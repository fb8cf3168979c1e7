package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.operators.DedupIndexStore

/** compactTail's manifest-based fold detection (VERDICT r12 item 2): the
  * normal maintenance path must do ZERO corpus-proportional reads, with
  * the old distinct-scan kept only as the crash-recovery / bootstrap /
  * verify audit. */
class DedupIndexManifestSpec extends SparkSpec {
  import spark.implicits._

  private def uniqueDocs(n: Int, tag: String): org.apache.spark.sql.DataFrame =
    (0 until n).map(i =>
      (i.toLong, s"$tag document $i carries tokens " +
        s"alpha$i beta${i * 7} gamma${i * 13} delta${i * 29} epsilon${i * 31}"))
      .toDF("doc_id", "text")

  private def newTail(): String = {
    val t = java.nio.file.Files.createTempDirectory("graft_mfest_tail").toString
    DedupIndexStore.initEmpty(spark, t, k = 2, numHashes = 8, bands = 4)
    t
  }

  private def manifestLines(tail: String, table: String): Set[String] = {
    val f = new java.io.File(s"$tail/_folded/$table.txt")
    if (!f.exists) Set.empty
    else scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty).toSet
  }

  private def withTables[A](base: String)(body: => A): A =
    try body finally Seq("bands", "shingles", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${base}_$t"))

  test("normal-path compaction never reads the corpus-sized tables") {
    withTables("mf_idx") {
      // corpus 400 docs -> 1600 band rows + 400 shingle rows; tail 3 docs.
      // If fold detection still scanned the standing tables for distinct
      // ingest ids, compaction would read >2000 input rows; manifest-based
      // detection reads only the tail (+ two 1-row metas).
      DedupIndexStore.buildBucketed(
        uniqueDocs(400, "corpus"), "doc_id", "text", "mf_idx", 4,
        k = 2, numHashes = 8, bands = 4)
      val tail = newTail()
      DedupIndexStore.append(
        uniqueDocs(3, "tailbatch").withColumn(
          "doc_id", org.apache.spark.sql.functions.col("doc_id") + 10000L),
        "doc_id", "text", tail, "aaaa_b0")
      val read = new java.util.concurrent.atomic.AtomicLong
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        DedupIndexStore.compactTail(spark, "mf_idx", tail, 4)
        // listener events are asynchronous; wait for the count to settle
        var last = -1L
        var settled = 0
        while (settled < 3) {
          Thread.sleep(200)
          if (read.get == last) settled += 1 else { settled = 0; last = read.get }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      assert(read.get < 200,
        s"normal-path compaction read ${read.get} input rows — the fold " +
          "detection is scanning the corpus-sized tables again")
      // and the fold itself was real: tail cleared, rows landed
      assert(!new java.io.File(s"$tail/bands").exists)
      assert(spark.table("mf_idx_bands")
        .filter($"ingest" === "aaaa_b0").count() == 3L * 4)

      // CONTROL: verify=true runs the audit scan on purpose — it must
      // read corpus-scale input (prices the old behavior; also proves
      // the listener bound above had teeth)
      DedupIndexStore.append(
        uniqueDocs(2, "tailnext").withColumn(
          "doc_id", org.apache.spark.sql.functions.col("doc_id") + 20000L),
        "doc_id", "text", tail, "aaaa_b1")
      read.set(0)
      spark.sparkContext.addSparkListener(listener)
      try {
        DedupIndexStore.compactTail(spark, "mf_idx", tail, 4, verify = true)
        var last = -1L
        var settled = 0
        while (settled < 3) {
          Thread.sleep(200)
          if (read.get == last) settled += 1 else { settled = 0; last = read.get }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      assert(read.get > 1500,
        s"verify=true read only ${read.get} rows — the audit scan is gone")
    }
  }

  test("manifests stay O(streams): only the max id per namespace is retained") {
    withTables("mf_pr") {
      DedupIndexStore.buildBucketed(
        uniqueDocs(5, "corpus"), "doc_id", "text", "mf_pr", 4,
        k = 2, numHashes = 8, bands = 4)
      val tail = newTail()
      (0 to 2).foreach { b =>
        DedupIndexStore.append(
          uniqueDocs(2, s"batch$b").withColumn(
            "doc_id", org.apache.spark.sql.functions.col("doc_id") + 1000L * (b + 1)),
          "doc_id", "text", tail, s"cafe_b$b")
        DedupIndexStore.compactTail(spark, "mf_pr", tail, 4)
      }
      // three folded ingests, ONE live manifest entry: cafe_b0/b1 can
      // never replay once cafe_b2 exists (serial foreachBatch commits)
      assert(manifestLines(tail, "bands") == Set("cafe_b2"),
        s"bands manifest: ${manifestLines(tail, "bands")}")
      assert(manifestLines(tail, "shingles") == Set("cafe_b2"))
      // all three ingests' rows are in the tables exactly once
      assert(spark.table("mf_pr_bands")
        .filter($"ingest".startsWith("cafe_")).count() == 3 * 2 * 4)
    }
  }

  test("a crashed compaction (inflight marker) recovers via the audit without duplicating") {
    withTables("mf_rc") {
      DedupIndexStore.buildBucketed(
        uniqueDocs(5, "corpus"), "doc_id", "text", "mf_rc", 4,
        k = 2, numHashes = 8, bands = 4)
      val tail = newTail()
      val batch = uniqueDocs(2, "crashbatch").withColumn(
        "doc_id", org.apache.spark.sql.functions.col("doc_id") + 3000L)
      DedupIndexStore.append(batch, "doc_id", "text", tail, "f00d_b0")
      DedupIndexStore.compactTail(spark, "mf_rc", tail, 4)
      val bandRows = spark.table("mf_rc_bands").count()
      // simulate the crash window: the stream replayed (tail re-appended),
      // a compaction then died AFTER its appends but BEFORE the manifest
      // write — manifests gone, _inflight left behind
      DedupIndexStore.append(batch, "doc_id", "text", tail, "f00d_b0")
      Seq("bands.txt", "shingles.txt").foreach(f =>
        new java.io.File(s"$tail/_folded/$f").delete())
      new java.io.File(s"$tail/_folded/_inflight").createNewFile()
      DedupIndexStore.compactTail(spark, "mf_rc", tail, 4)
      assert(spark.table("mf_rc_bands").count() == bandRows,
        "recovery re-folded an already-folded ingest")
      assert(!new java.io.File(s"$tail/_folded/_inflight").exists,
        "recovery must clear the inflight marker")
      assert(manifestLines(tail, "bands").contains("f00d_b0"),
        "recovery must rewrite the manifest to ground truth")
    }
  }

  test("a pre-manifest-era index bootstraps via the audit on first compaction") {
    withTables("mf_bs") {
      DedupIndexStore.buildBucketed(
        uniqueDocs(5, "corpus"), "doc_id", "text", "mf_bs", 4,
        k = 2, numHashes = 8, bands = 4)
      val tail = newTail()
      val b0 = uniqueDocs(2, "oldbatch").withColumn(
        "doc_id", org.apache.spark.sql.functions.col("doc_id") + 4000L)
      DedupIndexStore.append(b0, "doc_id", "text", tail, "beef_b0")
      DedupIndexStore.compactTail(spark, "mf_bs", tail, 4)
      // erase the manifest era entirely: an r12-vintage index
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(s"$tail/_folded"))
      // replay re-appends the folded ingest, plus a genuinely new one
      DedupIndexStore.append(b0, "doc_id", "text", tail, "beef_b0")
      DedupIndexStore.append(
        uniqueDocs(2, "newbatch").withColumn(
          "doc_id", org.apache.spark.sql.functions.col("doc_id") + 5000L),
        "doc_id", "text", tail, "beef_b1")
      val before = spark.table("mf_bs_bands").count()
      DedupIndexStore.compactTail(spark, "mf_bs", tail, 4)
      assert(spark.table("mf_bs_bands").count() == before + 2 * 4,
        "bootstrap must fold ONLY the new ingest (audit detects beef_b0)")
      assert(manifestLines(tail, "bands") == Set("base", "beef_b1"),
        s"bootstrap manifest: ${manifestLines(tail, "bands")}")
    }
  }

  test("an id crashed between bands and shingles tail writes is not marked shingles-folded") {
    // ADVICE r13 (medium): append() writes bands before shingles. A stream
    // crash between the two leaves ingest=X with a bands partition and no
    // shingles partition; compaction folding both tables from a bands-side
    // listing marked X folded for shingles with ZERO rows folded — after
    // the replay re-appended both tables, the next compaction skipped X
    // and deleted the tail, losing the shingle rows permanently (and with
    // them the verify stage's corpus side for those docs).
    withTables("mf_hc") {
      DedupIndexStore.buildBucketed(
        uniqueDocs(5, "corpus"), "doc_id", "text", "mf_hc", 4,
        k = 2, numHashes = 8, bands = 4)
      val tail = newTail()
      val batch = uniqueDocs(2, "halfbatch").withColumn(
        "doc_id", org.apache.spark.sql.functions.col("doc_id") + 7000L)
      DedupIndexStore.append(batch, "doc_id", "text", tail, "abad_b0")
      // simulate the append crash: bands written, died before shingles
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(s"$tail/shingles/ingest=abad_b0"))
      DedupIndexStore.compactTail(spark, "mf_hc", tail, 4)
      assert(manifestLines(tail, "bands").contains("abad_b0"),
        "the bands half folded — its manifest must record it")
      assert(!manifestLines(tail, "shingles").contains("abad_b0"),
        "an id with no shingles tail partition must NOT enter the " +
          "shingles manifest — that is the silent-loss seam")
      // the stream replays the batch: idempotent re-append of BOTH tables
      DedupIndexStore.append(batch, "doc_id", "text", tail, "abad_b0")
      DedupIndexStore.compactTail(spark, "mf_hc", tail, 4)
      // shingle rows landed exactly once; band rows were not re-folded
      assert(spark.table("mf_hc_shingles")
        .filter($"ingest" === "abad_b0").count() == 2,
        "the replayed shingle rows must fold (they were lost before the fix)")
      assert(spark.table("mf_hc_bands")
        .filter($"ingest" === "abad_b0").count() == 2L * 4,
        "the bands half must fold exactly once across the two compactions")
      // and the verify stage has its corpus side back: a near-dup of a
      // halfbatch doc is found with a real jaccard
      val hits = DedupIndexStore.probeBucketed(
        spark, uniqueDocs(1, "halfbatch").withColumn(
          "doc_id", org.apache.spark.sql.functions.col("doc_id") + 9000L),
        "doc_id", "text", "mf_hc", threshold = 0.5)
        .select("id_corpus").collect().map(_.getLong(0)).toSet
      // (corpus doc 0 shares the template text minus its tag token and
      // also matches — the load-bearing hit is 7000, whose shingle rows
      // the pre-fix fold lost)
      assert(hits.contains(7000L), s"near-dup probe after the replay fold: $hits")
    }
  }

  test("a recreated tail's seeded manifests do not forget standing folds") {
    // ADVICE r13 (low): fold history lives in the tail-path manifests; an
    // operator who replaces the tail directory (initEmpty at a fresh path)
    // over a standing table that already holds folded ingests would, with
    // the seeded-empty manifests trusted, double-fold a replayed batch.
    // The standing table's fold-history property triggers a one-time audit.
    withTables("mf_rt") {
      DedupIndexStore.buildBucketed(
        uniqueDocs(5, "corpus"), "doc_id", "text", "mf_rt", 4,
        k = 2, numHashes = 8, bands = 4)
      val tailA = newTail()
      val batch = uniqueDocs(2, "movedbatch").withColumn(
        "doc_id", org.apache.spark.sql.functions.col("doc_id") + 8000L)
      DedupIndexStore.append(batch, "doc_id", "text", tailA, "feed_b0")
      DedupIndexStore.compactTail(spark, "mf_rt", tailA, 4)
      // the operator replaces the tail path; the crashed stream replays
      // batch 0 into the NEW tail under the same (checkpoint-keyed) id
      val tailB = newTail()
      DedupIndexStore.append(batch, "doc_id", "text", tailB, "feed_b0")
      val before = spark.table("mf_rt_bands").count()
      DedupIndexStore.compactTail(spark, "mf_rt", tailB, 4)
      assert(spark.table("mf_rt_bands").count() == before,
        "the already-folded replay must not fold again from the new tail")
      assert(manifestLines(tailB, "bands").contains("feed_b0"),
        "the audit bootstrap must rewrite the new tail's manifest to truth")
      // a genuinely new ingest through the new tail still folds normally
      DedupIndexStore.append(
        uniqueDocs(2, "newbatch").withColumn(
          "doc_id", org.apache.spark.sql.functions.col("doc_id") + 9500L),
        "doc_id", "text", tailB, "feed_b1")
      DedupIndexStore.compactTail(spark, "mf_rt", tailB, 4)
      assert(spark.table("mf_rt_bands").count() == before + 2 * 4,
        "a fresh ingest must still fold after the bootstrap")
    }
  }

  test("verify=true throws when the manifest diverges from the tables") {
    withTables("mf_vf") {
      DedupIndexStore.buildBucketed(
        uniqueDocs(5, "corpus"), "doc_id", "text", "mf_vf", 4,
        k = 2, numHashes = 8, bands = 4)
      val tail = newTail()
      val batch = uniqueDocs(2, "vbatch").withColumn(
        "doc_id", org.apache.spark.sql.functions.col("doc_id") + 6000L)
      DedupIndexStore.append(batch, "doc_id", "text", tail, "dead_b0")
      // consistent state: verify passes
      DedupIndexStore.compactTail(spark, "mf_vf", tail, 4, verify = true)
      // corrupt: replay re-appends the folded id, then the manifest
      // loses it — a non-verify run would double-fold; verify must throw
      DedupIndexStore.append(batch, "doc_id", "text", tail, "dead_b0")
      // corrupt through the Hadoop FS (keeps the .crc sidecar consistent)
      val mp = new org.apache.hadoop.fs.Path(s"$tail/_folded/bands.txt")
      val mfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = mfs.create(mp, true)
      out.write("\n".getBytes("UTF-8"))
      out.close()
      val e = intercept[IllegalArgumentException] {
        DedupIndexStore.compactTail(spark, "mf_vf", tail, 4, verify = true)
      }
      assert(e.getMessage.contains("diverges"), e.getMessage)
    }
  }
}
