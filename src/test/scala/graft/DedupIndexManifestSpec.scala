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
