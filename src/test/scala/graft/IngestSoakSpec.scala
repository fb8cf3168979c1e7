package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.DedupIndexStore
import graft.streaming.StreamOps

/** Longevity of the self-maintaining hybrid ingest loop (VERDICT r12
  * item 3): the 50×-corpus price point said one trigger is cheap; this
  * says the THOUSANDTH trigger is still cheap — per-trigger wall must not
  * creep as the index accumulates ingests and compactions fold them, and
  * the on-disk footprint must stay bounded by the compaction cadence, not
  * the stream's lifetime. CI runs the scaled-down version (30+ triggers,
  * 2 mid-stream compactions); Bench's `soak` section runs the full-size
  * one and publishes the per-trigger curve. */
class IngestSoakSpec extends SparkSpec {
  import spark.implicits._

  private def fileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new java.io.File(dir))
  }

  test("30-trigger soak with 2 mid-stream compactions: flat wall, bounded files, exact admissions") {
    val Triggers = 30
    val CompactEvery = 10
    val tail = java.nio.file.Files.createTempDirectory("graft_soak_tail").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_soak_ckpt").toFile
    ckpt.deleteOnExit()
    try {
      DedupIndexStore.buildBucketed(
        Seq((100000L, "seed corpus document about tokens shingles bands " +
          "signatures jaccard thresholds buckets")).toDF("doc_id", "text"),
        "doc_id", "text", "soak_idx", 4, k = 2, numHashes = 8, bands = 4)
      DedupIndexStore.initEmpty(spark, tail, k = 2, numHashes = 8, bands = 4)

      val in = MemoryStream[(Long, String)](spark)
      val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamOps.streamingIngestDedupBucketed(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", "soak_idx", tail,
        ckpt.getAbsolutePath,
        (df, _) => admitted.synchronized {
          admitted ++= df.select("doc_id").collect().map(_.getLong(0))
        },
        threshold = 0.2)
      val wallSec = Array.fill(Triggers)(0.0)
      val tailFilesSeen = scala.collection.mutable.ArrayBuffer.empty[Int]
      try {
        // every token embeds (trigger, doc), so distinct docs share ZERO
        // shingles — near-dup pairs exist only where this test plants them
        def freshText(t: Int, j: Int): String =
          (0 until 8).map(w => s"t${t}d${j}w$w").mkString(" ")
        (0 until Triggers).foreach { t =>
          // per trigger: 3 fresh docs + 1 near-dup of a doc admitted ~5
          // triggers ago (exercises the store lookup, not just freshness)
          val base = 10L * t
          val fresh = (0 until 3).map(j => (base + j, freshText(t, j)))
          val dup = (base + 5, freshText(math.max(0, t - 5), 0) + " ztail")
          val t0 = System.nanoTime()
          in.addData(fresh :+ dup: _*)
          q.processAllAvailable()
          wallSec(t) = (System.nanoTime() - t0) / 1e9
          if ((t + 1) % CompactEvery == 0 && t + 1 < Triggers) {
            DedupIndexStore.compactTail(spark, "soak_idx", tail, 4)
            assert(!new java.io.File(s"$tail/bands").exists,
              s"tail not cleared by compaction after trigger $t")
          }
          tailFilesSeen += fileCount(tail)
        }
      } finally q.stop()

      // exact admissions: every trigger admits its 3 fresh docs and drops
      // its planted near-dup — trigger 0's dup targets its OWN doc 0
      // (within-batch canonicalizer keeps the min id), triggers 1-4
      // target trigger 0's admitted doc, and trigger >=5 targets the doc
      // admitted 5 triggers ago (the store probe, possibly across folds)
      val got = admitted.synchronized(admitted.toSet)
      (0 until Triggers).foreach { t =>
        (0 until 3).foreach(j => assert(got.contains(10L * t + j),
          s"fresh doc ${10L * t + j} of trigger $t was not admitted"))
        assert(!got.contains(10L * t + 5),
          s"near-dup ${10L * t + 5} of trigger $t escaped the dedup loop")
      }

      // flat wall: the last third must not creep past the first third
      // (generous 2.5x bound — a leak over 30 triggers of a growing index
      // shows as monotone growth, not noise)
      def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      val firstMed = median(wallSec.slice(2, 10).toSeq) // skip 2 warmup triggers
      val lastMed = median(wallSec.takeRight(10).toSeq)
      assert(lastMed <= firstMed * 2.5,
        s"per-trigger wall crept: first-third median $firstMed s, " +
          s"last-10 median $lastMed s " +
          s"(walls: ${wallSec.map(w => f"$w%.2f").mkString(", ")})")

      // bounded footprint: the tail's file count is bounded by the
      // compaction interval (never exceeds interval x files-per-append),
      // not by the stream's lifetime
      val perAppend = tailFilesSeen.take(CompactEvery).max.toDouble / CompactEvery
      assert(tailFilesSeen.max <= (CompactEvery + 2) * math.max(perAppend, 4.0),
        s"tail file count outgrew the compaction cadence: $tailFilesSeen")
    } finally {
      Seq("bands", "shingles", "meta").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS soak_idx_$t"))
    }
  }

  test("compound seam: kill mid-compaction + 4->8-byte id upgrade in the same incarnation") {
    // VERDICT r13 item 4: the compaction crash fence and the in-flight
    // namespace-widening upgrade were each spec'd alone; this drives them
    // COMPOUNDED — the pre-upgrade attempt's batch is in the tail, a
    // compaction is killed after its bucketed appends but before the
    // manifest write, and the stream restarts UPGRADED in that same
    // incarnation. Required: exact admissions on the replay, no duplicate
    // folds in the recovery compaction, and a correct store afterwards.
    val textA = "spark catalyst tungsten codegen shuffle exchange partition broadcast"
    val textB = "parquet footers column chunks dictionary encoding page statistics"
    val tail = java.nio.file.Files.createTempDirectory("graft_cmb_tail").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cmb_ckpt").toFile
    ckpt.deleteOnExit()
    try {
      DedupIndexStore.buildBucketed(
        Seq((100000L, "seed corpus document about tokens shingles bands " +
          "signatures jaccard thresholds buckets")).toDF("doc_id", "text"),
        "doc_id", "text", "cmb_idx", 4, k = 2, numHashes = 8, bands = 4)
      DedupIndexStore.initEmpty(spark, tail, k = 2, numHashes = 8, bands = 4)
      val data = Seq((1L, textA), (2L, textB))
      val legacyId = StreamOps.ingestNs(ckpt.getAbsolutePath).take(8) + "_b0"
      val newId = StreamOps.ingestNs(ckpt.getAbsolutePath) + "_b0"
      // pre-upgrade attempt: both docs admitted, appended to the tail
      // under the 4-byte-era id, crash before the streaming commit
      val first = StreamOps.admitBatchBucketed(
        data.toDF("doc_id", "text"), "doc_id", "text", "cmb_idx", tail,
        threshold = 0.2)
      assert(first.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      DedupIndexStore.append(first, "doc_id", "text", tail, legacyId)
      // maintenance compaction is KILLED mid-run, after its bucketed
      // appends and before the manifest write: fold for real, then
      // restore the killed-run state — tail partition back, manifests
      // gone, _inflight left behind (same simulation as
      // DedupIndexManifestSpec's crash-fence test)
      DedupIndexStore.compactTail(spark, "cmb_idx", tail, 4)
      DedupIndexStore.append(first, "doc_id", "text", tail, legacyId)
      Seq("bands.txt", "shingles.txt").foreach(f =>
        new java.io.File(s"$tail/_folded/$f").delete())
      new java.io.File(s"$tail/_folded/_inflight").createNewFile()
      // -- the upgrade lands HERE; the same incarnation restarts and
      // replays batch 0 under the widened id --
      val in = MemoryStream[(Long, String)](spark)
      val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = StreamOps.streamingIngestDedupBucketed(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", "cmb_idx", tail,
        ckpt.getAbsolutePath,
        (df, bid) => admitted.synchronized {
          admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
        },
        threshold = 0.2)
      try {
        in.addData(data: _*)
        q.processAllAvailable()
        assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L), (0L, 2L)),
          "the upgraded replay must admit exactly the first attempt's docs " +
            s"despite its rows standing in BOTH stores: ${admitted.toSet}")
        // the stream retired the legacy tail partition after the commit
        assert(!new java.io.File(s"$tail/bands/ingest=$legacyId").exists,
          "legacy tail partition must be retired by the upgraded replay")
        assert(new java.io.File(s"$tail/bands/ingest=$newId").exists)
        // recovery compaction, mid-stream: the inflight fence forces the
        // audit, which must fold ONLY the new id (the legacy rows already
        // stand) — the no-duplicate-folds half of the compound seam
        DedupIndexStore.compactTail(spark, "cmb_idx", tail, 4)
        def bandRows(ingest: String): Long = spark.table("cmb_idx_bands")
          .filter($"ingest" === ingest).count()
        assert(bandRows(legacyId) == 2L * 4,
          s"legacy rows must stand exactly once, got ${bandRows(legacyId)}")
        assert(bandRows(newId) == 2L * 4,
          s"new-id rows must fold exactly once, got ${bandRows(newId)}")
        assert(!new java.io.File(s"$tail/_folded/_inflight").exists,
          "recovery must clear the inflight marker")
        assert(!new java.io.File(s"$tail/bands").exists, "tail must be cleared")
        // and the loop keeps running correctly in the same incarnation:
        // a fresh doc admits, a near-dup of doc 1 (standing twice, under
        // both id eras) still drops exactly once
        in.addData(
          (3L, "entirely novel text mentioning vacuum analyze planner estimates"),
          (4L, textA + " tailword"))
        q.processAllAvailable()
        assert(admitted.synchronized(admitted.toSet) ==
          Set((0L, 1L), (0L, 2L), (1L, 3L)),
          s"post-recovery trigger admissions: ${admitted.toSet}")
      } finally q.stop()
    } finally {
      Seq("bands", "shingles", "meta").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS cmb_idx_$t"))
    }
  }
}
