package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.DedupIndexStore
import graft.streaming.StreamOps

/** The self-maintaining streaming admission loop: within-batch
  * canonicalize → probe the persisted index → admit survivors → append
  * them, so later batches dedup against earlier ones THROUGH THE STORE
  * (no Spark state). */
class StreamingIngestDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpusText = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val freshText = "spark catalyst tungsten codegen shuffle exchange " +
    "partition broadcast executor driver stage task lineage plan optimizer " +
    "pushdown pruning bucketing skew salting"
  private val otherText = "entirely different document discussing parquet " +
    "footers column chunks dictionary encoding page headers statistics " +
    "bloom filters row groups compression codecs"

  test("first-wins across batches with all dedup state in the index") {
    val idx = java.nio.file.Files.createTempDirectory("graft_sid_idx").toString
    DedupIndexStore.build(
      Seq((100L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)

    val in = MemoryStream[(Long, String)](spark)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sid_ckpt").toFile
    ckpt.deleteOnExit()
    val q = StreamOps.streamingIngestDedup(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", idx,
      ckpt.getAbsolutePath,
      (df, bid) => admitted.synchronized {
        admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
      },
      threshold = 0.2)
    try {
      // batch 0: doc 1 fresh; doc 2 near-dups doc 1 (within-batch, higher
      // id loses); doc 3 near-dups the corpus (index hit)
      in.addData(
        (1L, freshText),
        (2L, freshText + " omega"),
        (3L, corpusText + " phi"))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L)),
        s"batch 0 admissions: ${admitted.toSet}")

      // batch 1: doc 4 near-dups doc 1 — admitted LAST batch, visible
      // only through the index append; doc 5 is new
      in.addData(
        (4L, freshText + " psi"),
        (5L, otherText))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L), (1L, 5L)),
        s"batch 1 admissions: ${admitted.toSet}")
    } finally q.stop()

    // the index now holds corpus + doc 1 + doc 5: a direct probe of a
    // copy of doc 5's text must hit doc 5
    val hits = DedupIndexStore.probe(
      spark, Seq((9L, otherText + " extra")).toDF("doc_id", "text"),
      "doc_id", "text", idx, threshold = 0.2)
      .select("id_corpus").collect().map(_.getLong(0)).toSet
    assert(hits == Set(5L), s"post-stream index probe hits: $hits")
  }

  test("replayed batch (crash between append and commit) re-admits identically") {
    // ADVICE r10 (high): a foreachBatch restart re-runs a batchId whose
    // first attempt already appended ingest=b0; probing against that
    // partition makes every admitted doc self-match (jaccard 1.0), the
    // admission comes back empty, and the idempotent re-append then
    // overwrites b0 with ZERO rows — silent loss. The probe must exclude
    // the batch's own partition.
    val idx = java.nio.file.Files.createTempDirectory("graft_sid_rp").toString
    DedupIndexStore.build(
      Seq((100L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)
    val batch = Seq(
      (1L, freshText),
      (2L, freshText + " omega"),
      (3L, corpusText + " phi"),
      (5L, otherText)).toDF("doc_id", "text")
    def admit() = StreamOps.admitBatch(
      batch, "doc_id", "text", idx, threshold = 0.2,
      excludeIngest = Some("b0"))
    val first = admit()
    assert(first.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 5L))
    DedupIndexStore.append(first, "doc_id", "text", idx, "b0")
    // -- crash here: append done, streaming commit lost; b0 replays --
    val replay = admit()
    assert(replay.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 5L),
      "replayed admission must equal the first attempt")
    // negative control: WITHOUT the exclusion the replayed probe sees the
    // first attempt's own partition and drops everything — the r10 bug
    val naive = StreamOps.admitBatch(batch, "doc_id", "text", idx, threshold = 0.2)
    assert(naive.select("doc_id").collect().isEmpty,
      "control: un-excluded replay self-matches (the failure this fix pins)")
    DedupIndexStore.append(replay, "doc_id", "text", idx, "b0")
    // index state after replay == state after a single clean run
    val hits = DedupIndexStore.probe(
      spark, Seq((9L, otherText + " extra")).toDF("doc_id", "text"),
      "doc_id", "text", idx, threshold = 0.2)
      .select("id_corpus").collect().map(_.getLong(0)).toSet
    assert(hits == Set(5L), s"post-replay index probe hits: $hits")
  }

  test("bucketed hybrid: first-wins through bucketed corpus + tail; corpus probe exchange-free") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val tail = java.nio.file.Files.createTempDirectory("graft_sid_tail").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sid_bkt_ckpt").toFile
    ckpt.deleteOnExit()
    try {
      DedupIndexStore.buildBucketed(
        Seq((100L, corpusText)).toDF("doc_id", "text"),
        "doc_id", "text", "sid_idx", 4, k = 2, numHashes = 32, bands = 16)
      DedupIndexStore.initEmpty(spark, tail, k = 2, numHashes = 32, bands = 16)

      val in = MemoryStream[(Long, String)](spark)
      val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = StreamOps.streamingIngestDedupBucketed(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", "sid_idx", tail,
        ckpt.getAbsolutePath,
        (df, bid) => admitted.synchronized {
          admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
        },
        threshold = 0.2)
      try {
        // same batch script as the plain-path test: the hybrid layout
        // must make the identical first-wins decisions
        in.addData(
          (1L, freshText),
          (2L, freshText + " omega"),
          (3L, corpusText + " phi"))
        q.processAllAvailable()
        assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L)),
          s"batch 0 admissions: ${admitted.toSet}")
        in.addData(
          (4L, freshText + " psi"),
          (5L, otherText))
        q.processAllAvailable()
        assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L), (1L, 5L)),
          s"batch 1 admissions: ${admitted.toSet}")
      } finally q.stop()

      // the per-batch probe plan (admitBatchBucketed IS the foreachBatch
      // body): the standing-corpus side of the candidate join must not
      // shuffle — its scan is hash-placed by the bucketing; only the
      // batch and the small tail pay exchanges
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val probe = StreamOps.admitBatchBucketed(
          Seq((9L, otherText + " extra")).toDF("doc_id", "text"),
          "doc_id", "text", "sid_idx", tail, threshold = 0.2)
        // doc 9 near-dups doc 5 — admitted via the TAIL, visible only
        // through the store
        assert(probe.collect().isEmpty, "tail near-dup must be dropped")
        val plan = probe.queryExecution.executedPlan
        def leavesOf(p: SparkPlan): Seq[String] = p.collectLeaves().map(_.toString)
        val bandSides = plan.collect {
          case j: SortMergeJoinExec => j
          case j: ShuffledHashJoinExec => j
        }.flatMap(_.children)
          .filter(side => leavesOf(side).exists(_.contains("sid_idx_bands")))
          .filter(side => side.collect {
            case j: SortMergeJoinExec => j
            case j: ShuffledHashJoinExec => j
          }.isEmpty)
        assert(bandSides.nonEmpty, s"no join over sid_idx_bands found:\n$plan")
        bandSides.foreach { side =>
          assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
            s"bucketed corpus side shuffles in the streaming probe:\n$side")
        }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }

      // compaction: fold the tail into the bucketed tables; decisions
      // unchanged (docs 1/5 now match via the standing corpus), tail gone
      DedupIndexStore.compactTail(spark, "sid_idx", tail, 4)
      assert(!new java.io.File(s"$tail/bands").exists, "tail must be cleared")
      val after = StreamOps.admitBatchBucketed(
        Seq((9L, otherText + " extra"), (10L, freshText + " chi")).toDF("doc_id", "text"),
        "doc_id", "text", "sid_idx", tail, threshold = 0.2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(after == Set.empty[Long],
        s"post-compaction: both near-dups must still be dropped, got $after")
      val fresh = StreamOps.admitBatchBucketed(
        Seq((11L, "completely novel sentence about database vacuum " +
          "autovacuum analyze statistics planner estimates")).toDF("doc_id", "text"),
        "doc_id", "text", "sid_idx", tail, threshold = 0.2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(fresh == Set(11L), s"novel doc must be admitted, got $fresh")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sid_idx_bands")
      spark.sql("DROP TABLE IF EXISTS sid_idx_shingles")
      spark.sql("DROP TABLE IF EXISTS sid_idx_meta")
    }
  }

  test("composed ingest: admitted docs are immediately ANN-searchable from the coded store") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{AnnIndexStore, Similarity}
    // geometry trained once on the standing embeddings table — appended
    // vectors are coded in the EXISTING cells/codebook, never retrained
    val e = graft.util.SparkUtil.table(spark, sf(), "embeddings")
    val cc = Similarity.trainIvfCentroids(e, "vec_id", "embedding", 4, 2)
    val pc = Similarity.trainPq(e, "vec_id", "embedding", m = 8, k = 8)
    val vecs = e.filter(col("vec_id") < 8).orderBy("vec_id").collect()
      .map(_.getSeq[Float](1))

    val root = java.nio.file.Files.createTempDirectory("graft_sid_ann").toString
    val idx = s"$root/dedup"
    val codes = s"$root/codes"
    DedupIndexStore.build(
      Seq((100L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)
    AnnIndexStore.buildCodes(
      Seq((100L, vecs(0))).toDF("doc_id", "embedding"),
      "doc_id", "embedding", cc, pc, codes)

    val in = MemoryStream[(Long, String, Seq[Float])](spark)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sid_ann_ckpt").toFile
    ckpt.deleteOnExit()
    val q = StreamOps.streamingIngestDedupWithAnn(
      in.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding", idx, codes, cc, pc,
      ckpt.getAbsolutePath,
      (df, bid) => admitted.synchronized {
        admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
      },
      threshold = 0.2)
    def searchTop1(vec: Seq[Float]): Long = {
      val stored = AnnIndexStore.loadCodes(spark, codes)
      val raw = stored.select(col("neighbor_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
        .map(id => (id, if (id == 100L) vecs(0) else vecs(id.toInt)))
      Similarity.ivfPqTopKFromCodes(
        stored, Seq((0L, vec)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1, nprobe = 4, cc, pc, rerank = 4,
        corpusForRerank = Some(raw.toDF("neighbor_id", "cv")))
        .select("neighbor_id").head().getLong(0)
    }
    try {
      // batch 0: doc 1 fresh (admitted), doc 3 near-dups the corpus
      in.addData((1L, freshText, vecs(1)), (3L, corpusText + " phi", vecs(3)))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L)))
      // doc 1 is ANN-findable from the store the moment its batch commits
      assert(searchTop1(vecs(1)) == 1L,
        "admitted doc must be the exact-rerank top-1 for its own vector")

      // batch 1: doc 4 near-dups doc 1 (drop), doc 5 fresh (admit)
      in.addData((4L, freshText + " psi", vecs(4)), (5L, otherText, vecs(5)))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L), (1L, 5L)))
      assert(searchTop1(vecs(5)) == 5L)
      // the coded corpus holds EXACTLY base + admitted — dropped docs
      // (3, 4) never enter the ANN store
      val stored = AnnIndexStore.loadCodes(spark, codes)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      assert(stored == Set(100L, 1L, 5L), s"coded store holds: $stored")
    } finally q.stop()
  }

  test("all-duplicate batch appends an empty ingest partition without poisoning later probes") {
    // a batch where EVERY doc near-dups the corpus admits nothing; its
    // append writes an empty ingest partition, and the index must stay
    // fully probe-able for the batches after it
    val idx = java.nio.file.Files.createTempDirectory("graft_sid_empty").toString
    DedupIndexStore.build(
      Seq((100L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)

    val in = MemoryStream[(Long, String)](spark)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sid_empty_ckpt").toFile
    ckpt.deleteOnExit()
    val q = StreamOps.streamingIngestDedup(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", idx,
      ckpt.getAbsolutePath,
      (df, bid) => admitted.synchronized {
        admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
      },
      threshold = 0.2)
    try {
      in.addData((1L, corpusText + " phi"), (2L, corpusText + " chi"))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.isEmpty),
        s"batch 0 must admit nothing: ${admitted.toSet}")
      in.addData((3L, freshText))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((1L, 3L)),
        s"batch 1 admissions after an empty append: ${admitted.toSet}")
    } finally q.stop()
    val hits = DedupIndexStore.probe(
      spark, Seq((9L, freshText + " psi")).toDF("doc_id", "text"),
      "doc_id", "text", idx, threshold = 0.2)
      .select("id_corpus").collect().map(_.getLong(0)).toSet
    assert(hits == Set(3L), s"post-empty-append probe hits: $hits")
  }

  test("admitBatch replays the admission rule deterministically in batch") {
    val idx = java.nio.file.Files.createTempDirectory("graft_sid_idx2").toString
    DedupIndexStore.build(
      Seq((100L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)
    val batch = Seq(
      (1L, freshText),
      (2L, freshText + " omega"),
      (3L, corpusText + " phi"),
      (5L, otherText)).toDF("doc_id", "text")
    val out = StreamOps.admitBatch(batch, "doc_id", "text", idx, threshold = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 5L), s"admitted: $out")
  }
}
