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

      // plan shape of a probe round: the standing-corpus side of the
      // candidate join must not shuffle — its scan is hash-placed by the
      // bucketing; only the batch and the small tail pay exchanges
      def assertCorpusSideExchangeFree(label: String): Unit = {
        val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          val probe = StreamOps.admitBatchBucketed(
            Seq((9L, otherText + " extra")).toDF("doc_id", "text"),
            "doc_id", "text", "sid_idx", tail, threshold = 0.2)
          // doc 9 near-dups doc 5 — admitted by the stream, visible only
          // through the store (tail before compaction, folded rows after)
          assert(probe.collect().isEmpty, s"$label: near-dup of 5 must drop")
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
          assert(bandSides.nonEmpty, s"$label: no join over sid_idx_bands:\n$plan")
          bandSides.foreach { side =>
            assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
              s"$label: bucketed corpus side shuffles:\n$side")
          }
        } finally {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
          spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        }
      }

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

        assertCorpusSideExchangeFree("pre-compaction")

        // compaction MID-STREAM (VERDICT r11 item 4): fold the tail into
        // the bucketed tables between triggers while the query is live —
        // the maintenance cadence a production ingest runs. Admission
        // decisions must be unchanged across the boundary: docs 1/5 now
        // match via the standing corpus instead of the tail.
        DedupIndexStore.compactTail(spark, "sid_idx", tail, 4)
        assert(!new java.io.File(s"$tail/bands").exists, "tail must be cleared")
        in.addData(
          (6L, otherText + " extra"), // near-dups doc 5 — folded rows
          (7L, "completely novel sentence about database vacuum " +
            "autovacuum analyze statistics planner estimates"))
        q.processAllAvailable()
        assert(admitted.synchronized(admitted.toSet) ==
          Set((0L, 1L), (1L, 5L), (2L, 7L)),
          s"post-compaction batch admissions: ${admitted.toSet}")
      } finally q.stop()

      // the probe after compaction reads the folded rows from the
      // bucketed tables — still exchange-free on the corpus side
      assertCorpusSideExchangeFree("post-compaction")
      val after = StreamOps.admitBatchBucketed(
        Seq((10L, freshText + " chi")).toDF("doc_id", "text"),
        "doc_id", "text", "sid_idx", tail, threshold = 0.2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(after == Set.empty[Long],
        s"post-compaction: near-dup of doc 1 must still be dropped, got $after")
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

      // MID-STREAM maintenance: fold the per-batch ingest dirs into a
      // generation (AnnIndexStore.compactCodes) while the query is live —
      // admitted docs must stay searchable and later batches must keep
      // appending next to the generation
      AnnIndexStore.compactCodes(spark, codes)
      assert(searchTop1(vecs(1)) == 1L,
        "doc 1 must stay searchable from the folded generation")
      assert(searchTop1(vecs(5)) == 5L)
      in.addData((6L, "vacuum analyze planner estimates statistics hints", vecs(6)))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) ==
        Set((0L, 1L), (1L, 5L), (2L, 6L)))
      assert(searchTop1(vecs(6)) == 6L,
        "a post-compaction batch must be searchable from its fresh ingest dir")
      val storedAfter = AnnIndexStore.loadCodes(spark, codes)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      assert(storedAfter == Set(100L, 1L, 5L, 6L),
        s"coded store after fold + append holds: $storedAfter")
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

  test("admission signs each batch exactly once per trigger") {
    // VERDICT r11 item 3: the r11 sign-once refactor (admitSigned caches
    // the banded-signature and shingle tables for the trigger) is pinned
    // by COUNTING evaluations of the batch's text column. Consumers of
    // the raw batch per trigger: the bands signing scan, the shingles
    // signing scan, and the admitted-rows cache build — 3 evaluations
    // per row. The pre-r11 shape (the probe re-signing the batch from
    // text) adds two more scans; a future edit that feeds the raw batch
    // to another consumer fails this bound.
    import org.apache.spark.sql.functions.{col, udf}
    val idx = java.nio.file.Files.createTempDirectory("graft_sid_cnt").toString
    DedupIndexStore.build(
      Seq((100L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)
    val evals = spark.sparkContext.longAccumulator("text-evals")
    val countedText = udf { s: String => evals.add(1L); s }
    val in = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sid_cnt_ckpt").toFile
    ckpt.deleteOnExit()
    val q = StreamOps.streamingIngestDedup(
      in.toDF().toDF("doc_id", "text")
        .withColumn("text", countedText(col("text"))),
      "doc_id", "text", idx, ckpt.getAbsolutePath,
      (df, _) => { df.count(); () },
      threshold = 0.2)
    try {
      in.addData(
        (1L, freshText),
        (2L, freshText + " omega"),
        (3L, corpusText + " phi"),
        (5L, otherText))
      q.processAllAvailable()
    } finally q.stop()
    assert(evals.value <= 3L * 4,
      s"text evaluated ${evals.value} times for a 4-row batch — " +
        "expected ≤ 12 (bands sign + shingles sign + admitted cache); " +
        "a second signing pass has been reintroduced")
    assert(evals.value >= 2L * 4,
      s"text evaluated only ${evals.value} times — the counting probe " +
        "is no longer wired to the signing path; fix the test")
  }

  test("replay across a compaction boundary re-admits identically (folded lineage)") {
    // ADVICE r11 (medium): stream crashes after appending ingest=bN to
    // the tail but before the streaming commit; compaction runs before
    // the restart and folds bN into the bucketed tables. The replayed
    // batch must still exclude its own rows — now via their ingest
    // lineage in the bucketed tables — or it self-matches, admits
    // nothing, and an idempotent sink overwrites batch N with zero rows.
    val tail = java.nio.file.Files.createTempDirectory("graft_sid_rc").toString
    try {
      DedupIndexStore.buildBucketed(
        Seq((100L, corpusText)).toDF("doc_id", "text"),
        "doc_id", "text", "sidrc_idx", 4, k = 2, numHashes = 32, bands = 16)
      DedupIndexStore.initEmpty(spark, tail, k = 2, numHashes = 32, bands = 16)
      val batch = Seq(
        (1L, freshText),
        (3L, corpusText + " phi"),
        (5L, otherText)).toDF("doc_id", "text")
      val ingestId = "deadbeef_b0"
      def admit(exclude: Option[String]) = StreamOps.admitBatchBucketed(
        batch, "doc_id", "text", "sidrc_idx", tail, threshold = 0.2,
        excludeIngest = exclude)
      val first = admit(Some(ingestId))
      assert(first.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 5L))
      DedupIndexStore.append(first, "doc_id", "text", tail, ingestId)
      // -- crash: append done, commit lost. Maintenance folds the tail --
      DedupIndexStore.compactTail(spark, "sidrc_idx", tail, 4)
      assert(!new java.io.File(s"$tail/bands").exists)
      // replay: its rows now live in the BUCKETED tables, under their id
      val replay = admit(Some(ingestId))
      assert(replay.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 5L),
        "replayed admission must equal the first attempt across the " +
          "compaction boundary")
      // negative control: without the lineage exclusion the replay
      // self-matches against its own folded rows — the seam this pins
      val naive = admit(None)
      assert(naive.select("doc_id").collect().isEmpty,
        "control: un-excluded replay must self-match against folded rows")
      // the replay re-appends to the tail (idempotent path); a second
      // compaction detects the already-folded id and SKIPS it instead of
      // duplicating rows (ADVICE r11: fold/delete fencing)
      DedupIndexStore.append(replay, "doc_id", "text", tail, ingestId)
      val bandRows = spark.table("sidrc_idx_bands").count()
      val shingleRows = spark.table("sidrc_idx_shingles").count()
      DedupIndexStore.compactTail(spark, "sidrc_idx", tail, 4)
      assert(spark.table("sidrc_idx_bands").count() == bandRows,
        "re-compaction of an already-folded ingest must not duplicate band rows")
      assert(spark.table("sidrc_idx_shingles").count() == shingleRows,
        "re-compaction of an already-folded ingest must not duplicate shingle rows")
      assert(!new java.io.File(s"$tail/bands").exists, "tail must be cleared")
      // and the store still answers correctly
      val hits = StreamOps.admitBatchBucketed(
        Seq((9L, otherText + " extra")).toDF("doc_id", "text"),
        "doc_id", "text", "sidrc_idx", tail, threshold = 0.2)
      assert(hits.collect().isEmpty, "near-dup of admitted doc 5 must drop")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sidrc_idx_bands")
      spark.sql("DROP TABLE IF EXISTS sidrc_idx_shingles")
      spark.sql("DROP TABLE IF EXISTS sidrc_idx_meta")
    }
  }

  test("a new stream incarnation over an existing index cannot clobber prior admissions") {
    // ADVICE r11: batchIds restart at 0 under a NEW checkpoint, so bare
    // b<batchId> ingest ids would make the new incarnation's batch 0
    // exclude — then idempotently OVERWRITE — the old incarnation's b0
    // partition. Ingest ids are namespaced by the checkpoint location:
    // the new stream's batch 0 treats the old rows as ordinary corpus.
    val idx = java.nio.file.Files.createTempDirectory("graft_sid_inc").toString
    DedupIndexStore.build(
      Seq((100L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)
    def runIncarnation(ckptName: String, data: Seq[(Long, String)]): Set[(Long, Long)] = {
      val in = MemoryStream[(Long, String)](spark)
      val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory(ckptName).toFile
      ckpt.deleteOnExit()
      val q = StreamOps.streamingIngestDedup(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", idx,
        ckpt.getAbsolutePath,
        (df, bid) => admitted.synchronized {
          admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
        },
        threshold = 0.2)
      try {
        in.addData(data: _*)
        q.processAllAvailable()
      } finally q.stop()
      admitted.synchronized(admitted.toSet)
    }
    // incarnation A: batch 0 admits doc 1
    assert(runIncarnation("graft_sid_inc_a", Seq((1L, freshText))) == Set((0L, 1L)))
    // incarnation B (fresh checkpoint, batchId 0 again): doc 7 near-dups
    // doc 1 — it must be DROPPED (doc 1's partition is ordinary corpus to
    // this stream, not "its own" b0); doc 8 is fresh
    assert(runIncarnation("graft_sid_inc_b",
      Seq((7L, freshText + " psi"), (8L, otherText))) == Set((0L, 8L)))
    // doc 1 must still be in the index — the old partition was not
    // overwritten by the new incarnation's batch 0
    val hits = DedupIndexStore.probe(
      spark, Seq((9L, freshText + " chi")).toDF("doc_id", "text"),
      "doc_id", "text", idx, threshold = 0.2)
      .select("id_corpus").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L), s"doc 1 must survive the new incarnation: $hits")
  }

  test("un-drained bare-id upgrade fails loudly; a foreign bare-id partition passes through") {
    // VERDICT r13 item 1: upgrading a PRE-NAMESPACE maintaining stream
    // with an in-flight uncommitted batch (no quiesced drain) used to
    // self-match every doc, admit nothing, and idempotently overwrite the
    // batch's output with zero rows — silent loss, documented but
    // unenforced. The guard must abort the batch with the drain
    // instruction instead, while a genuinely foreign bare-id partition
    // (another incarnation's committed batch, different doc ids) stays
    // ordinary corpus.
    val data = Seq(
      (1L, freshText),
      (3L, corpusText + " phi"),
      (5L, otherText))
    def newIndex(name: String): String = {
      val idx = java.nio.file.Files.createTempDirectory(name).toString
      DedupIndexStore.build(
        Seq((100L, corpusText)).toDF("doc_id", "text"),
        "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)
      idx
    }
    def runStream(idx: String): (Either[Throwable, Unit], Set[(Long, Long)]) = {
      val in = MemoryStream[(Long, String)](spark)
      val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_sid_bare_ckpt").toFile
      ckpt.deleteOnExit()
      val q = StreamOps.streamingIngestDedup(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", idx,
        ckpt.getAbsolutePath,
        (df, bid) => admitted.synchronized {
          admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
        },
        threshold = 0.2)
      val outcome =
        try { in.addData(data: _*); q.processAllAvailable(); Right(()) }
        catch { case e: Throwable => Left(e) }
        finally q.stop()
      (outcome, admitted.synchronized(admitted.toSet))
    }

    // VIOLATION: the pre-namespace attempt appended its admitted subset
    // under bare b0 and crashed before the commit; the operator upgrades
    // without draining and the stream replays batch 0
    val idxV = newIndex("graft_sid_bare_v")
    val first = StreamOps.admitBatch(
      data.toDF("doc_id", "text"), "doc_id", "text", idxV, threshold = 0.2)
    assert(first.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 5L))
    DedupIndexStore.append(first, "doc_id", "text", idxV, "b0")
    val (outcomeV, admittedV) = runStream(idxV)
    val err = outcomeV.swap.getOrElse(fail(
      "un-drained bare-id replay must fail the streaming query loudly"))
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
        .map(e => Option(e.getMessage).getOrElse(""))
    assert(messages(err).exists(m =>
      m.contains("quiesced") && m.contains("pre-namespace")),
      s"failure must carry the drain instruction, got: ${messages(err)}")
    assert(admittedV.isEmpty, s"no admission may land: $admittedV")
    // the crashed attempt's partition is untouched — nothing overwrote it
    // with zero rows; its docs remain probe-able corpus
    val survivors = DedupIndexStore.probe(
      spark, Seq((9L, otherText + " extra")).toDF("doc_id", "text"),
      "doc_id", "text", idxV, threshold = 0.2)
      .select("id_corpus").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(5L),
      s"the bare partition's rows must survive the abort: $survivors")

    // FALSE-POSITIVE CONTROL: a foreign incarnation's committed bare b0
    // with DIFFERENT doc ids — the stream must run clean, treat it as
    // corpus (doc 5 near-dups foreign doc 50 and drops), admit doc 1
    val idxF = newIndex("graft_sid_bare_f")
    DedupIndexStore.append(
      Seq((50L, otherText + " legacy")).toDF("doc_id", "text"),
      "doc_id", "text", idxF, "b0")
    val (outcomeF, admittedF) = runStream(idxF)
    assert(outcomeF.isRight,
      s"foreign bare-id partition must not trip the guard: $outcomeF")
    assert(admittedF == Set((0L, 1L)),
      s"foreign bare-id corpus must dedup normally: $admittedF")
    assert(new java.io.File(s"$idxF/bands/ingest=b0").exists,
      "the foreign partition must stay untouched")
  }

  test("un-drained bare-id upgrade fails loudly when a compaction folded the tail (hybrid)") {
    // VERDICT r14 item 2 / ADVICE r14: the bare-id guard's tail-directory
    // check has a SECOND home to cover on the hybrid layout — a
    // maintenance compactTail that ran between the pre-upgrade crash and
    // the upgraded restart folds the bare in-flight partition into the
    // STANDING bucketed table (lineage intact, tail directory gone). The
    // tail-only guard then passed, the replay self-matched, and the
    // idempotent sink overwrote the batch with zero rows — the exact
    // silent-loss mode the guard exists to kill, plausible wherever
    // compaction runs on a cron. The guard must find the folded copy
    // through the fold manifest (bare ids never parse as <ns>_b<N>, so
    // manifest pruning keeps them forever) and abort with the same drain
    // instruction; a FOREIGN folded bare-id lineage (another
    // incarnation's committed batch, different doc ids) must pass through
    // as ordinary corpus.
    val data = Seq(
      (1L, freshText),
      (3L, corpusText + " phi"),
      (5L, otherText))
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
        .map(e => Option(e.getMessage).getOrElse(""))
    def setupFolded(tag: String, bareRows: org.apache.spark.sql.DataFrame): String = {
      val tail = java.nio.file.Files.createTempDirectory(s"graft_sid_fold_$tag").toString
      DedupIndexStore.buildBucketed(
        Seq((100L, corpusText)).toDF("doc_id", "text"),
        "doc_id", "text", s"sidfold_${tag}_idx", 4, k = 2, numHashes = 32, bands = 16)
      DedupIndexStore.initEmpty(spark, tail, k = 2, numHashes = 32, bands = 16)
      DedupIndexStore.append(bareRows, "doc_id", "text", tail, "b0")
      DedupIndexStore.compactTail(spark, s"sidfold_${tag}_idx", tail, 4)
      assert(!new java.io.File(s"$tail/bands").exists,
        "the fold must have cleared the tail (the guard's directory check passes)")
      tail
    }
    def runStream(tag: String, tail: String): (Either[Throwable, Unit], Set[(Long, Long)]) = {
      val in = MemoryStream[(Long, String)](spark)
      val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_sid_fold_${tag}_ckpt").toFile
      ckpt.deleteOnExit()
      val q = StreamOps.streamingIngestDedupBucketed(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"sidfold_${tag}_idx", tail, ckpt.getAbsolutePath,
        (df, bid) => admitted.synchronized {
          admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
        },
        threshold = 0.2)
      val outcome =
        try { in.addData(data: _*); q.processAllAvailable(); Right(()) }
        catch { case e: Throwable => Left(e) }
        finally q.stop()
      (outcome, admitted.synchronized(admitted.toSet))
    }
    try {
      // VIOLATION: the pre-namespace attempt appended its admitted subset
      // of THIS data under bare b0, crashed before the commit, and a
      // cron'd compaction folded the tail before the upgraded restart
      val first = Seq((1L, freshText), (5L, otherText)).toDF("doc_id", "text")
      val tailV = setupFolded("v", first)
      val (outcomeV, admittedV) = runStream("v", tailV)
      val err = outcomeV.swap.getOrElse(fail(
        "un-drained bare-id replay against a FOLDED copy must fail loudly"))
      assert(messages(err).exists(m =>
        m.contains("quiesced") && m.contains("pre-namespace") &&
          m.contains("compaction")),
        s"failure must carry the drain instruction and name the fold, " +
          s"got: ${messages(err)}")
      assert(admittedV.isEmpty, s"no admission may land: $admittedV")
      // the folded rows are untouched corpus — still probe-able
      val survivors = DedupIndexStore.probeBucketed(
        spark, Seq((9L, otherText + " extra")).toDF("doc_id", "text"),
        "doc_id", "text", "sidfold_v_idx", threshold = 0.2)
        .select("id_corpus").collect().map(_.getLong(0)).toSet
      assert(survivors == Set(5L),
        s"the folded rows must survive the abort: $survivors")
      // ESCAPE HATCH: the folded lineage is permanent (no compaction
      // retires it), so a verified legitimate reprocess opts the batch
      // number out with the documented marker file - the re-run must
      // then complete cleanly with ZERO admissions (the docs ARE corpus:
      // correct reprocess semantics, loss only in the true violation)
      assert(messages(err).exists(_.contains("guard_allow_b0")),
        s"the folded-copy abort must name the escape hatch: ${messages(err)}")
      new java.io.File(s"$tailV/_folded/guard_allow_b0").createNewFile()
      val (outcomeV2, admittedV2) = runStream("v", tailV)
      assert(outcomeV2.isRight,
        s"the allow marker must unblock the stream: $outcomeV2")
      assert(admittedV2.isEmpty,
        s"reprocess over folded corpus must admit nothing: $admittedV2")

      // FALSE-POSITIVE CONTROL: a foreign incarnation's committed bare b0
      // folded into the standing table with DIFFERENT doc ids — the
      // stream must run clean and treat the folded lineage as corpus
      // (doc 5 near-dups foreign doc 50 and drops; doc 1 admits)
      val tailF = setupFolded("f",
        Seq((50L, otherText + " legacy")).toDF("doc_id", "text"))
      val (outcomeF, admittedF) = runStream("f", tailF)
      assert(outcomeF.isRight,
        s"foreign folded bare-id lineage must not trip the guard: $outcomeF")
      assert(admittedF == Set((0L, 1L)),
        s"foreign folded lineage must dedup normally: $admittedF")
    } finally {
      Seq("v", "f").foreach(tag =>
        Seq("bands", "shingles", "meta").foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS sidfold_${tag}_idx_$t")))
    }
  }

  test("web-ingest composition: markup stream -> htmlText -> dedup admission") {
    // the production ingestion topology for a web corpus: documents
    // arrive as raw HTML, extraction runs INSIDE the streaming plan
    // (htmlText is a fold of codegen'd built-ins - nothing stateful, so
    // it streams), and admission dedups on the EXTRACTED text. Two
    // differently-marked-up copies of the same content (different tags,
    // entity spellings, whitespace) must collapse to one admission;
    // byte-level dedup on the raw markup could never see that.
    import graft.operators.TextOps
    val idx = java.nio.file.Files.createTempDirectory("graft_sid_web").toString
    DedupIndexStore.build(
      Seq((100L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 2, numHashes = 32, bands = 16)
    val in = MemoryStream[(Long, String)](spark)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sid_web_ckpt").toFile
    ckpt.deleteOnExit()
    import org.apache.spark.sql.functions.col
    val docs = in.toDF().toDF("doc_id", "markup")
      .select(col("doc_id"), TextOps.htmlText(col("markup")).as("text"))
    val q = StreamOps.streamingIngestDedup(
      docs, "doc_id", "text", idx, ckpt.getAbsolutePath,
      (df, bid) => admitted.synchronized {
        admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
      },
      threshold = 0.2)
    try {
      // doc 1 and doc 2 carry the SAME extracted content under different
      // markup; doc 3 is the corpus text wrapped in tags (index hit)
      in.addData(
        (1L, s"<html><body><p>$freshText</p></body></html>"),
        (2L, s"<DIV CLASS='wrap'>  $freshText  </DIV><!-- tracked -->"),
        (3L, s"<article><h1>copy</h1><p>$corpusText phi</p></article>"))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L)),
        s"batch 0: one admission for two markups of one text: ${admitted.toSet}")
      // batch 1: an entity-encoded near-dup of doc 1's content must drop
      // against the index (the admitted doc was indexed by its EXTRACTED
      // text); a genuinely new doc admits
      in.addData(
        (4L, s"<p>$freshText &amp; more</p>"),
        (5L, s"<p>$otherText</p>"))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L), (1L, 5L)),
        s"batch 1 admissions: ${admitted.toSet}")
    } finally q.stop()
  }

  test("streaming web ingest: a cross-batch cookie banner never reaches the index") {
    // VERDICT r15 item 6, the full composed topology: markup ->
    // htmlText (in-plan) -> stripBannedLines (per-batch, against the
    // maintained banned-line snapshot) -> dedup admission. The banner
    // arrives once per micro-batch, so within-batch frequency could
    // never flag it — only the BATCH-SIDE table (built from the
    // standing corpus, re-read per trigger) can.
    import graft.streaming.StreamOps
    val banner = Seq(
      "please accept our cookies to continue",
      "this website uses tracking technologies",
      "manage your consent preferences below",
      "copyright example media all rights reserved")
    def markup(lines: Seq[String]): String =
      lines.map(l => s"<p>$l</p>").mkString
    // the standing corpus carries the banner above the frequency cap
    val corpus = (0 until 12).map(i =>
      (100L + i, (banner :+ s"corpus page $i speaks about subject ${i * 7}")
        .mkString("\n"))).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_swi_idx").toString
    DedupIndexStore.build(corpus, "doc_id", "text", idx,
      k = 2, numHashes = 32, bands = 16)
    val bannedPath = java.nio.file.Files
      .createTempDirectory("graft_swi_banned").toString + "/lines"
    StreamOps.buildBannedLines(corpus, "doc_id", "text",
      maxDocFreq = 10, outPath = bannedPath)

    val in = MemoryStream[(Long, String)](spark)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_swi_ckpt").toFile
    ckpt.deleteOnExit()
    // threshold 0.9 is the DISCRIMINATING choice: if the banner leaked
    // into doc 1's indexed text, doc 2 (the clean content alone) would
    // overlap it at only ~0.5 Jaccard and be wrongly ADMITTED; with the
    // strip working, doc 2 matches exactly and drops
    val q = StreamOps.streamingWebIngest(
      in.toDF().toDF("doc_id", "markup"), "doc_id", "markup", idx,
      ckpt.getAbsolutePath, bannedPath,
      (df, bid) => admitted.synchronized {
        admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0)))
      },
      threshold = 0.9)
    try {
      // batch 0: banner + fresh content -> admitted, indexed WITHOUT
      // the banner lines
      in.addData((1L, markup(banner :+ freshText)))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L)),
        s"batch 0 admissions: ${admitted.toSet}")
      // batch 1: doc 2 is doc 1's clean content with NO banner — an
      // exact dup iff the index holds clean text; doc 3 is
      // boilerplate-only (drops before admission, never indexed);
      // doc 4 is the banner around genuinely new content (admits)
      in.addData(
        (2L, markup(Seq(freshText))),
        (3L, markup(banner)),
        (4L, markup(banner :+ otherText)))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set((0L, 1L), (1L, 4L)),
        s"batch 1 admissions: ${admitted.toSet}")
      // the batch side detects a NEW banner and refreshes the snapshot
      // (overwrite) — the running stream must pick it up on the next
      // trigger with NO restart (the per-trigger re-read claim)
      val banner2 = "subscribe to our newsletter for updates"
      val corpus2 = (0 until 12).map(i =>
        (200L + i, (banner :+ banner2 :+ s"later crawl page $i id ${i * 11}")
          .mkString("\n"))).toDF("doc_id", "text")
      StreamOps.buildBannedLines(corpus2, "doc_id", "text",
        maxDocFreq = 10, outPath = bannedPath)
      val freshText2 = "streams joined windows watermarked triggers " +
        "checkpointed offsets replayed sinks idempotent batches bounded " +
        "state stores compacted snapshots versioned"
      in.addData((5L, markup(Seq(banner2, freshText2))))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) ==
        Set((0L, 1L), (1L, 4L), (2L, 5L)),
        s"batch 2 admissions: ${admitted.toSet}")
      // doc 6 is doc 5's content WITHOUT banner2 — an exact dup iff
      // banner2 was stripped before doc 5 was indexed
      in.addData((6L, markup(Seq(freshText2))))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) ==
        Set((0L, 1L), (1L, 4L), (2L, 5L)),
        s"the refreshed ban must have kept banner2 out of the index: " +
          s"${admitted.toSet}")
    } finally q.stop()
  }

  test("banned-line snapshot never bans the empty line; blank separators survive") {
    // ADVICE r16: '' exceeds any frequency threshold in any corpus —
    // banning it would make stripBannedLines collapse paragraph
    // structure (every blank separator deleted) and drop
    // empty-extraction docs via the n_kept>0 admission filter. Blank
    // lines are structure, not boilerplate; the build must not see them.
    import graft.streaming.StreamOps
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val banner = "accept cookies now"
    val corpus = (0 until 12).map(i =>
      (i.toLong, s"$banner\n\npage body $i\n\nmore body $i"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_banned_empty").toString + "/banned"
    StreamOps.buildBannedLines(corpus, "doc_id", "text",
      maxDocFreq = 5, outPath = path)
    val hashes = spark.read.parquet(path)
      .collect().map(_.getString(0)).toSet
    assert(hashes.contains(md5hex(banner)), "the banner must be banned")
    assert(!hashes.contains(md5hex("")),
      "the empty line must never enter the banned table")
    val out = StreamOps.stripBannedLines(
      Seq((100L, s"$banner\nfirst para\n\nsecond para"))
        .toDF("doc_id", "text"),
      "doc_id", "text", path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(100L) == "first para\n\nsecond para",
      s"blank separator must survive the strip: '${out(100L)}'")
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
