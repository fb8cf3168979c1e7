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
