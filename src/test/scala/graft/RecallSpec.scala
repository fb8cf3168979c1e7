package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Dedup, Similarity, TextOps}
import graft.util.SparkUtil

/** Quantified recall for the three LSH-approximate driver queries
  * (q27 minhash pairs, q31 ANN top-k, q32 embedding near-dups), measured
  * against exhaustively computed exact ground truth on the sf0.001
  * tables, with the exact parameters the driver queries use.
  *
  * Soundness (output ⊆ truth) is asserted exactly: every emitted pair
  * survives an exact-metric filter, so nothing outside the ground-truth
  * set may appear. Recall bounds sit just under the measured values —
  * hyperplanes/hashes are derived deterministically, so these are stable
  * measurements, not flaky statistical tests. */
class RecallSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q27 minhash pairs: exact containment and full recall vs brute-force Jaccard") {
    val docs = SparkUtil.table(spark, sf(), "documents")
    val sh = docs.select(col("doc_id"),
      GraftFunctions.shingle_hashes(TextOps.tokens(col("text")), 2).as("sh"))
    val truth = pairSet(
      sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        .crossJoin(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          GraftFunctions.jaccard_sorted(col("sh_a"), col("sh_b")).as("j"))
        .filter(col("j") >= 0.2)
        .select("id_a", "id_b"))
    val got = pairSet(
      Dedup.minhashPairs(docs, "doc_id", "text",
        k = 2, numHashes = 32, bands = 16, threshold = 0.2) // q27's parameters
        .select("id_a", "id_b"))
    assert((got diff truth).isEmpty, "minhash pairs outside exact ground truth")
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"q27 recall $recall (measured 1.0)") // 16 bands × 2 rows at j≥0.2
  }

  test("q31 ANN LSH top-k: sound scores and recall vs brute-force top-k") {
    val e = SparkUtil.table(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val brute = pairSet(
      Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id"))
    val lshDf = Similarity.lshTopK(
      e, "vec_id", "embedding", q, "vec_id", "embedding", 10, planes = 6) // q31's parameters
    // soundness: every returned score is the true cosine of that pair
    val exact = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .select(col("query_id"), col("neighbor_id"),
        GraftFunctions.cosine_similarity(col("cv"), col("qv")).as("true_cosine"))
    val mismatches = lshDf.join(exact, Seq("query_id", "neighbor_id"))
      .filter(col("cosine") =!= col("true_cosine")).count()
    assert(mismatches == 0, "LSH returned a score differing from the exact cosine")
    val lsh = pairSet(lshDf.select("query_id", "neighbor_id"))
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"q31 recall@10 $recall (measured 0.58 at radius-2 multi-probe)")
  }

  test("q40 ANN IVF: recall at nprobe=4, exact brute-force equivalence at nprobe=nlist") {
    val e = SparkUtil.table(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val ivf4 = pairSet(
      Similarity.ivfTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
        nlist = 16, nprobe = 4) // q40's parameters
        .select("query_id", "neighbor_id"))
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (bruteIds intersect ivf4).size.toDouble / bruteIds.size
    assert(recall >= 0.5, s"q40 recall@10 $recall (measured 0.58 at nprobe=4/16)")
    // probing every cell searches the whole corpus: IVF must then equal
    // brute force exactly — same neighbors, same cosines, same ranks
    val ivfAll = Similarity.ivfTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(ivfAll == brute, "IVF at nprobe=nlist diverged from brute force")
  }

  test("q81 ANN IVF-PQ: rerank recall floor; full-probe+deep-rerank recovers brute force") {
    val e = SparkUtil.table(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val ivfpq = pairSet(
      Similarity.ivfPqTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
        nlist = 16, nprobe = 8, m = 16, rerank = 50) // q81's parameters
        .select("query_id", "neighbor_id"))
    val recall = (bruteIds intersect ivfpq).size.toDouble / bruteIds.size
    assert(recall >= 0.5, s"q81 recall@10 $recall")
    // probing every cell + reranking a corpus-deep shortlist = exact
    // brute force, bit for bit (rerank scores are plain float cosine)
    val n = e.count().toInt
    val full = Similarity.ivfPqTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 16, m = 16, rerank = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(full == brute, "IVF-PQ at full probe + corpus-deep rerank diverged from brute force")
    // m ≠ codebook with NO rerank: pure ADC scores must still rank sanely
    // (regression: pq_score's stride arg is k-per-subspace, not m — the
    // two coincide at m=16/k=16, so only this shape can catch a mix-up)
    val adc = pairSet(
      Similarity.ivfPqTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
        nlist = 16, nprobe = 16, m = 8, codebook = 16, rerank = 0)
        .select("query_id", "neighbor_id"))
    val adcRecall = (bruteIds intersect adc).size.toDouble / bruteIds.size
    assert(adcRecall >= 0.3, s"m!=k ADC recall collapsed to $adcRecall — codebook stride bug")
  }

  test("q32 embedding near-dups: exact containment and recall vs brute-force cosine") {
    val e = SparkUtil.table(spark, sf(), "embeddings")
    val truth = pairSet(
      e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
        .crossJoin(e.select(col("vec_id").as("id_b"), col("embedding").as("v_b")))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          GraftFunctions.cosine_similarity(col("v_a"), col("v_b")).as("c"))
        .filter(col("c") >= 0.4)
        .select("id_a", "id_b"))
    val got = pairSet(
      Dedup.embeddingNearDups(e, "vec_id", "embedding",
        planes = 4, threshold = 0.4, tables = 3) // q32's parameters
        .select("id_a", "id_b"))
    assert((got diff truth).isEmpty, "near-dup pairs outside exact ground truth")
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.45, s"q32 recall $recall (measured 0.50 with 3-table OR-amplification)")
    // OR-amplification must not duplicate pairs
    val rows = Dedup.embeddingNearDups(e, "vec_id", "embedding",
      planes = 4, threshold = 0.4, tables = 3).count()
    assert(rows == got.size, "duplicate pairs emitted across LSH tables")
  }
}
