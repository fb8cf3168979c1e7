package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The q40/q59/q81 oracles replay index TRAINING in DuckDB, which is only
  * sound if training is invariant to everything Spark is free to vary —
  * partitioning, partition order, row order. These tests pin that claim:
  * the smallest-id exemplar init is order-free by construction, the
  * cosine argmax ties break deterministically, and the ExactAgg decimal
  * means are order-invariant, so the trained matrices must be
  * bit-identical under any physical layout. A plain `avg` regression here
  * (partition-order-dependent float sums) fails this suite before it
  * flakes the correctness gate.
  */
class AnnDeterminismSpec extends SparkSpec {

  private def embeddings = graft.util.SparkUtil.table(spark, sf(), "embeddings")

  test("trainIvfCentroids is bit-identical under repartitioning and row order") {
    val e = embeddings
    val a = Similarity.trainIvfCentroids(e.repartition(7), "vec_id", "embedding", nlist = 16)
    val b = Similarity.trainIvfCentroids(
      e.orderBy(col("vec_id").desc).repartition(3), "vec_id", "embedding", nlist = 16)
    assert(a.length == b.length)
    a.zip(b).zipWithIndex.foreach { case ((ca, cb), i) =>
      assert(ca.sameElements(cb), s"centroid $i diverged under re-layout")
    }
  }

  test("trainPq codebooks are bit-identical under repartitioning") {
    val e = embeddings
    val a = Similarity.trainPq(e.repartition(5), "vec_id", "embedding", m = 16, k = 16)
    val b = Similarity.trainPq(
      e.orderBy(col("vec_id").desc).repartition(2), "vec_id", "embedding", m = 16, k = 16)
    assert(a.length == b.length)
    for (s <- a.indices; c <- a(s).indices)
      assert(a(s)(c).sameElements(b(s)(c)), s"subspace $s centroid $c diverged")
  }

  test("repeated training from the same layout is a fixed point") {
    val e = embeddings
    val a = Similarity.trainIvfCentroids(e, "vec_id", "embedding", nlist = 16)
    val b = Similarity.trainIvfCentroids(e, "vec_id", "embedding", nlist = 16)
    a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
  }
}
