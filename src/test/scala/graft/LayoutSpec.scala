package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, HashKernels}

/** Z-order (Morton) layout key: bit-interleave correctness and the
  * locality property that makes it a data-layout tool — chunks of the
  * z-sorted order have small bounding boxes in BOTH dimensions, so
  * row-group min/max stats prune 2-D predicates. */
class LayoutSpec extends SparkSpec {

  test("zorder2 interleaves bits: known values") {
    assert(HashKernels.zorder2(0L, 0L, 8) === 0L)
    assert(HashKernels.zorder2(1L, 0L, 8) === 1L)
    assert(HashKernels.zorder2(0L, 1L, 8) === 2L)
    assert(HashKernels.zorder2(1L, 1L, 8) === 3L)
    assert(HashKernels.zorder2(3L, 3L, 8) === 15L)
    assert(HashKernels.zorder2(0L, 2L, 8) === 8L)
    // bitsPer caps the contribution of each coordinate
    assert(HashKernels.zorder2(0xffffL, 0L, 4) === 0x55L)
  }

  test("z-sorted chunks stay local in both dimensions; row-major does not") {
    import spark.implicits._
    // 64×64 grid; 64-row chunks of the sorted order. Z-order chunks span
    // at most two aligned 8×8 blocks (max side ≤ 16); row-major chunks
    // span a full 64-wide row.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val chunks = grid
      .withColumn("zk", GraftFunctions.zorder_key(col("x"), col("y"), 6))
      .withColumn("chunk", floor((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("zk"), col("x"), col("y")))
        - 1) / 64))
      .groupBy("chunk")
      .agg((max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"))
      .collect()
    assert(chunks.length === 64)
    val maxSide = chunks.map(r => math.max(r.getLong(1), r.getLong(2))).max
    assert(maxSide <= 16, s"z-order chunk bounding box side $maxSide exceeds 16")
    // row-major comparison: every chunk spans the full second dimension
    val rowMajorSide = grid
      .withColumn("chunk", floor((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("x"), col("y"))) - 1) / 64))
      .groupBy("chunk")
      .agg((max(col("y")) - min(col("y"))).as("dy"))
      .collect().map(_.getLong(1)).max
    assert(rowMajorSide === 63L)
  }
}
