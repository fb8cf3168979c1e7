package graft

import org.apache.spark.sql.functions._

import graft.util.SparkUtil.table

/** Approximate-sketch accuracy: HLL distinct counts and approximate
  * percentiles must land within their configured error of the exact
  * answers. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val o = table(spark, sf("sf0.01"), "orders")
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("e"))
    val approx = o.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"))
    exact.join(approx, "o_orderpriority").collect().foreach { r =>
      val (e, a) = (r.getAs[Long]("e"), r.getAs[Long]("a"))
      assert(math.abs(a - e).toDouble / e < 0.05, s"$e vs $a")
    }
  }

  test("approx_percentile close to exact percentile") {
    val li = table(spark, sf("sf0.01"), "lineitem")
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("e"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a"))
      .collect().head
    assert(math.abs(r.getDouble(1) - r.getDouble(0)) / r.getDouble(0) < 0.05)
  }
}
