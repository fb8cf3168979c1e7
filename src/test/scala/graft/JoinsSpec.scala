package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: result equals plain join under heavy key skew") {
    // 10k rows of one hot key + scattered others
    val left = (Seq.fill(10000)(1L) ++ (2L to 100L)).toDF("k")
      .withColumn("lv", monotonically_increasing_id())
    val right = (1L to 100L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).groupBy("k").count()
    val salted = Joins.saltedJoin(left, right, "k").groupBy("k").count()
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
    // the hot key's rows spread across multiple salt partitions pre-join
    val spread = left.withColumn("_salt", (rand(seed = 42) * 16).cast("int"))
      .filter(col("k") === 1).select("_salt").distinct().count()
    assert(spread > 4)
  }

  test("bucketized join plans without a shuffle exchange") {
    val o = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "ov")
    val l = (1L to 3000L).map(i => (i % 1000 + 1, i)).toDF("k", "lv")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge plan (tiny test tables would broadcast) so the
      // co-located-bucket property is what's actually exercised
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Joins.bucketize(spark, o, "bkt_orders", "k", 8)
      Joins.bucketize(spark, l, "bkt_lines", "k", 8)
      val joined = spark.table("bkt_orders").join(spark.table("bkt_lines"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 3000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lines")
    }
  }
}
