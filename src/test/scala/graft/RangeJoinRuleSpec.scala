package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The theta-range-join optimizer rule: eligible inequality-only joins
  * must be rewritten to the bucketed equi-join (no BroadcastNestedLoop in
  * the physical plan), with results identical to the naive join; guarded
  * cases must be left alone. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    GraftExtensions.register(spark)
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.RangeJoinBucketRewrite)
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // negative and positive times: exercises the pmod floor-division path
  private def left = Seq((1L, -25L), (2L, 0L), (3L, 40L), (4L, 1000L))
    .toDF("lid", "lt")
  private def right = Seq((10L, -30L), (11L, -10L), (12L, 5L), (13L, 45L), (14L, 2000L))
    .toDF("rid", "rt")

  private def naive: Set[(Long, Long)] = (for {
    (lid, lt) <- Seq((1L, -25L), (2L, 0L), (3L, 40L), (4L, 1000L))
    (rid, rt) <- Seq((10L, -30L), (11L, -10L), (12L, 5L), (13L, 45L), (14L, 2000L))
    if rt >= lt - 10 && rt <= lt + 10
  } yield (lid, rid)).toSet

  test("theta range join is rewritten: no nested-loop join, identical rows") {
    val cond = col("rt") >= col("lt") - 10 && col("rt") <= col("lt") + 10
    val plain = left.join(right, cond).select("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain == naive) // baseline sanity without the rule
    withRule {
      val df = left.join(right, cond)
      val got = df.select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, "rewrite changed the result")
      val p = physical(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop survived:\n$p")
      assert(p.contains("Generate"), s"no bucket replication in plan:\n$p")
    }
  }

  test("join with an equi conjunct is left untouched") {
    withRule {
      val df = left.withColumn("k", col("lid") % 2)
        .join(right.withColumn("k", col("rid") % 2),
          Seq("k")).filter(col("rt") >= col("lt") - 10 && col("rt") <= col("lt") + 10)
      assert(!df.queryExecution.optimizedPlan.toString.contains("__range_lb"))
      // BETWEEN pushed into the join condition next to an equi key
      val df2 = left.join(right,
        col("lid") === col("rid") - 9 &&
          col("rt") >= col("lt") - 10 && col("rt") <= col("lt") + 10)
      assert(!df2.queryExecution.optimizedPlan.toString.contains("__range_lb"))
      assert(df2.count() >= 0)
    }
  }

  test("non-long time columns are not rewritten (type guard)") {
    withRule {
      val li = Seq((1, 5)).toDF("lid", "lt")
      val ri = Seq((2, 8)).toDF("rid", "rt")
      val df = li.join(ri, col("rt") >= col("lt") - 10 && col("rt") <= col("lt") + 10)
      assert(!df.queryExecution.optimizedPlan.toString.contains("__range_lb"))
      assert(df.count() == 1)
    }
  }

  test("asymmetric bounds and flipped operand order still rewrite correctly") {
    withRule {
      // lt - 5 <= rt (flipped) and rt <= lt + 20: width 25
      val cond = (col("lt") - 5) <= col("rt") && col("rt") <= col("lt") + 20
      val df = left.join(right, cond)
      val got = df.select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (lid, lt) <- Seq((1L, -25L), (2L, 0L), (3L, 40L), (4L, 1000L))
        (rid, rt) <- Seq((10L, -30L), (11L, -10L), (12L, 5L), (13L, 45L), (14L, 2000L))
        if rt >= lt - 5 && rt <= lt + 20
      } yield (lid, rid)).toSet
      assert(got == want)
      assert(df.queryExecution.optimizedPlan.toString.contains("__range_lb"))
    }
  }
}
