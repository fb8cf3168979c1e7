package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Packing.groupedCumSum must be BIT-IDENTICAL to the naive
  * `sum over (partition by group order by ...)` window it replaces —
  * the salting is an execution detail, never a semantics change. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame,
                    order: Seq[String]): Map[(String, Long), Long] = {
    val w = Window.partitionBy(col("g")).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col("t")).over(w))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("id")) -> r.getAs[Long]("cum"))
      .toMap
  }

  test("equivalent to the per-group window on skewed groups, any bucket count") {
    // 3 groups with very different sizes; ids deliberately non-contiguous
    val df = ((1L to 900L).map(i => ("en", i * 7 + 3, (i % 13) + 1)) ++
      (1L to 90L).map(i => ("es", i * 11, (i % 7) + 1)) ++
      Seq(("fr", 5L, 42L))).toDF("g", "id", "t")
    val expected = naive(df, Seq("id"))
    for (buckets <- Seq(1, 4, 64, 4096)) {
      val got = Packing.groupedCumSum(df, "g", Seq("id"), "t", "cum", buckets)
        .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("id")) -> r.getAs[Long]("cum"))
        .toMap
      assert(got == expected, s"mismatch at buckets=$buckets")
    }
  }

  test("secondary order columns break ties without splitting a leading value") {
    // several rows share the leading id (chunked docs): they must stay in
    // one bucket and order by the secondary column
    val df = (for (id <- 1L to 50L; c <- 0 to (id % 5).toInt)
      yield ("en", id, c, id + c)).toDF("g", "id", "c", "t")
    val w = Window.partitionBy(col("g")).orderBy(col("id"), col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("t")).over(w))
      .collect().map(r => (r.getLong(1), r.getInt(2)) -> r.getAs[Long]("cum")).toMap
    val got = Packing.groupedCumSum(df, "g", Seq("id", "c"), "t", "cum", buckets = 16)
      .collect().map(r => (r.getLong(1), r.getInt(2)) -> r.getAs[Long]("cum")).toMap
    assert(got == expected)
  }

  test("result is invariant under input partition layout") {
    val df = (1L to 500L).map(i => (if (i % 3 == 0) "a" else "b", i, i % 10)).toDF("g", "id", "t")
    val a = Packing.groupedCumSum(df, "g", Seq("id"), "t", "cum", 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("cum"))).sorted.toSeq
    val b = Packing.groupedCumSum(df.repartition(17), "g", Seq("id"), "t", "cum", 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("cum"))).sorted.toSeq
    assert(a == b)
  }

  test("degenerate inputs: empty frame and single row") {
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "id", "t")
    assert(Packing.groupedCumSum(empty, "g", Seq("id"), "t", "cum").count() == 0)
    val one = Seq(("en", 7L, 5L)).toDF("g", "id", "t")
    val row = Packing.groupedCumSum(one, "g", Seq("id"), "t", "cum").head()
    assert(row.getAs[Long]("cum") == 5L)
  }

  test("plan partitions the window by (group, bucket), never group alone") {
    val df = (1L to 100L).map(i => ("en", i, i)).toDF("g", "id", "t")
    val plan = Packing.groupedCumSum(df, "g", Seq("id"), "t", "cum")
      .queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.toSeq).map(_.name).toSet
      assert(keys == Set("g", "__pb"), s"window keys were $keys")
    }
  }

  test("offsets derive from the data plan, never a driver-built table") {
    // the pre-round-6 form collected (group × bucket) totals to the
    // driver and parallelized the offsets back — that table appeared in
    // the plan as a second, unrelated RDD leaf. The distributed form's
    // every leaf is the ONE checkpointed input; at per-doc group
    // cardinality nothing driver-sided remains to OOM.
    val df = (1L to 5000L).map(i => (s"g${i % 500}", i, i % 7)).toDF("g", "id", "t")
    val out = Packing.groupedCumSum(df, "g", Seq("id"), "t", "cum", 64)
    val leaves = out.queryExecution.analyzed.collectLeaves()
    val rddIds = leaves.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(rddIds.size == leaves.size,
      s"unexpected non-checkpoint leaf among:\n${leaves.mkString("\n")}")
    assert(rddIds.distinct.size == 1,
      s"offsets must derive from the checkpointed input; saw RDD ids $rddIds")
    // and 500 groups still reproduce the window semantics bit-for-bit
    val expected = naive(df, Seq("id"))
    val got = out.collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("id")) -> r.getAs[Long]("cum")).toMap
    assert(got == expected)
  }

  test("DISK_ONLY materialization is bit-identical to the in-memory path") {
    // the 100 TB knob: inputs too big for executor RAM stream the
    // multi-pass materialization from local disk; the cache level is an
    // execution detail and must never change a single sum
    import org.apache.spark.storage.StorageLevel
    val df = (1L to 3000L).map(i => (s"g${i % 7}", i * 3 + 1, i % 11)).toDF("g", "id", "t")
    val mem = Packing.groupedCumSum(df, "g", Seq("id"), "t", "cum", 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("cum"))).sorted.toSeq
    val disk = Packing.groupedCumSum(df, "g", Seq("id"), "t", "cum", 64,
        storage = Some(StorageLevel.DISK_ONLY))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("cum"))).sorted.toSeq
    assert(disk == mem)
  }

  test("budgetTake: greedy quality-descending prefix per group, overshoot ≤ 1 doc") {
    import spark.implicits._
    // en: quality 0.9 (3 tok), 0.8 (4 tok), 0.7 (5 tok), 0.1 (100 tok)
    // budget 8 → keep 0.9 (cum-before 0), 0.8 (cum-before 3), 0.7
    // (cum-before 7 < 8 — overshoot row), drop 0.1 (cum-before 12)
    val df = Seq(
      ("en", 1L, 0.9, 3L), ("en", 2L, 0.8, 4L),
      ("en", 3L, 0.7, 5L), ("en", 4L, 0.1, 100L),
      ("fr", 5L, 0.5, 2L) // under budget: everything kept
    ).toDF("lang", "doc_id", "quality", "n_tok")
    val kept = Packing.budgetTake(df, "lang", "quality", "doc_id", "n_tok", 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 5L))
    assert(Packing.budgetTake(df, "lang", "quality", "doc_id", "n_tok", 8L)
      .columns.toSeq == Seq("lang", "doc_id", "quality", "n_tok"),
      "helper columns must not leak")
    // equal qualities: tie column decides, deterministically
    val ties = Seq(("en", 1L, 0.5, 4L), ("en", 2L, 0.5, 4L), ("en", 3L, 0.5, 4L))
      .toDF("lang", "doc_id", "quality", "n_tok")
    val keptTies = Packing.budgetTake(ties, "lang", "quality", "doc_id", "n_tok", 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptTies == Set(1L, 2L), s"lowest tie ids win: $keptTies")
  }

  test("groupedRunningMax: bit-identical to the exclusive window max, any bucket count") {
    // skewed groups, duplicate leading keys, descending secondary via
    // negation — the q171 skyline shape
    val df = ((1L to 400L).map(i => ("a", i % 37, -(i % 11), i, i % 11)) ++
      (1L to 40L).map(i => ("b", i % 5, -(i % 3), i + 1000, i % 3)) ++
      Seq(("c", 0L, 0L, 9999L, 7L))).toDF("g", "nc", "neg", "id", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("nc"), col("neg"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.withColumn("bp", max(col("v")).over(w))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("bp"))).toMap
    for (buckets <- Seq(1, 7, 64)) {
      val got = Packing.groupedRunningMax(df, "g", Seq("nc", "neg", "id"), "v", "bp", buckets)
        .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("bp"))).toMap
      assert(got == expected, s"mismatch at buckets=$buckets")
    }
    // first row of each group carries null, like the window form
    val firsts = Packing.groupedRunningMax(df, "g", Seq("nc", "neg", "id"), "v", "bp", 16)
      .filter(col("bp").isNull).count()
    assert(firsts == 3L)
    // layout-invariant
    val scrambled = Packing
      .groupedRunningMax(df.repartition(17), "g", Seq("nc", "neg", "id"), "v", "bp", 16)
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("bp"))).toMap
    assert(scrambled == expected)
  }

  test("two-phase operators reject a non-numeric leading order column loudly") {
    // a string leading order would CAST to NULL under non-ANSI semantics,
    // bucket to NULL, and the offset join would silently drop the rows —
    // both operators must refuse at plan time instead
    val df = Seq(("a", "x", 1L)).toDF("g", "ord", "t")
    intercept[IllegalArgumentException] {
      Packing.groupedCumSum(df, "g", Seq("ord"), "t", "cum")
    }
    intercept[IllegalArgumentException] {
      Packing.groupedRunningMax(df, "g", Seq("ord"), "t", "rm")
    }
  }
}
