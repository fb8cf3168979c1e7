package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.util.SparkUtil

/** Pins [[SparkUtil.fanOutForCpu]]'s two contracts (round 12):
  *
  *  1. SMALL-SCAN regime: the result is fanned to the session's core
  *     count AND is an optimizer barrier. The barrier is load-bearing —
  *     a bare repartition is transparent to predicate pushdown, so a
  *     filter on a computed column (q55's keep-gate) was alias-
  *     substituted and pushed below the exchange onto the 1-split scan,
  *     re-serializing the exact kernels the fan-out exists to
  *     parallelize (one task carried ~70% of q55@10× wall time).
  *  2. ADEQUATE-SCAN regime: the input is returned UNCHANGED (same
  *     reference), keeping full scan pushdown — the optimal shape when
  *     splits already cover the cores.
  */
class FanOutSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(files: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fanout").toString
    val df = (0L until 256L).map(i => (i, s"alpha beta gamma doc $i text body"))
      .toDF("doc_id", "text")
    val w = if (files == 1) df.coalesce(1) else df.repartition(files)
    w.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    dir
  }

  test("1-split scan: fanned to core count, and an optimizer barrier") {
    val dir = writeDocs(1)
    val docs = spark.read.parquet(s"$dir/docs.parquet")
    val cores = spark.sparkContext.defaultParallelism
    assert(docs.rdd.getNumPartitions < cores,
      "precondition: the test file must under-split the session's cores")

    val fanned = SparkUtil.fanOutForCpu(docs, "doc_id")
    assert(fanned.rdd.getNumPartitions == cores,
      s"fanned partitions: ${fanned.rdd.getNumPartitions} != $cores")

    // the q55 shape: filter on a COLUMN COMPUTED FROM text. Without the
    // barrier, pushdown inlines the expression below the exchange onto
    // the single-split scan; with it, the plan's leaf is the checkpoint
    // RDD and no parquet scan (hence no pushed predicate) exists at all.
    val gated = fanned
      .withColumn("qual", graft.operators.TextOps.qualityScore(col("text")))
      .filter(col("qual") >= 0.0)
    assert(gated.count() == 256, "barrier must not change results")
    val scans = gated.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      "small-scan fan-out must be a barrier: a parquet scan in the plan " +
        "means predicates can push below the fan-out exchange again:\n" +
        gated.queryExecution.executedPlan)

    // content identical to the un-fanned read
    val a = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = fanned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("adequate splits: input returned unchanged, pushdown preserved") {
    val cores = spark.sparkContext.defaultParallelism
    val dir = writeDocs(cores * 2)
    val docs = spark.read.parquet(s"$dir/docs.parquet")
    assert(docs.rdd.getNumPartitions >= cores,
      "precondition: enough files to cover the cores")
    val fanned = SparkUtil.fanOutForCpu(docs, "doc_id")
    assert(fanned eq docs,
      "adequate-split inputs must pass through untouched (scan pushdown " +
        "is the optimal shape there)")
    // and the parquet scan (with its pushdown machinery) is still the leaf
    val scans = fanned.filter(col("doc_id") > 10)
      .queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
  }
}
