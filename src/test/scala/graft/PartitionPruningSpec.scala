package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source-layout behavior that matters at 100 TB: date-partitioned
  * parquet must be partition-pruned (only matching directories read) and
  * predicates must reach the scan. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write + partition-pruned read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val ev = graft.util.SparkUtil.events(spark, sf("sf0.001"))
      .withColumn("event_date", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val pruned = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-15")
      .select(col("event_id"), col("value"))

    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter present, and only one partition directory scanned
    assert(plan.contains("PartitionFilters"), plan)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
      }.get
    assert(scanned.size == 1, s"expected 1 pruned partition, got ${scanned.size}")

    val expect = graft.util.SparkUtil.events(spark, sf("sf0.001"))
      .filter(to_date(col("ts")) === "2024-01-15").count()
    assert(pruned.count() == expect && expect > 0)
  }
}
