package graft

import org.apache.spark.sql.SparkSession

/** Spot-timer for individual registry queries in the SAME forked-JVM
  * configuration the full [[Bench]] uses (48g heap, local[cpus]) —
  * `sbt console` timings are useless for this (they run inside sbt's
  * 4g JVM and spill). Usage:
  *   sbt "runMain graft.MicroBench <sfDir> <substr[,substr...]> [reps]"
  * Prints one `MICRO <name> repN <sec>` line per rep.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val filters = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filters.exists(n.contains))
    for (name <- names; rep <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"MICRO $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
