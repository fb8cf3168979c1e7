package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registry queries to files — the
  * before/after plan evidence the optimization rounds commit under
  * the plans/ directory. Runs in the same session configuration as [[graft.Bench]]
  * so the captured plans are the benched plans.
  *
  * Usage:
  *   sbt "runMain graft.tools.PlanDump <sfDir> <substr[,substr...]> <outDir> [suffix]"
  * writes `<outDir>/<query>_<suffix>.txt` (suffix defaults to "plan").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val filters = args(1).split(',').toSeq
    val outDir = args(2)
    val suffix = if (args.length > 3) args(3) else "plan"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filters.exists(n.contains))
    names.foreach { name =>
      // queryExecution.explainString on the DataFrame the registry returns:
      // plans are captured pre-execution (AdaptiveSparkPlan isFinalPlan=false),
      // which is the comparable artifact — the driver can't run Spark either.
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"PLAN $name -> $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
