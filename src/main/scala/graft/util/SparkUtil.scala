package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table helpers shared by queries, Verify, Bench and tests. */
object SparkUtil {

  /** Confs every session needs, safe to set at runtime.
    *
    * `events.parquet` carries TIMESTAMP(NANOS) which Spark refuses by
    * default; `nanosAsLong` reads it as a Long of epoch-nanos, which we
    * convert explicitly (see [[events]]). Keeping the raw long is also the
    * cheapest representation for bucket arithmetic at scale — integer math
    * instead of timestamp math in the hot path.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The `events` table with both the raw epoch-nano long (`ts_ns`) and a
    * proper TimestampType column (`ts`, microsecond precision) so callers
    * can pick integer bucket math or Spark's `window()` as appropriate.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

  def newLocalSession(appName: String, cores: String): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
  }
}
