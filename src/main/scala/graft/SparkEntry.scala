package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TickOps
import graft.queries._
import graft.util.SparkUtil

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full moving-stats pipeline (parse-shape input → six
    * sliding windows in one shuffle → per-window stats) on sf0.001.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val ticks = SparkUtil.events(spark, "/root/testdata/sf0.001").selectExpr(
      "event_type AS symbol", "value AS price", "ts AS event_time")
    TickOps.slidingStatsMulti(ticks, TickOps.defaultWindows)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++
      TimeSeriesQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ RelationalQueries.oracles ++
      TextQueries.oracles ++ SimilarityQueries.oracles ++
      TimeSeriesQueries.oracles
}
