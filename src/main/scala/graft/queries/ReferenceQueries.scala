package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg._
import graft.operators.TickOps
import graft.operators.TickOps.WindowConfig
import graft.util.SparkUtil

/** Batch analogs of the reference's streaming pipeline, run over the
  * `events` table (`ts` → event_time, `event_type` → symbol, `value` →
  * price) so the DuckDB oracle can verify the *same* [[TickOps]] code the
  * streaming jobs execute.
  *
  * All float outputs flow through [[graft.functions.ExactAgg]] so results
  * hash-match the oracle bit-for-bit; time keys are emitted as epoch-milli
  * longs (`*_ms`) to sidestep timestamp serialization differences.
  */
object ReferenceQueries {

  /** events table presented in the tick schema. */
  private def ticks(s: SparkSession, dir: String): DataFrame =
    SparkUtil.events(s, dir).select(
      col("event_type").as("symbol"),
      col("value").as("price"),
      col("ts").as("event_time"))

  private val w30 = WindowConfig("30s", "30 seconds")
  private val w1m = WindowConfig("1m", "1 minute")
  private val t10 = WindowConfig("10s", "10 seconds", "10 seconds")
  private val t30 = WindowConfig("30s", "30 seconds", "30 seconds")

  private def flatOut(df: DataFrame): DataFrame =
    df.select(
      unix_millis(col("window_timestamp")).as("window_end_ms"),
      col("symbol"),
      col("window").as("win"),
      col("avg_price"),
      col("std_price"))

  /** Oracle SQL for one sliding-window stats config: explode each event
    * into the k = dur/slide window instances containing it, then aggregate.
    * Window end = (bucket - k) * slide + dur, epoch-ns integer math. */
  private def slidingSql(cfg: WindowConfig): String = {
    val slide = cfg.slideMs
    val k = (cfg.durationMs / cfg.slideMs).toInt
    s"""SELECT window_end_ms, symbol, win,
       |       COALESCE(${sqlAvg("price")}, 0.0) AS avg_price,
       |       ${sqlStddev0("price")} AS std_price
       |FROM (
       |  SELECT (epoch_ns(ts) // ${slide * 1000000L} - k) * ${slide}
       |           + ${cfg.durationMs} AS window_end_ms,
       |         event_type AS symbol, '${cfg.name}' AS win, value AS price
       |  FROM events CROSS JOIN (SELECT unnest(range(0, $k)) AS k) ks
       |) GROUP BY window_end_ms, symbol, win""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A2/T2/T3/P8/P10/P11: one sliding-window stats branch.
    "q01_sliding_stats" -> ((s, dir) =>
      flatOut(TickOps.slidingStats(ticks(s, dir), w30, exact = true))),

    // U1: the reference's union-of-branches topology (30s + 1m).
    "q02_moving_stats_union" -> ((s, dir) =>
      flatOut(TickOps.movingStatsUnion(ticks(s, dir), Seq(w30, w1m), exact = true))),

    // Scale path: all six windows in ONE shuffle, rolled up per (win,
    // symbol) so the result stays small while the full explode runs.
    "q03_moving_stats_all" -> ((s, dir) => {
      // Rollup metrics are count/min/max only: min/max of bit-identical
      // doubles are order-independent, while a decimal-cast SUM of
      // *derived* doubles (avg_price) hits HALF_UP-vs-HALF_EVEN rounding
      // ties between engines (observed at sf0.1) — derived doubles are
      // never decimal-cast in oracle-checked outputs.
      // two-phase decimal rollup: bit-identical to slidingStatsMulti
      // (exact = true) — decimal partials merge losslessly — while the
      // 360-offset fan-out runs over bucket partials, not raw ticks
      val flat = TickOps.slidingStatsMultiTwoPhaseExact(ticks(s, dir), TickOps.defaultWindows)
      flat.groupBy(col("window").as("win"), col("symbol"))
        .agg(
          count(lit(1)).as("n_windows"),
          min(col("avg_price")).as("min_avg"),
          max(col("avg_price")).as("max_avg"),
          min(col("std_price")).as("min_std"),
          max(col("std_price")).as("max_std"))
    }),

    // A3 + G1 roundtrip: nest into Array[Struct], explode back; equals q01.
    "q04_nest_roundtrip" -> ((s, dir) =>
      flatOut(TickOps.explodeWindows(TickOps.nestWindows(
        TickOps.slidingStats(ticks(s, dir), w30, exact = true))))),

    // J1 + P9/P12: join each event to its 10 s bucket stats, z-score it.
    "q05_zscore" -> ((s, dir) => {
      val t = ticks(s, dir)
      val stats = TickOps.slidingStats(t, t10, exact = true)
      val keyed = t.withColumn(
        "event_time",
        timestamp_millis(expr("(unix_millis(event_time) div 10000L) * 10000L + 10000L")))
      TickOps.zscore(TickOps.joinTicksToStats(keyed, stats))
        .select(
          unix_millis(col("event_time")).as("window_end_ms"),
          col("symbol"),
          col("window").as("win"),
          col("price"),
          col("avg_price"),
          col("std_price"),
          col("zscore_price"))
    }),

    // A4 + G1 roundtrip over two tumbling grains.
    "q06_zscore_nest_roundtrip" -> ((s, dir) => {
      val t = ticks(s, dir)
      val flatZ = TickOps.unionAll(Seq(t10, t30).map { cfg =>
        val stats = TickOps.slidingStats(t, cfg, exact = true)
        val d = cfg.durationMs
        val keyed = t.withColumn(
          "event_time",
          timestamp_millis(expr(s"(unix_millis(event_time) div ${d}L) * ${d}L + ${d}L")))
        TickOps.zscore(TickOps.joinTicksToStats(keyed, stats))
      })
      val nested = TickOps.nestZScores(flatZ)
      nested
        .select(to_timestamp(col("timestamp")).as("tts"), col("symbol"), explode(col("zscores")).as("z"))
        .select(
          unix_millis(col("tts")).as("window_end_ms"),
          col("symbol"),
          col("z.window").as("win"),
          col("z.zscore_price").as("zscore_price"))
    }),

    // P1/P3/P5/F1: JSON encode → decode roundtrip with malformed rows
    // injected; parse failures must be dropped silently.
    "q07_parse_ticks" -> ((s, dir) => {
      val json = ticks(s, dir).select(
        to_json(struct(
          col("symbol"),
          col("price"),
          date_format(col("event_time"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("event_time"),
          lit(42).as("data_age_ms"))).as("value"))
      val withJunk = json.union(s.range(5).select(concat(lit("{not json "), col("id")).as("value")))
      TickOps.parseTicks(withJunk)
        .select(col("symbol"), col("price"), unix_millis(col("event_time")).as("event_ms"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_sliding_stats" -> slidingSql(w30),

    "q02_moving_stats_union" ->
      Seq(w30, w1m).map(slidingSql).map(q => s"($q)").mkString("\nUNION ALL\n"),

    "q03_moving_stats_all" -> {
      val inner = TickOps.defaultWindows.map(slidingSql).map(q => s"($q)").mkString("\nUNION ALL\n")
      s"""SELECT win, symbol, COUNT(1) AS n_windows,
         |       MIN(avg_price) AS min_avg, MAX(avg_price) AS max_avg,
         |       MIN(std_price) AS min_std, MAX(std_price) AS max_std
         |FROM ($inner) GROUP BY win, symbol""".stripMargin
    },

    "q04_nest_roundtrip" -> slidingSql(w30),

    "q05_zscore" -> {
      s"""WITH stats AS (
         |  SELECT (epoch_ns(ts) // 10000000000) * 10000 + 10000 AS window_end_ms,
         |         event_type AS symbol,
         |         COALESCE(${sqlAvg("value")}, 0.0) AS avg_price,
         |         ${sqlStddev0("value")} AS std_price
         |  FROM events GROUP BY window_end_ms, symbol)
         |SELECT s.window_end_ms, s.symbol, '10s' AS win, e.value AS price,
         |       s.avg_price, s.std_price,
         |       CASE WHEN s.std_price = 0.0 OR s.std_price IS NULL OR isnan(s.std_price)
         |            THEN 0.0 ELSE (e.value - s.avg_price) / s.std_price END AS zscore_price
         |FROM events e JOIN stats s
         |  ON (epoch_ns(e.ts) // 10000000000) * 10000 + 10000 = s.window_end_ms
         | AND e.event_type = s.symbol""".stripMargin
    },

    "q06_zscore_nest_roundtrip" -> Seq(t10, t30).map { cfg =>
      val d = cfg.durationMs
      val dns = d * 1000000L
      s"""(WITH stats AS (
         |  SELECT (epoch_ns(ts) // $dns) * $d + $d AS window_end_ms,
         |         event_type AS symbol,
         |         COALESCE(${sqlAvg("value")}, 0.0) AS avg_price,
         |         ${sqlStddev0("value")} AS std_price
         |  FROM events GROUP BY window_end_ms, symbol)
         |SELECT s.window_end_ms, s.symbol, '${cfg.name}' AS win,
         |       CASE WHEN s.std_price = 0.0 OR s.std_price IS NULL OR isnan(s.std_price)
         |            THEN 0.0 ELSE (e.value - s.avg_price) / s.std_price END AS zscore_price
         |FROM events e JOIN stats s
         |  ON (epoch_ns(e.ts) // $dns) * $d + $d = s.window_end_ms
         | AND e.event_type = s.symbol)""".stripMargin
    }.mkString("\nUNION ALL\n"),

    "q07_parse_ticks" ->
      """SELECT event_type AS symbol, value AS price,
        |       epoch_ns(ts) // 1000000 AS event_ms
        |FROM events""".stripMargin
  )
}
