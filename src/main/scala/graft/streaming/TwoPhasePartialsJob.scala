package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TickOps
import graft.operators.TickOps.WindowConfig

/** The state-BOUNDED multi-window topology: two chained streaming
  * queries glued through a materialized topic, the way the reference
  * chains its jobs (docker-compose: moving_statistic → Kafka →
  * zscore_calculator).
  *
  *  - EP1 ([[partialsStream]]): raw ticks → watermark → ONE tumbling
  *    slide-sized aggregate → append mode. Append emits a bucket's
  *    (count, sum, sumsq) partial exactly once, when the watermark
  *    closes it — the topic carries IMMUTABLE partials.
  *  - EP2 ([[statsFromPartials]]): consumes the partial topic with its
  *    own watermark on the bucket timestamp and re-windows per config
  *    with window() — each branch's state is watermark-evicted.
  *
  * Why this beats the in-query chaining ([[TickOps.slidingStatsTwoPhase]])
  * when retention matters:
  *  1. EVERY stateful operator in both queries evicts: EP1's tumbling agg
  *     by the tick watermark, EP2's six window aggs by the bucket
  *     watermark. The in-query variant's merge phase is end-keyed and
  *     grows forever.
  *  2. No chained-aggregation caveat: each query has one LEVEL of
  *     stateful aggregation over an append-only input, so the
  *     `checkCorrectness` opt-out (and the double-count risk it guards)
  *     disappears — EP2 re-aggregates finalized rows, never updates.
  *  3. EP2's wide work (6 branches) runs over partials — ~rate×slide
  *     fewer rows than the raw stream, the same economy as the fused
  *     two-phase plan.
  * The cost is the topic hop's latency (a bucket's stats appear only
  * after the watermark closes it), which is what bounded state buys.
  */
object TwoPhasePartialsJob {

  /** EP1: raw tick frames → finalized per-(bucket, symbol) partials.
    * Run with `outputMode("append")` so each partial is emitted once. */
  def partialsStream(
      raw: DataFrame,
      cfgs: Seq[WindowConfig] = TickOps.defaultWindows,
      watermark: String = "10 seconds"): DataFrame = {
    require(cfgs.map(_.slideMs).distinct.size == 1, "uniform slide required")
    val slide = cfgs.head.slide
    TickOps.parseTicks(raw)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), slide, slide).as("w10"), col("symbol"))
      .agg(
        count(col("price")).as("pn"),
        sum(col("price")).as("ps"),
        sum(col("price") * col("price")).as("pq"))
      .select(col("w10.start").as("bucket_ts"), col("symbol"),
        col("pn"), col("ps"), col("pq"))
  }

  /** EP2: the partial topic → per-(sliding window × symbol) stats. Each
    * config re-windows the bucket timestamp with window(), so Spark ties
    * the branch's state to the watermark and evicts closed windows. */
  def statsFromPartials(
      partials: DataFrame,
      cfgs: Seq[WindowConfig] = TickOps.defaultWindows,
      watermark: String = "10 seconds"): DataFrame = {
    val wp = partials.withWatermark("bucket_ts", watermark)
    val branches = cfgs.map { c =>
      val merged = wp
        .groupBy(window(col("bucket_ts"), c.duration, c.slide).as("w"), col("symbol"))
        .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"), sum(col("pq")).as("q"))
      val variance = (col("q") - col("s") * col("s") / col("n")) / (col("n") - lit(1))
      val sd = when(col("n") === 1, lit(0.0))
        .otherwise(sqrt(greatest(variance, lit(0.0))))
      merged.select(
        col("w.end").as("window_timestamp"),
        col("symbol"),
        lit(c.name).as("window"),
        coalesce(col("s") / col("n"), lit(0.0)).as("avg_price"),
        when(sd.isNull || isnan(sd), lit(0.0)).otherwise(sd).as("std_price"))
    }
    branches.reduce(_ union _)
  }
}
