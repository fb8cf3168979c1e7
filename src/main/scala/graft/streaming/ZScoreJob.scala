package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StringType

import graft.model.Models
import graft.operators.TickOps

/** Streaming z-score job: `btc-price` ⋈ `btc-price-moving` →
  * per-(tick, window) z-scores → re-nested → `btc-price-zscore`
  * (reference src/Tranforms/zscore_calculator.py).
  *
  * The join is a stream-stream inner equi-join on
  * (event_time == window end, symbol) — equality, not a range: only ticks
  * landing exactly on a 10 s slide boundary match, by reference design
  * (SURVEY.md §2.7). Both sides carry a 10 s watermark, which bounds the
  * symmetric-hash join state.
  */
object ZScoreJob {

  /** Decode the nested moving-stats topic and flatten to per-window rows
    * (reference zscore_calculator.py:74-97). */
  def parseMoving(raw: DataFrame): DataFrame =
    TickOps.explodeWindows(
      raw
        .select(from_json(col("value").cast(StringType), Models.movingStatsSchema).as("data"))
        .select(col("data.*")))
      .filter(col("window_timestamp").isNotNull)

  /** ticks ⋈ stats → z-score rows; shared by streaming and tests. */
  def zscores(ticks: DataFrame, moving: DataFrame): DataFrame =
    TickOps.zscore(
      TickOps.joinTicksToStats(
        ticks.withWatermark("event_time", "10 seconds"),
        moving.withWatermark("window_timestamp", "10 seconds")))

  def nested(flat: DataFrame): DataFrame =
    TickOps.toKafkaJson(TickOps.nestZScores(flat), Seq("timestamp", "symbol", "zscores"))

  def run(
      spark: SparkSession,
      brokers: String,
      priceTopic: String = "btc-price",
      movingTopic: String = "btc-price-moving",
      outTopic: String = "btc-price-zscore",
      checkpointDir: String = "./tmp/zscore-checkpoint",
      mode: MovingStatsJob.H1Mode = MovingStatsJob.H1Mode.ForeachBatch,
      format: String = "kafka",
      startingOffsets: String = "latest",
      triggerInterval: String = "5 seconds"): StreamingQuery = {
    val ticks = TickOps.parseTicks(
      KafkaIO.source(spark, brokers, priceTopic, startingOffsets, format))
    val moving = parseMoving(
      KafkaIO.source(spark, brokers, movingTopic, startingOffsets, format))
    val flat = zscores(ticks, moving)
    mode match {
      case MovingStatsJob.H1Mode.ForeachBatch =>
        flat.writeStream
          .outputMode("append")
          .option("checkpointLocation", checkpointDir)
          .trigger(Trigger.ProcessingTime(triggerInterval))
          .foreachBatch { (batch: DataFrame, _: Long) =>
            nested(batch).write
              .mode("append") // DSv2 rejects the default ErrorIfExists
              .format(format)
              .option("kafka.bootstrap.servers", brokers)
              .option("topic", outTopic)
              .save()
          }
          .start()
      case MovingStatsJob.H1Mode.Chained =>
        spark.conf.set(
          "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
        KafkaIO.sink(nested(flat), brokers, outTopic, checkpointDir, "append",
          triggerInterval, format).start()
    }
  }
}
