package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Kafka source/sink builders with the reference's operational options
  * (reference moving_statistic.py:32-39, 123-131;
  * zscore_calculator.py:50-73, 165-183).
  *
  * Format is addressed by name ("kafka") so the engine compiles without the
  * connector on the classpath; at deploy time add
  * `spark-sql-kafka-0-10_2.13` to the session. Tests drive the same
  * transforms through MemoryStream instead.
  */
object KafkaIO {

  /** Streaming source for one topic; `startingOffsets=latest` and
    * `failOnDataLoss=false` mirror the reference's tolerance of retention
    * gaps. `format` defaults to the real connector; pass `"fakekafka"`
    * ([[graft.streaming.fake.FakeKafkaProvider]]) to execute the identical
    * plan against the in-JVM broker double — same options, schema, and
    * offset checkpointing. */
  def source(
      spark: SparkSession,
      brokers: String,
      topic: String,
      startingOffsets: String = "latest",
      format: String = "kafka"): DataFrame =
    spark.readStream
      .format(format)
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", "false")
      .load()

  /** Kafka sink writer: 5 s processing-time trigger, explicit checkpoint
    * (reference moving_statistic.py:123-131). Caller picks output mode. */
  def sink(
      df: DataFrame,
      brokers: String,
      topic: String,
      checkpointDir: String,
      outputMode: String,
      triggerInterval: String = "5 seconds",
      format: String = "kafka"): DataStreamWriter[Row] =
    df.writeStream
      .format(format)
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .outputMode(outputMode)
      .trigger(Trigger.ProcessingTime(triggerInterval))

  /** Console monitoring sink: 3 rows, untruncated, 10 s cadence
    * (reference moving_statistic.py:134-141). */
  def consoleSink(
      df: DataFrame,
      outputMode: String,
      numRows: Int = 3,
      triggerInterval: String = "10 seconds"): StreamingQuery =
    df.writeStream
      .format("console")
      .option("numRows", numRows)
      .option("truncate", value = false)
      .outputMode(outputMode)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
}
