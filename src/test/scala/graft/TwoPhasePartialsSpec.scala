package graft

import java.nio.file.Files

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TickOps
import graft.streaming.TwoPhasePartialsJob

/** The bounded-state chained topology: EP1 finalizes bucket partials in
  * append mode, EP2 re-windows them under its own watermark. The tests
  * pin the two claims that justify it over in-query chaining: (1) the
  * merged stats equal the batch reference, (2) BOTH queries' state is
  * actually evicted (numRowsRemoved > 0) — which the in-query merge
  * phase can never do for its integer end-key. */
class TwoPhasePartialsSpec extends SparkSpec {
  import spark.implicits._

  private def tickJson(symbol: String, price: Double, iso: String): String =
    s"""{"symbol":"$symbol","price":$price,"event_time":"$iso"}"""

  private val partialSchema = StructType(Seq(
    StructField("bucket_ts", TimestampType),
    StructField("symbol", StringType),
    StructField("pn", LongType),
    StructField("ps", DoubleType),
    StructField("pq", DoubleType)))

  test("chained partials topology matches batch stats and evicts state in BOTH queries") {
    val topic = Files.createTempDirectory("graft-partials-topic").toFile
    val ckpt = Files.createTempDirectory("graft-partials-ckpt").toFile

    // EP1: two micro-batches, one output file each (coalesce keeps the
    // topic's file order = commit order, so EP2's replay is time-ordered
    // and nothing is late against its watermark). The far-future flush
    // tick advances the watermark past every real bucket; its own bucket
    // is never closed, so the flush partial itself never reaches the
    // topic.
    val in = MemoryStream[String](spark)
    val q1 = TwoPhasePartialsJob.partialsStream(in.toDF()).coalesce(1)
      .writeStream.format("parquet")
      .option("path", topic.getAbsolutePath)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("append")
      .start()
    val real = Seq(
      ("BTC", 100.0, "2024-01-01T00:00:02.000Z"),
      ("BTC", 110.0, "2024-01-01T00:00:07.000Z"),
      ("ETH", 50.0, "2024-01-01T00:00:12.000Z"),
      ("BTC", 130.0, "2024-01-01T00:02:33.000Z"),
      ("BTC", 90.0, "2024-01-01T00:02:39.000Z"),
      ("ETH", 55.0, "2024-01-01T00:04:07.000Z"))
    in.addData(real.map((tickJson _).tupled): _*)
    q1.processAllAvailable()
    in.addData(tickJson("FLUSH", 1.0, "2024-01-01T02:00:00.000Z"))
    q1.processAllAvailable()
    val ep1Removed = q1.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
    q1.stop(); q1.awaitTermination()
    assert(ep1Removed > 0, "EP1's tumbling aggregate never evicted closed buckets")
    val emitted = spark.read.schema(partialSchema).parquet(topic.getAbsolutePath)
    assert(emitted.filter(col("symbol") === "FLUSH").count() == 0,
      "the flush bucket should never close, so its partial must not be emitted")

    // EP2: one file per trigger so the watermark advances across batches
    // and eviction is observable; updates collected WITH their batch id
    // (update mode re-emits growing windows — the final value per key is
    // the one from the highest batch).
    val updates = ListBuffer.empty[(Long, Row)]
    val q2 = noWideExpandCodegen {
      val partials = spark.readStream.schema(partialSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(topic.getAbsolutePath)
      val q = TwoPhasePartialsJob.statsFromPartials(partials)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          val rows = b.collect()
          updates.synchronized { rows.foreach(r => updates += ((id, r))) }
          ()
        }
        .outputMode("update").start()
      q.processAllAvailable(); q
    }
    val ep2Removed = q2.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
    q2.stop(); q2.awaitTermination()
    assert(ep2Removed > 0, "EP2's window aggregates never evicted closed windows")

    val got = updates
      .groupBy(e => (e._2.getTimestamp(0), e._2.getString(1), e._2.getString(2)))
      .map { case (_, es) => es.maxBy(_._1)._2 }
      .toSeq
      .sortBy(r => (r.getTimestamp(0).getTime, r.getString(1), r.getString(2)))

    // batch reference over the same ticks (same partial-merge math)
    val ticks = real.toDF("symbol", "price", "et")
      .select(col("symbol"), col("price"), to_timestamp(col("et")).as("event_time"))
    val want = noWideExpandCodegen {
      TickOps.slidingStatsTwoPhase(ticks, TickOps.defaultWindows)
        .orderBy("window_timestamp", "symbol", "window").collect()
    }
    assert(got.length == want.length, s"${got.length} windows vs batch ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getTimestamp(0) == w.getTimestamp(0) && g.getString(1) == w.getString(1)
        && g.getString(2) == w.getString(2), s"key mismatch: $g vs $w")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9, s"avg: $g vs $w")
      assert(math.abs(g.getDouble(4) - w.getDouble(4)) < 1e-6, s"std: $g vs $w")
    }
  }
}
