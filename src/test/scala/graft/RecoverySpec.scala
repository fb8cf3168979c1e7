package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fault-tolerance: a stateful streaming query stopped and restarted from
  * its checkpoint must resume source offsets (no reprocessing) and restore
  * aggregation state (counts continue, not restart). */
class RecoverySpec extends SparkSpec {

  test("stateful query restarts from checkpoint with offsets and state intact") {
    val inDir = Files.createTempDirectory("graft-rec-in").toFile
    val ckpt = Files.createTempDirectory("graft-rec-ckpt").toFile
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

    def writeFile(name: String, lines: Seq[String]): Unit = {
      val f = new java.io.File(inDir, name)
      java.nio.file.Files.write(f.toPath, lines.mkString("\n").getBytes)
    }
    def tick(sym: String, p: Double, iso: String): String =
      s"""{"symbol":"$sym","price":$p,"event_time":"$iso"}"""

    def runOnce(): Unit = {
      val raw = spark.readStream
        .schema("value STRING")
        .text(inDir.getAbsolutePath)
      val counts = graft.operators.TickOps.parseTicks(raw)
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n"))
      val q = counts.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (b: DataFrame, _: Long) =>
          seen ++= b.collect().map(r => (r.getString(0), r.getLong(1)))
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    writeFile("a.json", Seq(
      tick("BTC", 1.0, "2024-01-01T00:00:00Z"),
      tick("BTC", 2.0, "2024-01-01T00:00:01Z"),
      tick("ETH", 3.0, "2024-01-01T00:00:02Z")))
    runOnce()
    assert(seen.toSet == Set(("BTC", 2L), ("ETH", 1L)))

    seen.clear()
    writeFile("b.json", Seq(tick("BTC", 4.0, "2024-01-01T00:00:03Z")))
    runOnce() // fresh query object, same checkpoint
    // only BTC changed; its count CONTINUES from restored state (3, not 1),
    // and file a.json was not reprocessed (no ETH re-emission)
    assert(seen.toSet == Set(("BTC", 3L)))
  }
}
