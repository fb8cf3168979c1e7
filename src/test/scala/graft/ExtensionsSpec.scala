package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.TextOps

/** SQL-surface registration of the custom expressions, and a streaming
  * watermarked dropDuplicates (the §2.11 absence most relevant to a
  * dedup-centric pipeline). */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq(("hello world foo", Array(1.0f, 2.0f))).toDF("text", "vec")
      .createOrReplaceTempView("ext_t")
    val r = spark.sql(
      """SELECT rolling_fingerprint(text) AS fp,
        |       simhash64(split(text, ' ')) AS sh,
        |       cosine_similarity(vec, vec) AS cs,
        |       sign_lsh_bucket(vec, 4) AS b,
        |       minhash_from_tokens(split(text, ' '), 2, 8) AS sig,
        |       sig_overlap(minhash_from_tokens(split(text, ' '), 2, 8),
        |                   minhash_from_tokens(split(text, ' '), 2, 8)) AS so
        |FROM ext_t""".stripMargin).collect().head
    // SQL results equal the Column-API results
    val api = Seq(("hello world foo", Array(1.0f, 2.0f))).toDF("text", "vec")
      .select(
        TextOps.fingerprint(col("text")).as("fp"),
        GraftFunctions.simhash64(split(col("text"), " ")).as("sh"),
        GraftFunctions.cosine_similarity(col("vec"), col("vec")).as("cs"))
      .collect().head
    assert(r.getAs[Long]("fp") == api.getAs[Long]("fp"))
    assert(r.getAs[Long]("sh") == api.getAs[Long]("sh"))
    assert(r.getAs[Double]("cs") == api.getAs[Double]("cs"))
    assert(r.getAs[Double]("so") == 1.0)
    assert(r.getAs[scala.collection.Seq[Long]]("sig").length == 8)
  }

  test("media_meta callable from SQL over a binary column") {
    GraftExtensions.register(spark)
    Seq(Tuple1(graft.operators.Multimodal.pngBytes(320, 240, 4, 1L)))
      .toDF("payload").createOrReplaceTempView("ext_media")
    val r = spark.sql(
      "SELECT media_meta(payload).format AS f, media_meta(payload).width AS w, " +
        "media_meta(payload).height AS h FROM ext_media").collect().head
    assert(r.getAs[String]("f") == "png")
    assert(r.getAs[Int]("w") == 320)
    assert(r.getAs[Int]("h") == 240)
    assert(spark.sql("SELECT zorder_key(3L, 3L, 8)").collect().head.getLong(0) == 15L)
  }

  test("streaming dropDuplicates with watermark: exact dedup on a stream") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.Models.PriceTick
    val in = MemoryStream[PriceTick](spark)
    val dedup = in.toDF()
      .withWatermark("event_time", "10 seconds")
      .dropDuplicates("symbol", "price", "event_time")
    val q = dedup.writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:05")
      in.addData(PriceTick("BTC", 1.0, t), PriceTick("BTC", 1.0, t), PriceTick("BTC", 2.0, t))
      q.processAllAvailable()
      // duplicate within the batch collapsed
      assert(spark.table("dd_out").count() == 2)
      // duplicate arriving in a later batch (within watermark) also collapsed
      in.addData(PriceTick("BTC", 1.0, t))
      q.processAllAvailable()
      assert(spark.table("dd_out").count() == 2)
    } finally q.stop()
  }
}
