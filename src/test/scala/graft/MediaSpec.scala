package graft

import org.apache.spark.sql.functions._

import graft.functions.MediaKernels
import graft.operators.Multimodal

/** Container-header parsing: real byte-level parsers against
  * spec-conformant synthetic headers, plus robustness on garbage. */
class MediaSpec extends SparkSpec {

  private def parse(b: Array[Byte]): (String, Any, Any, Any) = {
    val r = MediaKernels.parse(b)
      .asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
    (r.getUTF8String(0).toString,
      if (r.isNullAt(1)) null else r.getInt(1),
      if (r.isNullAt(2)) null else r.getInt(2),
      if (r.isNullAt(3)) null else r.getInt(3))
  }

  test("png/jpeg/gif/bmp headers parse to their encoded dimensions") {
    assert(parse(Multimodal.pngBytes(640, 480, 10, 1L)) === (("png", 640, 480, null)))
    assert(parse(Multimodal.jpegBytes(1920, 1080, 10, 2L)) === (("jpeg", 1920, 1080, null)))
    assert(parse(Multimodal.gifBytes(320, 200, 10, 3L)) === (("gif", 320, 200, null)))
    assert(parse(Multimodal.bmpBytes(800, 600, 10, 4L)) === (("bmp", 800, 600, null)))
  }

  test("wav sample rate comes from the fmt chunk; mp4 sniffs by ftyp") {
    assert(parse(Multimodal.wavBytes(44100, 10, 5L)) === (("wav", null, null, 44100)))
    assert(parse(Multimodal.mp4Bytes(10, 6L)) === (("mp4", null, null, null)))
  }

  test("jpeg marker walk skips APPn segments to find SOF") {
    // jpegBytes already has APP0 before SOF0; also check SOF2 (progressive)
    val b = Multimodal.jpegBytes(64, 32, 0, 7L)
    val i = b.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    b(i + 1) = 0xc2.toByte // SOF0 → SOF2
    assert(parse(b) === (("jpeg", 64, 32, null)))
  }

  test("garbage and truncated headers degrade to unknown/null, never throw") {
    assert(parse(Array[Byte]())._1 === "unknown")
    assert(parse(Array.tabulate[Byte](64)(_.toByte))._1 === "unknown")
    assert(parse(Multimodal.pngBytes(64, 64, 0, 8L).take(10)) === (("png", null, null, null)))
    assert(parse(Array[Byte](0xff.toByte, 0xd8.toByte)) === (("jpeg", null, null, null)))
    assert(parse("RIFF1234WAVE".getBytes("US-ASCII")) === (("wav", null, null, null)))
  }

  test("adversarial wav chunk sizes terminate: negative sizes degrade to null") {
    // size=-8 advances the naive walk by 0 (infinite loop inside a
    // codegen'd expression = a hung executor task); more-negative sizes
    // drive the offset negative (AIOOBE). Both must degrade to null.
    def wavWith(size: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(16)
        .put("WAVE".getBytes("US-ASCII"))
        .put("junk".getBytes("US-ASCII")).putInt(size)
      b.array()
    }
    assert(parse(wavWith(-8)) === (("wav", null, null, null)))
    assert(parse(wavWith(-9)) === (("wav", null, null, null)))
    assert(parse(wavWith(Int.MinValue)) === (("wav", null, null, null)))
    assert(parse(wavWith(Int.MaxValue)) === (("wav", null, null, null)))
  }

  test("parseMeta recovers the declared dims for every image format") {
    val parsed = Multimodal.parseMeta(Multimodal.syntheticMedia(spark, 120))
      .join(Multimodal.syntheticMedia(spark, 120).toDF()
        .select(col("media_id"), col("kind").as("k2"),
          col("width").as("dw"), col("height").as("dh")),
        Seq("media_id"))
      .collect()
    assert(parsed.length === 120)
    val images = parsed.filter(_.getAs[String]("kind") == "image")
    assert(images.nonEmpty)
    images.foreach { r =>
      assert(Set("png", "jpeg", "gif", "bmp").contains(r.getAs[String]("format")))
      assert(r.getAs[Int]("width") === r.getAs[Int]("dw"))
      assert(r.getAs[Int]("height") === r.getAs[Int]("dh"))
    }
    parsed.filter(_.getAs[String]("kind") == "audio").foreach { r =>
      assert(r.getAs[String]("format") === "wav")
      assert(r.getAs[Int]("sample_rate") === 16000)
    }
    parsed.filter(_.getAs[String]("kind") == "video").foreach { r =>
      assert(r.getAs[String]("format") === "mp4")
    }
  }
}
