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

  test("BMP pixel decoder: features equal hand-computed statistics of explicit pixels") {
    // a 2×2 bottom-up 24-bit BMP with EXPLICIT pixels, rows padded to 4n:
    //   logical top row:    (B,G,R) = (10,20,30), (40,50,60)
    //   logical bottom row: (B,G,R) = (0,0,0),    (255,255,255)
    // bottom-up file order stores the bottom row first. rowSize = 8.
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val pixels =
      Array[Byte](0, 0, 0, -1, -1, -1, 0, 0) ++ // bottom row + 2 pad bytes
        Array[Byte](10, 20, 30, 40, 50, 60, 0, 0) // top row + pad
    val bmp = "BM".getBytes("US-ASCII") ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ Array.fill[Byte](54 - 34)(0) ++ pixels
    val f = Multimodal.bmpPixelFeatures(bmp, 16).get
    // channel means over {10,40,0,255}B {20,50,0,255}G {30,60,0,255}R
    assert(f(0) == ((10 + 40 + 0 + 255) / 4.0).toFloat)
    assert(f(1) == ((20 + 50 + 0 + 255) / 4.0).toFloat)
    assert(f(2) == ((30 + 60 + 0 + 255) / 4.0).toFloat)
    // population std of B channel
    val bVals = Seq(10.0, 40.0, 0.0, 255.0)
    val bMean = bVals.sum / 4
    assert(math.abs(f(3) - math.sqrt(bVals.map(v => v * v).sum / 4 - bMean * bMean)) < 1e-4)
    assert(f(6) == 0f && f(9) == 255f) // min/max B
    // luminance of the four pixels (0.114B + 0.587G + 0.299R)
    def lum(b: Int, g: Int, r: Int) = 0.114 * b + 0.587 * g + 0.299 * r
    val lums = Seq(lum(10, 20, 30), lum(40, 50, 60), lum(0, 0, 0), lum(255, 255, 255))
    assert(math.abs(f(12) - lums.sum / 4) < 1e-4)
    assert(f(13) == 0.25f) // only the white pixel exceeds 127.5
    // within-row gradient: |l(40,50,60)-l(10,20,30)| and |l(white)-l(black)|
    val g1 = math.abs(lums(1) - lums(0))
    val g2 = math.abs(lums(3) - lums(2))
    assert(math.abs(f(14) - (g1 + g2) / 2) < 1e-4)
    assert(f(15) == 1.0f) // square
  }

  test("BMP pixel decoder refuses what it cannot decode (falls back, never lies)") {
    // truncated pixel array → None
    val full = Multimodal.bmpBytes(8, 8, ((8 * 3 + 3) / 4) * 4 * 8, 1L)
    assert(Multimodal.bmpPixelFeatures(full, 16).isDefined)
    assert(Multimodal.bmpPixelFeatures(full.dropRight(1), 16).isEmpty)
    // non-BMP magic → None
    assert(Multimodal.bmpPixelFeatures(Multimodal.pngBytes(8, 8, 64, 1L), 16).isEmpty)
    // synthetic table: every BMP row decodes for real (complete files)
    val feats = Multimodal.featureFrame(Multimodal.syntheticMedia(spark, 48))
      .filter(col("kind") === "image").collect()
    assert(feats.nonEmpty)
    // BMP media ids: kind==image (i%3==0) and (i/3)%4==3 → i ∈ {9, 21, 33, 45}
    val bmpIds = Seq(9L, 21L, 33L, 45L)
    val byId = feats.map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    bmpIds.foreach { id =>
      val v = byId(id)
      // real pixel statistics live in [0, 255]; min ≤ mean ≤ max per channel
      assert(v(6) <= v(0) && v(0) <= v(9), s"media $id")
      assert(v(0) >= 0f && v(9) <= 255f, s"media $id")
    }
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

  /** A 16-bit PCM WAV with EXPLICIT samples (little-endian, two's
    * complement), for hand-computed feature checks. */
  private def pcmWav(rate: Int, channels: Int, bits: Int, fmt: Int,
      samples: Seq[Int]): Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(fmt) ++ le16(channels) ++ le32(rate) ++
      le32(rate * channels * bits / 8) ++ le16(channels * bits / 8) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  test("WAV PCM decoder: features equal hand-computed statistics of explicit samples") {
    // samples chosen to exercise sign extension at both extremes
    val s = Seq(1000, -2000, 3000, -32768, 32767)
    val f = Multimodal.wavPcmFeatures(pcmWav(8000, 1, 16, 1, s), 16).get
    val n = s.length.toDouble
    val mean = s.sum / n
    val sumSq = s.map(v => v.toDouble * v).sum
    assert(f(0) == mean.toFloat)
    assert(f(1) == math.sqrt(sumSq / n - mean * mean).toFloat)
    assert(f(2) == -32768f && f(3) == 32767f)
    assert(f(4) == math.sqrt(sumSq / n).toFloat)
    // signs +,-,+,-,+ → every adjacent pair crosses zero
    assert(f(5) == 1.0f)
    // |Δ| = 3000, 5000, 35768, 65535 → mean 27325.75
    assert(f(6) == 27325.75f)
    // |s| > 16384 only for the two extremes
    assert(f(7) == 0.4f)
    assert(f(8) == (5.0 / 8000).toFloat)
    assert(f(9) == 8000f && f(10) == 1f && f(11) == 5f)
    assert(f(12) == 0f && f(15) == 0f) // unused lanes stay zero
  }

  test("WAV PCM decoder refuses what it cannot decode (falls back, never lies)") {
    val s = Seq(1, 2, 3)
    // non-PCM format tag, non-16-bit depth, bad magic → None
    assert(Multimodal.wavPcmFeatures(pcmWav(8000, 1, 16, 3, s), 16).isEmpty)
    assert(Multimodal.wavPcmFeatures(pcmWav(8000, 1, 8, 1, s), 16).isEmpty)
    assert(Multimodal.wavPcmFeatures(Multimodal.mp4Bytes(64, 1L), 16).isEmpty)
    assert(Multimodal.wavPcmFeatures(Multimodal.pngBytes(8, 8, 64, 1L), 16).isEmpty)
    // empty data chunk → None (no samples to describe)
    assert(Multimodal.wavPcmFeatures(pcmWav(8000, 1, 16, 1, Seq.empty), 16).isEmpty)
    // a truncated file still decodes the samples actually present
    val whole = pcmWav(8000, 1, 16, 1, Seq(100, 200, 300))
    val trunc = Multimodal.wavPcmFeatures(whole.dropRight(2), 16).get
    assert(trunc(11) == 2f && trunc(3) == 200f)
    // synthetic table: every audio row decodes for real (16-bit PCM)
    val feats = Multimodal.featureFrame(Multimodal.syntheticMedia(spark, 48))
      .filter(col("kind") === "audio").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      val pad = 200 + (id % 512).toInt
      val fv = r.getSeq[Float](3)
      // lane 11 = samples decoded = pad // 2; lane 9 = the declared rate
      assert(fv(11) == (pad / 2).toFloat, s"media $id")
      assert(fv(9) == 16000f && fv(10) == 1f)
    }
  }

  test("WAV PCM decoder walks chunk lists with extra chunks before fmt/data") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // RIFF → LIST(5 bytes, odd → word-aligned skip) → fmt → data
    val data = Array[Byte](10, 0, 246.toByte, 255.toByte) // samples 10, -10
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(100) ++ "WAVE".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(5) ++ Array.fill[Byte](6)(0) ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(44100) ++
      le32(88200) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(4) ++ data
    val f = Multimodal.wavPcmFeatures(wav, 16).get
    assert(f(0) == 0f && f(2) == -10f && f(3) == 10f && f(9) == 44100f && f(11) == 2f)
  }
}
