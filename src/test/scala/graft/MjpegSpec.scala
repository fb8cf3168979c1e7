package graft

import graft.operators.{JpegCodec, Mp4Codec, Multimodal}

/** Motion-JPEG end-to-end video pixel decode: stsc/stco byte-range
  * expansion pins against the two-chunk builder layout (and refuses
  * every inconsistent table), and the decoded band colors pin against an
  * independent reimplementation of the block-mean YCbCr round trip —
  * the same double-op chain the q183 DuckDB oracle replays. */
class MjpegSpec extends SparkSpec {

  // seed 3: n = 4 + 3%6 = 7 frames, chunk 1 = 4 samples, chunk 2 = 3
  private val b3 = Multimodal.mp4MjpegBytes(64, 32, 3L)

  test("sampleRanges expands stsc/stco across the two-chunk layout") {
    val info = Mp4Codec.parse(b3).get
    assert(info.codec == "jpeg")
    assert(info.stscRuns.toSeq == Seq((1L, 4L), (2L, 3L)))
    assert(info.chunkOffsets.length == 2)
    val ranges = Mp4Codec.sampleRanges(info, b3.length.toLong).get
    assert(ranges.length == 7)
    assert(ranges.map(_._2).toSeq == info.sampleSizes.toSeq)
    // contiguous inside each chunk; the builder's 7-byte gap between
    for (i <- 0 until 6 if i != 3)
      assert(ranges(i + 1)._1 == ranges(i)._1 + ranges(i)._2, s"sample $i")
    assert(ranges(4)._1 == ranges(3)._1 + ranges(3)._2 + 7)
    // every range slices a complete SOI..EOI JPEG out of mdat
    for ((off, sz) <- ranges) {
      val (o, e) = (off.toInt, (off + sz).toInt)
      assert((b3(o) & 0xff) == 0xff && (b3(o + 1) & 0xff) == 0xd8)
      assert((b3(e - 2) & 0xff) == 0xff && (b3(e - 1) & 0xff) == 0xd9)
      assert(JpegCodec.decodeRgb(
        java.util.Arrays.copyOfRange(b3, o, e)).isDefined)
    }
  }

  test("sampleRanges refuses absent, inconsistent, or overflowing tables") {
    val info = Mp4Codec.parse(b3).get
    val len = b3.length.toLong
    assert(Mp4Codec.sampleRanges(info.copy(chunkOffsets = Array.empty), len).isEmpty)
    assert(Mp4Codec.sampleRanges(info.copy(stscRuns = Array.empty), len).isEmpty)
    // first run must start at chunk 1
    assert(Mp4Codec.sampleRanges(
      info.copy(stscRuns = Array((2L, 4L), (3L, 3L))), len).isEmpty)
    // non-increasing first_chunk
    assert(Mp4Codec.sampleRanges(
      info.copy(stscRuns = Array((1L, 4L), (1L, 3L))), len).isEmpty)
    // non-positive samples_per_chunk
    assert(Mp4Codec.sampleRanges(
      info.copy(stscRuns = Array((1L, 0L))), len).isEmpty)
    // more samples than the chunk table can hold
    assert(Mp4Codec.sampleRanges(
      info.copy(chunkOffsets = info.chunkOffsets.take(1)), len).isEmpty)
    // a range that would run past end-of-file
    assert(Mp4Codec.sampleRanges(info, 100L).isEmpty)
  }

  test("co64 64-bit chunk offsets drive the same ranges") {
    // splice the 2-entry stco (24 bytes) into a co64 (32 bytes): every
    // enclosing box grows by 8 and the mdat (hence both offsets) moves
    // by 8 — a REAL large-file-layout container, parsed end to end
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32((v >> 32).toInt) ++ be32(v.toInt)
    def rd32(o: Int) = ((b3(o) & 0xff) << 24) | ((b3(o + 1) & 0xff) << 16) |
      ((b3(o + 2) & 0xff) << 8) | (b3(o + 3) & 0xff)
    val stco = b3.indexOfSlice("stco".getBytes("US-ASCII")) - 4
    val (off1, off2) = (rd32(stco + 16), rd32(stco + 20))
    val co64 = be32(32) ++ "co64".getBytes("US-ASCII") ++ be32(0) ++
      be32(2) ++ be64(off1 + 8L) ++ be64(off2 + 8L)
    val out = b3.take(stco) ++ co64 ++ b3.drop(stco + 24)
    for (tpe <- Seq("moov", "trak", "mdia", "minf", "stbl")) {
      val at = out.indexOfSlice(tpe.getBytes("US-ASCII")) - 4
      val sz = ((out(at) & 0xff) << 24) | ((out(at + 1) & 0xff) << 16) |
        ((out(at + 2) & 0xff) << 8) | (out(at + 3) & 0xff)
      for ((b, j) <- be32(sz + 8).zipWithIndex) out(at + j) = b
    }
    val info = Mp4Codec.parse(out).get
    val ranges = Mp4Codec.sampleRanges(info, out.length.toLong).get
    assert(ranges.length == 7)
    for ((off, sz) <- ranges)
      assert(JpegCodec.decodeRgb(java.util.Arrays.copyOfRange(
        out, off.toInt, (off + sz).toInt)).isDefined)
  }

  // independent reimplementation of the encode→decode color chain (the
  // same chain the q183 oracle replays in DuckDB)
  private def clamp(v: Double): Int = {
    val r = math.round(v).toInt
    if (r < 0) 0 else if (r > 255) 255 else r
  }
  private def chain(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def fold(t: Double) = { var a = 0.0; var i = 0; while (i < 64) { a += t; i += 1 }; a }
    val y = clamp(fold(0.299 * r + 0.587 * g + 0.114 * b) / 64.0)
    val cb = clamp(fold(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0) / 64.0)
    val cr = clamp(fold(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0) / 64.0)
    val (yv, cbd, crd) = (y.toDouble, cb - 128.0, cr - 128.0)
    (clamp(yv + 1.402 * crd),
      clamp(yv - 0.344136 * cbd - 0.714136 * crd),
      clamp(yv + 1.772 * cbd))
  }

  test("decodeMjpegFrames: every frame's band colors match the hand chain") {
    val rows = Multimodal.decodeMjpegFrames(Multimodal.syntheticMjpeg(spark, 6))
      .collect().sortBy(r => (r.media_id, r.frame_index))
    assert(rows.length == (0 until 6).map(i => 4 + i % 6).sum) // 39
    for (r <- rows) {
      val i = r.media_id
      assert(r.width == 64 + (i % 8).toInt * 16 && r.height == 32)
      assert(r.frame_ts_ms == r.frame_index * 40L)
      def c(b: Int, ch: Int) = Multimodal.mjpegBandColor(i, r.frame_index, b, ch)
      val (rl, gl, bl) = chain(c(0, 0), c(0, 1), c(0, 2))
      val (rr, gr, br) = chain(c(1, 0), c(1, 1), c(1, 2))
      assert((r.rl, r.gl, r.bl) == ((rl, gl, bl)), s"media $i frame ${r.frame_index} L")
      assert((r.rr, r.gr, r.br) == ((rr, gr, br)), s"media $i frame ${r.frame_index} R")
    }
  }

  test("refusal: non-MJPEG videos yield no rows; a corrupt frame drops alone") {
    import spark.implicits._
    // the mp4v synthetic table has no decodable pixel bitstream
    assert(Multimodal.decodeMjpegFrames(
      Multimodal.syntheticMedia(spark, 12)).count() == 0L)
    // zero out frame 2's SOI marker: that frame refuses, the rest decode
    val b = Multimodal.mp4MjpegBytes(64, 32, 5L) // n = 4 + 5%6 = 9
    val info = Mp4Codec.parse(b).get
    val ranges = Mp4Codec.sampleRanges(info, b.length.toLong).get
    val corrupt = b.clone()
    corrupt(ranges(2)._1.toInt) = 0
    val ds = Seq(
      Multimodal.MediaRow(0L, "video", corrupt, 64, 32, 0, 360L)).toDS()
    val got = Multimodal.decodeMjpegFrames(ds).collect().map(_.frame_index).sorted
    assert(got.toSeq == (0 until 9).filterNot(_ == 2))
  }
}
