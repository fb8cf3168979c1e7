package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mp4Codec, Multimodal}

/** Real ISO-BMFF container parsing: the box-tree walk, headers, and
  * sample tables pin against hand-computed values on the synthetic full
  * MP4s (every byte closed-form in the seed), and every malformed shape
  * refuses with None — the same decoder contract as BMP/PNG/GIF/JPEG/
  * WAV. */
class Mp4Spec extends SparkSpec {

  // seed 2 (the first video row): n = 7 frames, sample k sized
  // 16 + ((2·31 + 7k) % 251) = 78, 85, 92, 99, 106, 113, 120
  private val b2 = Multimodal.mp4FullBytes(96, 64, 2L)
  private val sizes2 = Seq(78L, 85L, 92L, 99L, 106L, 113L, 120L)

  test("full builder length matches the closed-form 579 + 4n + total") {
    for (i <- 0L until 24L) {
      val n = (5 + i % 10).toInt
      val total = (0 until n).map(k => 16 + (i * 31 + k * 7) % 251).sum
      assert(Multimodal.mp4FullBytes(64, 64, i).length == 579 + 4 * n + total, s"seed $i")
    }
  }

  test("parse reads brand, codec, dims, tracks, timescales, and sample tables") {
    val p = Mp4Codec.parse(b2).get
    assert(p.brand == "isom")
    assert(p.codec == "mp4v")
    assert(p.width == 96 && p.height == 64)
    assert(p.nTracks == 1)
    assert(p.mvhdTimescale == 1000L && p.mvhdDuration == 7 * 40L)
    assert(p.timescale == 12800L && p.duration == 7 * 512L)
    assert(p.sampleDeltas.toSeq == Seq((7L, 512L)))
    assert(p.sampleSizes.toSeq == sizes2)
  }

  test("frameTimesMs expands stts runs into exact 40 ms decode timestamps") {
    val p = Mp4Codec.parse(b2).get
    assert(Mp4Codec.frameTimesMs(p).toSeq ==
      (0 until 7).map(k => (k, k * 40L)))
    // multi-run stts: 2 frames at 256 ticks then 3 at 512
    val multi = p.copy(
      sampleDeltas = Array((2L, 256L), (3L, 512L)),
      sampleSizes = Array(1L, 1L, 1L, 1L, 1L))
    assert(Mp4Codec.frameTimesMs(multi).toSeq ==
      Seq((0, 0L), (1, 20L), (2, 40L), (3, 80L), (4, 120L)))
    // stsz shorter than stts (disagreeing tables): truncate to stsz
    val short = p.copy(sampleSizes = Array(9L, 9L, 9L))
    assert(Mp4Codec.frameTimesMs(short).toSeq ==
      Seq((0, 0L), (1, 40L), (2, 80L)))
  }

  test("mp4Features lanes are the hand-computed sample-size statistics") {
    val f = Mp4Codec.mp4Features(b2, 16).get
    assert(f(0) == 7f) // frame count
    assert(f(1) == ((7 * 512).toDouble / 12800).toFloat) // duration s
    assert(f(2) == (7.0 / ((7 * 512).toDouble / 12800)).toFloat) // fps ≈ 25
    assert(f(3) == 99f) // mean size (exact: sum 693 / 7)
    assert(f(4) == 14f) // pop std (deviations ±21, ±14, ±7, 0 → var 196)
    assert(f(5) == 78f && f(6) == 120f) // min/max size
    assert(f(7) == 693f) // total bytes
    assert(f(8) == 96f && f(9) == 64f) // tkhd dims
    assert(f(10) == 1f) // tracks
    assert(f(11) == ((7 * 40).toDouble / 1000).toFloat) // movie dur s
    assert((12 until 16).forall(f(_) == 0f))
  }

  test("64-bit largesize boxes parse (size 1 + 64-bit length on mdat)") {
    val data = b2.takeRight(693) // the mdat body (Σ sizes2)
    val head = b2.dropRight(693 + 8) // everything before the mdat header
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val large = head ++ be32(1) ++ "mdat".getBytes("US-ASCII") ++
      Array.fill[Byte](4)(0) ++ be32(16 + data.length) ++ data
    assert(Mp4Codec.parse(large).get.sampleSizes.toSeq == sizes2)
  }

  test("malformed containers refuse with None, never throw") {
    // header-only ftyp (no moov) — the old stub payload
    assert(Mp4Codec.parse(Multimodal.mp4Bytes(100, 3L)).isEmpty)
    // foreign bytes / empty
    assert(Mp4Codec.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(Mp4Codec.parse(Array.emptyByteArray).isEmpty)
    // truncation at every prefix length must refuse, not throw
    for (keep <- Seq(4, 17, 100, 300, b2.length - 700, b2.length - 1))
      assert(Mp4Codec.parse(b2.take(keep)).isEmpty, s"keep $keep")
    // box size smaller than its own header
    val tiny = b2.clone()
    tiny(19) = 4 // moov size 555+28 → 4
    assert(Mp4Codec.parse(tiny).isEmpty)
    // box size overflowing the file
    val over = b2.clone()
    over(16) = 0x7f
    assert(Mp4Codec.parse(over).isEmpty)
    // stts entry count forged huge: must refuse, not allocate
    val stts = b2.indexOfSlice("stts".getBytes("US-ASCII"))
    val forged = b2.clone()
    forged(stts + 8) = 0x7f
    assert(Mp4Codec.parse(forged).isEmpty)
  }

  test("audio-handler tracks are not video: parse refuses without a vide trak") {
    val soun = b2.clone()
    val hdlr = soun.indexOfSlice("hdlrvide".getBytes("US-ASCII").take(4))
    // hdlr handler_type at body+8 → file offset hdlr+4(cc)+8
    for ((c, j) <- "soun".zipWithIndex) soun(hdlr + 12 + j) = c.toByte
    assert(Mp4Codec.parse(soun).isEmpty)
  }

  test("extractFeatures routes video rows through the REAL container parser") {
    import spark.implicits._
    val feats = Multimodal.featureFrame(Multimodal.syntheticMedia(spark, 48))
      .filter(col("kind") === "video")
      .select(col("media_id"), element_at(col("features"), 1).as("f0"))
      .as[(Long, Float)].collect()
    assert(feats.length == 16)
    for ((id, f0) <- feats) assert(f0 == (5 + id % 10).toFloat, s"media $id")
  }

  test("sampleFramesMp4 emits real stts timestamps per video row") {
    val frames = Multimodal.sampleFramesMp4(Multimodal.syntheticMedia(spark, 12))
      .collect().groupBy(_.media_id)
    assert(frames.keySet == Set(2L, 5L, 8L, 11L))
    for ((id, fs) <- frames) {
      val n = (5 + id % 10).toInt
      assert(fs.sortBy(_.frame_index).map(f => (f.frame_index, f.frame_ts_ms)).toSeq ==
        (0 until n).map(k => (k, k * 40L)), s"media $id")
    }
  }
}
