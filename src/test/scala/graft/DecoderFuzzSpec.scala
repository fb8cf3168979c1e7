package graft

import scala.util.Random

import graft.functions.MediaKernels
import graft.operators.{JpegCodec, Mp4Codec, Multimodal}

/** Seeded mutation fuzzing over every binary-payload parser: random byte
  * flips and random truncations of valid payloads must either decode or
  * refuse (None / null-field rows) — NEVER throw. This is the decoder
  * contract the whole multimodal path rests on: one corrupt payload in a
  * 100 TB corpus must not kill a Spark job, and the ADVICE-r9 findings
  * (unguarded segment bodies in JPEG/WAV) showed hand-written bound
  * checks need adversarial coverage, not just the happy-path specs. */
class DecoderFuzzSpec extends SparkSpec {

  private val bases: Seq[(String, Array[Byte])] = Seq(
    "bmp" -> Multimodal.bmpBytes(32, 64, ((32 * 3 + 3) / 4) * 4 * 64, 11L),
    "png" -> Multimodal.pngBytes(32, 64, 0, 12L),
    "gif" -> Multimodal.gifBytes(32, 64, 0, 13L),
    "jpeg" -> JpegCodec.encodeBlockMean(32, 32, Array.fill[Byte](32 * 32 * 3)(77.toByte)),
    "jpeg_hdr" -> Multimodal.jpegBytes(32, 64, 300, 14L),
    "wav" -> Multimodal.wavBytes(16000, 400, 15L),
    "mp4" -> Multimodal.mp4FullBytes(96, 64, 16L),
    "mjpeg" -> Multimodal.mp4MjpegBytes(64, 32, 17L))

  /** Every parser the engine exposes to untrusted bytes, one call site. */
  private def throwNothing(b: Array[Byte], ctx: String): Unit = {
    try {
      Multimodal.decodeRgb(b).foreach { case (w, h, rgb) =>
        assert(w > 0 && h > 0 && rgb.length == w * h * 3, ctx)
      }
      Multimodal.wavPcmFeatures(b, 16).foreach(f => assert(f.length == 16, ctx))
      Mp4Codec.parse(b).foreach { info =>
        Mp4Codec.mp4Features(b, 16).foreach(f => assert(f.length == 16, ctx))
        // frame expansion on whatever parsed must terminate and be bounded
        assert(Mp4Codec.frameTimesMs(info).size <= info.sampleSizes.length, ctx)
        // byte-range expansion must stay inside the mutated payload and
        // whatever it hands the JPEG decoder must decode-or-refuse
        Mp4Codec.sampleRanges(info, b.length.toLong).foreach { ranges =>
          assert(ranges.length == info.sampleSizes.length, ctx)
          for ((off, sz) <- ranges) {
            // overflow-safe form: off + sz would wrap for a forged co64
            // offset near Long.MaxValue and let a bad range pass silently
            assert(off >= 0 && sz >= 0 && sz <= b.length && off <= b.length - sz, ctx)
            JpegCodec.decodeRgb(
              java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt))
          }
        }
      }
      MediaKernels.parse(b) // struct row or nulls, never a throw
    } catch {
      case e: AssertionError => throw e
      case e: Throwable =>
        fail(s"$ctx threw ${e.getClass.getName}: ${e.getMessage}")
    }
  }

  test("random byte flips never throw in any decoder") {
    for ((name, base) <- bases) {
      val rnd = new Random(base.length * 31L + name.hashCode)
      for (trial <- 0 until 300) {
        val b = base.clone()
        val flips = 1 + rnd.nextInt(8)
        for (_ <- 0 until flips)
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        throwNothing(b, s"$name trial $trial")
      }
    }
  }

  test("random truncations never throw in any decoder") {
    for ((name, base) <- bases) {
      val rnd = new Random(name.hashCode * 7L)
      for (trial <- 0 until 150) {
        val keep = rnd.nextInt(base.length + 1)
        throwNothing(base.take(keep), s"$name truncated to $keep")
        // truncation plus one flip — corrupt length fields pointing past
        // a shortened payload is the classic over-read shape
        val b = base.take(math.max(keep, 8))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        throwNothing(b, s"$name truncated+flipped at $keep")
      }
    }
  }

  test("forged co64 offset near Long.MaxValue cannot wrap the range check") {
    // a crafted chunk offset where off + sz overflows Long: the naive
    // `off + sz > fileLen` bound wraps negative and ADMITS the range,
    // which decodeMjpegFrames would then hand to Arrays.copyOfRange —
    // an uncaught executor throw on untrusted bytes (ADVICE r10)
    val base = Mp4Codec.parse(Multimodal.mp4MjpegBytes(64, 32, 21L)).get
    val forged = base.copy(
      stscRuns = Array((1L, base.sampleSizes.length.toLong)),
      chunkOffsets = Array(Long.MaxValue - 1))
    assert(Mp4Codec.sampleRanges(forged, 10000L).isEmpty,
      "wrapped off+sz must refuse, not admit an out-of-file range")
    // and a size that alone exceeds the file must refuse even at off 0
    val bigSz = base.copy(
      stscRuns = Array((1L, 1L)),
      sampleSizes = Array(0xFFFFFFFFL),
      sampleDeltas = Array((1L, 1L)),
      chunkOffsets = Array(0L))
    assert(Mp4Codec.sampleRanges(bigSz, 10000L).isEmpty)
  }

  test("forged constant-size stsz cannot amplify allocation") {
    val base = Multimodal.mp4FullBytes(64, 64, 3L)
    // box body after the fourcc: verflags +4..7, sample_size +8..11,
    // sample_count +12..15 (offsets from the fourcc position)
    val stsz = base.indexOfSlice("stsz".getBytes("US-ASCII"))
    val forged = base.clone()
    // sample_size := 1, sample_count := 2^20 — a 20-byte box demanding a
    // MaxEntries array; n·const > payload length must refuse
    forged(stsz + 11) = 1
    forged(stsz + 12) = 0x00; forged(stsz + 13) = 0x10
    forged(stsz + 14) = 0x00; forged(stsz + 15) = 0x00
    assert(Mp4Codec.parse(forged).isEmpty)
    // a plausible const-size table (count consistent with the file) parses
    val small = base.clone()
    small(stsz + 11) = 2 // const 2, keep builder count (5 + 3%10 = 8)
    val p = Mp4Codec.parse(small)
    assert(p.nonEmpty && p.get.sampleSizes.toSeq == Seq.fill(8)(2L))
  }
}
