package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / resize / frame-sample stages as
  * `mapPartitions` over typed rows.
  *
  * The *codec* is STUBBED — no image/audio libraries exist in this
  * environment — with a deterministic fake (content-hash-seeded features)
  * clearly marked below; everything Spark-side is real and tested: the
  * schema, binary-column handling, partition-batched processing shape
  * (one decoder init per partition, streamed iterator, no
  * collect-to-driver), and the downstream join-ability of the extracted
  * features with [[Similarity]] ops.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float])

  final case class FrameSample(media_id: Long, frame_index: Int, frame_ts_ms: Long)

  // ---- real container headers (see functions.MediaKernels) ----
  // The synthetic payloads carry REAL format headers — PNG IHDR, JPEG
  // SOF0, GIF, BMP, WAV fmt-chunk, MP4 ftyp — followed by deterministic
  // filler, so header parsing is exercised against spec-conformant bytes.

  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def be32(v: Int) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def asciiB(s: String) = s.getBytes("US-ASCII")
  private def filler(n: Int, seed: Long): Array[Byte] =
    Array.tabulate[Byte](n)(j => ((seed * 31 + j * 7) % 251).toByte)

  private[graft] def pngBytes(w: Int, h: Int, pad: Int, seed: Long): Array[Byte] =
    Array[Byte](0x89.toByte) ++ asciiB("PNG") ++
      Array[Byte](0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ asciiB("IHDR") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0) ++ filler(pad, seed)

  private[graft] def jpegBytes(w: Int, h: Int, pad: Int, seed: Long): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      // APP0/JFIF segment (length 16 incl. the 2 length bytes)
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
      asciiB("JFIF") ++ Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0) ++
      // SOF0: length 17, precision 8, height, width, 3 components
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(h) ++ be16(w) ++
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) ++ filler(pad, seed)

  private[graft] def gifBytes(w: Int, h: Int, pad: Int, seed: Long): Array[Byte] =
    asciiB("GIF89a") ++ le16(w) ++ le16(h) ++ filler(pad, seed)

  private[graft] def bmpBytes(w: Int, h: Int, pad: Int, seed: Long): Array[Byte] =
    asciiB("BM") ++ le32(54 + pad) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ filler(pad, seed)

  private[graft] def wavBytes(rate: Int, pad: Int, seed: Long): Array[Byte] =
    asciiB("RIFF") ++ le32(36 + pad) ++ asciiB("WAVE") ++
      asciiB("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(rate) ++
      le32(rate * 2) ++ le16(2) ++ le16(16) ++
      asciiB("data") ++ le32(pad) ++ filler(pad, seed)

  private[graft] def mp4Bytes(pad: Int, seed: Long): Array[Byte] =
    be32(16) ++ asciiB("ftyp") ++ asciiB("isom") ++ be32(512) ++ filler(pad, seed)

  /** Deterministic synthetic media table (test stand-in for a real
    * binary-column source such as parquet/webdataset). Image payloads
    * rotate through PNG/JPEG/GIF/BMP; the header-encoded dimensions equal
    * the declared metadata columns, so the header parser is verifiable
    * against them. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val pad = 200 + (i % 512).toInt
      val w = 64 + (i % 8).toInt * 16
      val h = 64
      val payload = kind match {
        case "image" => (i / 3) % 4 match {
          case 0 => pngBytes(w, h, pad, i)
          case 1 => jpegBytes(w, h, pad, i)
          case 2 => gifBytes(w, h, pad, i)
          case _ => bmpBytes(w, h, pad, i)
        }
        case "audio" => wavBytes(16000, pad, i)
        case _ => mp4Bytes(pad, i)
      }
      MediaRow(i, kind, payload, w, h, 16000, 1000L + i % 5000)
    }
  }

  /** Header-parse stage: REAL multimodal metadata extraction (format
    * sniff + dimensions + sample rate) straight off the binary column,
    * one codegen'd expression per row — no codec, no mapPartitions, no
    * shuffle. This is the honest boundary: container headers are parsed
    * for real ([[graft.functions.MediaKernels]]); pixel/sample decode
    * below stays stubbed. */
  def parseMeta(media: Dataset[MediaRow]): DataFrame =
    media.toDF().select(
      col("media_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      graft.functions.GraftFunctions.media_meta(col("payload")).as("meta"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.sample_rate").as("sample_rate"))

  /** ===== STUB ===== A real implementation decodes payload with an image/
    * audio codec and runs a vision/audio encoder. Here: a deterministic
    * hash-seeded projection of the bytes so tests can assert exact values.
    * The *shape* (dim-`dim` float vector per row, computed inside a
    * partition iterator with per-partition "model" init) is the real
    * contract. */
  private def fakeDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = -3750763034362895579L
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 1099511628211L
      out(i % dim) += ((h >>> 16) & 0xffff).toFloat / 65535.0f
      i += 1
    }
    out
  }

  /** Decode + feature-extract, partition-batched: the per-partition block
    * is where a real codec/encoder would be initialized once and reused —
    * the expensive-init-amortized shape that matters at scale. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init site (real impl: load codec + model weights once)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          fakeDecodeFeatures(r.payload, dim))
      }
    }
  }

  /** Frame sampling for video rows: one row per sampled frame at a fixed
    * stride — pure metadata math (real impl would slice the container). */
  def sampleFrames(media: Dataset[MediaRow], strideMs: Long = 1000L): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0L until r.duration_ms by strideMs).zipWithIndex.map { case (ts, i) =>
        FrameSample(r.media_id, i, ts)
      }
    }
  }

  /** Resize stub: recomputes metadata, passes payload through (real impl:
    * decode → scale → re-encode inside mapPartitions). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => if (r.kind == "image") r.copy(width = w, height = h) else r)
  }

  /** Feature table as a DataFrame (array<float> column) ready for the
    * Similarity/Dedup operators. */
  def featureFrame(media: Dataset[MediaRow], dim: Int = 16): DataFrame =
    extractFeatures(media, dim).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("features"))
}
