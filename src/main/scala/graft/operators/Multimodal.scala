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

  /** Deterministic synthetic media table (test stand-in for a real
    * binary-column source such as parquet/webdataset). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val payload = Array.tabulate[Byte](256 + (i % 512).toInt)(j => ((i * 31 + j * 7) % 251).toByte)
      MediaRow(i, kind, payload, 64 + (i % 8).toInt * 16, 64, 16000, 1000L + i % 5000)
    }
  }

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
