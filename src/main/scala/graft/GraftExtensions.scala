package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions._

/** Registers the engine's custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(...)")` works next to the Column API.
  *
  * Two entry points:
  *  - `withExtensions(new GraftExtensions)` at session build time, or
  *  - `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, b) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          b))
    }
    // theta range joins → bucketed equi-joins (kills BroadcastNestedLoop)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinBucketRewrite)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_fingerprint" -> (args => RollingFingerprint(args.head)),
    "simhash64" -> (args => SimHash64(args.head)),
    "cosine_similarity" -> (args => CosineSimilarity(args(0), args(1))),
    "sign_lsh_bucket" -> (args =>
      SignLshBucket(args(0), intArg(args(1), "planes"))),
    "minhash_from_tokens" -> (args =>
      MinHashFromTokens(args(0), intArg(args(1), "k"), intArg(args(2), "numHashes"))),
    "sig_overlap" -> (args => SigOverlap(args(0), args(1))),
    "quant_scale" -> (args => QuantScale(args.head)),
    "quant_int8" -> (args => QuantInt8(args(0), args(1))),
    "cosine_int8" -> (args => CosineInt8(args(0), args(1))),
    "media_meta" -> (args => MediaMeta(args.head)),
    "zorder_key" -> (args =>
      ZOrderKey(args(0), args(1), intArg(args(2), "bitsPer")))
  )

  /** Register on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(spark, name, b)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinBucketRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinBucketRewrite
  }
}
