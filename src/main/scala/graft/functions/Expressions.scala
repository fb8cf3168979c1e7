package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels invoked from both interpreted eval and generated Java code.
  * Keeping the loop in one static method means whole-stage codegen emits a
  * single call (no per-element Catalyst expression overhead) and the
  * interpreted path cannot drift from the codegen path.
  */
object HashKernels {

  /** FNV-1a 64-bit over UTF-8 bytes — the document fingerprint. */
  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = -3750763034362895579L // 14695981039346656037 as signed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over an array of string tokens: per-token FNV-1a,
    * per-bit majority vote. Near-duplicate texts land within a small
    * Hamming distance. */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Cosine similarity of two float vectors, accumulated in double in
    * index order — bit-reproducible across engines (mirrors the DuckDB
    * oracle's `list_inner_product(CAST(.. AS DOUBLE[]))` composition).
    * Zero-norm vectors yield 0.0. */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** FNV-1a rolling fingerprint of a string column → long. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.fnv1a(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.fnv1a($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string> token column → long. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Cosine similarity of two array<float> columns → double. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.cosineFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.cosineFF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Column-level API for the custom expressions. */
object GraftFunctions {
  def rolling_fingerprint(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(RollingFingerprint(org.apache.spark.sql.graft.Bridge.expression(c)))
  def simhash64(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(SimHash64(org.apache.spark.sql.graft.Bridge.expression(c)))
  def cosine_similarity(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CosineSimilarity(org.apache.spark.sql.graft.Bridge.expression(a), org.apache.spark.sql.graft.Bridge.expression(b)))
}
