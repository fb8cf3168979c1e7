package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Blocked bloom filter over 64-bit key hashes — the join-reduction
  * sketch: build once over the SMALL side's keys, probe the BIG side's
  * scan with a codegen'd expression, and only the survivors reach the
  * join shuffle. At 100 TB the probe deletes the dominant cost (shuffling
  * fact rows that can never match); the residual exact join removes the
  * false positives, so composed results are EXACT.
  *
  * Bits are set by Kirsch–Mitzenmacher double hashing: bitᵢ = h₁ + i·h₂
  * (mod m) — k index derivations from one 64-bit input hash, no rehash
  * per probe. Merge is word-wise OR, so the aggregate map-side combines
  * like any sum: shuffled bytes are `numPartitions × m/8`, constant in
  * row count.
  */
final class BloomBits(val numBits: Int, val numHashes: Int) {
  val words = new Array[Long]((numBits + 63) >>> 6)

  def add(h: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val bit = BloomKernel.index(h, i, numBits)
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mergeFrom(other: BloomBits): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

object BloomKernel {
  /** i-th probe index for input hash `h` over `m` bits. h2 is forced odd
    * so successive probes walk the whole bit space. */
  def index(h: Long, i: Int, m: Int): Int = {
    val h2 = (h >>> 32) | 1L
    val combined = h + i.toLong * h2
    // floor-mod to a non-negative index
    ((combined % m + m) % m).toInt
  }

  /** Probe: all k bits set? `words` comes in as a codegen reference
    * object — one static call per row from whole-stage codegen. */
  def mightContain(h: Long, words: Array[Long], numBits: Int, numHashes: Int): Boolean = {
    var i = 0
    while (i < numHashes) {
      val bit = index(h, i, numBits)
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_build(hash, numBits, numHashes)` → array<long> filter words.
  * Input is a 64-bit hash column (pair with `xxhash64(key)`; the probe
  * side must apply the identical hash). */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBits] with UnaryLike[Expression] {

  require(numBits > 0 && numHashes > 0, "numBits and numHashes must be positive")

  override def prettyName: String = "bloom_build"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BloomBits = new BloomBits(numBits, numHashes)

  override def update(buf: BloomBits, input: InternalRow): BloomBits = {
    val h = child.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomBits, other: BloomBits): BloomBits = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: BloomBits): Any = new GenericArrayData(buf.words)

  override def serialize(buf: BloomBits): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.words.length * 8)
    buf.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBits = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BloomBits(numBits, numHashes)
    var i = 0
    while (i < b.words.length) { b.words(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuild =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuild =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
}

/** `bloom_might_contain(hash)` against a driver-built word array (baked
  * in as a codegen reference object, like a broadcast). False positives
  * possible, false negatives never. */
case class BloomMightContain(
    child: Expression,
    words: Array[Long],
    numBits: Int,
    numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(input: Any): Any =
    BloomKernel.mightContain(input.asInstanceOf[Long], words, numBits, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomKernel.mightContain($c, $ref, $numBits, $numHashes)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
