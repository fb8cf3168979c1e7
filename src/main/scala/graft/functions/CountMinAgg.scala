package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms '05): a
  * `depth × width` counter matrix; each item increments one counter per
  * row, the point estimate is the MIN over rows. Never underestimates;
  * overestimates by ≤ ε·N (ε = e/width) with probability 1−δ (δ = e^−depth).
  * Merge is element-wise add — exactly mergeable, so the aggregate
  * map-side combines like a sum and shuffled bytes are
  * `numPartitions × depth × width × 8`, constant in row count: the
  * frequency-table shape for a 100 TB token stream whose distinct set
  * would itself be too big to shuffle.
  *
  * The input is the PRE-HASHED bucket vector (`array<long>`, one bucket
  * index per sketch row), built with ordinary codegen'd expressions —
  * the `graft` pairing uses md5-prefix buckets, which DuckDB replays
  * verbatim, so the whole sketch and its estimates are oracle-checkable
  * bit-exact (unlike engine-opaque HLL/approx_percentile state).
  */
final class CMSketch(val depth: Int, val width: Int) {
  val counters = new Array[Long](depth * width)

  def add(buckets: ArrayData): Unit = {
    var i = 0
    while (i < depth) {
      counters(i * width + buckets.getLong(i).toInt) += 1L
      i += 1
    }
  }

  def mergeFrom(other: CMSketch): Unit = {
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
  }
}

/** `count_min_build(buckets, depth, width)` → array<long> of
  * depth×width counters (row-major). `buckets(i)` must already be in
  * [0, width) — the caller owns the hash family. */
case class CountMinBuild(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CMSketch] with UnaryLike[Expression] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def prettyName: String = "count_min_build"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CMSketch = new CMSketch(depth, width)

  override def update(buf: CMSketch, input: InternalRow): CMSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: CMSketch, other: CMSketch): CMSketch = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: CMSketch): Any = new GenericArrayData(buf.counters)

  override def serialize(buf: CMSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.counters.length * 8)
    buf.counters.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CMSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new CMSketch(depth, width)
    var i = 0
    while (i < s.counters.length) { s.counters(i) = bb.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinBuild =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinBuild =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CountMinBuild =
    copy(child = newChild)
}
