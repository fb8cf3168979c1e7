package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: at most `k` counters; a full
  * summary decrements every counter when an untracked item arrives, so
  * any item with true frequency > n/(k+1) is GUARANTEED to survive, and
  * every estimate undercounts by at most n/(k+1) (Misra & Gries 1982;
  * merge rule per Agarwal et al., "Mergeability of Summaries", PODS'12:
  * sum counters, then subtract the (k+1)-largest count and drop the
  * non-positive — error stays ≤ n/(k+1) through any merge tree).
  *
  * The 100 TB pattern is candidates-then-verify: this aggregate finds a
  * ≤k-item candidate superset of the heavy hitters in ONE pass with k
  * counters of state per task (a full `groupBy(token)` would shuffle
  * every distinct token), then a second exact pass recounts only the
  * candidates — making the composed result exact and engine-checkable.
  */
final class MGSummary(val k: Int) {
  val counts = new java.util.HashMap[UTF8String, Long]()

  def add(item: UTF8String, w: Long): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + w)
    else if (counts.size < k) counts.put(item.clone(), w)
    else {
      // decrement all by the new item's weight (batched MG step); the
      // new item is "absorbed" by the same amount
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - w
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
  }

  def mergeFrom(other: MGSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != 0L || counts.containsKey(e.getKey)) counts.put(e.getKey, cur + e.getValue)
      else counts.put(e.getKey, e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤ 0
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0L) eit.remove() else e.setValue(nv)
      }
    }
  }
}

/** `heavy_hitters(item, k)` → array<struct<item string, est bigint>>
  * sorted (est desc, item asc). Estimates undercount by ≤ n/(k+1);
  * the retained set is a superset of all items with true count
  * > n/(k+1). Null items are skipped. */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  require(k >= 1, "k must be positive")

  override def prettyName: String = "heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MGSummary): Any = {
    val entries = new Array[(UTF8String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortWith { case ((i1, c1), (i2, c2)) =>
      c1 > c2 || (c1 == c2 && i1.compareTo(i2) < 0)
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MGSummary): Array[Byte] = {
    var bytes = 4
    val it0 = buf.counts.keySet().iterator()
    while (it0.hasNext) bytes += 4 + it0.next().numBytes() + 8
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new MGSummary(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      s.counts.put(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
