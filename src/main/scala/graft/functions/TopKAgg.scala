package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-heap of the k strongest (score, id) pairs, ordered by
  * (score desc, id asc) — id breaks score ties, matching
  * `ROW_NUMBER() OVER (ORDER BY score DESC, id ASC)` exactly (including
  * IEEE total order on doubles via `Double.compare`: -0.0 < 0.0, NaN last,
  * the same ordering Spark's sort uses). The heap root is the *weakest*
  * retained pair, so insert is O(log k) and memory is O(k) regardless of
  * input size.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](math.max(k, 1))
  val ids = new Array[Long](math.max(k, 1))
  var size = 0

  /** (s1, i1) strictly weaker than (s2, i2) in the top-k order. */
  private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  def insert(s: Double, id: Long): Unit = {
    if (k == 0) return
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up: move below any parent it is weaker than
      while (i > 0 && weaker(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (weaker(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var continue = true
    while (continue) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var w = i // index of weakest among i and children
      if (l < size && weaker(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && weaker(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) continue = false
      else { swap(i, w); i = w }
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Retained pairs sorted strongest-first: (score desc, id asc). */
  def sortedPairs(): Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }
  }
}

/** Partial-aggregatable exact top-k: `top_k_by_score(score, id, k)` →
  * `array<struct<score double, id bigint>>`, strongest first.
  *
  * The scale story vs a ranking window: `row_number().over(partitionBy(q))`
  * shuffles EVERY scored row into one reducer per query — at a 100 TB
  * corpus each query partition is the whole corpus. This aggregate
  * map-side combines: each task reduces its partition to a k-entry heap,
  * so shuffled bytes are `numPartitions × numGroups × k` entries, constant
  * in corpus size. Null scores/ids are ignored (cannot rank).
  */
case class TopKByScore(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k >= 0, "k must be non-negative")

  override def prettyName: String = "top_k_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val pairs = buf.sortedPairs()
    new GenericArrayData(pairs.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) {
      h.insert(bb.getDouble, bb.getLong)
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByScore =
    copy(left = l, right = r)
}
