package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** k-bounded top-k heap: the aggregation buffer behind [[TopKByScore]].
  *
  * A binary heap over parallel primitive arrays with the WORST retained
  * entry at the root, so an incoming row costs O(1) when it can't make
  * the cut and O(log k) when it can. Memory is O(k) regardless of how
  * many rows a partition feeds it — the property that makes distributed
  * top-k safe at 100 TB (a collect_list-then-slice buffer is O(rows per
  * partition) and degrades to materialize-everything at scale).
  *
  * Ordering matches the engine's deterministic top-k contract: higher
  * score first, ties broken by ascending id; doubles compare by the
  * same total order Spark sorts by (NaN greatest-score-wins is excluded
  * by comparing on the negated score, so NaN scores rank WORST, exactly
  * like the `sort by struct(-score, id)` formulation this replaces).
  */
final class TopKBuffer(val k: Int) {
  private var n = 0
  private val scores = new Array[Double](math.max(k, 1))
  private val ids = new Array[Long](math.max(k, 1))

  /** Total order: negative = a ranks strictly better than b. */
  @inline private def cmp(sa: Double, ia: Long, sb: Double, ib: Long): Int = {
    val c = java.lang.Double.compare(-sa, -sb)
    if (c != 0) c else java.lang.Long.compare(ia, ib)
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  // heap invariant: parent ranks no better than its children (worst at root)
  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (cmp(scores(i), ids(i), scores(p), ids(p)) > 0) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var worst = i
      if (l < n && cmp(scores(l), ids(l), scores(worst), ids(worst)) > 0) worst = l
      if (r < n && cmp(scores(r), ids(r), scores(worst), ids(worst)) > 0) worst = r
      if (worst == i) return
      swap(i, worst)
      i = worst
    }
  }

  def offer(s: Double, id: Long): Unit = {
    if (k <= 0) return
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (cmp(s, id, scores(0), ids(0)) < 0) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  def absorb(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { offer(o.scores(i), o.ids(i)); i += 1 }
  }

  /** Entries best-first as ARRAY<STRUCT<score, vec_id>> rows. */
  def toSortedArrayData: GenericArrayData = {
    val idx = Array.range(0, n).sortWith { (a, b) =>
      cmp(scores(a), ids(a), scores(b), ids(b)) < 0
    }
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](scores(i), ids(i))): Any
    })
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < m) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}

/** top_k(score DOUBLE, id BIGINT) → ARRAY<STRUCT<score, vec_id>>:
  * the k best (score desc, id asc) rows of the group, computed with an
  * O(k) buffer at every stage — partial heaps on the map side, heap
  * merge on the reduce side (TypedImperativeAggregate runs under
  * ObjectHashAggregate with partial aggregation, so the shuffle carries
  * one k-sized buffer per (partition, key), never the scored rows). */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"top_k needs k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("vec_id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        TypeCheckResult.TypeCheckFailure(s"top_k needs (DOUBLE, BIGINT), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.absorb(other); buf
  }

  override def eval(buf: TopKBuffer): Any = buf.toSortedArrayData

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "top_k"
}
