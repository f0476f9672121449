package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Cap-bounded collection buffer: a TreeMap of (sortKey, payload) →
  * multiplicity holding the `cap` SMALLEST entries seen so far. Every
  * stage is O(cap): inserts past the cap evict from the largest end,
  * partial buffers merge by re-offering entries, so neither the
  * aggregation buffer nor — under a streaming aggregation — the state
  * store row can outgrow `cap` regardless of how hot the bucket is. */
final class BoundedCollectBuf(val cap: Int, ord: Ordering[(Any, Any)],
    distinct: Boolean) {
  val entries = new java.util.TreeMap[(Any, Any), java.lang.Long](
    ord: java.util.Comparator[(Any, Any)])
  private var total = 0L

  def add(k: Any, p: Any, c: Long): Unit = {
    val key = (k, p)
    if (distinct) {
      if (!entries.containsKey(key)) {
        // don't even insert entries past a full buffer's largest
        if (total < cap || ord.lt(key, entries.lastKey())) {
          entries.put(key, 1L)
          total += 1
          trim()
        }
      }
    } else {
      entries.merge(key, c, (a, b) => a + b)
      total += c
      trim()
    }
  }

  private def trim(): Unit = {
    while (total > cap) {
      val last = entries.lastEntry()
      val over = total - cap
      if (last.getValue <= over) {
        total -= last.getValue
        entries.remove(last.getKey)
      } else {
        entries.put(last.getKey, last.getValue - over)
        total -= over
      }
    }
  }

  def absorb(o: BoundedCollectBuf): Unit = {
    val it = o.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.getKey._1, e.getKey._2, e.getValue)
    }
  }

  /** Payloads in (sortKey, payload) ascending order, with
    * multiplicity (1 per entry in distinct mode by construction). */
  def toArrayData: GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue.longValue()
      while (c > 0) { out += e.getKey._2; c -= 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

/** bounded_collect(sortKey, payload) → ARRAY<payload>: the `cap`
  * smallest entries by (sortKey asc, payload asc) — with multiplicity,
  * or distinct payload-witnesses when `distinct` — emitted in that
  * order. The STATE-BOUNDED fold behind the streaming series/set cap
  * knob ([[graft.streaming.StreamingIngest.aggregateStream]]'s
  * `bucketElemCap`): the plain folds' state grows with bucket
  * contents (bounded only by the watermark TTL), so one hostile hot
  * bucket can balloon a state-store row; with the cap the buffer — and
  * the state row — is O(cap) at every stage, and the kept subset is
  * DETERMINISTIC (the order-smallest entries, independent of arrival
  * and merge order — a replay folds to the identical array).
  *
  * With `cap` ≥ the true bucket size the result is exactly the
  * uncapped fold: series (`sortKey`=ord, `distinct`=false) matches
  * `transform(array_sort(collect_list(struct(ord, value))), …)` and
  * set (`sortKey`=payload, `distinct`=true) matches
  * `array_sort(collect_set(value))` — both sort by the same
  * (sortKey, payload) total order this keeps its smallest prefix of.
  * Null sort keys or payloads are skipped, like `collect_set` /
  * `collect_list` over a bare column. Note one asymmetry against the
  * STRUCT-wrapped series fold: `collect_list(struct(ord, value))`
  * keeps an entry whose `value` FIELD is null (the struct itself is
  * non-null, so collect_list's top-level null skip never sees it),
  * while this aggregate drops it — so a capped series fold over
  * null-bearing input is the uncapped fold of its non-null entries
  * (see SeriesType.foldExprCapped's contract note). */
case class BoundedCollect(
    sortKey: Expression,
    payload: Expression,
    cap: Int,
    distinct: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectBuf]
  with BinaryLike[Expression] {

  require(cap > 0, s"bounded_collect needs cap > 0, got $cap")

  override def left: Expression = sortKey
  override def right: Expression = payload

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val k = TypeUtils.checkForOrderingExpr(sortKey.dataType, prettyName)
    if (k.isFailure) k
    else TypeUtils.checkForOrderingExpr(payload.dataType, prettyName)
  }

  @transient private lazy val entryOrd: Ordering[(Any, Any)] = {
    val kOrd = TypeUtils.getInterpretedOrdering(sortKey.dataType)
    val pOrd = TypeUtils.getInterpretedOrdering(payload.dataType)
    new Ordering[(Any, Any)] {
      def compare(a: (Any, Any), b: (Any, Any)): Int = {
        val c = kOrd.compare(a._1, b._1)
        if (c != 0) c else pOrd.compare(a._2, b._2)
      }
    }
  }

  @transient private lazy val rowProj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](sortKey.dataType, payload.dataType))

  override def createAggregationBuffer(): BoundedCollectBuf =
    new BoundedCollectBuf(cap, entryOrd, distinct)

  override def update(buf: BoundedCollectBuf,
      input: InternalRow): BoundedCollectBuf = {
    val k = sortKey.eval(input)
    val p = payload.eval(input)
    if (k != null && p != null)
      buf.add(InternalRow.copyValue(k), InternalRow.copyValue(p), 1L)
    buf
  }

  override def merge(buf: BoundedCollectBuf,
      other: BoundedCollectBuf): BoundedCollectBuf = {
    buf.absorb(other); buf
  }

  override def eval(buf: BoundedCollectBuf): Any = buf.toArrayData

  override def serialize(buf: BoundedCollectBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + 48 * buf.entries.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.entries.size)
    val holder = new GenericInternalRow(2)
    val it = buf.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      holder.update(0, e.getKey._1)
      holder.update(1, e.getKey._2)
      val rowBytes = rowProj(holder).getBytes
      out.writeInt(rowBytes.length)
      out.write(rowBytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      val k = InternalRow.copyValue(row.get(0, sortKey.dataType))
      val p = InternalRow.copyValue(row.get(1, payload.dataType))
      buf.add(k, p, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedCollect =
    copy(sortKey = newLeft, payload = newRight)

  override def prettyName: String = "bounded_collect"
}
