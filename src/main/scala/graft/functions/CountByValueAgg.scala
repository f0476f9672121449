package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** count_by_value(v) → MAP<v-type, BIGINT>: the histogram fold as an
  * O(distinct) incremental aggregate.
  *
  * This is the streaming-path replacement for the
  * `aggregate(collect_list(v), …)` formulation of the histogram fold:
  * that shape buffers EVERY raw value in the aggregation buffer (and,
  * under a streaming aggregation, in the state store) and only builds
  * the value→count map at output, so a hot bucket's state grows with
  * row count. Here the buffer IS the map — each input row costs one
  * hash upsert, partial buffers merge by adding counts, and both the
  * shuffle payload and the streaming state-store row are proportional
  * to the number of DISTINCT values in the bucket. This matches the
  * reference's per-bucket map state (kairos redis_backend.py:282-286
  * keeps histogram buckets as a Redis hash updated with HINCRBY — one
  * field per distinct value, never a value log).
  *
  * Keys are generic over any orderable atomic type (the engine's
  * read/write casts make histogram values DOUBLE or STRING in
  * practice); serialization round-trips each key through a one-column
  * UnsafeRow so no type is hardcoded. Output entries are sorted by key
  * to match the batch fold's `map_from_entries(array_sort(…))`
  * determinism.
  */
case class CountByValue(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  // atomic keys ONLY: the buffer hashes raw catalyst values, and only
  // atomic types guarantee representation-consistent equals/hashCode
  // (an array key could arrive as UnsafeArrayData on the update path
  // and GenericArrayData after deserialize — logically-equal keys
  // would land as separate map entries with split counts)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // no BinaryType either: Array[Byte] hashes by identity, so
    // equal-bytes keys would split across map entries
    case _: NumericType | _: StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType =>
      TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_by_value needs an atomic key type, got $t")
  }

  @transient private lazy val keyType: DataType = child.dataType
  @transient private lazy val keyProj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](keyType))

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long]()

  override def update(
      buf: java.util.HashMap[Any, Long], input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy: eval may hand back a pointer into a reused row buffer
      val k = InternalRow.copyValue(v)
      buf.put(k, buf.getOrDefault(k, 0L) + 1L)
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[Any, Long],
      other: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.put(e.getKey, buf.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[Any, Long]): Any = {
    val ord = TypeUtils.getInterpretedOrdering(keyType)
    val keys = buf.keySet().toArray.sorted(ord.asInstanceOf[Ordering[AnyRef]])
    val vals = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) { vals(i) = buf.get(keys(i)); i += 1 }
    new ArrayBasedMapData(
      new GenericArrayData(keys.asInstanceOf[Array[Any]]),
      new GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + 32 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val holder = new GenericInternalRow(1)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      holder.update(0, e.getKey)
      val rowBytes = keyProj(holder).getBytes
      out.writeInt(rowBytes.length)
      out.write(rowBytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[Any, Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      val k = InternalRow.copyValue(row.get(0, keyType))
      val c = bb.getLong
      buf.put(k, buf.getOrDefault(k, 0L) + c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountByValue =
    copy(child = newChild)

  override def prettyName: String = "count_by_value"
}
