package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Moment accumulator for d-dim vector columns: one pass over the
  * corpus yields (n, Σx, upper triangle of Σxxᵀ) — everything a
  * covariance matrix (and from it PCA/whitening) needs. The buffer is
  * a fixed d + d(d+1)/2 doubles (~17 KB at d=64) regardless of row
  * count: partial buffers on the map side, one addition per merge, so
  * the shuffle carries one buffer per (partition, group) — the same
  * O(1)-state property as [[TopKBuffer]], which is what makes a
  * corpus-wide covariance a single cheap aggregation at 100 TB (the
  * naive explode-(i,j)-groupBy ships d²/2 rows per input row).
  */
final class CovBuffer(val d: Int) {
  var n: Long = 0L
  val sum = new Array[Double](d)
  val upper = new Array[Double](d * (d + 1) / 2) // row-major i<=j

  def add(xs: Array[Double]): Unit = {
    n += 1
    var i = 0
    var u = 0
    while (i < d) {
      val xi = xs(i)
      sum(i) += xi
      var j = i
      while (j < d) {
        upper(u) += xi * xs(j)
        u += 1
        j += 1
      }
      i += 1
    }
  }

  def absorb(o: CovBuffer): Unit = {
    n += o.n
    var i = 0
    while (i < d) { sum(i) += o.sum(i); i += 1 }
    var u = 0
    while (u < upper.length) { upper(u) += o.upper(u); u += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * (sum.length + upper.length))
    bb.putLong(n)
    sum.foreach(bb.putDouble)
    upper.foreach(bb.putDouble)
    bb.array()
  }
}

object CovBuffer {
  def fromBytes(d: Int, bytes: Array[Byte]): CovBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new CovBuffer(d)
    b.n = bb.getLong
    var i = 0
    while (i < b.sum.length) { b.sum(i) = bb.getDouble; i += 1 }
    var u = 0
    while (u < b.upper.length) { b.upper(u) = bb.getDouble; u += 1 }
    b
  }
}

/** cov_accum(vec ARRAY<FLOAT|DOUBLE>, d) → STRUCT<n BIGINT,
  * sum ARRAY<DOUBLE>, upper ARRAY<DOUBLE>>: the one-row moment
  * summary of the corpus. Rows of the wrong width OR containing null
  * elements are malformed DATA — skipped, never folded in (a null
  * slot must not pollute the corpus moments) and never a task error. */
case class CovAccum(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovBuffer] with UnaryLike[Expression] {

  // the documented dims ceiling (see Pca.MaxDims): past it the
  // d(d+3)/2-double buffer stops being "one small row per partition"
  // (d=4096 → ~67 MB per partial) and the driver Jacobi stalls
  require(d >= 1 && d <= graft.ops.Pca.MaxDims,
    s"cov_accum: dims=$d outside [1, ${graft.ops.Pca.MaxDims}] — " +
      "the moment buffer is d(d+3)/2 doubles per partial and the " +
      "downstream eigensolve is a driver O(d^3) Jacobi; reduce " +
      "dimensionality (random projection / PCA on a slice) first")


  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("upper", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cov_accum needs ARRAY<FLOAT> or ARRAY<DOUBLE>, got $t")
  }

  @transient private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): CovBuffer = new CovBuffer(d)

  override def update(buf: CovBuffer, input: InternalRow): CovBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val xs = v.asInstanceOf[ArrayData]
      // wrong-width rows and rows with null slots are DATA, skipped
      if (xs.numElements() == d) {
        val arr = new Array[Double](d)
        var ok = true
        var i = 0
        while (ok && i < d) {
          if (xs.isNullAt(i)) ok = false
          else {
            arr(i) = if (elemIsDouble) xs.getDouble(i)
                     else xs.getFloat(i).toDouble
            i += 1
          }
        }
        if (ok) buf.add(arr)
      }
    }
    buf
  }

  override def merge(buf: CovBuffer, other: CovBuffer): CovBuffer = {
    buf.absorb(other); buf
  }

  override def eval(buf: CovBuffer): Any =
    new GenericInternalRow(Array[Any](buf.n,
      new GenericArrayData(buf.sum.map(x => x: Any)),
      new GenericArrayData(buf.upper.map(x => x: Any))))

  override def serialize(buf: CovBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CovBuffer =
    CovBuffer.fromBytes(d, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CovAccum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovAccum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CovAccum =
    copy(child = newChild)

  override def prettyName: String = "cov_accum"
}
