package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed range (interval) join. Spark plans a bare
  * `p.x BETWEEN iv.lo AND iv.hi` predicate as a broadcast
  * nested-loop join — O(|points| × |intervals|) compares, the classic
  * scale killer. The standard fix: quantize the value axis into
  * fixed-width buckets, explode each interval over the buckets it
  * covers, tag each point with its single bucket, and EQUALITY-join
  * on (keys…, bucket) before the exact BETWEEN filter. Each (point,
  * interval) pair meets in exactly one bucket (the point's), so the
  * output needs no dedup; cost is one shuffle on derived keys plus
  * ⌈width/bucketWidth⌉ + 1 replicated rows per interval.
  *
  * `bucketWidth` tunes replication against bucket occupancy — set it
  * near the TYPICAL interval width (≈1 extra row per interval; a
  * point's bucket then holds only intervals that plausibly contain
  * it). Pathologically wide intervals (≫ bucketWidth) replicate
  * proportionally — cap them upstream or raise the width.
  */
object RangeJoin {

  /** Inner join of `points` (value column `point`) against
    * `intervals` (closed interval [`lo`, `hi`]), equal `keys` on both
    * sides. Output carries every column of both frames (column names
    * must not collide apart from `keys`). Intervals with lo > hi or a
    * null bound match nothing. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], point: String, lo: String, hi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucket(c: Column): Column = floor(c / bucketWidth).cast(LongType)
    val ib = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__b", explode(sequence(bucket(col(lo)), bucket(col(hi)))))
    val pb = points.filter(col(point).isNotNull)
      .withColumn("__b", bucket(col(point)))
    pb.join(ib, keys :+ "__b")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__b")
  }
}
