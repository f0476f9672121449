package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout: Morton (z-order) interleaving so
  * parquet min/max stats prune on EITHER filter dimension — the
  * data-skipping layout Delta's OPTIMIZE ZORDER popularized (public
  * technique; Morton 1966). A range-sorted layout prunes only its
  * leading sort column; at 100 TB, "filter by time" AND "filter by
  * entity" on the same table otherwise needs two copies.
  *
  * The z-value is computed with the classic 5-mask bit-spread — pure
  * codegen'd Column bitwise ops, no UDF. Inputs must be non-negative
  * and < 2^31 (rank/bucket ids, epoch-second buckets, hash buckets);
  * map real domains onto that range first (e.g. `sec - min_sec`,
  * `xxhash64(user) & 0x7FFFFFFF`).
  */
object Layout {

  /** Spread the low 32 bits of `c` to the even bit positions of a
    * 64-bit value. */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two dimension values in [0, 2^31): `a`'s
    * bits land in the odd positions, `b`'s in the even — nearby (a,b)
    * pairs get nearby z-values, so a file of consecutive z-values
    * covers a small rectangle in (a,b) space and its parquet min/max
    * footer excludes it from most range filters on either dimension. */
  def zValue(a: Column, b: Column): Column =
    shiftleft(spread(a.cast("long")), 1)
      .bitwiseOR(spread(b.cast("long")))

  /** Write `df` z-ordered on (a, b) into `numFiles` range-partitioned,
    * internally-sorted parquet files. The z column is dropped before
    * writing (projection after the sort is narrow — ordering is
    * preserved into the files). */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int): Unit =
    df.withColumn("__z", zValue(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
