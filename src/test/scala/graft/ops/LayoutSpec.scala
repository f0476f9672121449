package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Morton-code arithmetic and the measured data-skipping claim: a
  * z-ordered layout prunes row groups on BOTH dimensions where a
  * single-column sort prunes only its leading column. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("zValue interleaves bits: a odd positions, b even") {
    import spark.implicits._
    val got = Seq((3L, 0L), (0L, 3L), (1L, 1L), (2L, 1L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a=0b11,b=0b00 → 0b1010; a=0b00,b=0b11 → 0b0101;
    // a=1,b=1 → 0b11; a=0b10,b=0b01 → 0b1001
    assert(got === Seq(10L, 5L, 3L, 9L))
  }

  test("zValue is monotone-rectangular: prefixes share z ranges") {
    import spark.implicits._
    // all points with a,b in [0,4) have z < 16; any point with a >= 4
    // or b >= 4 has z >= 16 — the quadrant property pruning relies on
    val df = spark.range(64).select(
      (col("id") / 8).cast("long").as("a"), (col("id") % 8).as("b"))
    val z = df.select(col("a"), col("b"),
      Layout.zValue(col("a"), col("b")).as("z")).collect()
    z.foreach { r =>
      val inQuad = r.getLong(0) < 4 && r.getLong(1) < 4
      assert((r.getLong(2) < 16) === inQuad, r)
    }
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("measured: z-order prunes row groups on the second dimension") {
    import spark.implicits._
    val n = 200000L
    // two independent uniform dims in [0, 1024)
    val df = spark.range(n).select(
      (xxhash64(col("id")).bitwiseAND(lit(0x7FFFFFFFL)) % 1024).as("x"),
      (xxhash64(col("id"), lit(1)).bitwiseAND(lit(0x7FFFFFFFL)) % 1024).as("y"),
      col("id"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(df, s"$dir/z", col("x"), col("y"), numFiles = 64)
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/xsort")

    def q(path: String) = spark.read.parquet(path)
      .filter(col("y") >= 100 && col("y") < 132) // ~3% of y space
    val zRows = scanRows(q(s"$dir/z"))
    val xRows = scanRows(q(s"$dir/xsort"))
    // x-sorted layout: every file spans all of y → nothing prunes.
    // z-ordered: most files' y min/max excludes the range.
    assert(xRows === n, s"x-sorted should scan everything, got $xRows")
    assert(zRows < n / 2, s"z-order should prune >half the rows, got $zRows")
    // same answer either way
    assert(q(s"$dir/z").count() === q(s"$dir/xsort").count())
  }
}
