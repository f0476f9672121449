package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aho-Corasick semantics: the classic suffix-link fixture, overlap
  * counting, distinct-pattern tallies, and the column surface. */
class AcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(text: String, pats: Array[String]): (Long, Long) = {
    val bs = new java.util.BitSet(pats.length)
    val ac = new Kernels.AcAutomaton(pats)
    (ac.run(text, bs), bs.cardinality().toLong)
  }

  test("the textbook he/she/his/hers fixture on 'ushers'") {
    // she and he both end at index 3 (suffix link), hers at 5
    assert(run("ushers", Array("he", "she", "his", "hers")) === ((3L, 3L)))
  }

  test("overlapping matches count every end position") {
    assert(run("aaaa", Array("aa")) === ((3L, 1L)))
    assert(run("abababa", Array("aba")) === ((3L, 1L)))
  }

  test("no match, empty text, pattern repetition in one doc") {
    val pats = Array("cat", "dog")
    assert(run("bird song", pats) === ((0L, 0L)))
    assert(run("", pats) === ((0L, 0L)))
    assert(run("cat dog cat", pats) === ((3L, 2L)))
  }

  test("patterns sharing prefixes stay distinct") {
    assert(run("interested in interest rates",
      Array("interest", "interested")) === ((3L, 2L)))
  }

  test("blocklistColumns: case-insensitive scan, verdict, codegen path") {
    val docs = Seq(
      (1L, "The HASH join was slow"),
      (2L, "clean text only")).toDF("doc_id", "text")
    val out = docs.select((col("doc_id") +:
        graft.ops.TextOps.blocklistColumns(col("text"),
          Seq("Hash", "slow"))): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((2L, 2L, true)))
    assert(out(2L) === ((0L, 0L, false)))
  }
}
