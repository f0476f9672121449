package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the Gopher repetition kernel: line
  * duplicate fractions, gram char-mass numerators/denominators, the
  * 1.0 cap on overlapping repeats, and the zero-denominator edges. */
class RepetitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def stats(text: String): (Double, Double, Double, Double) = {
    import spark.implicits._
    val r = Seq(text).toDF("text")
      .select(TextOps.repetitionColumns(col("text")): _*).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("duplicate lines: occurrences beyond the first, char-weighted") {
    // lines: [aa, b, aa, aa] → 2 of 4 are repeats; repeat chars 4 of 7
    val (dl, dlc, _, _) = stats("aa\nb\naa\naa")
    assert(dl === 0.5)
    assert(dlc === 4.0 / 7.0)
  }

  test("top 2-gram mass: count × gram length over normalized length") {
    // toks [a,b,a,b,a]: "a b"×2, "b a"×2, len 3 → mass 6; norm 9
    val (_, _, top2, dup5) = stats("a b a b a")
    assert(top2 === 6.0 / 9.0)
    assert(dup5 === 0.0) // single 5-gram, no repeat
  }

  test("dup 5-gram mass counts repeats beyond the first") {
    // separator x breaks the chain: only [c d e f g] repeats (offsets
    // 0 and 6), len 9 → dup mass (2-1)*9 = 9; norm 21
    val (_, _, _, dup5) = stats("c d e f g x c d e f g")
    assert(dup5 === 9.0 / 21.0)
  }

  test("overlapping repeats cap at 1.0") {
    // "a a a a a a": 2-gram "a a" ×5, len 3 → mass 15 > norm 11
    val (_, _, top2, _) = stats("a a a a a a")
    assert(top2 === 1.0)
  }

  test("zero denominators (empty text) yield 0.0 across the board") {
    assert(stats("") === ((0.0, 0.0, 0.0, 0.0)))
  }

  test("clean doc: line/dup metrics zero; top2 is the longest gram mass") {
    // norm len 27; 2-grams all count 1 → max mass = len("three four")=10
    val (dl, dlc, top2, dup5) = stats("one two three four five six")
    assert((dl, dlc, dup5) === ((0.0, 0.0, 0.0)))
    assert(top2 === 10.0 / 27.0)
  }
}
