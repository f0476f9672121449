package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for the Gopher document-quality rules
  * ([[TextOps.gopherColumns]], Rae et al. 2021 A1.1) and the C4
  * line-level cleaner ([[TextOps.c4CleanColumns]], Raffel et al. 2020
  * §2.2): every rule is exercised individually on strings small
  * enough to count by hand, then the composite verdicts at their
  * boundaries. */
class QualityRulesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def gopher(text: String): Map[String, Any] = {
    import spark.implicits._
    val row = Seq(text).toDF("t")
      .select(TextOps.gopherColumns(col("t")): _*).head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  private def c4(text: String): Map[String, Any] = {
    import spark.implicits._
    val row = Seq(text).toDF("t")
      .select(TextOps.c4CleanColumns(col("t")): _*).head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("gopher: word count, mean word length, alpha fraction") {
    val g = gopher("aa bb cc")
    assert(g("n_words") == 3L)
    assert(g("mean_word_len") == 2.0)
    assert(g("alpha_word_frac") == 1.0)
    assert(g("sym_word_ratio") == 0.0)
    assert(g("n_req_stopwords") == 0L)
    assert(g("gopher_keep") == 0) // n_words < 50
  }

  test("gopher: bullet/ellipsis line fractions, symbols, non-alpha words") {
    // lines: "- one two...", "three four…", "* five #", "six ..."
    val g = gopher("- one two...\nthree four…\n* five #\nsix ...")
    assert(g("n_words") == 10L)         // -,one,two...,three,four…,*,five,#,six,...
    assert(g("bullet_line_frac") == 0.5)    // lines 1 and 3 of 4
    assert(g("ellipsis_line_frac") == 0.75) // lines 1, 2, 4
    assert(g("alpha_word_frac") == 0.6)     // 6 alpha words of 10
    assert(g("sym_word_ratio") == 0.4)      // 1×'#' + 2×'...' + 1×'…' over 10
    assert(g("mean_word_len") == 3.2)       // 32 non-ws chars / 10 words
  }

  test("gopher: required stopwords respect word boundaries") {
    assert(gopher("The quick be to of and that have with them")("n_req_stopwords") == 8L)
    // "them", "toffee", "band" must not count as the/to/and
    assert(gopher("them toffee band offer have-nots")("n_req_stopwords") == 1L) // "have"
  }

  test("gopher: composite keep at the rule boundaries") {
    // 50 words, all alpha, stopwords present, no lines/symbols tripping
    val base = (1 to 48).map(i => "word").mkString(" ") + " the and"
    assert(gopher(base)("gopher_keep") == 1)
    // one word short of the floor
    val short = (1 to 47).map(_ => "word").mkString(" ") + " the and"
    assert(gopher(short)("n_words") == 49L)
    assert(gopher(short)("gopher_keep") == 0)
    // mean word length beyond 10 fails
    val longWords = (1 to 48).map(_ => "supercalifragilistic").mkString(" ") + " the and"
    assert(gopher(longWords)("gopher_keep") == 0)
  }

  test("c4: line retention — terminal punctuation, ≥3 words, javascript") {
    val text = "one two three.\nfour five\nsix seven eight!\n" +
      "nine ten javascript okay.\nshort.\nEleven twelve \"thirteen\""
    val c = c4(text)
    assert(c("n_lines") == 6L)
    assert(c("n_kept") == 3L)
    assert(c("text_clean") ==
      "one two three.\nsix seven eight!\nEleven twelve \"thirteen\"")
    assert(c("n_sent_clean") == 2L) // '.' and '!'; the quote line has none
    assert(c("c4_keep") == 0)       // fewer than 5 sentences survive
  }

  test("c4: right-trim before the terminal-punctuation check") {
    val c = c4("alpha beta gamma.   ")
    assert(c("n_kept") == 1L)
  }

  test("c4: document drops — lorem ipsum, braces, sentence floor") {
    val five = "aa bb cc. dd ee ff! gg hh ii? jj kk ll. mm nn oo."
    assert(c4(five)("c4_keep") == 1)
    assert(c4(five)("n_sent_clean") == 5L)
    assert(c4("Lorem Ipsum dolor sit. " + five)("c4_keep") == 0)
    assert(c4(five + "\nint main() { return 0; } yes.")("c4_keep") == 0)
  }

  test("gopherKeep matches gopherColumns' composite verdict") {
    import spark.implicits._
    val texts = Seq(
      "aa bb cc",
      (1 to 48).map(_ => "word").mkString(" ") + " the and",
      "- one two...\nthree four…\n* five #\nsix ...",
      (1 to 60).map(i => s"w$i").mkString(" ") + " the and that")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "t")
    val both = df.select(
      TextOps.gopherKeep(col("t")).cast("int").as("a"),
      TextOps.gopherColumns(col("t")).last.as("b")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("fixture: minted page round-trips the documents corpus deterministically") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d e f g h i"), (1L, "j k l m n"))
      .toDF("doc_id", "text")
    val pages = graft.SparkEntry.linePageFixture(docs)
      .orderBy("doc_id").collect().map(_.getString(1))
    // doc 0: k=4 → chunks [a b c d][e f g h][i]; (0+i)%7: line0 bullet;
    // (0+i)%6 suffixes: '.', '!', '?'; %13: line0 gets ' javascript';
    // doc 0 extras: %3 stopword line, %17 lorem, %19 brace, %23 numeric,
    // %29 hash line all fire at doc_id 0
    assert(pages(0) ==
      "- a b c d javascript.\ne f g h!\ni?\n" +
        "that will be of and with the.\nlorem ipsum dolor sit amet.\n" +
        "function() { var x = 1; }.\n12345 67890 11 22 33.\n" +
        "# header # tags # # #.")
    // doc 1: k=5 → chunks [j k l m n]; (1+0)%6=1 → '!'; no bullet
    // (1%7≠0), no extras (1 not divisible by 3/17/19/23/29)
    assert(pages(1) == "j k l m n!")
  }
}
