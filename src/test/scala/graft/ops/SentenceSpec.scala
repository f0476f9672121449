package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for rule-based sentence segmentation — one case per split
  * rule, one per refusal rule. */
class SentenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sents(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextOps.sentenceSplit(col("t")).as("x"))
      .collect().head.getSeq[String](0)
  }

  test("plain terminators split; unterminated tail survives") {
    assert(sents("One here. Two there! Three? Tail without end") ===
      Seq("One here.", "Two there!", "Three?", "Tail without end"))
  }

  test("abbreviations do not split") {
    assert(sents("Dr. Smith met Mr. Jones. They left.") ===
      Seq("Dr. Smith met Mr. Jones.", "They left."))
    assert(sents("See e.g. the appendix. Also i.e. the notes.") ===
      Seq("See e.g. the appendix.", "Also i.e. the notes."))
    assert(sents("Meet at 5 p.m. At dawn we go. No. 5 is open.") ===
      Seq("Meet at 5 p.m. At dawn we go.", "No. 5 is open."))
  }

  test("decimal numbers do not split") {
    assert(sents("Pi is 3.14 exactly. Euler has 2.71 too.") ===
      Seq("Pi is 3.14 exactly.", "Euler has 2.71 too."))
  }

  test("terminator inside closing quote splits after the quote") {
    assert(sents("She said \"Stop.\" He did. It was (done.) Next came.") ===
      Seq("She said \"Stop.\"", "He did.", "It was (done.)", "Next came."))
  }

  test("ellipsis splits only before a capital") {
    assert(sents("Wait... Then go.") === Seq("Wait...", "Then go."))
    assert(sents("It trails... and continues here.") ===
      Seq("It trails... and continues here."))
  }

  test("lowercase continuation after a period does not split") {
    assert(sents("version 2. of the spec says so.") ===
      Seq("version 2. of the spec says so."))
  }

  test("digit and opening-quote sentence starters split") {
    assert(sents("Released 2020. 3000 units sold. \"Quoted start\" ended.") ===
      Seq("Released 2020.", "3000 units sold.", "\"Quoted start\" ended."))
  }

  test("pre-existing sentinel bytes are stripped, not misread") {
    assert(sents("A\u0002B here. C\u0001D there.") ===
      Seq("AB here.", "CD there."))
  }

  test("empty and whitespace-only input give no sentences") {
    assert(sents("") === Seq())
    assert(sents("   ") === Seq())
  }

  test("fused kernel agrees with the Column formulation on every case") {
    import spark.implicits._
    val cases = Seq(
      "One here. Two there! Three? Tail without end",
      "Dr. Smith met Mr. Jones. They left.",
      "See e.g. the appendix. Also i.e. the notes.",
      "Meet at 5 p.m. At dawn we go. No. 5 is open.",
      "Pi is 3.14 exactly. Euler has 2.71 too.",
      "She said \"Stop.\" He did. It was (done.) Next came.",
      "Wait... Then go.",
      "It trails... and continues here.",
      "version 2. of the spec says so.",
      "Released 2020. 3000 units sold. \"Quoted start\" ended.",
      "Sailed in Sept. 1620. Sept is also a word",
      "Tab\tafter. Newline\nbreaks? Yes. done",
      "", "   ", "A.", "..?!")
    val got = cases.toDF("t").select(
        TextOps.sentenceSplit(col("t")).as("k"),
        TextOps.sentenceSplitColumns(col("t")).as("c"))
      .collect().map(r => (r.getSeq[String](0), r.getSeq[String](1)))
    for (((k, c), in) <- got.zip(cases)) assert(k === c, s"in=$in")
  }
}
