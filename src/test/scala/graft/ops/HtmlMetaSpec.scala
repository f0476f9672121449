package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for page-metadata extraction — one case per field rule. */
class HtmlMetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def meta(html: String): (String, String, String, String) = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(TextOps.htmlMeta(col("h")).as("m"))
      .select("m.title", "m.description", "m.og_title", "m.canonical")
      .collect().head
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
  }

  test("title entity-decodes and collapses whitespace across lines") {
    assert(meta("<html><head><title>\n  A &amp; B\n  title </title></head></html>")
      ._1 === "A & B title")
  }

  test("description and og:title take the content after their selector") {
    val h = "<head>" +
      "<meta name='description' content=\"d &quot;x&quot;\">" +
      "<meta property='og:title' content=\"OG t\">" +
      "<link rel='canonical' href=\"https://c.example/p\"></head>"
    assert(meta(h) === ("", "d \"x\"", "OG t", "https://c.example/p"))
  }

  test("missing fields are empty strings, not nulls") {
    assert(meta("<html><body>no head</body></html>") === ("", "", "", ""))
  }

  test("an unrelated meta does not satisfy the selector") {
    val h = "<head><meta name=\"keywords\" content=\"k1,k2\"></head>"
    assert(meta(h)._2 === "")
  }
}
