package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Block-decision pins for [[TextOps.extractMainContent]] — each test
  * isolates one classification rule so a regression names its rule. */
class MainContentSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val para =
    "The quick brown fox jumps over the lazy dog near the river bank today."

  private def extract(html: String): (String, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Seq(html).toDF("html")
      .select(TextOps.extractMainContent(col("html")).as("mc"))
      .select("mc.main_text", "mc.n_blocks", "mc.n_content_blocks",
        "mc.content_chars", "mc.boiler_chars")
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("structural chrome drops wholesale, even when its text is long") {
    val (text, _, nc, _, _) = extract(
      s"""<body><nav>$para $para</nav><header>$para</header>
         |<p>$para</p>
         |<aside>$para</aside><footer>$para $para</footer></body>""".stripMargin)
    assert(text === para)
    assert(nc === 1L)
  }

  test("link-farm block: long enough, but link density kills it") {
    val farm = "<ul><li><a href=\"/1\">Related one: how the spark " +
      "shuffle works in practice today</a></li></ul>"
    val (text, nb, nc, _, boiler) = extract(s"<body><p>$para</p>$farm</body>")
    assert(text === para)
    assert(nb === 2L && nc === 1L)
    assert(boiler > 25L) // the farm text was long — dropped by DENSITY
  }

  test("in-content anchor survives; its chars count toward density only") {
    val (text, _, nc, _, _) = extract(
      s"<body><p>$para See also <a href=\"/ref\">the source</a>.</p></body>")
    assert(nc === 1L)
    assert(text === s"$para See also the source .")
  }

  test("short fragments (titles, timestamps, labels) are boilerplate") {
    val (text, nb, nc, _, _) = extract(
      s"<body><h1>Site News</h1><div>2026-08-14</div><p>$para</p></body>")
    assert(nb === 3L && nc === 1L)
    assert(text === para)
  }

  test("char accounting: content + boiler == total visible block chars") {
    val (text, _, _, cc, bc) = extract(
      s"<body><h1>Tiny</h1><p>$para</p><div>also small</div></body>")
    assert(cc === para.length.toLong)
    assert(text === para)
    assert(bc === "Tiny".length.toLong + "also small".length.toLong)
  }

  test("plain text with no tags is one content block") {
    val (text, nb, nc, _, _) = extract(para)
    assert((nb, nc) === ((1L, 1L)))
    assert(text === para)
  }

  test("unclosed structural tag keeps its content (falls through to scoring)") {
    // no </nav>: the wholesale drop can't match, so the nav text is
    // scored like any block — the documented non-greedy contract
    val (_, nb, _, _, _) = extract(s"<body><nav>$para<p>$para</p></body>")
    assert(nb >= 2L)
  }

  test("script/style/comments drop with content; entities decode in blocks") {
    val (text, _, _, _, _) = extract(
      s"<body><script>var x = 1 < 2;</script><style>p{color:red}</style>" +
        s"<!-- note --><p>$para Fish &amp; chips &lt;cheap&gt;</p></body>")
    assert(text === s"$para Fish & chips <cheap>")
  }

  test("fused kernel == pure-builtin Column formulation, field for field") {
    import spark.implicits._
    // every fixture shape above plus the oracle's full synthetic page
    val pages = Seq(
      s"<body><nav>$para</nav><p>$para</p><footer>$para</footer></body>",
      s"<body><p>$para See also <a href=\"/r\">the source</a>.</p>" +
        "<ul><li><a href=\"/1\">Related one: how the spark shuffle " +
        "works in practice today</a></li></ul></body>",
      para,
      "",
      s"<body><nav>$para<p>$para</p></body>", // unclosed structural tag
      s"<div>2026-08-14</div><h1>Hi</h1><p>$para &amp; more&lt;x&gt;</p>")
    val df = pages.toDF("html")
    val k = df.select(TextOps.extractMainContent(col("html")).as("m"))
      .select("m.*").collect().map(_.toSeq)
    val c = df.select(TextOps.extractMainContentCols(col("html")).as("m"))
      .select("m.*").collect().map(_.toSeq)
    assert(k.toSeq === c.toSeq)
    // and on real minted pages: the first 40 docs of the oracle fixture
    val docs = spark.range(40).select(col("id").as("doc_id"),
      concat(lit("w"), col("id").cast("string"),
        lit(" some words repeat here enough to pass the length floor " +
          "for every document in this fixture")).as("text"))
    val fx = graft.SparkEntry.htmlPageFixture(docs)
    val k2 = fx.select(TextOps.extractMainContent(col("html")).as("m"))
      .select("m.*").collect().map(_.toSeq)
    val c2 = fx.select(TextOps.extractMainContentCols(col("html")).as("m"))
      .select("m.*").collect().map(_.toSeq)
    assert(k2.toSeq === c2.toSeq)
  }
}
