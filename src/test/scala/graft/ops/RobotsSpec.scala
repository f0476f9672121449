package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the robots.txt parse kernel and the RFC 9309 evaluation
  * rules — each case isolates one grammar or matching rule. */
class RobotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rules(txt: String, agent: String): Seq[(String, Boolean)] = {
    import spark.implicits._
    Seq(txt).toDF("t")
      .select(explode(graft.functions.GraftFunctions.robotsRules(col("t"), agent)).as("r"))
      .select("r.prefix", "r.allow")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
  }

  private def verdict(robotsTxt: String, path: String,
      agent: String = "graftbot"): Boolean = {
    import spark.implicits._
    val urls = Seq((1L, s"http://h.example$path")).toDF("doc_id", "url")
    val robots = Seq(("h.example", robotsTxt)).toDF("host", "txt")
    Urls.robotsVerdicts(urls, col("url"), col("doc_id"), robots,
      col("host"), col("txt"), agent)
      .collect().head.getAs[Boolean]("allowed")
  }

  test("named group shadows the star group; case-insensitive agent") {
    val txt = "User-agent: GraftBot\nDisallow: /a\n\nUser-agent: *\nDisallow: /\n"
    assert(rules(txt, "graftbot") === Seq(("/a", false)))
    assert(rules(txt, "otherbot") === Seq(("/", false)))
  }

  test("a trailing named group with zero rules means allow-all, not star fallback") {
    val txt = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\n"
    assert(rules(txt, "graftbot") === Seq.empty)
    assert(verdict(txt, "/anything") === true)
  }

  test("user-agent lines stack into one group even across blank lines (RFC 9309)") {
    // blanks are insignificant: with no rule between them, graftbot
    // and * name the SAME group, so its rules bind graftbot too
    val txt = "User-agent: graftbot\n\nUser-agent: *\nDisallow: /\n"
    assert(rules(txt, "graftbot") === Seq(("/", false)))
  }

  test("consecutive User-agent lines share one group; comments strip") {
    val txt = "User-agent: a # primary\nUser-agent: b\nDisallow: /x\n"
    assert(rules(txt, "a") === Seq(("/x", false)))
    assert(rules(txt, "b") === Seq(("/x", false)))
  }

  test("rules before any User-agent line are ignored; empty values drop") {
    val txt = "Disallow: /orphan\nUser-agent: *\nDisallow:\nAllow: /ok\n"
    assert(rules(txt, "any") === Seq(("/ok", true)))
  }

  test("multiple groups naming the agent merge their rules") {
    val txt = "User-agent: g\nDisallow: /a\n\nUser-agent: g\nAllow: /a/b\n"
    assert(rules(txt, "g") === Seq(("/a", false), ("/a/b", true)))
  }

  test("longest match wins; Allow wins exact-length ties") {
    val txt = "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
    assert(verdict(txt, "/p/doc") === false)
    assert(verdict(txt, "/p/ok/doc") === true)
    val tie = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    assert(verdict(tie, "/dir/x") === true)
  }

  test("no matching rule, or no robots entry for the host, allows") {
    assert(verdict("User-agent: *\nDisallow: /private\n", "/public") === true)
    import spark.implicits._
    val urls = Seq((1L, "http://nobody.example/x")).toDF("doc_id", "url")
    val robots = Seq(("h.example", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "txt")
    val got = Urls.robotsVerdicts(urls, col("url"), col("doc_id"), robots,
      col("host"), col("txt"), "g").collect().head.getAs[Boolean]("allowed")
    assert(got === true)
  }
}
