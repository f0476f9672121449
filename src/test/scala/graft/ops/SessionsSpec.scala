package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sessionization boundary semantics and the strict in-order funnel
  * contract, plus the one-exchange plan shape both operators promise. */
class SessionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("session boundaries: first event, strict-gap split, equal-gap stays") {
    import spark.implicits._
    // gaps: 100 (stay, == gap), 101 (split), 1 (stay), then new user
    val ev = Seq((1L, 0L, 1L), (1L, 100L, 2L), (1L, 201L, 3L), (1L, 202L, 4L),
      (2L, 5000L, 5L)).toDF("u", "t", "id")
    val got = Sessions.sessionize(ev, Seq("u"), "t", gapSec = 100,
        tieBreak = Some("id"))
      .select("u", "id", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 1L)) === 1L)
    assert(got((1L, 2L)) === 1L) // gap == gapSec is the same session
    assert(got((1L, 3L)) === 2L) // gap > gapSec splits
    assert(got((1L, 4L)) === 2L)
    assert(got((2L, 5L)) === 1L) // per-key restart
  }

  test("funnel: strict order — out-of-order steps do not count") {
    import spark.implicits._
    val ev = Seq(
      // u=1 completes in order: view@10, click@20, purchase@30
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L), (1L, 30L, "purchase", 3L),
      // u=2: purchase BEFORE any view → depth 1 (view only)
      (2L, 5L, "purchase", 4L), (2L, 10L, "view", 5L),
      // u=3: click before view, click never re-occurs → depth 1
      (3L, 5L, "click", 6L), (3L, 10L, "view", 7L),
      // u=4: no funnel event at all → depth 0
      (4L, 10L, "error", 8L)).toDF("u", "t", "step", "id")
    val got = Sessions.funnel(ev, Seq("u"), "t", col("step"),
        Seq("view", "click", "purchase"), tieBreak = Some("id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(4) === 3)
    assert(got(1L).getLong(1) === 10L) // t_view
    assert(got(1L).getLong(2) === 20L) // t_click
    assert(got(1L).getLong(3) === 30L) // t_purchase
    assert(got(2L).getInt(4) === 1)
    assert(got(2L).isNullAt(2) && got(2L).isNullAt(3))
    assert(got(3L).getInt(4) === 1)
    assert(got(4L).getInt(4) === 0)
  }

  test("funnel: earliest qualifying reach wins; equal-time counts at-or-after") {
    import spark.implicits._
    val ev = Seq(
      // two views: earliest (t=5) anchors; click@7 is after 5 → counts
      (1L, 5L, "view", 1L), (1L, 9L, "view", 2L), (1L, 7L, "click", 3L),
      // u=2: click at the SAME second as view, view sorts first by id
      (2L, 10L, "view", 4L), (2L, 10L, "click", 5L),
      // u=3: click same second but BEFORE the view in tie order → no reach
      (3L, 10L, "click", 6L), (3L, 10L, "view", 7L)).toDF("u", "t", "step", "id")
    val got = Sessions.funnel(ev, Seq("u"), "t", col("step"),
        Seq("view", "click"), tieBreak = Some("id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 5L && got(1L).getLong(2) === 7L)
    assert(got(2L).getInt(3) === 2) // same-second, in tie order → counts
    assert(got(3L).getInt(3) === 1) // same-second, against tie order → not
  }

  test("plan: sessionize and a 3-step funnel each shuffle exactly once") {
    import spark.implicits._
    val ev = spark.range(0, 1000).select((col("id") % 7).as("u"),
      col("id").as("t"), (col("id") % 3).cast("string").as("step"),
      col("id").as("id"))
    for (df <- Seq(
        Sessions.sessionize(ev, Seq("u"), "t", 10, Some("id")),
        Sessions.funnel(ev, Seq("u"), "t", col("step"), Seq("0", "1", "2"),
          Some("id")))) {
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected one exchange:\n${plan.take(1200)}")
      assert(!plan.contains("Join"), "no join in a window construction")
    }
  }
}
