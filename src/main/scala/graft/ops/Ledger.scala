package graft.ops

/** Drop ledger: every funnel that bounds its own output (df caps,
  * bucket caps, per-doc candidate budgets, hot-element scrubs) reports
  * WHAT it dropped here, so a silent cap can never read as "covered
  * everything". Logged under the `graft.ledger` logger (INFO) — one
  * line per engagement, greppable in driver logs — and mirrored in an
  * in-memory tail that tests and the scale harness can assert on. */
object Ledger {
  private val logger = org.slf4j.LoggerFactory.getLogger("graft.ledger")
  private val tail =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  def note(name: String, detail: String): Unit = {
    logger.info(s"[$name] $detail")
    tail.add((name, detail))
    while (tail.size > 256) tail.poll()
  }

  /** Recent entries, oldest first (bounded at 256). */
  def recent(): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    tail.asScala.toSeq
  }
}
