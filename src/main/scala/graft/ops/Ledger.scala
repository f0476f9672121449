package graft.ops

/** Drop ledger: every funnel that bounds its own output (df caps,
  * bucket caps, per-doc candidate budgets, hot-element scrubs) reports
  * WHAT it dropped here, so a silent cap can never read as "covered
  * everything". Logged under the `graft.ledger` logger (INFO) — one
  * line per engagement, greppable in driver logs — mirrored in an
  * in-memory tail that tests and the scale harness can assert on, and
  * aggregated per name so the Bench/Scale artifacts can commit an
  * engaged-cap summary (the harnesses write it into BENCH/SCALING
  * JSON: a capped run is distinguishable from a full run by artifact,
  * not only by reading driver logs). */
object Ledger {
  private val logger = org.slf4j.LoggerFactory.getLogger("graft.ledger")
  private val seq = new java.util.concurrent.atomic.AtomicLong()
  private val tail =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
  private val counts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val lastDetail =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def note(name: String, detail: String): Unit = {
    logger.info(s"[$name] $detail")
    tail.add((seq.incrementAndGet(), name, detail))
    while (tail.size > 256) tail.poll()
    counts.merge(name, 1L, (a, b) => a + b)
    lastDetail.put(name, detail)
  }

  /** Counter-valued engagement: like [[note]] but the summary line
    * accumulates `delta` instead of +1 — for per-partition outcome
    * counts (e.g. media decode dispatch: decoded-real vs stub vs
    * quarantined), where the artifact-grade number is the SUM of row
    * counts, not how many partitions reported. Zero deltas are
    * dropped (an outcome that never happened should not mint a row).
    * Executor-side callers (mapPartitions codec stages) aggregate
    * in-JVM under local[*]; on a multi-executor cluster each executor
    * ledgers its own partitions (log-greppable per ISO logging), and
    * cluster-global accounting falls out of the stage's `decoded`
    * column — one groupBy away — so nothing is lost, only the
    * convenience summary is per-JVM. */
  def add(name: String, delta: Long, detail: String): Unit = {
    if (delta > 0) {
      logger.info(s"[$name] +$delta $detail")
      tail.add((seq.incrementAndGet(), name, s"+$delta $detail"))
      while (tail.size > 256) tail.poll()
      counts.merge(name, delta, (a, b) => a + b)
      lastDetail.put(name, detail)
    }
  }

  /** Recent entries, oldest first (bounded at 256). */
  def recent(): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    tail.asScala.toSeq.map(t => (t._2, t._3))
  }

  /** Monotonic engagement count — snapshot before a run, pass to
    * [[since]] after it to isolate that run's engagements. */
  def mark(): Long = seq.get()

  /** Entries recorded after `m`, oldest first (within the 256-entry
    * tail), de-duplicated — warm re-runs of one plan re-note the same
    * engagement verbatim. */
  def since(m: Long): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    tail.asScala.toSeq.filter(_._1 > m).map(t => (t._2, t._3)).distinct
  }

  /** Lifetime per-name engagement summary: (name, count, last detail),
    * name-sorted. Counts are exact (not tail-bounded). */
  def summary(): Seq[(String, Long, String)] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(_._1)
      .map { case (n, c) => (n, c.longValue(), lastDetail.get(n)) }
  }

  /** [[summary]] as a queryable DataFrame (name, count, last_detail) —
    * so corpus-health accounting (decode real/fallback/quarantined
    * shares, engaged caps) can be JOINED against source metadata
    * in-engine instead of read off the bench artifact. Same per-JVM
    * scope as the counters themselves (see [[add]]): under local[*]
    * it is the whole story; on a cluster each executor keeps its own,
    * and cluster-global accounting comes from the stage's `decoded`
    * column — this view is the driver-side convenience summary. */
  def snapshot(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    summary().toDF("name", "count", "last_detail")
  }
}
