package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = List.empty[String]
    // warm the JVM/codegen/parquet-reader paths so the first measured
    // query isn't charged ~6s of one-time infrastructure cost; a
    // failure here is a real regression, not ignorable noise
    try {
      spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
      SparkEntry.events(spark, sfDir).limit(10).write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println("[bench] warmup FAILED")
      e.printStackTrace()
      failed ::= "warmup"
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Each query runs twice: the first (cold) run carries the one-time
    // whole-stage-codegen/Janino compile + classload cost (~0.3-2.5s per
    // novel plan — measured to dwarf the actual sf0.1 execution for fast
    // queries); the second (warm) run is the steady-state number, the
    // one that predicts 100 TB throughput where compile time amortizes
    // to zero. BOTH are reported: value/queries = warm, cold_* = cold.
    val results = selected.map { case (name, fn) =>
      // noop sink materializes EVERY column — .count() would let
      // Catalyst prune projection-only queries down to nothing and
      // record fictional times
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED:")
          e.printStackTrace()
          None
        }
      }
      val cold = once()
      val warm = if (cold.isDefined) once() else None
      // per-query storage hygiene: operators persist/localCheckpoint
      // intermediates and release the REFERENCES eagerly, but the
      // blocks themselves are only reaped by ContextCleaner when the
      // driver GCs — which a 128 GiB local heap almost never does on
      // its own. Without this, ~50 queries in, executor storage is
      // full of dead blocks and later queries pay 2-3x in memory
      // pressure (measured: split_leakfree 5.3s isolated vs 14.2s at
      // position ~100). A real cluster gets the same effect from
      // spark.cleaner.periodicGC.interval; a one-JVM bench has to ask.
      spark.catalog.clearCache()
      System.gc()
      if (warm.isEmpty) failed ::= name
      else System.err.println(f"[bench] $name%-28s cold ${cold.get}%8.2fs  warm ${warm.get}%8.2fs")
      name -> (cold, warm)
    }
    def json(sel: ((Option[Double], Option[Double])) => Option[Double]) =
      results.map {
        case (k, t) => sel(t) match {
          case Some(v) => s"\"" + k + "\":" + v
          case None    => s"\"" + k + "\":\"error\""
        }
      }.mkString("{", ",", "}")
    val warmTotal = results.values.flatMap(_._2).sum
    val coldTotal = results.values.flatMap(_._1).sum
    val errJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the short headline line brackets the long per-query line: capture
    // tooling may keep either the head or the TAIL of the log (the
    // round-4 artifact lost its totals to tail-capture), so the primary
    // metrics (warm total = the 100 TB-predictive number) print BOTH
    // before and after the line most likely to be truncated
    val summary = s"""{"metric":"summary","warm_total":$warmTotal,"cold_total":$coldTotal,"unit":"sec","n_queries":${results.size},"errors":$errJson,"sf":"$sfDir"}"""
    println(summary)
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","cold_total":$coldTotal,"errors":$errJson,"queries":${json(_._2)},"cold_queries":${json(_._1)},"sf":"$sfDir"}""")
    spark.stop()
    // print the summary once more AFTER spark.stop() so no shutdown
    // logging can land between it and process exit: with the build's
    // StdoutOutput strategy this line reaches the driver's tail-capture
    // verbatim as the final line of output
    println(summary)
    System.out.flush()
    // a query that throws must fail the bench loudly, never report a
    // healthy-looking near-zero time
    if (failed.nonEmpty) sys.exit(1)
  }
}
