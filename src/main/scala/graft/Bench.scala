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
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes EVERY column — .count() would let
      // Catalyst prune projection-only queries down to nothing and
      // record fictional times
      val err = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); false
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED:")
        e.printStackTrace()
        failed ::= name
        true
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (!err) System.err.println(f"[bench] $name%-28s $dt%8.2fs")
      name -> (if (err) None else Some(dt))
    }
    val qs = results.map {
      case (k, Some(v)) => s"\"" + k + "\":" + v
      case (k, None)    => s"\"" + k + "\":\"error\""
    }.mkString("{", ",", "}")
    val total = results.values.flatten.sum
    val errJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    // a query that throws must fail the bench loudly, never report a
    // healthy-looking near-zero time
    if (failed.nonEmpty) sys.exit(1)
  }
}
