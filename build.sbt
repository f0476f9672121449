ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kairosspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses the LAST line of the captured bench log as JSON.
// sbt's default LoggedOutput prefixes every forked-stdout line with
// "[info] " and appends a "[success] Total time" line — both defeat
// that parser (rounds 1-5 all recorded parsed:null). Pass the forked
// program's stdout through verbatim and drop the success banner.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command processor, not a task — exempt it
// from the unused-key lint
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Bench hygiene calls System.gc() before every timed run (it is what
  // drives Spark's ContextCleaner on an otherwise idle heap). As full
  // STW collections those System.gc()s poisoned the TIMED regions
  // that followed them — class-unloading deopt churn and compaction
  // made 4-8 random queries per 264-query session run 2-7s slow
  // (measured r16: in-region GC 20.5s, warm_total 321.8s). Concurrent
  // explicit GC keeps the cleaner triggering while taking the stalls
  // out of the measurements: in-region GC 4.4s, warm_total 256.7s,
  // same code, same methodology. A/Bed at 8g and 16g heaps.
  "-XX:+ExplicitGCInvokesConcurrent",
)
