ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gluetablecachespark"
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
  // 8g is measured-optimal for this single-JVM local[32] shape:
  // larger heaps INVERT — G1's young generation scales with the heap
  // and multi-second young collections land mid-query (d11 warm reps:
  // 3.6-4.3s at 8g, ~5s at 16g, 7-38s erratic at 48g; ParallelGC at
  // 24g worse still). Suite-length pressure is handled by trimming
  // the status-store retention (Bench) and unpersisting leftover
  // blocks between queries, not by growing the heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 147 queries x warm+timed passes generate thousands of codegen'd
  // classes; the 240m default code cache fills mid-suite, the JIT
  // stops compiling, and lambda-heavy projections (the charFold
  // content-hash family) silently run interpreted at 3x. The cache
  // is reserved virtual space, not committed memory.
  "-XX:ReservedCodeCacheSize=1g",
)
