ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mlopspipelinesfeaturestoregcpspark"
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
// The bench/verify drivers parse the LAST stdout line as JSON. Two sbt
// behaviors break that: (a) sbt prints "[success] Total time: …" AFTER
// the forked main returns, so the JSON line is never last; (b) forked
// output is routed through sbt's logger and "[info]"-prefixed. Disable
// both: no success banner, and forked process output goes straight to
// this process's stdout unprefixed.
Global / showSuccess := false
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // local[32] runs driver+executors in ONE JVM; the query library
  // persists its reused intermediates (shingle/signature/edge tables),
  // so the heap must hold storage for the whole suite — 8g forced
  // cache eviction + GC churn across ~100 queries on the 128 GiB box,
  // while very large heaps make the occasional full GC last many
  // seconds (cache() spills to disk past the storage fraction anyway).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
)
