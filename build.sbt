ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "advancedrealtimedatapipelineandanalyticalprocessingspark"
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
// Forked `run` output normally round-trips through sbt's logger, which
// prefixes every line with "[info] " — that prefix is what kept the
// driver's BENCH json tail unparseable (parsed:null in rounds 3 and 4)
// even after Bench printed a compact final line. StdoutOutput hands the
// forked JVM the real stdout so graft.Bench's JSON line survives as-is.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop sbt's trailing "[success] Total time: ..." line so the JSON
// line Bench prints last is ALSO the last line of the whole sbt run —
// robust whether the capturing side scans lines or parses only the tail.
showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by sbt's command layer, not a task
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
)
