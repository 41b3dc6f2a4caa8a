ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hyppoworkerspark"
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
// The harness parses ONE bare JSON line from the tail of `runMain
// graft.Bench` output; sbt's default logger prefixes forked stdout with
// "[info] ", which defeats a strict json.loads per line (BENCH_r10/r11
// `parsed: null`). Inherit stdout for forked runs so the bench line is
// emitted verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and sbt's own trailing "[success] Total time" line would still land
// AFTER the bench line in the captured tail, so a parse that reads the
// LAST line would see sbt's summary, not the JSON. Suppress it: with
// StdoutOutput above this makes the bare bench JSON the final line of a
// `sbt -batch "runMain graft.Bench"` invocation.
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by a task — exclude
// it from the unused-key lint so every build doesn't warn
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
  "-Dderby.stream.error.file=/tmp/graft-derby.log", // keep the repo clean
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
