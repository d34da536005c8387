ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aipoweredecommerceanalyticsspark"
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
// Suppress sbt's "[success] Total time: …" footer. graft.Bench emits its
// machine-readable JSON record as the LAST stdout line; with the footer
// on, any harness that runs `sbt "runMain graft.Bench"` and parses the
// final line gets the footer instead of the JSON. Errors still print.
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by another setting,
// so the unused-key lint false-positives on it:
Global / excludeLintKeys += showSuccess
// Pass the forked run's stdout/stderr through verbatim. The default
// LoggedOutput re-logs the child's stdout as "[info] …" and its stderr
// as "[error] …" — both onto sbt's stdout — which (a) prefixes the Bench
// JSON line and (b) interleaves Spark's shutdown chatter after it. With
// StdoutOutput the child's streams keep their identity: Bench's JSON is
// the last raw stdout line, Spark logs stay on stderr.
run / outputStrategy := Some(StdoutOutput)
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
