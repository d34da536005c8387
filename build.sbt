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

// r19 (VERDICT item 2): the suite took ~13 quiet minutes in ONE forked
// JVM — long enough that r18's loaded driver window killed the JVM
// mid-suite (VERIFY_r18 tests_ok: false, shutdown hook during
// JdbcMergeProps). Run the suites as several forked JVMs CONCURRENTLY:
// every per-JVM resource is already process-scoped (TestSpark's
// warehouse dir is a fresh temp dir, query Scratch fixtures are
// per-PID, Derby DBs are in-memory), and the only PROCESS-SHARED state
// — the oracle-artifact store's symlink repointing under
// /tmp/graft_oracle_store — is protected by pinning every suite that
// touches query-level fixtures into one group. ScaleGrowthSpec (146 s,
// the longest suite) gets its own JVM; everything else hash-splits.
val fixtureSuites: Set[String] = Set(
  "graft.MediaStreamSpec", "graft.MediaSynthSpec", "graft.OracleArtifactSpec",
  "graft.PlanAuditTableSpec", "graft.PlanContractSpec",
  "graft.StarJoinSpec", "graft.TextStatsSpec", "graft.VideoStreamSpec")
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val fo = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  def groupOf(n: String): Int =
    if (fixtureSuites(n)) 0
    else if (n == "graft.ScaleGrowthSpec") 1
    else 2 + java.lang.Math.floorMod(n.hashCode, 4)
  tests.groupBy(t => groupOf(t.name)).toSeq.sortBy(_._1).map { case (i, ts) =>
    Tests.Group(s"graft-tests-$i", ts, Tests.SubProcess(fo))
  }
}
// sbt's default restrictions cap ForkedTestGroup at 1 — allow the
// groups to run side by side (6 JVMs × local[4] on a 32-core host).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
  Tags.limit(Tags.ForkedTestGroup, 6))
