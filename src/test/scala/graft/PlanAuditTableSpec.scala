package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The no-drift gate for the PLANS.md physical-plan audit (VERDICT r7
  * #8): the marker-delimited table `graft.PlanAudit` rewrites must
  * contain EXACTLY one row per registered query. Adding a query to
  * [[SparkEntry.queries]] without regenerating the audit table — or
  * leaving a row for a deleted query — fails here, at test time, so
  * the published plan audit always describes the current surface. No
  * Spark session needed: this parses the checked-in markdown. */
class PlanAuditTableSpec extends AnyFunSuite {

  test("PLANS.md audit table rows match SparkEntry.queries exactly") {
    val plansMd = new String(
      Files.readAllBytes(Paths.get("PLANS.md")), "UTF-8")
    val tabled = PlanAudit.tableQueryNames(plansMd)
    val registered = SparkEntry.queries.keySet
    val missing = registered -- tabled
    val stale = tabled -- registered
    assert(missing.isEmpty && stale.isEmpty,
      s"PLANS.md audit table drifted from SparkEntry.queries — " +
        s"missing rows: ${missing.toSeq.sorted.mkString(", ")}; " +
        s"stale rows: ${stale.toSeq.sorted.mkString(", ")}. " +
        "Regenerate with: sbt \"runMain graft.PlanAudit /root/testdata/sf0.01 PLANS.md\"")
  }

  test("no audit row is an ERROR row") {
    val plansMd = new String(
      Files.readAllBytes(Paths.get("PLANS.md")), "UTF-8")
    val lines = plansMd.linesIterator.toSeq
    val begin = lines.indexOf(PlanAudit.BeginMarker)
    val end = lines.indexOf(PlanAudit.EndMarker)
    val errors = lines.slice(begin, end).filter(_.contains("| ERROR"))
    assert(errors.isEmpty,
      s"audit rows recorded a failing plan build:\n${errors.mkString("\n")}")
  }
}
