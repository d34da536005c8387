package graft

import graft.operators.Constraints
import graft.operators.Constraints.{References, Satisfies, Unique}
import org.scalatest.funsuite.AnyFunSuite

/** Violation counts must be exact per rule, nulls must violate
  * row-level predicates ("cannot prove" = fail), null FKs must NOT
  * count as orphans, and a clean frame must pass everything.
  */
class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame,
                     checks: Seq[Constraints.Check]): Map[String, (Long, Long, Int)] =
    Constraints.check(df, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap

  test("each rule counts its exact violations on a dirty frame") {
    val dim = Seq(1L, 2L, 3L).toDF("ref_id")
    val df = Seq(
      (1L, Some("a"), 5.0, Some(1L)),
      (1L, Some("b"), -1.0, Some(2L)),   // dup key; out of range
      (2L, None, 50.0, Some(9L)),        // null name; orphan fk
      (3L, Some("zz"), 200.0, None)      // name not in set; null fk (NOT orphan); range high
    ).toDF("id", "name", "v", "fk")
    val got = report(df, Seq(
      Satisfies.notNull("name"),
      Satisfies.isIn("name", Seq("a", "b")),
      Satisfies.matches("name", "^[a-y]+$"),
      Satisfies.inRange("v", 0.0, 100.0),
      Unique(Seq("id")),
      References("fk", dim, "ref_id")))
    assert(got("not_null(name)") == ((1L, 4L, 0)))
    // null name also fails is_in (cannot prove membership)
    assert(got("is_in(name)") == ((2L, 4L, 0)))
    // "zz" fails the pattern; the null fails as unprovable
    assert(got("matches(name)") == ((2L, 4L, 0)))
    assert(got("in_range(v,0.0,100.0)") == ((2L, 4L, 0)))
    assert(got("unique(id)") == ((1L, 4L, 0)))
    assert(got("references(fk)") == ((1L, 4L, 0)))
  }

  test("a clean frame passes every rule") {
    val dim = Seq(1L, 2L).toDF("ref_id")
    val df = Seq((1L, "a", 1.0, 1L), (2L, "b", 2.0, 2L)).toDF("id", "name", "v", "fk")
    val got = report(df, Seq(
      Satisfies.notNull("name"), Unique(Seq("id")),
      References("fk", dim, "ref_id")))
    assert(got.values.forall { case (v, t, p) => v == 0L && t == 2L && p == 1 })
  }

  test("empty frame: zero totals, everything passes") {
    val df = Seq.empty[(Long, String)].toDF("id", "name")
    val got = report(df, Seq(Satisfies.notNull("name"), Unique(Seq("id"))))
    assert(got.values.forall { case (v, t, p) => v == 0L && t == 0L && p == 1 })
  }

  test("multi-family report reads ONE pinned materialization; scope releases it") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val dir = java.nio.file.Files.createTempDirectory("constraints_pin").toString
    Seq((1L, "a", 1.0, Some(1L)), (2L, "b", 2.0, Some(2L)),
      (2L, null.asInstanceOf[String], -1.0, Some(9L)))
      .toDF("id", "name", "v", "fk").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val dim = Seq(1L, 2L, 3L).toDF("ref_id")
    val scope = new graft.operators.CacheScope
    try {
      val report = Constraints.check(df, Seq(
        Satisfies.notNull("name"), Satisfies.inRange("v", 0.0, 100.0),
        Unique(Seq("id")), References("fk", dim, "ref_id")), scope)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan =
        try report.queryExecution.executedPlan
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      // every rule-family consumer (row aggregate, Unique groupBy, the
      // References anti-join AND its total) reads the in-memory pin; the
      // parquet input appears nowhere as a direct file scan, so however
      // many families are declared the input lineage runs once
      val fileScans = plan.collect { case s: FileSourceScanExec => s }
      assert(fileScans.isEmpty,
        s"input rescanned ${fileScans.size}× instead of reading the pin")
      val memScans = plan.collect { case s: InMemoryTableScanExec => s }
      assert(memScans.size >= 4, s"expected >=4 pin consumers, got ${memScans.size}")
      // and the report is still exact through the pin
      val got = report.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
      assert(got("not_null(name)") == ((1L, 3L, 0)))
      assert(got("in_range(v,0.0,100.0)") == ((1L, 3L, 0)))
      assert(got("unique(id)") == ((1L, 3L, 0)))
      assert(got("references(fk)") == ((1L, 3L, 0)))
    } finally scope.close()
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "scope.close() must release the operator's pin")
  }

  test("guards: empty and duplicate check lists") {
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] { Constraints.check(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      Constraints.check(df, Seq(Satisfies.notNull("name"), Satisfies.notNull("name")))
    }
  }
}
