package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the
  * validate-before-publish gate of a production pipeline (the Deequ
  * shape, engine-native): declare what must hold, get back one row per
  * constraint with its violation count, and gate the publish on zero
  * failures.
  *
  * Evaluation cost is the point at 100 TB: every ROW-LEVEL constraint
  * (non-null, range, set membership, regex, arbitrary predicate)
  * folds into ONE aggregate pass — a conditional sum per constraint,
  * partial-aggregated map-side, so the corpus is scanned once however
  * many rules are declared. Uniqueness adds one groupBy on its key
  * (the unavoidable exchange); referential integrity adds one
  * broadcast-or-shuffle anti-join per FK. Nothing else touches the
  * data.
  *
  * Output: `(constraint, violations, total, passed)` — deterministic,
  * SQL-expressible, so the whole report is DuckDB-oracle-able
  * (q_constraints).
  */
object Constraints {

  sealed trait Check { def name: String }

  /** Rows where `predicate` is FALSE or NULL count as violations —
    * the building block every row-level rule reduces to. */
  final case class Satisfies(name: String, predicate: Column) extends Check

  object Satisfies {
    def notNull(colName: String): Satisfies =
      Satisfies(s"not_null($colName)", col(colName).isNotNull)
    def inRange(colName: String, lo: Double, hi: Double): Satisfies =
      Satisfies(s"in_range($colName,$lo,$hi)",
        col(colName) >= lo && col(colName) <= hi)
    def isIn(colName: String, values: Seq[String]): Satisfies =
      Satisfies(s"is_in($colName)", col(colName).isin(values: _*))
    def matches(colName: String, regex: String): Satisfies =
      Satisfies(s"matches($colName)", col(colName).rlike(regex))
  }

  /** Key columns must identify rows uniquely; violations = rows beyond
    * the first per duplicated key. */
  final case class Unique(keyCols: Seq[String]) extends Check {
    val name = s"unique(${keyCols.mkString(",")})"
  }

  /** Every non-null `fkCol` value must exist in `ref`'s `refCol` —
    * violations = orphaned rows. `ref` is typically dimension-sized;
    * the anti-join broadcasts it below the threshold and shuffles
    * both sides by the key above it, either way one join. */
  final case class References(fkCol: String, ref: DataFrame, refCol: String)
      extends Check {
    val name = s"references($fkCol)"
  }

  /** Evaluate all checks: `(constraint, violations, total, passed)`,
    * one row per check, ordered by constraint name.
    *
    * The report is a UNION of independent subtrees (row-rule aggregate,
    * one groupBy per Unique, anti-join + total per References), each of
    * which would otherwise re-scan `df` — and re-run its whole upstream
    * lineage — once per rule family. When more than one subtree consumes
    * `df` it is pinned through `scope` (the [[SetSimJoin.similarPairs]]
    * idiom) so the input materializes once; a single-family report keeps
    * the pin-free plan. */
  def check(df: DataFrame, checks: Seq[Check],
            scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(checks.nonEmpty, "Constraints: no checks declared")
    require(checks.map(_.name).distinct.size == checks.size,
      s"Constraints: duplicate check names in ${checks.map(_.name)}")
    val rowChecks = checks.collect { case s: Satisfies => s }
    // consumers of df: the fused row-rule aggregate (1), each Unique
    // groupBy (1 apiece), each References anti-join + its total (2)
    val consumers = (if (rowChecks.isEmpty) 0 else 1) +
      checks.count(_.isInstanceOf[Unique]) +
      2 * checks.count(_.isInstanceOf[References])
    val in = if (consumers > 1) scope.pin(df) else df
    val rowReport: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else Some {
        // one pass: COUNT(*) + a conditional sum per rule (FALSE and
        // NULL both violate — a null predicate is "cannot prove");
        // the wide 1-row aggregate unpivots map-side, so the report
        // stays a lazy plan with no driver action
        // internal aliases are index-based: rule names carry dots and
        // parens, which column resolution would parse as nesting
        val aggs = count(lit(1)).as("__total") +:
          rowChecks.zipWithIndex.map { case (s, i) =>
            coalesce(sum(when(s.predicate, 0L).otherwise(1L)), lit(0L)).as(s"__v_$i") }
        in.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rowChecks.zipWithIndex.map { case (s, i) =>
            struct(lit(s.name).as("constraint"),
              col(s"__v_$i").as("violations"),
              col("__total").as("total")) }: _*)).as("r"))
          .select("r.*")
      }

    val otherReports = checks.collect {
      case u: Unique =>
        in.groupBy(u.keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"),
            coalesce(sum(col("__c")), lit(0L)).as("total"))
          .select(lit(u.name).as("constraint"), col("violations"), col("total"))
      case r: References =>
        // 1×1 crossJoin attaches the total without a driver action
        in.filter(col(r.fkCol).isNotNull)
          .join(r.ref.select(col(r.refCol).as(r.fkCol)).distinct(),
            Seq(r.fkCol), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .crossJoin(in.agg(count(lit(1)).as("total")))
          .select(lit(r.name).as("constraint"), col("violations"), col("total"))
    }

    (rowReport.toSeq ++ otherReports)
      .reduce(_ unionByName _)
      .withColumn("passed", (col("violations") === 0L).cast("int"))
      .orderBy("constraint")
  }
}
