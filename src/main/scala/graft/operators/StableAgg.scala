package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent, cross-engine-deterministic SUM/AVG over double
  * columns.
  *
  * `SUM(double)` accumulates in partition/merge order, and Spark's task
  * order differs from DuckDB's morsel order — totals can differ in the
  * last ulps, which a rounding step then amplifies into a different
  * bucket at exactly the wrong inputs (the harness hash-compares
  * results). The fix is to make the aggregate exact: cast each row to
  * `DECIMAL(30,8)` and sum decimals.
  *
  *  - The per-row cast is bit-deterministic across engines: a tie would
  *    need a double exactly at a half-way point of the 1e-8 grid, i.e.
  *    (2k+1)/(2·10⁸) — its denominator carries 5⁸, so it is not a dyadic
  *    rational and NO double equals it. Both engines therefore round to
  *    the same nearest decimal, whatever their tie-break mode.
  *  - Decimal addition is exact (no rounding), so the sum is independent
  *    of partition order and of the engine.
  *
  * This is also the right call at 100 TB independent of oracles: double
  * accumulation over ~10¹² rows drifts by far more than a cent, while
  * decimal sums stay exact and remain whole-stage-codegen'd (Spark's
  * `Sum` over `DecimalType` uses unsafe-row decimal arithmetic, still a
  * single partial+final hash aggregate — no extra shuffle, ~equal cost).
  *
  * AVG is formulated as exact-decimal sum → double, divided by the row
  * count: one IEEE division of identical operands is itself identical.
  * (Dividing the decimals instead would re-introduce engine-specific
  * intermediate-scale rules — Spark widens to scale+4, DuckDB differs.)
  */
object StableAgg {
  private val Dec = "decimal(30,8)"

  /** Exact SUM of a double expression, returned as double. */
  def ssum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent AVG of a double expression (null rows skipped,
    * like built-in AVG). */
  def savg(c: Column): Column = ssum(c) / count(c)

  /** DuckDB mirror of [[ssum]]. */
  def ssumSql(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(30,8))) AS DOUBLE)"

  /** DuckDB mirror of [[savg]]. */
  def savgSql(e: String): String = s"${ssumSql(e)} / COUNT($e)"
}
