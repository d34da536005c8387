package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable rounding for oracle parity.
  *
  * `ROUND()` differs at half-way points between Spark (HALF_UP on the
  * decimal expansion of the double) and DuckDB (scale-multiply in binary
  * floating point, then round) — e.g. 5149.9653125 rounds to ...5312 in
  * Spark and ...5313 in DuckDB. Instead both sides compute
  * `floor(x * 10^d + 0.5) / 10^d`: every step is an IEEE-754 double op,
  * bit-identical in any engine, so identical inputs give identical
  * outputs by construction.
  */
object Rnd {
  def r(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  def sql(expr: String, digits: Int): String = {
    val p = s"1e$digits"
    s"FLOOR(($expr) * $p + 0.5) / $p"
  }
}
