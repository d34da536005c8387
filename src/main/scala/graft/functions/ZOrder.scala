package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving for MULTI-column clustering: a single
  * sort key whose order alternates the bits of two dimensions, so rows
  * close in EITHER dimension land in the same region of the sort.
  * Range-partition + sort by the interleaved key (writeClustered) and
  * every parquet file covers a small rectangle of (x, y) space — its
  * min/max footer statistics then skip files for predicates on x alone,
  * y alone, or both. Single-column clustering gives perfect skipping on
  * one dimension and none on the other; Z-order trades a little of the
  * first for most of the second. The linearization is the standard
  * space-filling-curve technique behind lakehouse `OPTIMIZE ZORDER BY`.
  *
  * Built entirely from codegen'd bitwise built-ins (no UDF, no custom
  * expression): 5 shift-or-mask rounds spread each 32-bit coordinate
  * over the even (x) / odd (y) bit positions of one long.
  *
  * Domain: both coordinates must be in [0, 2^31) — dimension ids, epoch
  * days, bucketed/quantized measures (quantize floats first). Enforced
  * per row with `raise_error`: a negative or wider input would
  * otherwise WRAP into the interleave silently — rows would cluster
  * into meaningless ranges and min/max skipping would quietly buy
  * nothing, the worst failure mode for a layout tool. Null coordinates
  * propagate to a null key (SQL convention). The same arithmetic is
  * SQL-expressible
  * ([[interleaveSql]]), which puts any query built on it on the DuckDB
  * oracle path — the bit math is value-checked cross-engine, not just
  * spot-tested.
  */
object ZOrder {

  /** (shift, mask) rounds spreading bit i of a 32-bit value to bit 2i. */
  private val Rounds = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Null passes through (null z-key); out-of-domain fails the job with
    * a row-valued message — the weightedBernoulli guard pattern. */
  private def guard(c: Column): Column = {
    val l = c.cast("long")
    when(c.isNull, lit(null).cast("long"))
      .when(l.between(0L, Int.MaxValue.toLong), l)
      .otherwise(raise_error(concat(
        lit("zorder: coordinate outside [0, 2^31): "), c.cast("string"))))
  }

  private def spread(c: Column): Column =
    Rounds.foldLeft(guard(c)) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Z-value of (x, y): x's bits on even positions, y's on odd. */
  def interleave(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** The identical computation as ANSI SQL over BIGINT bit operators
    * (DuckDB-compatible), for oracle mirrors. The input snippets are
    * substituted textually — each appears 2^5 times after the five
    * doubling rounds, so pass a short column reference, not a subquery. */
  def interleaveSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  private def spreadSql(e: String): String =
    Rounds.foldLeft(s"(CAST($e AS BIGINT) & 4294967295)") {
      case (x, (s, m)) => s"(($x | ($x << $s)) & $m)"
    }
}
