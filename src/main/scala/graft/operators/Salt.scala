package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed aggregation keys: phase 1 aggregates on
  * (key, salt) so a hot key's rows spread over `salts` reducers instead
  * of funneling into one; phase 2 merges the per-salt partials — a frame
  * of at most |keys|·salts rows.
  *
  * Semantics-preserving by construction: SUM/COUNT partials are
  * associative (sums use exact decimal accumulation via [[StableAgg]]'s
  * representation, so even the merge order cannot perturb a result).
  * That puts the whole technique on the DuckDB-oracle path — the oracle
  * runs the UNSALTED aggregate and must hash-match.
  *
  * The salt is a deterministic function of the row (xxhash64 of the
  * value column), not `rand()`: same results every run, no re-execution
  * hazards under task retry. AQE's runtime skew-join splitting is the
  * complementary join-side tool (enabled by default in the sessions);
  * salting is the aggregation-side and pre-planned-join tool.
  */
object Salt {

  /** Two-phase salted sum/count/avg of `valueCol` per `keyCol`. Output:
    * (key, n_rows, total, mean) — identical to the direct aggregate:
    * n_rows counts every row, while the mean divides by the NON-NULL
    * value count (built-in AVG's null-skipping semantics — a null-valued
    * row must not deflate the mean). */
  def saltedSumCountAvg(df: DataFrame, keyCol: Column, valueCol: Column, salts: Int = 16): DataFrame = {
    val Dec = "decimal(30,8)"
    df.withColumn("__salt", pmod(xxhash64(valueCol), lit(salts)))
      .groupBy(keyCol.as("key"), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        count(valueCol).as("__nv"),
        sum(valueCol.cast(Dec)).as("__sum"))
      .groupBy("key")
      .agg(
        sum(col("__n")).cast("long").as("n_rows"),
        sum(col("__nv")).cast("long").as("__n_values"),
        sum(col("__sum")).cast("double").as("total"))
      .withColumn("mean", col("total") / col("__n_values"))
      .drop("__n_values")
  }

  /** Pre-planned salted equi-join for a skewed probe side: inner join of
    * `big` (skewed key distribution) with `small` (a dimension too large
    * or too reused to broadcast) USING `key`.
    *
    * Mechanics: every `big` row gets a deterministic salt in
    * [0, salts) — xxhash64 over ALL its columns, so a hot key's rows
    * spread across `salts` reducers instead of funneling into one task's
    * sort/hash build; `small` is replicated once per salt value
    * (`explode(sequence(...))` — |small|·salts rows, the price of the
    * technique) and the join runs on (key, salt). Row-for-row identical
    * to the plain inner join, which is exactly what the DuckDB oracle
    * checks (q_skew_join).
    *
    * When to use over AQE skew splitting: AQE only rebalances
    * shuffle-stage skew it can SEE at runtime and only for sort-merge
    * joins; pre-planned salting also covers shuffled-hash joins,
    * streaming micro-batches (no AQE), and the case where the skewed
    * stage feeds further keyed work that must already be spread. Like
    * [[saltedSumCountAvg]], the salt is deterministic — task retries
    * recompute identical rows.
    *
    * Contract: `key` must exist on both sides and the remaining column
    * names must be disjoint (same rule as Spark's USING join); `big`'s
    * other columns must be hashable (maps are not). Null keys drop, as
    * in any inner equi-join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(big.columns.contains(key) && small.columns.contains(key),
      s"saltedJoin: key '$key' must exist on both sides")
    val overlap = (big.columns.toSet - key) intersect (small.columns.toSet - key)
    require(overlap.isEmpty,
      s"saltedJoin: non-key columns must be disjoint, found ${overlap.mkString(", ")}")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: column name __salt is reserved")
    // backtick-quote so dotted names don't parse as struct access
    val bigCols = big.columns.map(c => col(s"`${c.replace("`", "``")}`"))
    val salted = big.withColumn("__salt", pmod(xxhash64(bigCols.toIndexedSeq: _*), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
