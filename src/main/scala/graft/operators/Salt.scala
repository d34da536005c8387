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
}
