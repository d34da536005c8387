package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's KPI family (reference: `data_transformer.py:113-143`,
  * `KPIs()` + the per-date mean; output schemas `README.md:114-129`).
  *
  * Input contract: a "facts" frame with a grouping key, a `price` column
  * (double) and a nullable boolean `sentiment` column (null = the LLM
  * batch that carried the row failed — `data_transformer.py:100-109`).
  *
  * Semantics preserved exactly:
  *  - positive_reviews / negative_reviews count `true` / `false` and skip
  *    nulls in BOTH (Polars bool-sum semantics, `data_transformer.py:115-117`);
  *  - likeness_score = positive / (negative if negative>0 else 1), double
  *    (`data_transformer.py:118-124`);
  *  - normalized_likeness_score = global min-max, degenerate -> 0.0
  *    (`utils/tools.py:67-94`).
  *
  * Fixture divergence (deliberate, mirrored in the oracle): the harness
  * shop-KPI query feeds `profit` = price*(1-discount) as the averaged
  * column, while the reference's `generateShopKpis` averages raw `price`
  * for `average_profit` (`data_transformer.py:130-133`). The operator
  * itself is column-parameterized (`priceCol`), so both semantics are one
  * call away; the harness picks the discounted form because the testdata
  * carries a discount column the reference's records lack.
  *
  * Divergence (an optimization, same results): the reference aggregates
  * the same grouping twice and joins the halves back together
  * (`data_transformer.py:113-127`, J2). We fuse everything into ONE
  * `groupBy.agg` — one shuffle instead of two plus a join. At 100 TB the
  * single hash aggregate (partial + final) is the plan you want; the join
  * formulation would shuffle the facts twice.
  */
object Kpis {

  /** positive = sum over rows where sentiment IS TRUE; nulls hit neither. */
  private def positive: Column = sum(when(col("sentiment"), 1).otherwise(0)).as("positive_reviews")
  private def negative: Column = sum(when(!col("sentiment"), 1).otherwise(0)).as("negative_reviews")

  private def withScores(grouped: DataFrame, scope: CacheScope): DataFrame = {
    val scored = scope.pin(grouped.withColumn(
      "likeness_score",
      col("positive_reviews").cast("double") /
        when(col("negative_reviews") > 0, col("negative_reviews")).otherwise(lit(1))))
      // MinMax.normalize references its input twice (the min/max aggregate
      // and the crossJoin branch). Without the pin, the whole upstream
      // scan→join→groupBy chain appears in the plan twice; the post-agg
      // frame is tiny (|group keys| rows), so pin it and both branches
      // read memory instead of re-running the shuffle.
      // Cache contract: the pin lives inside the returned lazy plan, so
      // the CALLER releases it after materializing — a tracking scope's
      // close(), or the session sweep under the unmanaged default
      // (Bench/Verify clear between queries; EtlPipeline passes its
      // batch scope).
    MinMax.normalize(scored, "likeness_score", "normalized_likeness_score")
  }

  /** user_kpis: {id, average_spent, positive_reviews, negative_reviews,
    * likeness_score, normalized_likeness_score} (`README.md:115-121`). */
  def userKpis(facts: DataFrame, userCol: String = "id", priceCol: String = "price",
               scope: CacheScope = CacheScope.unmanaged): DataFrame =
    withScores(
      facts
        .groupBy(col(userCol).as("id"))
        .agg(StableAgg.savg(col(priceCol)).as("average_spent"), positive, negative),
      scope)

  /** shop_kpis: same shape keyed by shop_id with average_profit. */
  def shopKpis(facts: DataFrame, shopCol: String = "shop_id", priceCol: String = "price",
               scope: CacheScope = CacheScope.unmanaged): DataFrame =
    withScores(
      facts
        .groupBy(col(shopCol).as("shop_id"))
        .agg(StableAgg.savg(col(priceCol)).as("average_profit"), positive, negative),
      scope)

  /** date_kpis: {date, average_profit_per_day} (`data_transformer.py:140-143`
    * groups the raw string date column; we format the timestamp to the same
    * yyyy-MM-dd string shape). */
  def dateKpis(facts: DataFrame, dateCol: String = "date", priceCol: String = "price"): DataFrame =
    facts
      .groupBy(col(dateCol).as("date"))
      .agg(StableAgg.savg(col(priceCol)).as("average_profit_per_day"))
}
