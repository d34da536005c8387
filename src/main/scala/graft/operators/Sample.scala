package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling for training-data curation — the operations that cut a
  * corpus down to a training mix.
  *
  * Both samplers are DETERMINISTIC functions of the row key (no
  * `rand()`): re-runs, task retries, and other engines agree on the
  * selected set, which also puts them on the DuckDB-oracled path. This
  * is the standard trick for reproducible dataset curation — hash-gate
  * membership instead of drawing randomness.
  */
object Sample {

  /** Keep a row iff the first hex char of md5(key) falls in `hexChars`:
    * rate = |hexChars|/16 in expectation, exact per-key determinism. A
    * pure narrow filter — pushes down around/into the scan, no shuffle,
    * trivially parallel at any scale. */
  def hashSample(df: DataFrame, keyCol: Column, hexChars: Seq[String]): DataFrame =
    df.filter(substring(md5(keyCol.cast("string").cast("binary")), 1, 1)
      .isin(hexChars: _*))

  /** Stratified head: at most `k` rows per stratum, chosen by the
    * md5-of-key order (a deterministic uniform draw within each
    * stratum) — the class-balancing step of a training mix. The window
    * is PARTITIONED BY stratum: each stratum sorts independently in
    * parallel; no whole-frame window. For heavily skewed strata sizes
    * at extreme scale, the same contract can run as groupBy +
    * `min_by`-style top-k aggregation; the window form is the clearer
    * plan and bounded by the largest stratum. */
  def stratifiedHead(df: DataFrame, stratumCol: Column, keyCol: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(keyCol.cast("string").cast("binary")), keyCol)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
