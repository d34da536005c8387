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

  /** Weighted Bernoulli sample in EXACT integer arithmetic: row i is
    * kept iff u_i < w_i / w_max, where u_i = hex32(md5(key)) / 2^32 is
    * the deterministic uniform draw. The decision is evaluated as the
    * cross-multiplied integer compare `hex32 · w_max < w_i · 2^32`, so
    * no engine-specific float op (ln/pow/divide) ever touches it —
    * unlike the classic Efraimidis-Spirakis u^(1/w) keys, whose libm
    * calls differ in final ulps across engines and would break the
    * hash-compared oracle. Expected size Σw/w_max; a max-weight row is
    * kept with probability 1; selection is per-key reproducible.
    *
    * w_max comes from one aggregate broadcast as a 1-row crossJoin (the
    * MinMax pattern) — a narrow pass, no data shuffle. A 32-bit draw
    * (vs a wider one) buys weight headroom: weights may be any
    * non-negative integer < 2^31, so byte/char counts of arbitrarily
    * long documents are valid weights, while the worst-case product
    * (2^32−1)·(2^31−1) still fits int64. The draw's 2^-32 granularity
    * is far below sampling noise at any corpus size. Out-of-range
    * weights raise (silent wraparound would bias the sample). */
  def weightedBernoulli(df: DataFrame, keyCol: Column, weightCol: Column): DataFrame = {
    val maxW = Int.MaxValue.toLong // 2^31 - 1: (2^32-1) * (2^31-1) < 2^63
    val guarded = when(weightCol.cast("long").between(0L, maxW), weightCol.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"weightedBernoulli: weight outside [0, $maxW]: "), weightCol.cast("string"))))
    val u32 = conv(substring(md5(keyCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    df.crossJoin(broadcast(df.agg(max(guarded).as("__wmax"))))
      .filter(u32 * col("__wmax") < guarded * lit(1L << 32))
      .drop("__wmax")
  }

  /** Epoch-based UPSAMPLING to balance a skewed group mixture: each row
    * of group g is replicated `max_count div count(g)` times (an
    * integer "number of epochs", always ≥ 1 for the largest group and
    * ≥ 1 everywhere), appended as an `epoch` column ∈ [0, r). This is
    * the multilingual/multi-domain training-mix move — minority
    * groups re-appear in more epochs instead of majority groups being
    * thrown away (subsampling is [[stratifiedHead]]'s job). Integer
    * repeat factors keep the output an exact deterministic function of
    * the input (no fractional-epoch randomness), so re-runs and other
    * engines reproduce the mix row-for-row.
    *
    * Plan shape: the group-count aggregate collapses map-side to
    * |groups| rows; the max rides a whole-frame window over that
    * ALREADY-AGGREGATED |groups|-row frame (one tiny single-partition
    * exchange — NOT a whole-corpus window, and cheaper than the
    * crossJoin-with-own-max spelling, which plans the count subtree
    * twice and re-scans the input); the factor frame joins back by
    * BROADCAST — the corpus itself is never shuffled; replication is a
    * map-side `explode` whose output is Σ r_g·n_g rows. At 100 TB the
    * only extra full pass is the count scan. */
  def balanceByUpsampling(df: DataFrame, groupCol: Column): DataFrame = {
    require(!df.columns.contains("epoch"),
      "balanceByUpsampling: column name epoch is reserved")
    val counts = df.groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__n"))
    val factors = counts
      // floor division of positive longs: the quotient fits a double
      // exactly (counts < 2^53), so floor(a/b) == a div b
      .select(col("__g"),
        floor(max(col("__n")).over(Window.partitionBy()).cast("double") / col("__n"))
          .cast("long").as("__r"))
    df.join(broadcast(factors), groupCol === col("__g"))
      .withColumn("epoch", explode(sequence(lit(0L), col("__r") - 1L)))
      .drop("__g", "__r")
  }

  /** Quality pruning at a target fraction WITHOUT a corpus sort: keep
    * every row whose integer score clears the exact histogram threshold
    * thr = max t such that |{score ≥ t}| ≥ ⌈p·n⌉ — at least the target
    * fraction survives, overshooting only by the tie mass at the
    * threshold (the production quality-gate contract: a cut score, not
    * a per-row lottery).
    *
    * Requires a BOUNDED integer score domain (e.g.
    * [[TextStats.withQualityInt]]'s [0, 3000] permille scale): the
    * histogram aggregate collapses map-side to |domain| rows, the
    * cumulative + argmax run as a window over that tiny frame, and the
    * 1-row threshold broadcasts back as a crossJoin — so the corpus
    * pays one combine-collapsed aggregate pass and one narrow filter.
    * Contrast the alternatives at 100 TB: a global sort-and-take
    * shuffles everything; a quantile sketch gives an approximate,
    * engine-specific cut. The bounded-domain histogram is both exact
    * and cheaper than either. */
  def topFractionByScore(df: DataFrame, scoreCol: Column, p: Double): DataFrame = {
    require(p > 0 && p <= 1, s"topFractionByScore: fraction must be in (0,1], got $p")
    val thr = df.groupBy(scoreCol.as("__s")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(Window.orderBy(col("__s").desc)))
      .withColumn("__total", sum(col("__c")).over(Window.partitionBy()))
      .filter(col("__cum") >= ceil(col("__total") * lit(p)))
      .agg(max(col("__s")).as("__thr"))
    df.crossJoin(broadcast(thr)).filter(scoreCol >= col("__thr")).drop("__thr")
  }

  /** Training-mix construction from EXPLICIT per-source weights — the
    * "sampling proportions" step that turns curated corpora into a
    * training multiset (web×0.5, code×2.5, books×1.0, …). Weight w
    * means: ⌊w⌋ full epochs of the source plus one FRACTIONAL epoch
    * kept per-row with probability w−⌊w⌋; sources absent from the map
    * are dropped. Rows gain an `epoch` column ∈ [0, ⌈w⌉).
    *
    * Fully deterministic, float-free at evaluation time: the fractional
    * gate is the exact integer compare u32 < ⌊frac·2³²⌋ where u32 =
    * hex32(md5('mix:' || key)) — the salt decorrelates it from
    * [[hashSample]]'s unsalted draw — and the per-source thresholds are
    * driver-computed constants, so any engine (and the DuckDB oracle)
    * reproduces the multiset from the same constants. (Contrast
    * [[balanceByUpsampling]], which DERIVES integer factors from group
    * counts; here the caller declares the proportions, fractions
    * included.)
    *
    * Plan shape: weight lookup is a literal when-chain (no join), epoch
    * replication is a map-side explode, the gate is a narrow filter —
    * the corpus never shuffles. Order the result with the md5-of-
    * (key, epoch) rank (see q_corpus_mix) for the interleaved training
    * order. */
  /** TEMPERATURE-weighted domain mixture — the GPT-3/PaLM/mT5 data-
    * mixing knob, where per-domain sampling weights are derived FROM
    * the domain counts instead of being handed in ([[mixByWeights]]'s
    * job): domain d gets weight `n_d^T / Σ n^T`, flattening the head
    * (a big domain contributes less than proportionally) while keeping
    * the tail (α-sampling, Conneau & Lample 2019; `mC4`'s exponent).
    * Implemented at the canonical `T = 1/2` operating point in EXACT
    * integer arithmetic: `w_d = isqrt(n_d · scale²)` — IEEE sqrt is a
    * correctly-rounded basic operation in every engine, and for
    * integer arguments `< 2^52` (guarded) its floor equals the true
    * integer square root, because a non-square argument keeps
    * `sqrt(x)` at least `1/(2·isqrt(x)+1)` away from the nearest
    * integer, far above half-ulp — so both engines compute the SAME
    * longs and the mixture is hash-oracle-exact. Other dyadic T values
    * swap the weight expression (e.g. iterated isqrt for T = 1/4);
    * non-dyadic T needs libm `pow`, whose final ulps differ across
    * engines — off the oracled path by design.
    *
    * Admission is the deterministic md5-threshold draw: doc k of
    * domain d survives iff `hex32(md5('tmix:' || k)) < t_d` with
    * `t_d = min(2^32, ((2^32·w_d) div W)·(N div targetDiv) div n_d)` —
    * the scaled-integer spelling of the per-domain rate
    * `p_d = N_target·w_d / (W·n_d)`, capped at certainty for tiny
    * upweighted domains. Expected output ≈ `N div targetDiv` rows with
    * per-domain proportions `∝ w_d`. Every division is integral and
    * engine-exact; int64 headroom holds to corpus sizes ~2^52/scale²
    * per domain and `2^32·N_target ≤ 2^63` overall — beyond that the
    * same formula runs in decimal(38,0) unchanged.
    *
    * Plan shape (the [[balanceByUpsampling]] discipline): the count
    * aggregate collapses map-side to |domains| rows; totals ride a
    * window over that already-aggregated tiny frame; the threshold
    * table joins back by BROADCAST; admission is a narrow filter — the
    * corpus itself is never shuffled. */
  def temperatureMix(df: DataFrame, keyCol: Column, domainCol: Column,
      targetDiv: Long = 4, scale: Long = 1000): DataFrame = {
    require(targetDiv >= 1, s"temperatureMix: targetDiv must be >= 1, got $targetDiv")
    require(scale >= 1 && scale <= 1000000,
      s"temperatureMix: scale must be in [1, 1e6], got $scale")
    val guardMax = (1L << 52) / (scale * scale)
    val counts = df.groupBy(domainCol.as("__dom")).agg(count(lit(1)).as("__n"))
    val weighted = counts.withColumn("__w",
      when(col("__n") <= guardMax,
        floor(sqrt((col("__n") * lit(scale * scale)).cast("double"))).cast("long"))
        .otherwise(raise_error(concat(
          lit(s"temperatureMix: domain count exceeds the exact-isqrt guard $guardMax: "),
          col("__n").cast("string")))))
    val tot = weighted.select(col("__dom"), col("__n"), col("__w"),
      sum(col("__w")).over(Window.partitionBy()).as("__sw"),
      sum(col("__n")).over(Window.partitionBy()).as("__sn"))
    val thr = tot.select(col("__dom"), col("__n").as("n_dom"), col("__w").as("w_scaled"),
      least(lit(1L << 32),
        expr(s"(((4294967296 * __w) DIV __sw) * (__sn DIV $targetDiv)) DIV __n"))
        .as("thresh"))
    val u32 = conv(substring(
      md5(concat(lit("tmix:"), keyCol.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    df.join(broadcast(thr), domainCol === col("__dom"))
      .filter(u32 < col("thresh"))
      .drop("__dom")
  }

  def mixByWeights(df: DataFrame, keyCol: Column, sourceCol: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "mixByWeights: empty weight map")
    require(weights.values.forall(w => w > 0 && w <= 64),
      s"mixByWeights: weights must be in (0, 64], got $weights")
    require(!df.columns.contains("epoch"), "mixByWeights: column name epoch is reserved")
    val full = weights.map { case (s, w) => s -> math.floor(w).toLong }
    val gate = weights.map { case (s, w) =>
      s -> math.floor((w - math.floor(w)) * 4294967296d).toLong
    }
    def chain(m: Map[String, Long]): Column =
      m.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
        case (acc, (s, v)) => when(sourceCol === s, lit(v)).otherwise(acc)
      }
    val u32 = conv(substring(
      md5(concat(lit("mix:"), keyCol.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    df.withColumn("__full", chain(full))
      .withColumn("__gate", chain(gate))
      .filter(col("__full").isNotNull) // unlisted sources leave the mix
      // ⌊w⌋+1 candidate epochs; the last is the fractional one
      .withColumn("epoch", explode(sequence(lit(0L), col("__full"))))
      .filter(col("epoch") < col("__full") || u32 < col("__gate"))
      .drop("__full", "__gate")
  }
}
