package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LEARNED document-quality classification — the third leg of the
  * CCNet-style curation triad next to the heuristic gates
  * ([[TextStats.withGateFlags]]) and the reference-LM perplexity
  * filter ([[NgramLm.scoreBackoffPruned]]): production pipelines
  * (GPT-3's WebText classifier, LLaMA/CCNet's fastText linear model)
  * train a LINEAR classifier over hashed character-n-gram features to
  * score "looks like the reference domain", because at corpus scale
  * scoring must be a map-side dot product and training a bounded
  * number of aggregate passes.
  *
  * This is that niche spelled relationally and INTEGER-EXACT:
  *
  *  - FEATURES are hashed char-n-gram OCCURRENCES: every length-`n`
  *    window of the text buckets into `dim` slots via FNV-1a — the
  *    hash fastText itself uses, spelled as codegen'd integer
  *    arithmetic both engines reproduce bit-for-bit (an md5-prefix
  *    bucket measured ~1.1 s over the sf0.1 gram stream; this form is
  *    noise) — plus one constant BIAS occurrence at index `dim`, so
  *    the model has an intercept and every non-null document is
  *    scoreable. Occurrences (fastText's bag-of-features counts) stay
  *    UNAGGREGATED: the only shuffle anywhere groups by document id /
  *    bucket id, never by the (doc, bucket) cross — the per-pair
  *    count table would be the corpus-sized intermediate.
  *  - TRAINING is the batch perceptron: epoch e scores every labeled
  *    document under the epoch-(e−1) weights, and the misclassified
  *    set's label-signed occurrences fold into the weights
  *    (`w += Σ_mis y·x`). All-integer by construction — labels ±1, so
  *    weights and scores are exact longs on every engine, no
  *    learning-rate float anywhere (rate scales all scores uniformly;
  *    the sign — which is what routing uses — is rate-invariant).
  *    Epoch 1 from zero weights classifies everything as misclassified
  *    (y·0 ≤ 0), so `w₁ = Σ_all y·x` — the count-based
  *    Naive-Bayes-flavored start fastText's mean-gradient step also
  *    takes.
  *  - SCORING is one narrow feature pass + one broadcast join against
  *    the `dim+1`-row weight table + one per-document aggregate: the
  *    corpus is touched once, nothing pairs with anything.
  *
  * 100 TB shape: the model is `dim+1` rows (broadcast everywhere);
  * each training epoch is one bucket-keyed aggregate over the labeled
  * frame (bounded passes, map-side combined); scoring is
  * embarrassingly parallel. Skew-free: FNV buckets are uniform over
  * real text by construction.
  *
  * Reference scope: beyond-reference (the brief's training-data
  * curation surface); published technique only (Rosenblatt perceptron,
  * batch form; Joulin et al. 2016 fastText feature hashing with the
  * FNV-1a function; Brown et al. 2020 §A WebText-vs-CommonCrawl
  * quality classifier shape).
  */
object QualityClassifier {

  /** The bias bucket index is `dim`; real n-gram buckets are 0..dim-1. */
  def biasBucket(dim: Int): Int = dim

  /** FNV-1a 32-bit constants (Fowler–Noll–Vo; the fastText hash). */
  val FnvOffset = 2166136261L
  val FnvPrime = 16777619L
  private val Mask32 = 0xffffffffL

  /** The SAME fold as DuckDB SQL, generated from the same constants —
    * `t`/`i` are SQL fragments for the text column and the window's
    * 1-based start position. */
  private[graft] def fnvBucketSql(t: String, i: String, n: Int, dim: Int): String = {
    val h = (0 until n).foldLeft(FnvOffset.toString) { (acc, j) =>
      val pos = if (j == 0) i else s"$i + $j"
      s"((xor($acc, CAST(ascii(substr($t, $pos, 1)) AS BIGINT)) * $FnvPrime) & $Mask32)"
    }
    s"($h % $dim)"
  }

  /** The local-JVM mirror of [[fnvBucket]] — specs' independent
    * reference. */
  private[graft] def fnvBucketLocal(gram: String, dim: Int): Long = {
    var h = FnvOffset
    gram.codePoints().forEach(c => h = ((h ^ c) * FnvPrime) & Mask32)
    h % dim
  }

  /** Hashed char-n-gram feature OCCURRENCES `(id, b)` — one row per
    * window, plus the constant bias row `(id, dim)`. Null texts yield
    * NO rows (a classifier cannot vouch for what it cannot read — the
    * unscoreable-document contract); texts shorter than `n` yield only
    * the bias row. The window hashing is ONE native `fnv_ngrams` call
    * per row ([[graft.expressions.FnvNgrams]]): the declarative
    * spellings are all O(L²) per document (per-window positional
    * `substr` re-scans the byte prefix) or interpreted (HOF lambdas)
    * — measured 3.4-5.6 s at sf0.1 where this shape is sub-second. */
  def features(df: DataFrame, idCol: Column, textCol: Column,
               n: Int, dim: Int): DataFrame = {
    val gramRows = df.filter(textCol.isNotNull)
      .select(idCol.as("id"),
        explode(call_function("fnv_ngrams", lower(textCol), lit(n), lit(dim))).as("b"))
    val biasRows = df.filter(textCol.isNotNull)
      .select(idCol.as("id"), lit(biasBucket(dim).toLong).as("b"))
    gramRows.unionByName(biasRows)
  }

  /** Per-document integer scores under a weight table `(b, w)`:
    * `(id, n_feats, score)` with `score = Σ_occurrences w(b)` (absent
    * buckets weigh 0) and `n_feats` the occurrence count (bias
    * included). One narrow pass + one broadcast join; the aggregate
    * groups by document id only — map-side combine collapses the
    * occurrence stream before the shuffle. */
  private def scoreFeatures(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights), Seq("b"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w"), lit(0L))).as("score"))

  /** Train the batch perceptron: `labeled` carries `labelCol` ∈ {+1, −1}
    * (the reference-domain indicator). Returns the `(b, w)` weight
    * table after `epochs` passes — integer-exact, so any engine
    * replaying the same passes lands on the same longs. The feature
    * frame feeds every epoch and is pinned through `scope`. */
  def train(labeled: DataFrame, idCol: Column, textCol: Column, labelCol: Column,
            n: Int, dim: Int, epochs: Int,
            scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(epochs >= 1, s"train: epochs must be >= 1, got $epochs")
    val feats = scope.pin(features(labeled, idCol, textCol, n, dim))
    val labels = scope.pin(
      labeled.filter(textCol.isNotNull).select(idCol.as("id"), labelCol.as("y")))
    // epoch 1 from zero weights: every document is misclassified
    var w = scope.pin(
      feats.join(labels, Seq("id"))
        .groupBy("b").agg(sum(col("y")).cast("long").as("w")))
    (2 to epochs).foreach { _ =>
      val mis = scoreFeatures(feats, w)
        .join(labels, Seq("id"))
        .filter(col("y") * col("score") <= 0)
        .select(col("id"), col("y"))
      val delta = feats.join(mis, Seq("id"))
        .groupBy("b").agg(sum(col("y")).cast("long").as("__d"))
      // the weight table is dim+1 rows — pinning each epoch keeps the
      // lineage bounded (epochs never re-run transitively)
      w = scope.pin(
        w.join(delta, Seq("b"), "full_outer")
          .select(col("b"),
            (coalesce(col("w"), lit(0L)) + coalesce(col("__d"), lit(0L))).as("w")))
    }
    w
  }

  /** The scaled-rate scale for [[trainRates]] (the repo's 1e6
    * scaled-integer convention). */
  val RateScale = 1000000L

  /** CLOSED-FORM training — the Rocchio / nearest-centroid linear
    * model (Rocchio 1971; the standard robust text-classification
    * baseline): `w_b = S·pos_b div ptot − S·neg_b div ntot`, the
    * scaled integer difference of the classes' per-bucket occurrence
    * RATES. ONE aggregate pass, no epochs, no oscillation — the
    * operating point to DEPLOY on overlapping real-corpus classes,
    * where the batch perceptron's all-misclassified-at-once updates
    * overshoot the margin and flip the whole decision per epoch
    * (measured on this corpus: epochs alternate all-keep/all-drop;
    * the rate difference splits it cleanly). [[train]] stays the
    * iterative member for separable/near-separable reference sets
    * (its mistake-driven margin beats the centroid there). Both emit
    * the same `(b, w)` table shape — [[score]] and the streaming
    * filter take either. Exactness: integer counts, two exact
    * integral divisions per bucket — bit-identical on every engine,
    * and CLONE-INVARIANT (R·cnt div R·tot == cnt div tot exactly), so
    * the model does not merely scale under corpus growth, it is
    * bit-equal. */
  def trainRates(labeled: DataFrame, idCol: Column, textCol: Column, labelCol: Column,
                 n: Int, dim: Int,
                 scope: CacheScope = CacheScope.unmanaged): DataFrame =
    weightsFromCounts(rateCounts(labeled, idCol, textCol, labelCol, n, dim), scope)

  /** KEYED (per-partition) rate training — the CCNet/fastText
    * production shape: quality classifiers train PER LANGUAGE, one per
    * partition of the corpus (the router's `predicted_lang`). ONE
    * corpus pass and one keyed aggregate build ALL `L` models
    * (`(k, b, w)`), on the [[NgramLm.bigramModelBy]] pattern: each
    * key's slice of the output equals an independent [[trainRates]]
    * over that slice exactly — the group-by key only subdivides the
    * count groups, and the rate divisions use each key's OWN class
    * totals. 100 TB shape: output ≤ `L·(dim+1)` rows; the shuffle key
    * is `(k, b)`, map-side combined. */
  def trainRatesBy(labeled: DataFrame, idCol: Column, textCol: Column,
                   labelCol: Column, keyCol: Column, n: Int, dim: Int,
                   scope: CacheScope = CacheScope.unmanaged): DataFrame =
    weightsFromCountsBy(
      rateCountsBy(labeled, idCol, textCol, labelCol, keyCol, n, dim), scope)

  /** [[rateCounts]] with the partition key in the group:
    * `(k, b, n_pos, n_neg)` — additive per key, so keyed incremental
    * training folds exactly like the single-population state. */
  def rateCountsBy(labeled: DataFrame, idCol: Column, textCol: Column,
                   labelCol: Column, keyCol: Column, n: Int, dim: Int): DataFrame = {
    val labels = labeled.filter(textCol.isNotNull)
      .select(idCol.as("id"), keyCol.as("k"), labelCol.as("y"))
    features(labeled, idCol, textCol, n, dim)
      .join(labels, Seq("id"))
      .groupBy("k", "b").agg(
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y") === -1, 1L).otherwise(0L)).as("n_neg"))
  }

  /** [[weightsFromCounts]] per key: each key's rate divisions use its
    * own class totals (|keys| rows — broadcast). */
  def weightsFromCountsBy(counts: DataFrame,
                          scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val cls = scope.pin(counts)
    val tot = cls.groupBy("k")
      .agg(sum("n_pos").as("__pt"), sum("n_neg").as("__nt"))
    cls.join(broadcast(tot), Seq("k"))
      .select(col("k"), col("b"),
        expr(s"$RateScale * n_pos DIV __pt - $RateScale * n_neg DIV __nt").as("w"))
  }

  /** Score each document under ITS key's model slice: the [[score]]
    * arithmetic with the key in the weight join — `(id, k, n_feats,
    * score, keep)`. Absent `(k, b)` buckets weigh 0, exactly like the
    * single-population scorer's absent buckets.
    *
    * UNCOVERED-KEY CONTRACT (the NgramLm.scoreBy rule, ADVICE r17): a
    * document whose key has NO slice in the model SURFACES with
    * `score = NULL, keep = NULL` — an all-zero score would silently
    * drop the document at the keep gate, and a frozen/deployed model
    * missing a language must be visible, not a bias. */
  def scoreBy(docs: DataFrame, idCol: Column, textCol: Column, keyCol: Column,
              weights: DataFrame, n: Int, dim: Int,
              scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val w = scope.pin(weights)
    val keys = docs.filter(textCol.isNotNull)
      .select(idCol.as("id"), keyCol.as("k"))
    // |keys| rows — the coverage marker for the null-surface contract
    val covered = w.select("k").distinct().withColumn("__cov", lit(1))
    features(docs, idCol, textCol, n, dim)
      .join(keys, Seq("id"))
      .join(broadcast(w), Seq("k", "b"), "left")
      .groupBy("id", "k")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w"), lit(0L))).as("__s"))
      .join(broadcast(covered), Seq("k"), "left")
      .select(col("id"), col("k"), col("n_feats"),
        when(col("__cov").isNotNull, col("__s")).as("score"),
        when(col("__cov").isNotNull, (col("__s") > 0).cast("int")).as("keep"))
  }

  /** The rate model's persistable STATE: per-bucket class occurrence
    * counts `(b, n_pos, n_neg)`. ADDITIVE by construction — counts
    * over a corpus equal the bucket-wise sum of counts over any
    * partition of it — so incremental training is
    * [[mergeRateCounts]] of the persisted state with the arriving
    * batch's counts (the gramState / spanDigestState discipline: the
    * old corpus is never re-read), then [[weightsFromCounts]]. */
  def rateCounts(labeled: DataFrame, idCol: Column, textCol: Column, labelCol: Column,
                 n: Int, dim: Int): DataFrame = {
    val labels = labeled.filter(textCol.isNotNull).select(idCol.as("id"), labelCol.as("y"))
    features(labeled, idCol, textCol, n, dim)
      .join(labels, Seq("id"))
      .groupBy("b").agg(
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y") === -1, 1L).otherwise(0L)).as("n_neg"))
  }

  /** Fold a new batch's [[rateCounts]] into persisted state:
    * bucket-wise sums over the full outer join. */
  def mergeRateCounts(state: DataFrame, delta: DataFrame): DataFrame =
    state.join(delta.withColumnRenamed("n_pos", "__dp").withColumnRenamed("n_neg", "__dn"),
        Seq("b"), "full_outer")
      .select(col("b"),
        (coalesce(col("n_pos"), lit(0L)) + coalesce(col("__dp"), lit(0L))).as("n_pos"),
        (coalesce(col("n_neg"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n_neg"))

  /** The `(b, w)` weight table from a [[rateCounts]] state: the two
    * exact integral divisions. The counts frame feeds the totals AND
    * the rate difference — pinned through `scope`. */
  def weightsFromCounts(counts: DataFrame,
                        scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val cls = scope.pin(counts)
    val tot = cls.agg(sum("n_pos").as("__pt"), sum("n_neg").as("__nt"))
    cls.crossJoin(broadcast(tot))
      .select(col("b"),
        expr(s"$RateScale * n_pos DIV __pt - $RateScale * n_neg DIV __nt").as("w"))
  }

  /** Interchange stamp for persisted classifier models (the
    * [[TokenizerModel]] contract discipline). */
  val Format = "graft.linear-clf"
  val Version = 1

  /** Persist a trained `(b, w)` table under the interchange contract:
    * `(format string, version int, n int, dim int, b bigint,
    * w bigint)` — the feature geometry travels WITH the weights,
    * because buckets hashed under a different `(n, dim)` are
    * incomparable (the streaming filters' frozen-stamp rationale, made
    * portable). Model-sized (≤ dim+1 rows): single file. */
  def saveModel(spark: SparkSession, weights: DataFrame, n: Int, dim: Int,
                path: String): Unit =
    weights.select(lit(Format).as("format"), lit(Version).as("version"),
        lit(n).as("n"), lit(dim).as("dim"), col("b"), col("w"))
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Load a [[Format]] artifact whose stamped geometry matches the
    * caller's `(n, dim)`; fails loudly on a foreign format, a newer
    * version, missing columns, or a geometry mismatch — decoding a
    * drifted model silently re-partitions every downstream keep
    * decision. Returns the bare `(b, w)` table [[score]] takes. */
  def loadModel(spark: SparkSession, path: String, n: Int, dim: Int): DataFrame = {
    val df = spark.read.parquet(path)
    require(Set("format", "version", "n", "dim", "b", "w").subsetOf(df.columns.toSet),
      s"QualityClassifier: $path is not a $Format v$Version artifact — " +
        s"columns ${df.columns.toSet}")
    val stamp = df.select("format", "version", "n", "dim").distinct().collect()
    require(stamp.length == 1,
      s"QualityClassifier: $path carries ${stamp.length} distinct stamps — corrupt artifact")
    val s = stamp.head
    require(s.getString(0) == Format,
      s"QualityClassifier: $path carries format '${s.getString(0)}', expected " +
        s"'$Format' — refusing to decode a foreign artifact")
    require(s.getInt(1) == Version,
      s"QualityClassifier: $path carries version ${s.getInt(1)}, this engine " +
        s"reads version $Version — upgrade the engine or re-export the model")
    require(s.getInt(2) == n && s.getInt(3) == dim,
      s"QualityClassifier: $path was trained under n=${s.getInt(2)} " +
        s"dim=${s.getInt(3)}, probed with n=$n dim=$dim — buckets are " +
        "incomparable across geometries; re-train or fix the caller")
    df.select("b", "w")
  }

  /** Score `docs` under a trained `(b, w)` table: `(id, n_feats,
    * score, keep)` — `keep = score > 0` is the perceptron's decision;
    * callers wanting a different operating point threshold `score`
    * themselves. Documents with null text emit NO row (unscoreable). */
  def score(docs: DataFrame, idCol: Column, textCol: Column,
            weights: DataFrame, n: Int, dim: Int): DataFrame =
    scoreFeatures(features(docs, idCol, textCol, n, dim), weights)
      .select(col("id"), col("n_feats"), col("score"),
        (col("score") > 0).cast("int").as("keep"))
}
