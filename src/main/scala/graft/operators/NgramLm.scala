package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model QUALITY SCORING — the perplexity-filter step
  * of a pretraining curation pipeline (score every document by how
  * unlikely its token sequence is under a reference-corpus bigram
  * model; prune the tail): CCNet/Gopher curate with a KenLM
  * perplexity, and this is that niche spelled RELATIONALLY, shaped for
  * 100 TB:
  *
  *  - TRAINING is one corpus pass: the reference corpus folds to a
  *    `(w1, w2, n)` bigram count table (map-side combined, one
  *    shuffle) — the model is vocabulary²-bounded in principle and
  *    observed-bigram-bounded in practice, 3-5 orders smaller than the
  *    corpus, and persists as a plain parquet artifact next to the
  *    corpus (the [[EditDist.gramState]] discipline).
  *  - SCORING is two token-partitioned joins: per-document bigrams
  *    LEFT join the model on `(w1, w2)` and its context totals on
  *    `w1`, then one per-document aggregate. The corpus is touched
  *    once; nothing pairs with anything.
  *  - The per-bigram score is the INTEGER-EXACT smoothed unlikelihood
  *    `surprisal = (S · (ctx(w1) + V)) div (n(w1, w2) + 1)` — the
  *    scaled RECIPROCAL of the add-one-smoothed transition probability
  *    `P(w2|w1) = (n+1)/(ctx+V)`. Log-free on purpose: `ln` is a libm
  *    call whose final ulps differ across engines (the
  *    q_tfidf_topterms precedent), where this integer form is
  *    bit-identical everywhere and ORDER-EQUIVALENT to per-bigram
  *    log-probability (x ↦ 1/x is monotone). The document score is
  *    the MEAN scaled surprisal over its bigrams — the arithmetic-mean
  *    sibling of perplexity's geometric mean (exp of mean log): ranks
  *    differ only in how outlier bigrams are weighted (the arithmetic
  *    mean punishes single very-unlikely transitions harder, which is
  *    usually what a contamination/garbage filter wants); callers
  *    needing the literal log-space mean swap one line
  *    (`log(p_scaled)`) off the oracled path.
  *
  * Each document's token stream is prefixed with [[Bos]] so the first
  * token is scored as a transition too (the standard sentence-start
  * convention). Unseen contexts score `S·V`, the ceiling — an
  * out-of-domain document saturates rather than escaping the scale.
  *
  * Reference scope: beyond-reference (the brief's quality-scoring
  * surface); published technique only (Jelinek-style add-one bigram
  * smoothing; CCNet's filter-by-LM-score pipeline shape).
  */
object NgramLm {

  /** Sentence-start marker — scores the first real token's transition. */
  val Bos = "<s>"

  /** The surprisal scale (1e6, the repo's scaled-integer convention).
    * Bound: a single bigram's score tops out at `Scale · (ctx + V)`,
    * which must fit a long — good through ~10¹² reference-corpus
    * tokens at this scale (drop to 10³ beyond); the per-document SUM
    * rides an exact DECIMAL so document length never overflows the
    * aggregate. */
  val Scale = 1000000L

  /** BOS-prefixed token arrays: `(id, t)` with `t = [<s>…, tok, ...]`
    * (`nBos` markers); documents with no tokens (empty/whitespace text)
    * carry no transitions and are dropped HERE, symmetrically with the
    * oracle's empty `range`. */
  private def docTokens(df: DataFrame, idCol: Column, textCol: Column,
                        nBos: Int = 1): DataFrame =
    df.select(idCol.as("id"),
        concat(array(Seq.fill(nBos)(lit(Bos)): _*),
          filter(split(lower(textCol), " "), w => w =!= "")).as("t"))
      .filter(size(col("t")) >= nBos + 1)

  /** One row per adjacent transition: `(id, w1, w2)`. */
  private def bigrams(toks: DataFrame): DataFrame =
    toks.select(col("id"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Train: the `(w1, w2, n)` bigram count table over the reference
    * corpus — the persistable model artifact. Context totals and the
    * vocabulary size derive from it ([[score]] does both internally),
    * so ONE table is the whole model. */
  def bigramModel(ref: DataFrame, idCol: Column, textCol: Column): DataFrame =
    bigrams(docTokens(ref, idCol, textCol))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))

  /** Score `docs` under `model` (a [[bigramModel]] table): per document
    * the transition count and the mean scaled surprisal
    * `avg_surprisal = (Σ surprisal) div n_bigrams`. Output
    * `(id, n_bigrams, avg_surprisal)`, one row per document with ≥1
    * token. Higher = less like the reference corpus. */
  def score(docs: DataFrame, idCol: Column, textCol: Column,
            model: DataFrame,
            scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // model feeds three consumers (vocab scalar, context totals, the
    // transition join) — pin so the artifact is read once
    val m = scope.pin(model)
    val ctx = m.groupBy("w1").agg(sum("n").as("__cn"))
    // V = distinct successor vocabulary (the smoothing denominator's
    // add-V term); a one-row frame crossed in — the min-max pattern
    val vocab = m.agg(countDistinct("w2").as("__v"))
    bigrams(docTokens(docs, idCol, textCol))
      .join(m, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        expr(s"$Scale * (coalesce(__cn, 0L) + __v) DIV (coalesce(n, 0L) + 1)")
          .as("__s"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        // decimal accumulation: per-bigram scores near the long ceiling
        // must not overflow the document sum; DIV is the exact integral
        // divide (divideToIntegralValue), so the mean floors identically
        // to the oracle's HUGEINT //
        expr("sum(CAST(__s AS DECIMAL(30, 0))) DIV count(1)").as("avg_surprisal"))
  }

  /** One row per trigram window over the double-BOS-padded stream:
    * `(id, w1, w2, w3)` — a document with L tokens contributes exactly
    * L windows (positions 1..L of `[<s>, <s>, tok…]`), so every real
    * token is scored once as a `w3`. */
  private def trigrams(toks: DataFrame): DataFrame =
    toks.select(col("id"), explode(transform(
        sequence(lit(1), size(col("t")) - 2),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2"),
          element_at(col("t"), i + 2).as("w3")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"), col("b.w3").as("w3"))

  /** Train the ORDER-3 model: the `(w1, w2, w3, n)` trigram count table
    * over the reference corpus. ONE table is the whole backoff model —
    * every lower order is a marginal of it:
    *
    *  - trigram context `ctx2(w1,w2) = Σ_w3 n`;
    *  - bigram counts `b2(w2,w3) = Σ_w1 n` (each padded-stream bigram
    *    at positions ≥ 2 is the tail of exactly one trigram window);
    *  - bigram context `ctx1(w2) = Σ_{w1,w3} n`;
    *  - unigram counts `u1(w3) = Σ_{w1,w2} n` (every real token is a
    *    `w3` exactly once) with total `N = Σ n` and vocabulary
    *    `V = |distinct w3|`.
    *
    * So the persisted artifact stays ONE observed-trigram-bounded
    * parquet table (the [[bigramModel]]/[[EditDist.gramState]]
    * discipline) and scoring derives the marginals with three bounded
    * aggregates over it — never a second corpus pass. */
  def trigramModel(ref: DataFrame, idCol: Column, textCol: Column): DataFrame =
    trigrams(docTokens(ref, idCol, textCol, nBos = 2))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n"))

  /** Score `docs` under a [[trigramModel]] with STUPID BACKOFF (Brants
    * et al. 2007, "Large Language Models in Machine Translation" — the
    * count-based backoff used at corpus scale precisely because it
    * needs no discount fitting): per trigram `(w1, w2, w3)`,
    *
    *  - seen trigram: `p = n3 / ctx2(w1,w2)` →
    *    `s = S·ctx2 div n3`;
    *  - unseen trigram, seen tail bigram: `p = α·b2(w2,w3)/ctx1(w2)`
    *    with `α = 2/5` → `s = 5·S·ctx1 div (2·b2)`;
    *  - neither: add-one-smoothed unigram `p = α²·(u1(w3)+1)/(N+V)` →
    *    `s = 25·S·(N+V) div (4·(u1+1))` — an OOV token saturates at
    *    the ceiling instead of escaping the scale.
    *
    * All three tiers are the scaled INTEGER reciprocal of the backoff
    * score (the [[score]] rationale: log-free, bit-identical across
    * engines, order-equivalent per trigram to log-probability). Bound:
    * the α reciprocals multiply the scale by ≤ 25/4, so a single
    * trigram's score tops out at `25·S·(N+V)/4` — inside a long
    * through ~10¹¹ reference tokens (drop [[Scale]] to 10³ beyond);
    * the per-document sum rides the same exact DECIMAL as [[score]].
    *
    * Output `(id, n_trigrams, avg_surprisal)`, one row per document
    * with ≥ 1 token; higher = less like the reference. */
  def scoreBackoff(docs: DataFrame, idCol: Column, textCol: Column,
                   model: DataFrame,
                   scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // the model artifact feeds five marginal consumers — pin it
    val m = scope.pin(model)
    val ctx2 = m.groupBy("w1", "w2").agg(sum("n").as("__c2"))
    val b2 = m.groupBy("w2", "w3").agg(sum("n").as("__b2"))
    val ctx1 = m.groupBy("w2").agg(sum("n").as("__c1"))
    val u1 = m.groupBy("w3").agg(sum("n").as("__u1"))
    val tot = m.agg(sum("n").as("__nn"), countDistinct("w3").as("__v"))
    trigrams(docTokens(docs, idCol, textCol, nBos = 2))
      .join(m.withColumnRenamed("n", "__n3"), Seq("w1", "w2", "w3"), "left")
      .join(ctx2, Seq("w1", "w2"), "left")
      .join(b2, Seq("w2", "w3"), "left")
      .join(ctx1, Seq("w2"), "left")
      .join(u1, Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("id"),
        when(col("__n3").isNotNull, expr(s"$Scale * __c2 DIV __n3"))
          .when(col("__b2").isNotNull, expr(s"5L * $Scale * __c1 DIV (2L * __b2)"))
          .otherwise(expr(s"25L * $Scale * (__nn + __v) DIV (4L * (coalesce(__u1, 0L) + 1L))"))
          .as("__s"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"),
        expr("sum(CAST(__s AS DECIMAL(30, 0))) DIV count(1)").as("avg_surprisal"))
  }
}
