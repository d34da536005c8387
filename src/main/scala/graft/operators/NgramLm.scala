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

  // r19 MEASURED NEGATIVE, kept for the record: repartitioning the
  // pinned model artifact to defaultParallelism before caching (so the
  // marginal/lookup builds read it in parallel rather than as the one
  // serial task JobProfile showed) made every consumer SLOWER —
  // q_lm_score5 3.0 -> 5.3 s, q_lm_score3 1.4 -> 2.8 s,
  // q_curation_pipeline 4.1 -> 5.5 s at sf0.1: the models are small
  // enough that the repartition's extra shuffle + 32-task stage
  // latencies cost more than the serial scans they replaced.

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

  /** KEYED (per-partition) bigram models — the CCNet per-language
    * reference-LM shape: the corpus carries a partition key (the
    * lang-ID router's `predicted_lang`), and every key's slice trains
    * its OWN independent [[bigramModel]]. ONE corpus pass and one
    * keyed aggregate build all `L` models (`(k, w1, w2, n)`), not `L`
    * passes; each key's slice of the output equals [[bigramModel]]
    * over that slice exactly (the group-by key only subdivides the
    * count groups). 100 TB shape: the output is Σ per-key observed
    * bigrams — model-sized, not corpus-sized; the shuffle key is
    * `(k, w1, w2)`, map-side combined. */
  def bigramModelBy(ref: DataFrame, idCol: Column, textCol: Column,
                    keyCol: Column): DataFrame =
    bigramsBy(docTokensBy(ref, idCol, textCol, keyCol))
      .groupBy("k", "w1", "w2").agg(count(lit(1)).as("n"))

  /** Score each document under ITS key's model slice — the [[score]]
    * arithmetic with the key in every join: transitions LEFT join the
    * model on `(k, w1, w2)` and its context totals on `(k, w1)`; the
    * smoothing vocabulary V is per key (each language smooths over its
    * own successor vocabulary, exactly as L independent [[score]]
    * calls would). Output `(id, k, n_bigrams, avg_surprisal)`.
    *
    * UNCOVERED-KEY CONTRACT (ADVICE r17): a document whose key has NO
    * slice in the model (a frozen/deployed model missing that
    * language) SURFACES with `avg_surprisal = NULL` — there is no
    * vocabulary to smooth against, so no number is honest, and an
    * inner join would make the document vanish from the output without
    * error (the silent-vanish failure class LangId.score's coverage
    * guard exists to prevent). Callers decide: a curation cut's
    * `avg_surprisal <= t` predicate drops nulls EXPLICITLY at the
    * filter, and an audit query can count them. */
  def scoreBy(docs: DataFrame, idCol: Column, textCol: Column, keyCol: Column,
              model: DataFrame,
              scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // model feeds three consumers (per-key vocab, context totals, the
    // transition join) — pin so the artifact is read once
    val m = scope.pin(model)
    val ctx = m.groupBy("k", "w1").agg(sum("n").as("__cn"))
    // |keys| rows — broadcast (the score() one-row vocab, per key).
    // LEFT: an uncovered key keeps its rows with __v null → null score
    // (see the contract above); covered keys are unaffected.
    val vocab = m.groupBy("k").agg(countDistinct("w2").as("__v"))
    bigramsBy(docTokensBy(docs, idCol, textCol, keyCol))
      .join(m, Seq("k", "w1", "w2"), "left")
      .join(ctx, Seq("k", "w1"), "left")
      .join(broadcast(vocab), Seq("k"), "left")
      .select(col("id"), col("k"),
        expr(s"$Scale * (coalesce(__cn, 0L) + __v) DIV (coalesce(n, 0L) + 1)")
          .as("__s"))
      .groupBy("id", "k")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(CAST(__s AS DECIMAL(30, 0))) DIV count(1)").as("avg_surprisal"))
  }

  /** [[docTokens]] with a partition key carried through. */
  private def docTokensBy(df: DataFrame, idCol: Column, textCol: Column,
                          keyCol: Column): DataFrame =
    df.select(idCol.as("id"), keyCol.as("k"),
        concat(array(lit(Bos)),
          filter(split(lower(textCol), " "), w => w =!= "")).as("t"))
      .filter(size(col("t")) >= 2)

  /** [[bigrams]] with the key carried through. */
  private def bigramsBy(toks: DataFrame): DataFrame =
    toks.select(col("id"), col("k"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("id"), col("k"), col("b.w1").as("w1"), col("b.w2").as("w2"))

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

  /** One row per order-`k` window over the (k−1)-BOS-padded stream —
    * the [[trigrams]] generalization: a document with L tokens
    * contributes exactly L windows, every real token scored once as
    * the window's last word `w$k`. */
  private def ngrams(toks: DataFrame, k: Int): DataFrame = {
    val win = transform(sequence(lit(1), size(col("t")) - (k - 1)),
      i => struct((1 to k).map(j =>
        element_at(col("t"), i + (j - 1)).as(s"w$j")): _*))
    toks.select(col("id"), explode(win).as("b"))
      .select(col("id") +: (1 to k).map(j => col(s"b.w$j").as(s"w$j")): _*)
  }

  /** Train an ORDER-`k` model: the `(w1..wk, n)` observed-ngram count
    * table over the reference corpus — ONE table is the whole backoff
    * model at ANY order (the [[trigramModel]] argument generalizes:
    * every lower-order count is a suffix marginal of it, because each
    * padded-stream j-gram ending at position p ≥ k is the tail of
    * exactly one k-gram window). CCNet's operating point is k = 5 on a
    * KenLM; this is that artifact shape, integer-exact. */
  def ngramModel(ref: DataFrame, idCol: Column, textCol: Column, order: Int): DataFrame = {
    require(order >= 2, s"ngramModel: order must be >= 2, got $order")
    ngrams(docTokens(ref, idCol, textCol, nBos = order - 1), order)
      .groupBy("w1", (2 to order).map(j => s"w$j"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Score `docs` under an order-`k` [[ngramModel]] with stupid
    * backoff at ARBITRARY order — [[scoreBackoff]]'s tier ladder
    * generalized (identical scores at k = 3, spec-pinned): tier d
    * (d = 0 full k-gram, then successive suffixes) scores
    * `s = 5^d·S·ctx_d div (2^d·cnt_d)` — the scaled integer
    * reciprocal of `α^d · cnt_d/ctx_d` with α = 2/5 — and the final
    * tier is the add-one unigram ceiling
    * `5^(k−1)·S·(N+V) div (2^(k−1)·(u+1))`. Bound: the α reciprocals
    * multiply [[Scale]] by (5/2)^(k−1) — at k = 5 a single window
    * tops out at `625·S·(N+V)/16`, inside a long through ~10¹⁰
    * reference tokens (drop [[Scale]] to 10³ beyond); the document
    * sum rides the exact DECIMAL.
    *
    * Scale shape: one persisted artifact, k−1 bounded marginal
    * aggregates over it (never a second corpus pass), k token-keyed
    * broadcast-or-shuffle joins against the document windows, one
    * 1-row scalar attach. Output `(id, n_ngrams, avg_surprisal)`. */
  def scoreBackoffN(docs: DataFrame, idCol: Column, textCol: Column,
                    model: DataFrame, order: Int,
                    scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val k = order
    require(k >= 2, s"scoreBackoffN: order must be >= 2, got $k")
    // the model artifact feeds 2(k-1) marginal consumers — pin it.
    // (r18 measured NEGATIVE result, kept for the record: deriving the
    // marginals as chains — cnt_d from cnt_{d-1}, ctx_d from cnt_d —
    // reads fewer total rows but SERIALIZES what are here independent
    // broadcast-build jobs over the pinned artifact, and the extra
    // cache materializations lengthen the critical path: q_lm_score5
    // went 3.15 → 5.5 s at sf0.1. The flat spelling keeps all 2(k-1)
    // marginal builds running concurrently.)
    val m = scope.pin(model)
    val ws = (1 to k).map(j => s"w$j")
    // cnt_d: count of the (k-d)-gram suffix; ctx_d: its context
    val cnts = (1 to k - 2).map(d =>
      d -> m.groupBy(ws.drop(d).head, ws.drop(d).tail: _*).agg(sum("n").as(s"__c$d")))
    val ctxs = (0 to k - 2).map(d =>
      d -> m.groupBy(ws.slice(d, k - 1).head, ws.slice(d, k - 1).tail: _*)
        .agg(sum("n").as(s"__x$d")))
    val u = m.groupBy(s"w$k").agg(sum("n").as("__u"))
    val tot = m.agg(sum("n").as("__nn"), countDistinct(s"w$k").as("__v"))
    var joined = ngrams(docTokens(docs, idCol, textCol, nBos = k - 1), k)
      .join(m.withColumnRenamed("n", "__c0"), ws, "left")
    ctxs.foreach { case (d, f) => joined = joined.join(f, ws.slice(d, k - 1), "left") }
    cnts.foreach { case (d, f) => joined = joined.join(f, ws.drop(d), "left") }
    joined = joined.join(u, Seq(s"w$k"), "left").crossJoin(broadcast(tot))
    def p5(d: Int): Long = math.pow(5, d).toLong
    def p2(d: Int): Long = math.pow(2, d).toLong
    val tiers = (0 to k - 2).map(d =>
      (col(s"__c$d").isNotNull,
        expr(s"${p5(d)}L * $Scale * __x$d DIV (${p2(d)}L * __c$d)")))
    val fallback = expr(
      s"${p5(k - 1)}L * $Scale * (__nn + __v) DIV (${p2(k - 1)}L * (coalesce(__u, 0L) + 1L))")
    val score = tiers.tail.foldLeft(when(tiers.head._1, tiers.head._2)) {
      case (acc, (c, s)) => acc.when(c, s)
    }.otherwise(fallback)
    joined.select(col("id"), score.as("__s"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_ngrams"),
        expr("sum(CAST(__s AS DECIMAL(30, 0))) DIV count(1)").as("avg_surprisal"))
  }

  /** COUNT-PRUNED per-order backoff artifact — the 100 TB shape of
    * [[ngramModel]]: at web scale the observed-5-gram table is
    * CORPUS-sized (nearly every window is distinct — the "3-5 orders
    * smaller" property of bigrams does not survive to order 5), and
    * the production answer (Brants et al. 2007 §3) is per-order count
    * tables pruned at a count floor — singleton high-order n-grams,
    * the overwhelming bulk, drop; scoring backs off through the floors
    * as if they were unseen.
    *
    * One corpus pass builds every order: the (order−1)-BOS-padded
    * stream's j-windows for j = 1..order, each `(len, gram, n)` with
    * `gram` the space-joined tokens (single-space tokenization
    * upstream makes the join key unambiguous), pruned at
    * `minCounts(j-1)`. Floors must be NON-DECREASING in j with
    * `minCounts(0) == 1`: a surviving j-gram's occurrences each
    * contain its length-(j−1) prefix, so `count(prefix) ≥ count(gram)
    * ≥ floor_j ≥ floor_{j-1}` — every surviving numerator's
    * denominator is guaranteed present, and the exact unigram floor
    * keeps the final tier's N and V exact. */
  def prunedBackoffModel(ref: DataFrame, idCol: Column, textCol: Column,
                         order: Int, minCounts: Seq[Long]): DataFrame = {
    require(order >= 2, s"prunedBackoffModel: order must be >= 2, got $order")
    require(minCounts.length == order,
      s"prunedBackoffModel: need $order floors (order 1..$order), got ${minCounts.length}")
    require(minCounts.head == 1L,
      s"prunedBackoffModel: the unigram floor must be 1 (exact N/V), got ${minCounts.head}")
    require(minCounts.zip(minCounts.tail).forall { case (a, b) => a <= b },
      s"prunedBackoffModel: floors must be non-decreasing in order, got $minCounts")
    val toks = docTokens(ref, idCol, textCol, nBos = order - 1)
    (1 to order).map { j =>
      ngrams(toks, j)
        .groupBy(concat_ws(" ", (1 to j).map(i => col(s"w$i")): _*).as("gram"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCounts(j - 1))
        .select(lit(j).as("len"), col("gram"), col("n"))
    }.reduce(_ unionByName _)
  }

  /** Stupid backoff over a [[prunedBackoffModel]]: the
    * [[scoreBackoffN]] tier ladder, but every count — numerator AND
    * denominator — is a `gram`-string lookup in the per-order pruned
    * tables (a floored-out suffix scores as unseen and falls through,
    * exactly the Brants et al. behavior). Output
    * `(id, n_ngrams, avg_surprisal)`. */
  def scoreBackoffPruned(docs: DataFrame, idCol: Column, textCol: Column,
                         model: DataFrame, order: Int,
                         scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val k = order
    require(k >= 2, s"scoreBackoffPruned: order must be >= 2, got $k")
    // the artifact feeds the tier lookups + the unigram total — pin it
    val m = scope.pin(model)
    def gramOf(from: Int, to: Int): Column =
      concat_ws(" ", (from to to).map(i => col(s"w$i")): _*)
    // r18: ONE lookup relation for every tier. The per-tier spelling
    // (filter len = j, join on gram) built 2(k-1)+1 DIFFERENT broadcast
    // relations — nine separate build jobs over the artifact at k = 5.
    // Keying the WHOLE model by "len gram" (space-safe: len digits
    // carry no space, gram tokens are single-space-joined) makes every
    // tier probe the SAME build subtree with `concat(lit("j "), gram)`,
    // so Spark's ReuseExchange ships ONE broadcast and the 2k-1 lookups
    // share it. Same lookups row-for-row: (len, gram) is the model key.
    val mk = m.select(concat(col("len"), lit(" "), col("gram")).as("__lg"),
      col("n").as("__mn"))
    def probe(len: Int, gram: Column): Column = concat(lit(s"$len "), gram)
    var joined = ngrams(docTokens(docs, idCol, textCol, nBos = k - 1), k)
    (0 to k - 2).foreach { d =>
      val cnt = mk.select(col("__lg").as(s"__g$d"), col("__mn").as(s"__c$d"))
      joined = joined.join(cnt, probe(k - d, gramOf(d + 1, k)) === col(s"__g$d"), "left")
        .drop(s"__g$d")
    }
    (0 to k - 2).foreach { d =>
      val ctx = mk.select(col("__lg").as(s"__h$d"), col("__mn").as(s"__x$d"))
      joined = joined.join(ctx, probe(k - 1 - d, gramOf(d + 1, k - 1)) === col(s"__h$d"), "left")
        .drop(s"__h$d")
    }
    val u = mk.select(col("__lg").as("__gu"), col("__mn").as("__u"))
    val tot = m.filter(col("len") === 1)
      .agg(sum("n").as("__nn"), count(lit(1)).as("__v"))
    joined = joined.join(u, probe(1, col(s"w$k")) === col("__gu"), "left").drop("__gu")
      .crossJoin(broadcast(tot))
    def p5(d: Int): Long = math.pow(5, d).toLong
    def p2(d: Int): Long = math.pow(2, d).toLong
    val tiers = (0 to k - 2).map(d =>
      (col(s"__c$d").isNotNull,
        expr(s"${p5(d)}L * $Scale * __x$d DIV (${p2(d)}L * __c$d)")))
    val fallback = expr(
      s"${p5(k - 1)}L * $Scale * (__nn + __v) DIV (${p2(k - 1)}L * (coalesce(__u, 0L) + 1L))")
    val score = tiers.tail.foldLeft(when(tiers.head._1, tiers.head._2)) {
      case (acc, (c, s)) => acc.when(c, s)
    }.otherwise(fallback)
    joined.select(col("id"), score.as("__s"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_ngrams"),
        expr("sum(CAST(__s AS DECIMAL(30, 0))) DIV count(1)").as("avg_surprisal"))
  }

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
    // the model artifact feeds five marginal consumers — pin it (the
    // flat spelling is deliberate; see the measured note in
    // [[scoreBackoffN]] — chained marginals serialize these builds)
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
