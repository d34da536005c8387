package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the
  * AllPairs/PPJoin family): all pairs of documents whose token-set
  * Jaccard reaches the threshold — no LSH false-negative risk, no
  * probability knob to tune. The deterministic complement to
  * [[Dedup]]'s minhash path: LSH for recall-tolerant scale sweeps,
  * prefix filtering where the contract is "every pair above t, exactly".
  *
  * The filter is the classic theorem: order every token set by one
  * GLOBAL rarest-first order and keep each set's first
  * `s - ceil(t*s) + 1` tokens (its prefix); any pair with
  * `J >= t` must share a prefix token (if the intersection avoided
  * a's prefix it would fit in a's last `ceil(t*sa) - 1` tokens, below
  * the `ceil(t*sa)` overlap J >= t forces via the length bound
  * `sb >= t*sa`). So joining on prefix tokens loses nothing, and
  * because prefixes hold each set's RAREST tokens, bucket sizes are
  * driven by the frequency tail, not the stopword head.
  *
  * Scale shape: one vocabulary-sized frequency aggregate, one per-doc
  * sort (in-row, `sort_array`), prefix explode at ~`(1-t)` of the
  * token volume, a skew-robust blocked bucket join
  * ([[PairEnum.bucketPairs]] — a viral prefix token cannot become one
  * c²/2 task) carrying prefix rank + set size as payload, then the
  * PPJoin POSITIONAL filter: a shared token at ranks (ra, rb) bounds
  * the overlap by `min(sa-ra, sb-rb) + 1`, which must reach
  * `ceil(t/(1+t)(sa+sb))` — on realistic corpora this kills the large
  * majority of shingle-coincidence candidates before the expensive
  * verify (measured 300k → 69k at sf0.1), with the length filter
  * riding the same carried sizes. [[Dedup.jaccardVerify]] is confined
  * to what survives. The corpus-wide token stream is never
  * pair-joined.
  */
object SetSimJoin {

  /** All (id_a < id_b, jaccard) pairs with Jaccard >= `threshold` over
    * `tokens` = (id, token) SET rows (dedupe upstream — positional
    * duplicates would corrupt set sizes). */
  def similarPairs(tokens: DataFrame, threshold: Double,
                   blockSize: Int = 4096,
                   scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"SetSimJoin: threshold must be in (0,1], got $threshold")
    Seq("__freq", "__toks", "__s", "__rk").foreach(c =>
      require(!tokens.columns.contains(c), s"SetSimJoin: column name $c is reserved"))
    // the token stream feeds three consumers (frequency aggregate, the
    // ordering join, exact verification) — pin it so the upstream
    // tokenization/shingling runs once, not per consumer
    val toks = scope.pin(tokens)
    // global rarest-first order = (corpus frequency, token): the tie on
    // frequency is broken by the token text so the order is total and
    // deterministic. Vocabulary-sized aggregate, token-partitioned join
    // back onto the stream (both sides already hash on token).
    val freq = toks.groupBy("token").agg(count(lit(1)).as("__freq"))
    // per-doc: in-row rarest-first sort + set size; |docs| rows out.
    // Pinned: feeds the prefix explode AND the verification arrays.
    val docs = scope.pin(toks.join(freq, "token")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__freq"), col("token")))).as("__toks"),
        count(lit(1)).as("__s")))
    // prefix length p = s - ceil(t*s) + 1, with an epsilon on the ceil:
    // double t*s landing a hair ABOVE the exact product would shorten
    // the prefix and silently drop a boundary pair — the epsilon can
    // only lengthen it (a superset of candidates, never a miss)
    val p = (col("__s") - ceil(col("__s") * lit(threshold) - lit(1e-9)) + 1).cast("int")
    // each prefix row carries its 1-based rank and the set size — the
    // payload the positional filter below needs on both pair sides
    val prefixes = docs
      .select(col("id"), col("__s"), posexplode(slice(col("__toks"), lit(1), p)))
      .select(col("col.token").as("token"), col("id"),
        (col("pos") + 1).as("__rk"), col("__s"))
    val cand = PairEnum.bucketPairs(prefixes, Seq("token"),
      payloadCols = Seq("__rk", "__s"), blockSize = blockSize)
    // PPJoin positional filter: common tokens all rank >= this shared
    // one in the global order, so overlap <= min(sa-rka, sb-rkb) + 1;
    // J >= t forces overlap >= ceil(t/(1+t)(sa+sb)) — a true pair's
    // FIRST common token satisfies both, so per-row filtering + distinct
    // loses nothing (epsilons again only widen). The length filter
    // (t*max <= min) rides the same carried sizes — no sizes join.
    val alpha = ceil((col("__s_a") + col("__s_b")) * lit(threshold / (1 + threshold))
      - lit(1e-9))
    val candFiltered = cand
      .filter((least(col("__s_a") - col("__rk_a"), col("__s_b") - col("__rk_b")) +
        lit(1) >= alpha) &&
        (least(col("__s_a"), col("__s_b")).cast("double") >=
          greatest(col("__s_a"), col("__s_b")) * lit(threshold) - lit(1e-9)))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // exact verification IN-ROW: each doc's token set is already an
    // array in `docs`, so intersection is one array_intersect per pair —
    // no pair×token explode, no per-pair aggregate (the
    // Dedup.jaccardVerify join chain exists for callers who only have a
    // token STREAM). Array frames are confined to candidate docs first
    // (broadcast semi-join), so at scale the two attach joins move a
    // vanishing fraction of the corpus.
    val candIds = candFiltered.select(col("id_a").as("id"))
      .union(candFiltered.select(col("id_b").as("id"))).distinct()
    val candDocs = docs.join(broadcast(candIds), Seq("id"), "left_semi")
      .select(col("id"),
        transform(col("__toks"), x => x("token")).as("__set"), col("__s"))
    candFiltered
      .join(candDocs.as("da"), col("id_a") === col("da.id"))
      .join(candDocs.as("db"), col("id_b") === col("db.id"))
      .withColumn("__i", size(array_intersect(col("da.__set"), col("db.__set"))))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") /
          (col("da.__s") + col("db.__s") - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
