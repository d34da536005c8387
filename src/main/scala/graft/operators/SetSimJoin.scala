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

  private def checkInput(tokens: DataFrame, threshold: Double): Unit = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"SetSimJoin: threshold must be in (0,1], got $threshold")
    Seq("__freq", "__toks", "__s", "__rk").foreach(c =>
      require(!tokens.columns.contains(c), s"SetSimJoin: column name $c is reserved"))
  }

  /** A frequency relation is VOCABULARY-sized — broadcast it when the
    * measured vocabulary fits (one bounded count over the pinned
    * aggregate, the [[PairEnum]] measured-gate discipline). With the
    * broadcast, the corpus token stream keeps its upstream id
    * partitioning through the frequency attach AND the per-doc collect:
    * the token-key shuffle of the WHOLE stream plus the id re-shuffle
    * behind it both disappear (guide §2.3 — ship the vocabulary-sized
    * metadata, not the corpus). Beyond the gate (web-scale vocabularies)
    * the plain shuffle join is the only correct shape and stays. */
  private val BroadcastVocabMax = 4000000L

  private def freqSide(freq: DataFrame, scope: CacheScope): DataFrame = {
    val f = scope.pin(freq)
    if (f.count() <= BroadcastVocabMax) broadcast(f) else f
  }

  /** Per-doc rarest-first sorted token array + set size under the
    * given global frequency order. The array holds BARE tokens (r19):
    * rank is the array position, so the struct(freq, token) wrapper —
    * which every downstream consumer (prefix explode, both verify
    * sides) paid to strip per row — drops right after the sort. */
  private[graft] def orderedDocs(tokens: DataFrame, freq: DataFrame): DataFrame =
    tokens.join(freq, "token")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__freq"), col("token")))).as("__ft"),
        count(lit(1)).as("__s"))
      .select(col("id"), transform(col("__ft"), x => x("token")).as("__toks"),
        col("__s"))

  /** Prefix rows `(token, id, __rk, __s)` — see the class doc for the
    * epsilon discipline. */
  private[graft] def prefixRows(docs: DataFrame, threshold: Double): DataFrame = {
    val p = (col("__s") - ceil(col("__s") * lit(threshold) - lit(1e-9)) + 1).cast("int")
    docs.select(col("id"), col("__s"), posexplode(slice(col("__toks"), lit(1), p)))
      .select(col("col").as("token"), col("id"),
        (col("pos") + 1).as("__rk"), col("__s"))
  }

  /** The PPJoin positional + length filter over carried
    * `__rk_a/__rk_b/__s_a/__s_b`, then dedup to bare pairs. */
  private[graft] def filterCandidates(cand: DataFrame, threshold: Double): DataFrame = {
    val alpha = ceil((col("__s_a") + col("__s_b")) * lit(threshold / (1 + threshold))
      - lit(1e-9))
    cand.filter((least(col("__s_a") - col("__rk_a"), col("__s_b") - col("__rk_b")) +
        lit(1) >= alpha) &&
        (least(col("__s_a"), col("__s_b")).cast("double") >=
          greatest(col("__s_a"), col("__s_b")) * lit(threshold) - lit(1e-9)))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** In-row exact verification: attach each side's token array
    * (candidate-confined) and intersect per pair. The candidate frame
    * feeds THREE consumers (both confinement id sets + the join spine)
    * and sits on top of the whole prefix bucket join — pin it through
    * `scope` or every consumer replays that chain. A SELF-join
    * (`docsA eq docsB`) confines ONCE on the union of both id columns
    * and reads the same pinned frame from both sides. */
  private[graft] def verifyPairs(cand0: DataFrame, docsA: DataFrame, docsB: DataFrame,
                          threshold: Double,
                          scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val cand = scope.pin(cand0)
    val selfJoin = docsA eq docsB
    val sharedConfined = if (!selfJoin) null else scope.pin {
      val ids = cand.select(col("id_a").as("id"))
        .union(cand.select(col("id_b").as("id"))).distinct()
      docsA.join(broadcast(ids), Seq("id"), "left_semi")
        .select(col("id"), col("__toks").as("__set"), col("__s"))
    }
    def confined(docs: DataFrame, side: String) =
      if (selfJoin) sharedConfined
      else {
        val ids = cand.select(col(side).as("id")).distinct()
        docs.join(broadcast(ids), Seq("id"), "left_semi")
          .select(col("id"), col("__toks").as("__set"), col("__s"))
      }
    cand
      .join(confined(docsA, "id_a").as("da"), col("id_a") === col("da.id"))
      .join(confined(docsB, "id_b").as("db"), col("id_b") === col("db.id"))
      .withColumn("__i", size(array_intersect(col("da.__set"), col("db.__set"))))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") /
          (col("da.__s") + col("db.__s") - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** All (id_a < id_b, jaccard) pairs with Jaccard >= `threshold` over
    * `tokens` = (id, token) SET rows (dedupe upstream — positional
    * duplicates would corrupt set sizes). */
  def similarPairs(tokens: DataFrame, threshold: Double,
                   blockSize: Int = 4096,
                   scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    checkInput(tokens, threshold)
    // the token stream feeds three consumers (frequency aggregate, the
    // ordering join, exact verification) — pin it so the upstream
    // tokenization/shingling runs once, not per consumer
    val toks = scope.pin(tokens)
    // global rarest-first order = (corpus frequency, token): the tie on
    // frequency is broken by the token text so the order is total and
    // deterministic. Vocabulary-sized aggregate, token-partitioned join
    // back onto the stream (both sides already hash on token).
    val freq = freqSide(
      toks.groupBy("token").agg(count(lit(1)).as("__freq")), scope)
    // per-doc: in-row rarest-first sort + set size; |docs| rows out.
    // Pinned: feeds the prefix explode AND the verification arrays.
    val docs = scope.pin(orderedDocs(toks, freq))
    val cand = PairEnum.bucketPairs(prefixRows(docs, threshold), Seq("token"),
      payloadCols = Seq("__rk", "__s"), blockSize = blockSize)
    // PPJoin positional filter: common tokens all rank >= this shared
    // one in the global order, so overlap <= min(sa-rka, sb-rkb) + 1;
    // J >= t forces overlap >= ceil(t/(1+t)(sa+sb)) — a true pair's
    // FIRST common token satisfies both, so per-row filtering + distinct
    // loses nothing (epsilons again only widen). The length filter
    // (t*max <= min) rides the same carried sizes — no sizes join.
    verifyPairs(filterCandidates(cand, threshold), docs, docs, threshold, scope)
  }

  /** Cross-collection (R-S) variant — ENTITY RESOLUTION between two
    * different tables: every (left id_a, right id_b, jaccard) pair
    * with Jaccard >= `threshold`, exactly. Both inputs are
    * `(id, token)` SET rows; ids need not be disjoint (sides are
    * distinguished by position, and no self-pair constraint applies).
    *
    * One global rarest-first order over the UNION of both sides'
    * frequencies drives both prefixes — the prefix theorem only needs
    * the order to be shared and total, and union-rarity keeps both
    * sides' prefix buckets on the frequency tail. Candidates come from
    * a plain prefix-token equi-join (no self-pairing, so no triangular
    * blocking needed; a skewed token still splits across tasks because
    * neither side self-pairs), filtered by the same positional +
    * length bounds, verified in-row. */
  def similarJoin(leftTokens: DataFrame, rightTokens: DataFrame,
                  threshold: Double,
                  scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    checkInput(leftTokens, threshold)
    checkInput(rightTokens, threshold)
    val lt = scope.pin(leftTokens)
    val rt = scope.pin(rightTokens)
    val freq = freqSide(lt.unionByName(rt)
      .groupBy("token").agg(count(lit(1)).as("__freq")), scope)
    val ldocs = scope.pin(orderedDocs(lt, freq))
    val rdocs = scope.pin(orderedDocs(rt, freq))
    def side(docs: DataFrame, s: String) =
      prefixRows(docs, threshold).select(col("token"),
        col("id").as(s"id_$s"), col("__rk").as(s"__rk_$s"), col("__s").as(s"__s_$s"))
    val cand = side(ldocs, "a").join(side(rdocs, "b"), "token")
    verifyPairs(filterCandidates(cand, threshold), ldocs, rdocs, threshold, scope)
  }
}
