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
  * c²/2 task), a candidate-sized length filter, and
  * [[Dedup.jaccardVerify]] confined to candidates. The corpus-wide
  * token stream is never pair-joined.
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
    Seq("__freq", "__toks", "__s").foreach(c =>
      require(!tokens.columns.contains(c), s"SetSimJoin: column name $c is reserved"))
    // global rarest-first order = (corpus frequency, token): the tie on
    // frequency is broken by the token text so the order is total and
    // deterministic. Vocabulary-sized aggregate, token-partitioned join
    // back onto the stream (both sides already hash on token).
    val freq = tokens.groupBy("token").agg(count(lit(1)).as("__freq"))
    // per-doc: in-row rarest-first sort + set size; |docs| rows out
    val docs = scope.pin(tokens.join(freq, "token")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__freq"), col("token")))).as("__toks"),
        count(lit(1)).as("__s")))
    // prefix length p = s - ceil(t*s) + 1, with an epsilon on the ceil:
    // double t*s landing a hair ABOVE the exact product would shorten
    // the prefix and silently drop a boundary pair — the epsilon can
    // only lengthen it (a superset of candidates, never a miss)
    val p = (col("__s") - ceil(col("__s") * lit(threshold) - lit(1e-9)) + 1).cast("int")
    val prefixes = docs.select(col("id"), explode(slice(col("__toks"), lit(1), p)).as("__pt"))
      .select(col("__pt.token").as("token"), col("id"))
    val cand = PairEnum.bucketPairs(prefixes, Seq("token"), blockSize = blockSize)
      .distinct()
    // length filter: J >= t forces t*max(sa,sb) <= min(sa,sb); epsilon
    // again so a float boundary never drops a true pair (the exact
    // threshold is re-applied by the verifier)
    val sizes = docs.select(col("id"), col("__s"))
    val lengthOk = cand
      .join(sizes.as("la"), col("id_a") === col("la.id"))
      .join(sizes.as("lb"), col("id_b") === col("lb.id"))
      .filter(least(col("la.__s"), col("lb.__s")).cast("double") >=
        greatest(col("la.__s"), col("lb.__s")) * lit(threshold) - lit(1e-9))
      .select(col("id_a"), col("id_b"))
    Dedup.jaccardVerify(lengthOk,
      tokens.select(col("id"), col("token").as("shingle")), threshold, scope)
  }
}
