package graft.operators

import org.apache.spark.sql.DataFrame

/** A handle for OPERATOR-INTERNAL caches, so library callers can release
  * them selectively instead of nuking the session cache namespace with
  * `spark.catalog.clearCache()` (which also evicts caller-owned pins).
  *
  * Operators that must pin an intermediate frame (e.g.
  * [[Dedup.jaccardVerify]]'s candidate-shingle set, read by three
  * downstream joins) call `scope.pin(df)`; the caller creates a scope,
  * consumes the operator's result, then `scope.close()` frees exactly
  * the frames that operator pinned:
  *
  * {{{
  * val scope = new CacheScope
  * val pairs = Dedup.jaccardVerify(cands, shingles, 0.8, scope)
  * pairs.write.parquet(out)   // consume while the pins are live
  * scope.close()              // release ONLY the operator's pins
  * }}}
  *
  * The default argument everywhere is [[CacheScope.unmanaged]], which
  * caches without tracking — the harness contract (Bench/Verify/
  * EtlPipeline sweep the session cache between queries) keeps working
  * unchanged, and one-shot callers keep the zero-ceremony spelling.
  */
final class CacheScope private (track: Boolean) {
  def this() = this(true)

  private val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Cache `df` and (in a tracking scope) remember it for [[close]].
    * Returns the cached frame. */
  def pin(df: DataFrame): DataFrame = synchronized {
    val c = df.cache()
    if (track) pinned += c
    c
  }

  /** Unpersist every pinned frame (non-blocking) and forget them. Safe to
    * call more than once; the scope is reusable after closing. */
  def close(): Unit = synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }
}

object CacheScope {
  /** Caches without tracking: `close()` frees nothing — the caller owns
    * cleanup via the session-level sweep. This is the default so existing
    * call sites keep their documented clearCache contract. */
  val unmanaged: CacheScope = new CacheScope(track = false)
}
