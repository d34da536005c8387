package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC-style snapshot diff: classify every key of two table versions as
  * added / removed / changed, emitting only the changes (the feed an
  * incremental downstream — index refresh, re-embedding, cache
  * invalidation — consumes).
  *
  * Scale design: each side reduces to `(key, 16-byte md5 digest)`
  * BEFORE the full-outer join, so the join exchange carries digests,
  * never full rows — the same trade as [[Dedup.exactByDigest]] (at a
  * 2^-64-scale collision risk a changed row could digest-collide and
  * read as unchanged; swap in the raw-column comparison where that is
  * unacceptable). The join shuffles both sides by key once; with the
  * snapshots bucketed by key on disk it is exchange-free.
  *
  * Digest canonicalization (`rowDigest`) is engine-portable BY
  * CONSTRUCTION so the operator stays on the DuckDB-oracled path:
  * every value is rendered to text with engine-stable formats
  * (integers/strings as-is; money through DECIMAL, timestamps through
  * epoch millis — double/timestamp native text rendering differs
  * between engines) and nulls become an explicit 0x02 sentinel —
  * `concat_ws` SKIPS nulls, so without the sentinel ("a", null) and
  * ("a") would collide — before md5 over a 0x01-joined byte string.
  */
object SnapshotDiff {

  /** md5 hex digest over canonicalized value columns. Callers pass the
    * values already rendered engine-stable (see class doc); this adds
    * the null sentinel and the field separator.
    *
    * Each non-null value is length-prefixed (`<len>:<value>`,
    * netstring-style) so free text CONTAINING the separator or
    * sentinel cannot shift field boundaries into a deterministic
    * collision — ("ab\u0001c") vs ("a", "b\u0001c") digest
    * differently — and a literal "\u0002" value ("1:\u0002") never
    * collides with NULL (the bare un-prefixed sentinel). */
  def rowDigest(values: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      values.map { v =>
        val s = v.cast("string")
        coalesce(concat(length(s).cast("string"), lit(":"), s), lit("\u0002"))
      }: _*).cast("binary"))

  /** Diff two snapshots on `keys`, with `digest` the canonicalized
    * row-content digest present in both inputs. Emits one row per
    * changed key: `(keys..., change_type ∈ added|removed|changed)`.
    * Unchanged keys are filtered before anything leaves the join. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           keys: Seq[String], digest: Column): DataFrame =
    diffDigests(
      oldSnap.select(keys.map(col) :+ digest.as("digest"): _*),
      newSnap.select(keys.map(col) :+ digest.as("digest"): _*), keys)

  /** Same classification over already-digested tables
    * `(keys..., digest)` — the form a persisted digest STATE table
    * takes (see [[graft.streaming.CdcStream]]): the expensive
    * canonicalization runs once per snapshot generation, and
    * successive diffs join 24-byte rows only. */
  def diffDigests(oldDig: DataFrame, newDig: DataFrame,
                  keys: Seq[String]): DataFrame = {
    // "digest" names the content column of the digested form and
    // "change_type" the classification output; a key of either name
    // would alias-collide or be silently overwritten
    require(!keys.contains("digest"),
      "SnapshotDiff: 'digest' is reserved for the content digest column")
    require(!keys.contains("change_type"),
      "SnapshotDiff: 'change_type' is reserved for the classification column")
    val o = oldDig.select(keys.map(col) :+ col("digest").as("__d_old"): _*)
    val n = newDig.select(keys.map(col) :+ col("digest").as("__d_new"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__d_old").isNull, lit("added"))
          .when(col("__d_new").isNull, lit("removed"))
          .when(col("__d_old") =!= col("__d_new"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }

  /** [[diff]] carrying the NEW row content for added/changed keys
    * (removed keys carry nulls) — the feed a replication consumer can
    * actually APPLY. Payload attaches by a second key join confined to
    * the change set: the full snapshot's content never rides the diff
    * exchange, only the (typically tiny) changed fraction's. */
  def diffWithPayload(oldSnap: DataFrame, newSnap: DataFrame,
                      keys: Seq[String], digest: Column): DataFrame = {
    require(!newSnap.columns.contains("change_type"),
      "SnapshotDiff: snapshot column 'change_type' would collide with the feed's classification")
    diff(oldSnap, newSnap, keys, digest)
      .join(newSnap, keys, "left")
  }

  /** Reconstruct snapshot N+1 from snapshot N plus a
    * [[diffWithPayload]] feed: surviving old rows (key not in the
    * feed) union the feed's added/changed payloads. The inverse
    * property `applyChanges(old, diffWithPayload(old, new)) == new`
    * is pinned exactly in ProfileSpec and against the DuckDB oracle
    * (q_snapshot_apply). At scale the anti-join ships only the feed's
    * keys; old rows move within their existing partitions. */
  def applyChanges(oldSnap: DataFrame, feed: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val payloadCols = oldSnap.columns.toSeq
    oldSnap.join(feed.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(
        feed.filter(col("change_type") =!= "removed")
          .select(payloadCols.map(col): _*))
  }
}
