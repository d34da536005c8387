package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.sources.StatsIndex
import graft.sources.StatsIndex.ColRange

/** Inverted text index: persisted, INCREMENTALLY MAINTAINED posting
  * lists with an integer-exact BM25-style ranker — keyword search over
  * a corpus without scanning the corpus at query time, and index
  * refresh from a CDC feed without rebuilding the index.
  *
  * Layout (the Lucene segment model re-based onto parquet dirs):
  * {{{
  * dir/segments/seg_<n>/postings/    (term, doc_id, tf, dl, seg) — term-clustered + zone-map sidecar
  * dir/segments/seg_<n>/tombstones/  (doc_id) — postings of this doc in segments < n are dead
  * dir/terms/                        (term, df) — maintained by delta, swap-replaced
  * dir/corpus/                       (n_docs, total_tokens) — ditto
  * }}}
  *
  * [[buildIndex]] writes segment 0; [[applyDelta]] turns a
  * [[SnapshotDiff.diffWithPayload]] feed into segment n+1: new/changed
  * docs' postings are APPENDED (immutable segment, term-clustered,
  * zone-mapped like any other), changed/removed docs are TOMBSTONED,
  * and the tiny term/corpus stats roll forward by [[MatView]]-style
  * delta arithmetic — the old snapshot is touched only by a
  * feed-confined semi-join, the index never rewrites a segment. A
  * query reads every segment's zone-map-admitted files and drops
  * tombstoned (doc, seg<asof) rows via one broadcast join — tombstone
  * volume is churn-bounded; [[compactIndex]] folds segments back to
  * one and empties it.
  *
  * Crash contract (single writer, like every maintenance loop here):
  * segment data lands before the stats swap, so a crash between them
  * leaves aux tables one delta behind the authoritative segments —
  * and that state is DETECTED, not assumed away: the corpus stats row
  * carries `asof_seg`, the segment id the stats reflect (written last,
  * CdcStream generation-marker style). [[search]] refuses loudly when
  * the marker lags the segment listing; [[applyDelta]] self-repairs by
  * compacting first ([[compactIndex]] rebuilds both stats tables
  * exactly from the authoritative postings). Without the marker the
  * drift would compound silently — every later delta rolling forward
  * from stale stats. Stats swaps ride
  * [[graft.sinks.Sinks.swapIn]]/healSwap; on object stores use a
  * [[graft.sinks.GenTable]]-rooted `dir`.
  *
  * Query ([[search]]): each term resolves through the zone maps to the
  * files whose `[min_term, max_term]` range contains it — at 100 TB a
  * 5-term query opens a handful of files per segment, never the
  * corpus. Query-term stats are a broadcast lookup; scoring is a map
  * over matched postings, one aggregate per candidate doc, and a
  * bounded top-k (TakeOrdered — no global sort).
  *
  * Scoring is BM25 (k1=1.2, b=0.75) with one deliberate divergence:
  * the idf LOG is replaced by its rational argument
  * `(2(N-df)+1)/(2df+1)` — same per-term ordering (both monotone
  * decreasing in df), but every operation stays 64-bit integer (scaled
  * by 1e6, integral division), so scores are bit-identical in any
  * engine and the whole ranker is DuckDB-oracle-able — the same
  * exact-integer-ranking trade the ANN family makes. Swap `ln` in
  * where cross-engine bit parity is not required. Bounds: the scaled
  * product stays under 2^63 for corpora to ~5e6 docs × doc length
  * 1e4; beyond that, drop the 1e6 scale to 1e4.
  */
object TextIndex {

  private val SegPrefix = "seg_"

  /** Posting rows from a document table: `(term, doc_id, tf, dl)`.
    * Tokenization is the corpus contract shared with TextQueries:
    * whitespace split of the lowercased text. One explode + one
    * (doc, term) aggregate; `dl` rides a same-key window (the id
    * exchange), not a second corpus pass. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .select("term", "doc_id", "tf", "dl")
  }

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (segId, segPath) pairs, ascending. Package-visible so the
    * scale-growth harness can count segments without a public listing
    * API. */
  private[graft] def segments(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val root = new Path(s"$dir/segments")
    val fs = fsOf(spark, dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(SegPrefix))
      .flatMap(p => p.getName.stripPrefix(SegPrefix).toLongOption
        .map(id => (id, p.toString)))
      .sortBy(_._1)
  }

  private def writeSegment(spark: SparkSession, dir: String, segId: Long,
                           post: DataFrame, tombstones: Option[DataFrame],
                           files: Int, feedMark: Option[String] = None): Unit = {
    val seg = f"$dir/segments/$SegPrefix$segId%09d"
    graft.sinks.Sinks.writeClustered(post.withColumn("seg", lit(segId)),
      s"$seg/postings", Seq("term"), files)
    StatsIndex.writeSidecar(
      StatsIndex.fromFooters(spark, s"$seg/postings", Seq("term")), s"$seg/postings")
    tombstones.foreach(_.select("doc_id").write.mode("overwrite")
      .parquet(s"$seg/tombstones"))
    // the feed marker lands AFTER the segment data commits and BEFORE
    // any stats swap — see applyDelta's exactly-once contract
    feedMark.foreach(d => writeFeedMarker(spark, seg, d))
  }

  /** Order-independent digest of a CDC feed — the applyDelta replay
    * detector. Three components: row count, bit_xor of per-row hashes
    * (commutative, overflow-free under ANSI), and total payload length
    * — the length term shrinks the surface where two DIFFERENT
    * consecutive feeds would need both an xor collision and an equal
    * row count to be silently dropped. Nulls in removed rows' payload
    * fold as absent, which is fine for a retry detector.
    *
    * Known, accepted behaviors of a digest-based detector:
    *  - two consecutive EMPTY feeds share the digest by construction,
    *    so a legitimate second empty delta is skipped — correct (an
    *    empty feed changes nothing; the only effect is that no empty
    *    segment is written) and documented here rather than papered
    *    over;
    *  - two consecutive feeds with IDENTICAL content likewise dedupe,
    *    which is exactly the retry case the marker exists for.
    *
    * Also returns the doc-count delta (Σ added − removed) from the
    * SAME one-pass aggregate — applyDelta needs both, and the feed is
    * the diff chain's first materialization, so one fused job beats
    * two passes over the cache (and two fixed job overheads). */
  private def feedDigestAndDocDelta(feedC: DataFrame, idCol: String,
                                    textCol: String): (String, Long) = {
    val r = feedC.agg(count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(xxhash64(`$idCol`, change_type, `$textCol`))"),
        lit(0L)).as("x"),
      coalesce(sum(length(col(textCol))), lit(0L)).as("len"),
      coalesce(sum(when(col("change_type") === "added", 1L)
        .when(col("change_type") === "removed", -1L).otherwise(0L)), lit(0L)).as("dd"))
      .head
    (s"${r.getAs[Long]("n")}_${r.getAs[Long]("x")}_${r.getAs[Long]("len")}",
      r.getAs[Long]("dd"))
  }

  /** Does `marker` match this feed's digest? Accepts the current
    * `n_x_len` form AND its `n_x` prefix (the pre-payload-length
    * format): without the legacy check, the first feed RETRIED across
    * the digest-format upgrade would mismatch the old marker and be
    * re-applied — exactly the replay the marker exists to stop. The
    * prefix compare is safe: `n` and `x` alone were the entire old
    * digest, so a legacy marker equals the new digest's first two
    * components iff the old detector would have matched. */
  private def markerMatches(marker: String, digest: String): Boolean =
    marker == digest ||
      marker == digest.split("_", -1).take(2).mkString("_")

  private def writeFeedMarker(spark: SparkSession, segPath: String, digest: String): Unit = {
    val fs = fsOf(spark, segPath)
    val out = fs.create(new Path(s"$segPath/_feed"), true)
    try out.write(digest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readFeedMarker(spark: SparkSession, segPath: String): Option[String] = {
    val fs = fsOf(spark, segPath)
    val p = new Path(s"$segPath/_feed")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Swap-replace a tiny stats table (terms/corpus): stage, then the
    * two-rename swap with heal on the next read. */
  /** Stats tables are vocabulary-sized at most — without the coalesce
    * the upstream join's 32 shuffle partitions land 32 near-empty
    * parquet files per swap, inflating every later stats read, the
    * swap itself, and any caller-side index copy. 4 files keeps even a
    * tens-of-millions-term vocabulary comfortable. */
  private val StatsFiles = 4

  private def replaceStats(spark: SparkSession, target: String, df: DataFrame): Unit = {
    val fs = fsOf(spark, target)
    val staged = new Path(s"$target.__staged")
    fs.delete(staged, true)
    df.coalesce(StatsFiles).write.parquet(staged.toString)
    if (fs.exists(new Path(target)))
      graft.sinks.Sinks.swapIn(fs, staged, new Path(target), new Path(s"$target.__backup"))
    else { fs.rename(staged, new Path(target)); () }
  }

  private def readStats(spark: SparkSession, target: String): DataFrame = {
    graft.sinks.Sinks.healSwap(fsOf(spark, target),
      new Path(target), new Path(s"$target.__backup"))
    spark.read.parquet(target)
  }

  /** Build + persist the index under `dir` as segment 0. `files`
    * bounds each segment's posting file count — at scale size it so
    * one term's postings span few files. */
  def buildIndex(spark: SparkSession, docs: DataFrame, dir: String,
                 files: Int = 16, idCol: String = "doc_id",
                 textCol: String = "text"): Unit = {
    // three consumers (segment write, term stats, corpus stats) — pin
    // so tokenization runs once; build-local scope, released on exit
    val scope = new CacheScope
    try {
      val post = scope.pin(postings(docs, idCol, textCol))
      writeSegment(spark, dir, 0L, post, None, files)
      statsFrom(spark, post, dir, asofSeg = 0L)
    } finally scope.close()
  }

  private def statsFrom(spark: SparkSession, post: DataFrame, dir: String,
                        asofSeg: Long): Unit = {
    replaceStats(spark, s"$dir/terms",
      post.groupBy("term").agg(count(lit(1)).as("df")))
    replaceStats(spark, s"$dir/corpus",
      post.agg(countDistinct(col("doc_id")).as("n_docs"),
        coalesce(sum(col("tf")), lit(0L)).as("total_tokens"))
        .withColumn("asof_seg", lit(asofSeg)))
  }

  /** The segment id the stats tables reflect (rides the corpus row,
    * which is replaced LAST — so marker == id means every stats swap
    * for that delta completed). None for a pre-marker index, which
    * cannot be verified. */
  private def statsAsof(spark: SparkSession, dir: String): Option[Long] = {
    val c = readStats(spark, s"$dir/corpus")
    if (!c.columns.contains("asof_seg")) None
    else Some(c.head.getAs[Long]("asof_seg"))
  }

  /** Detect the crash window the class doc describes (segment landed,
    * stats swap didn't): stats marker behind the last segment. The
    * drift would otherwise COMPOUND silently — every later delta rolls
    * forward from already-stale stats and search mis-ranks until some
    * operator happens to compact. Returns the last segment id when
    * consistent. */
  private def staleBy(spark: SparkSession, dir: String): Option[Long] = {
    val last = segments(spark, dir).lastOption.map(_._1)
    for (l <- last; asof <- statsAsof(spark, dir) if asof != l) yield l - asof
  }

  /** Fold a [[SnapshotDiff.diffWithPayload]] feed over the documents
    * into the index: one new segment (postings of added/changed docs +
    * tombstones for changed/removed), term/corpus stats rolled forward
    * by delta — `oldDocs` (the snapshot the index currently reflects)
    * is read only through a feed-confined semi-join for the retracted
    * postings. Equivalent to rebuilding on the new snapshot, which
    * TextIndexSpec pins search-for-search. */
  def applyDelta(spark: SparkSession, dir: String, oldDocs: DataFrame,
                 feed: DataFrame, files: Int = 4, idCol: String = "doc_id",
                 textCol: String = "text"): Unit = {
    // every pin this delta creates (feed cache, the delta aggregate,
    // the terms localCheckpoint, compaction's fold) is swept on exit —
    // a sustained CDC loop must not accumulate one pinned stats table
    // per applied delta
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    try applyDeltaInner(spark, dir, oldDocs, feed, files, idCol, textCol)
    finally {
      val persisted = spark.sparkContext.getPersistentRDDs
      persisted.keys.filterNot(pinnedBefore)
        .foreach(id => persisted(id).unpersist(blocking = false))
    }
  }

  private def applyDeltaInner(spark: SparkSession, dir: String, oldDocs: DataFrame,
                              feed: DataFrame, files: Int, idCol: String,
                              textCol: String): Unit = {
    // delta-local scope: feed (four consumers), plusPost (two), and the
    // stats delta (two) pin for the duration of the apply and release
    // on every exit path (applyDelta's RDD sweep remains the backstop
    // for localCheckpoint blocks, which are not cache entries)
    val scope = new CacheScope
    try applyDeltaPinned(spark, dir, oldDocs, feed, files, idCol, textCol, scope)
    finally scope.close()
  }

  private def applyDeltaPinned(spark: SparkSession, dir: String, oldDocs: DataFrame,
                               feed: DataFrame, files: Int, idCol: String,
                               textCol: String, scope: CacheScope): Unit = {
    // the feed is consumed four times (digest, retractions, additions,
    // the doc-count delta) and is typically the product of a diff
    // chain — pin it for the duration of the delta
    val feedC = scope.pin(feed)
    // EXACTLY-ONCE on retry: a segment carries the digest of the feed
    // that built it (written after the segment data commits, before
    // any stats swap). If the LAST segment already carries THIS feed's
    // digest, the call is a crash-retry (segment landed, stats swap
    // didn't) or a duplicate — either way the content already lives in
    // the postings (the all-keys tombstones made the segment
    // self-healing), and rolling the stats forward AGAIN would
    // double-apply the delta: heal stats if the crash window hit,
    // never re-apply. Without the marker a plain retry silently
    // over-counted df/total_tokens/n_docs for every doc in the feed.
    // (Residual window: a crash between the segment-data commit and
    // the one-file marker write still retries as a fresh apply — the
    // postings stay correct via tombstones; only the stats drift, and
    // compactIndex repairs them.)
    val (digest, dDocs) = feedDigestAndDocDelta(feedC, idCol, textCol)
    val lastSeg = segments(spark, dir).lastOption
    if (lastSeg.exists(s =>
        readFeedMarker(spark, s._2).exists(markerMatches(_, digest)))) {
      if (staleBy(spark, dir).isDefined) compactIndex(spark, dir, files)
      return // the caller's scope releases the feed pin
    }
    // self-heal the documented crash window before compounding on it: a
    // stale stats marker means a prior delta's segment landed without
    // its stats swap — compaction rebuilds stats exactly from the
    // authoritative postings (this is a maintenance entry point, so
    // repairing here is in-contract; the read-only search() refuses
    // loudly instead)
    if (staleBy(spark, dir).isDefined) compactIndex(spark, dir, files)
    val segId = segments(spark, dir).lastOption.map(_._1 + 1).getOrElse(
      throw new IllegalStateException(s"TextIndex.applyDelta: no index at $dir"))
    val retractIds = broadcast(
      feedC.filter(col("change_type").isin("removed", "changed"))
        .select(col(idCol)))
    // tombstones cover EVERY feed key, not just changed/removed: a doc
    // labeled 'added' by an upsert-style producer that already lives in
    // an earlier segment would otherwise keep both copies and
    // double-count in scoring — an all-keys tombstone is the same
    // bounded size and makes the segment self-healing (stats deltas
    // still follow the labels; a mislabeled add skews df/corpus stats
    // only, never posting content)
    val tombstoneIds = broadcast(feedC.select(col(idCol)))
    // plusPost feeds the segment write and the stats delta — pin;
    // minusPost has one consumer (the delta union), no pin needed
    val minusPost = postings(
      oldDocs.join(retractIds, Seq(idCol), "left_semi"), idCol, textCol)
    val plusPost = scope.pin(postings(
      feedC.filter(col("change_type") =!= "removed")
        .select(col(idCol), col(textCol)), idCol, textCol))
    writeSegment(spark, dir, segId, plusPost,
      Some(tombstoneIds.select(col(idCol).as("doc_id"))), files,
      feedMark = Some(digest))
    // ONE aggregate carries both stats deltas — exact integers: per
    // term, df rolls forward by the ±1 posting weights (__d); globally,
    // Σ(±tf) IS added-minus-retracted total tokens (dl = Σ tf per doc),
    // so the corpus constant needs no second pass over either posting
    // side. Pinned: the terms join and the token aggregate both read it.
    val delta = scope.pin(
      plusPost.select(col("term"), lit(1L).as("__w"), col("tf"))
        .unionByName(minusPost.select(col("term"), lit(-1L).as("__w"), col("tf")))
        .groupBy("term").agg(sum(col("__w")).as("__d"),
          sum(col("__w") * col("tf")).as("__t")))
    val terms = readStats(spark, s"$dir/terms")
      .join(delta.select("term", "__d"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("__d"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    // no lineage cut needed: replaceStats stages the write to a side
    // path and swaps only after the write job (which fully drains the
    // read of the old files) completes — the checkpoint this replaced
    // was a whole extra materialization of the term table per delta
    replaceStats(spark, s"$dir/terms", terms)
    // corpus constants: |terms|-sized and feed-sized aggregates only
    val dTokens = delta.agg(coalesce(sum(col("__t")), lit(0L))).head.getLong(0)
    // dDocs rode the feedDigest aggregate — no second feed pass
    val c = readStats(spark, s"$dir/corpus").head
    replaceStats(spark, s"$dir/corpus",
      spark.range(1).select(
        lit(c.getAs[Long]("n_docs") + dDocs).as("n_docs"),
        lit(c.getAs[Long]("total_tokens") + dTokens).as("total_tokens"),
        lit(segId).as("asof_seg")))
    // pins released by the caller's scope
  }

  /** Live postings across all segments: every segment's rows minus
    * those a LATER segment tombstoned. A non-empty `terms` list
    * confines each segment read through its zone maps — ONE sidecar
    * read and ONE scan per segment, keeping the union of each term's
    * admitted files (point ranges share the sidecar; per-term scans
    * would pay |terms| jobs for the same files). */
  private[graft] def livePostings(spark: SparkSession, dir: String,
                                  terms: Seq[String]): DataFrame = {
    val segs = segments(spark, dir)
    require(segs.nonEmpty, s"TextIndex: no index at $dir")
    val post = segs.map { case (_, p) =>
      val seg = s"$p/postings"
      if (terms.isEmpty) spark.read.parquet(seg)
      else StatsIndex.readSidecar(spark, seg) match {
        case None => spark.read.parquet(seg).filter(col("term").isin(terms: _*))
        case Some(stats) =>
          val st = stats.collect().toSeq
          // posting files the sidecar doesn't cover (partial sidecar
          // write) are kept unconditionally — same conservative-absence
          // rule as StatsIndex.prunedRead
          val kept = (terms.flatMap(t => StatsIndex.pruneFiles(st,
            Seq(ColRange("term", Some(t), Some(t))))) ++
            StatsIndex.unindexedFiles(spark, seg, st)).distinct.sorted
          val base =
            if (kept.isEmpty) spark.read.parquet(seg).where(lit(false))
            else spark.read.parquet(kept.map(f => s"$seg/$f"): _*)
          base.filter(col("term").isin(terms: _*))
      }
    }.reduce(_ unionByName _)
    val fs = fsOf(spark, dir)
    val tombs = segs.filter { case (_, p) => fs.exists(new Path(s"$p/tombstones")) }
      .map { case (id, p) => spark.read.parquet(s"$p/tombstones")
        .select(col("doc_id"), lit(id).as("__asof")) }
    if (tombs.isEmpty) post
    else {
      val dead = broadcast(tombs.reduce(_ unionByName _)
        .groupBy("doc_id").agg(max(col("__asof")).as("__asof")))
      post.join(dead, Seq("doc_id"), "left")
        .filter(col("__asof").isNull || col("seg") >= col("__asof"))
        .drop("__asof")
    }
  }

  /** Fold every segment back into one and clear tombstones; term and
    * corpus stats are recomputed exactly from the authoritative
    * postings (also the crash-repair path — see class doc). */
  def compactIndex(spark: SparkSession, dir: String, files: Int = 16): Unit = {
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    // the fold preserves the LAST segment's feed marker: a compaction
    // that runs as crash-repair must not forget which feed the crashed
    // segment carried, or the very next retry of that feed would
    // re-apply it (the exactly-once contract in applyDelta)
    val lastMark = segments(spark, dir).lastOption
      .flatMap(s => readFeedMarker(spark, s._2))
    val live = livePostings(spark, dir, Seq.empty).drop("seg")
      .localCheckpoint(true) // materialize before the dirs it reads are replaced
    try {
      val fs = fsOf(spark, dir)
      val staged = new Path(s"$dir/segments.__staged")
      fs.delete(staged, true)
      graft.sinks.Sinks.writeClustered(live.withColumn("seg", lit(0L)),
        s"$staged/${SegPrefix}000000000/postings", Seq("term"), files)
      StatsIndex.writeSidecar(
        StatsIndex.fromFooters(spark, s"$staged/${SegPrefix}000000000/postings", Seq("term")),
        s"$staged/${SegPrefix}000000000/postings")
      lastMark.foreach(d =>
        writeFeedMarker(spark, s"$staged/${SegPrefix}000000000", d))
      graft.sinks.Sinks.swapIn(fs, staged, new Path(s"$dir/segments"),
        new Path(s"$dir/segments.__backup"))
      statsFrom(spark, live, dir, asofSeg = 0L)
    } finally {
      // free the fold's pinned materialization (a sustained CDC loop
      // otherwise accumulates one full-corpus snapshot per compaction)
      val persisted = spark.sparkContext.getPersistentRDDs
      persisted.keys.filterNot(pinnedBefore)
        .foreach(id => persisted(id).unpersist(blocking = false))
    }
  }

  /** Top-`k` docs for `terms`: `(doc_id, n_terms, score_scaled)`,
    * ranked by the integer BM25 score then doc_id. Each term reads
    * only its zone-map-admitted posting files per segment; corpus
    * constants and query-term stats are a bounded driver/broadcast
    * model (two longs + |terms| rows). */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
             k: Int): DataFrame = {
    require(terms.nonEmpty, "TextIndex.search: empty term list")
    graft.sinks.Sinks.healSwap(fsOf(spark, dir),
      new Path(s"$dir/segments"), new Path(s"$dir/segments.__backup"))
    // refuse to rank on stale stats: mis-ranking is silent, this isn't
    staleBy(spark, dir).foreach { lag =>
      throw new IllegalStateException(
        s"TextIndex at $dir: stats lag the segments by $lag delta(s) — a prior " +
        "applyDelta crashed between its segment write and stats swap. Run " +
        "compactIndex (or applyDelta, which self-repairs) before searching.")
    }
    val c = readStats(spark, s"$dir/corpus").head()
    val (n, l) = (c.getAs[Long]("n_docs"), c.getAs[Long]("total_tokens"))
    val stats = broadcast(readStats(spark, s"$dir/terms")
      .filter(col("term").isin(terms: _*)))
    score(livePostings(spark, dir, terms), stats, n, l, k)
  }

  /** The ranker alone, over already-matched postings — the leg
    * [[search]] and a from-scratch (index-free) caller share. */
  def score(matched: DataFrame, termStats: DataFrame, nDocs: Long,
            totalTokens: Long, k: Int): DataFrame =
    matched.join(termStats, "term")
      .withColumn("__idf_s",
        expr(s"((2 * ($nDocs - df) + 1) * 1000000) DIV (2 * df + 1)"))
      .withColumn("__tfc_s",
        expr(s"(2200000 * tf * 1000000) DIV " +
          s"(1000000 * tf + 300000 + (900000 * dl * $nDocs) DIV $totalTokens)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("(__idf_s * __tfc_s) DIV 1000000")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
      .limit(k)
}
