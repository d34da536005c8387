package graft

import graft.operators.{SnapshotDiff, TextIndex}
import graft.sources.StatsIndex
import graft.sources.StatsIndex.ColRange
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.scalatest.funsuite.AnyFunSuite

/** The inverted index must answer exactly like the index-free ranker
  * over the full posting set (pruning and segmenting are pure
  * optimizations), a delta-maintained index must answer exactly like
  * one rebuilt on the new corpus, and compaction must change nothing
  * but the segment count.
  */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta beta gamma"),
    (2L, "beta gamma gamma delta delta delta"),
    (3L, "alpha alpha alpha"),
    (4L, "delta epsilon"),
    (5L, "zeta zeta beta alpha gamma")).toDF("doc_id", "text")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_tindex_").toString

  private def searchRows(dir: String, terms: Seq[String]) =
    TextIndex.search(spark, dir, terms, 10).collect().toSeq

  test("indexed search == index-free ranker over all postings") {
    val dir = tmp()
    TextIndex.buildIndex(spark, corpus, dir, files = 4)
    val terms = Seq("beta", "delta", "nosuchterm")
    val indexed = searchRows(dir, terms)

    val post = TextIndex.postings(corpus)
    val stats = post.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("term").isin(terms: _*))
    val n = post.select("doc_id").distinct().count()
    val l = post.agg(sum("tf")).head.getLong(0)
    val brute = TextIndex.score(
      post.filter(col("term").isin(terms: _*)), stats, n, l, 10).collect().toSeq
    assert(indexed == brute)
    // every doc containing beta or delta matches; doc 3 (alpha only) not
    assert(indexed.map(_.getLong(0)).toSet == Set(1L, 2L, 4L, 5L))
  }

  test("scores are deterministic integers with the documented ordering") {
    val dir = tmp()
    TextIndex.buildIndex(spark, corpus, dir, files = 2)
    val out = TextIndex.search(spark, dir, Seq("delta"), 10).collect()
    // df(delta)=2 of 5 docs; doc 2 has tf=3 of dl=6, doc 4 tf=1 of dl=2:
    // same tf/dl ratio, but BM25 tf-saturation ranks tf=3 higher
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 4L))
    val scores = out.map(_.getLong(2))
    assert(scores.head > scores(1) && scores.forall(_ > 0))
  }

  test("zone maps prune posting files for a point term") {
    val dir = tmp()
    TextIndex.buildIndex(spark, corpus, dir, files = 4)
    val seg = s"$dir/segments/seg_000000000/postings"
    val stats = StatsIndex.readSidecar(spark, seg).get.collect().toSeq
    val total = stats.map(_.file).distinct.size
    val kept = StatsIndex.pruneFiles(stats,
      Seq(ColRange("term", Some("zeta"), Some("zeta"))))
    assert(kept.size < total,
      s"term lookup opened all $total files — clustering/sidecar broken")
  }

  private def feedOf(o: DataFrame, n: DataFrame): DataFrame =
    SnapshotDiff.diffWithPayload(o, n, Seq("doc_id"),
      SnapshotDiff.rowDigest(Seq(col("text"))))

  test("applyDelta == rebuild on the new corpus (add, change, remove)") {
    // vs corpus: doc 2 changed, doc 4 removed, doc 6 added, rest kept
    val newCorpus = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "omega omega beta"),
      (3L, "alpha alpha alpha"),
      (5L, "zeta zeta beta alpha gamma"),
      (6L, "delta zeta omega")).toDF("doc_id", "text")
    val incr = tmp(); val rebuilt = tmp()
    TextIndex.buildIndex(spark, corpus, incr, files = 3)
    TextIndex.applyDelta(spark, incr, corpus, feedOf(corpus, newCorpus), files = 2)
    TextIndex.buildIndex(spark, newCorpus, rebuilt, files = 3)
    for (terms <- Seq(Seq("beta"), Seq("omega", "delta"), Seq("alpha", "zeta", "omega")))
      assert(searchRows(incr, terms) == searchRows(rebuilt, terms),
        s"delta-maintained index diverged from rebuild for $terms")
    // removed doc 4 must be gone even though its postings still sit in seg 0
    assert(!searchRows(incr, Seq("epsilon")).exists(_.getLong(0) == 4L))
    // stats rolled forward exactly
    def corpusRow(d: String) = spark.read.parquet(s"$d/corpus").head
    assert(corpusRow(incr).getLong(0) == corpusRow(rebuilt).getLong(0))
    assert(corpusRow(incr).getLong(1) == corpusRow(rebuilt).getLong(1))
  }

  test("chained deltas then compaction preserve answers and fold segments") {
    val s0 = corpus
    val s1 = Seq((1L, "alpha beta beta gamma"), (2L, "omega omega beta"),
      (3L, "alpha alpha alpha"), (5L, "zeta zeta beta alpha gamma"),
      (6L, "delta zeta omega")).toDF("doc_id", "text")
    val s2 = Seq((1L, "alpha beta beta gamma"), (2L, "omega omega beta"),
      (6L, "delta zeta omega gamma gamma")).toDF("doc_id", "text")
    val dir = tmp()
    TextIndex.buildIndex(spark, s0, dir, files = 2)
    TextIndex.applyDelta(spark, dir, s0, feedOf(s0, s1), files = 2)
    TextIndex.applyDelta(spark, dir, s1, feedOf(s1, s2), files = 2)
    val terms = Seq("gamma", "omega", "beta")
    val before = searchRows(dir, terms)
    TextIndex.compactIndex(spark, dir, files = 2)
    assert(searchRows(dir, terms) == before, "compaction changed answers")
    val segDirs = new java.io.File(s"$dir/segments").listFiles()
      .filter(_.getName.startsWith("seg_"))
    assert(segDirs.length == 1, s"expected one folded segment, got ${segDirs.length}")
    // and the folded index still equals a from-scratch build
    val rebuilt = tmp()
    TextIndex.buildIndex(spark, s2, rebuilt, files = 2)
    assert(searchRows(dir, terms) == searchRows(rebuilt, terms))
  }

  test("stale stats (crash between segment write and stats swap) detected, not compounded") {
    val s1 = Seq((1L, "alpha beta beta gamma"), (2L, "omega omega beta"),
      (3L, "alpha alpha alpha"), (5L, "zeta zeta beta alpha gamma"),
      (6L, "delta zeta omega")).toDF("doc_id", "text")
    val dir = tmp()
    TextIndex.buildIndex(spark, corpus, dir, files = 2)
    TextIndex.applyDelta(spark, dir, corpus, feedOf(corpus, s1), files = 2)
    // simulate the crash window: segment 1 is on disk but the stats
    // marker still claims segment 0 (the exact state a crash between
    // writeSegment and the final stats swap leaves behind)
    val c = spark.read.parquet(s"$dir/corpus").head
    spark.range(1).select(lit(c.getLong(0)).as("n_docs"),
        lit(c.getLong(1)).as("total_tokens"), lit(0L).as("asof_seg"))
      .write.mode("overwrite").parquet(s"$dir/corpus")
    // read path: loud refusal, never a silent mis-rank
    val e = intercept[IllegalStateException] {
      TextIndex.search(spark, dir, Seq("beta"), 10).collect()
    }
    assert(e.getMessage.contains("stats lag the segments"), e.getMessage)
    // maintenance path: self-repairs (compact rebuilds stats from the
    // authoritative postings), then the next delta lands cleanly and
    // the result equals a from-scratch build
    val s2 = Seq((1L, "alpha beta beta gamma"), (2L, "omega omega beta"),
      (6L, "delta zeta omega gamma gamma")).toDF("doc_id", "text")
    TextIndex.applyDelta(spark, dir, s1, feedOf(s1, s2), files = 2)
    val rebuilt = tmp()
    TextIndex.buildIndex(spark, s2, rebuilt, files = 2)
    for (terms <- Seq(Seq("beta"), Seq("gamma", "omega")))
      assert(searchRows(dir, terms) == searchRows(rebuilt, terms),
        s"post-repair index diverged from rebuild for $terms")
  }

  test("a crashed or duplicated applyDelta with the same feed applies exactly once") {
    val s1 = Seq((1L, "alpha beta beta gamma"), (2L, "omega omega beta"),
      (3L, "alpha alpha alpha"), (5L, "zeta zeta beta alpha gamma"),
      (6L, "delta zeta omega")).toDF("doc_id", "text")
    val dir = tmp()
    TextIndex.buildIndex(spark, corpus, dir, files = 2)
    // snapshot the PRE-delta stats so the crash window can be replayed
    val termsBefore = spark.read.parquet(s"$dir/terms").collect().toSeq
    val corpusBefore = spark.read.parquet(s"$dir/corpus").head
    val feed = feedOf(corpus, s1)
    TextIndex.applyDelta(spark, dir, corpus, feed, files = 2)
    // crash simulation: the delta's segment (and its feed marker) are
    // on disk, but BOTH stats swaps were lost — the state an orchestrator
    // retrying the same applyDelta call finds
    termsBefore.map(r => (r.getString(0), r.getLong(1))).toDF("term", "df")
      .write.mode("overwrite").parquet(s"$dir/terms")
    spark.range(1).select(lit(corpusBefore.getLong(0)).as("n_docs"),
        lit(corpusBefore.getLong(1)).as("total_tokens"), lit(0L).as("asof_seg"))
      .write.mode("overwrite").parquet(s"$dir/corpus")
    // the retry must heal the stats and NOT roll the delta forward
    // again (pre-fix: df/total_tokens/n_docs double-counted every feed
    // doc while postings stayed correct — a silent mis-rank)
    TextIndex.applyDelta(spark, dir, corpus, feed, files = 2)
    val rebuilt = tmp()
    TextIndex.buildIndex(spark, s1, rebuilt, files = 2)
    def corpusRow(d: String) = spark.read.parquet(s"$d/corpus").head
    assert(corpusRow(dir).getLong(0) == corpusRow(rebuilt).getLong(0), "n_docs double-applied")
    assert(corpusRow(dir).getLong(1) == corpusRow(rebuilt).getLong(1), "total_tokens double-applied")
    for (terms <- Seq(Seq("beta"), Seq("omega", "delta"), Seq("alpha", "zeta")))
      assert(searchRows(dir, terms) == searchRows(rebuilt, terms),
        s"post-retry index diverged from rebuild for $terms")
    // plain duplicate (no crash): a second identical call is a no-op
    TextIndex.applyDelta(spark, dir, corpus, feed, files = 2)
    assert(corpusRow(dir).getLong(0) == corpusRow(rebuilt).getLong(0))
    assert(corpusRow(dir).getLong(1) == corpusRow(rebuilt).getLong(1))
    assert(searchRows(dir, Seq("beta")) == searchRows(rebuilt, Seq("beta")))
    // and a genuinely NEW feed afterwards still applies normally
    val s2 = Seq((1L, "alpha beta beta gamma"), (2L, "omega omega beta"),
      (6L, "delta zeta omega gamma gamma")).toDF("doc_id", "text")
    TextIndex.applyDelta(spark, dir, s1, feedOf(s1, s2), files = 2)
    val rebuilt2 = tmp()
    TextIndex.buildIndex(spark, s2, rebuilt2, files = 2)
    assert(searchRows(dir, Seq("gamma", "omega")) == searchRows(rebuilt2, Seq("gamma", "omega")))
  }

  test("an upsert-style feed mislabeling an existing doc as 'added' does not double-post") {
    val dir = tmp()
    TextIndex.buildIndex(spark, corpus, dir, files = 2)
    // doc 3 already exists (alpha x3); a producer re-ships it as 'added'
    val feed = Seq((3L, "added", "alpha omega"))
      .toDF("doc_id", "change_type", "text")
    TextIndex.applyDelta(spark, dir, corpus, feed, files = 2)
    // the OLD copy is present on disk in segment 0 ...
    val seg0 = spark.read.parquet(s"$dir/segments/seg_000000000/postings")
    assert(seg0.filter(col("doc_id") === 3L).count() == 1) // (alpha, tf=3)
    // ... but tombstoned: doc 3's LIVE postings are the new content
    // only — (alpha,1,2) and (omega,1,2), never the seg-0 row stacked
    // on top (df/corpus stats still follow the labels, so a mislabeled
    // add skews STATS, not posting content — the documented contract)
    val alive = TextIndex.search(spark, dir, Seq("alpha", "omega"), 10)
      .filter(col("doc_id") === 3L).collect()
    assert(alive.length == 1 && alive.head.getLong(1) == 2,
      "doc 3 must match both new terms exactly once")
    val tomb = spark.read.parquet(s"$dir/segments/seg_000000001/tombstones")
      .collect().map(_.getLong(0)).toSet
    assert(tomb == Set(3L), "the 'added' key must be tombstoned too")
  }

  test("k bounds the result and empty term lists are rejected") {
    val dir = tmp()
    TextIndex.buildIndex(spark, corpus, dir, files = 2)
    assert(TextIndex.search(spark, dir, Seq("alpha", "beta"), 2).count() == 2)
    intercept[IllegalArgumentException] {
      TextIndex.search(spark, dir, Seq.empty, 5)
    }
  }
}
