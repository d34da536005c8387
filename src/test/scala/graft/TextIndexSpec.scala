package graft

import graft.operators.TextIndex
import graft.sources.StatsIndex
import graft.sources.StatsIndex.ColRange
import org.scalatest.funsuite.AnyFunSuite

/** The inverted index must answer exactly like the index-free ranker
  * over the full posting set (pruning is a pure optimization), and the
  * zone maps must actually prune: a term's postings live in few of the
  * clustered files.
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

  test("indexed search == index-free ranker over all postings") {
    val dir = tmp()
    TextIndex.buildIndex(spark, corpus, dir, files = 4)
    val terms = Seq("beta", "delta", "nosuchterm")
    val indexed = TextIndex.search(spark, dir, terms, 10).collect().toSeq

    val post = TextIndex.postings(corpus)
    val stats = post.groupBy("term")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("df"))
      .filter(org.apache.spark.sql.functions.col("term").isin(terms: _*))
    val n = post.select("doc_id").distinct().count()
    val l = post.agg(org.apache.spark.sql.functions.sum("tf")).head.getLong(0)
    val brute = TextIndex.score(
      post.filter(org.apache.spark.sql.functions.col("term").isin(terms: _*)),
      stats, n, l, 10).collect().toSeq
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
    val stats = StatsIndex.readSidecar(spark, s"$dir/postings").get.collect().toSeq
    val total = stats.map(_.file).distinct.size
    val kept = StatsIndex.pruneFiles(stats,
      Seq(ColRange("term", Some("zeta"), Some("zeta"))))
    assert(kept.size < total,
      s"term lookup opened all $total files — clustering/sidecar broken")
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
