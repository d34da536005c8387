package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.StatsIndex
import graft.sources.StatsIndex.ColRange

/** Inverted text index: persisted posting lists with an integer-exact
  * BM25-style ranker — keyword search over a corpus without scanning
  * the corpus at query time.
  *
  * Layout ([[buildIndex]]): one postings table `(term, doc_id, tf, dl)`
  * written CLUSTERED on `term` (range-partitioned + sorted, the
  * [[graft.sinks.Sinks.writeClustered]] layout) with a
  * [[StatsIndex]] zone-map sidecar, plus a tiny `(term, df)` term-stats
  * table and a one-row corpus-stats table. Doc length is denormalized
  * into the posting row — the classic posting-list trade: +8 bytes/row
  * buys query-time freedom from a per-doc join.
  *
  * Query ([[search]]): each query term resolves through the zone maps
  * to the files whose `[min_term, max_term]` rectangle contains it —
  * at 100 TB a 5-term query opens a handful of files, never the
  * corpus. Term stats for the query terms are a broadcast-sized
  * lookup; scoring is a map over the matched postings, one aggregate
  * per candidate doc, and a bounded top-k (TakeOrdered — no global
  * sort).
  *
  * Scoring is BM25 (k1=1.2, b=0.75) with one deliberate divergence:
  * the idf LOG is replaced by its rational argument
  * `(2(N-df)+1)/(2df+1)` — same ordering per term (both monotone
  * decreasing in df), but every operation stays 64-bit integer
  * (scaled by 1e6, integral division), so scores are bit-identical in
  * any engine and the whole ranker is DuckDB-oracle-able — the same
  * exact-integer-ranking trade the ANN family makes
  * (SimilarityQueries). Swap `ln` in where cross-engine bit parity is
  * not required. Bounds: the scaled product stays under 2^63 for
  * corpora to ~5e6 docs × doc length 1e4; beyond that, drop Scale to
  * 1e4.
  */
object TextIndex {

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

  /** Build + persist the index under `dir`: clustered postings with a
    * zone-map sidecar (`dir/postings`), per-term document frequency
    * (`dir/terms`), and the corpus constants (`dir/corpus`). `files`
    * bounds the posting table's file count — at scale size it so one
    * term's postings span few files. */
  def buildIndex(spark: SparkSession, docs: DataFrame, dir: String,
                 files: Int = 16, idCol: String = "doc_id",
                 textCol: String = "text"): Unit = {
    val post = postings(docs, idCol, textCol)
    graft.sinks.Sinks.writeClustered(post, s"$dir/postings", Seq("term"), files)
    StatsIndex.writeSidecar(
      StatsIndex.fromFooters(spark, s"$dir/postings", Seq("term")), s"$dir/postings")
    post.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/terms")
    post.agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("tf")).as("total_tokens"))
      .write.mode("overwrite").parquet(s"$dir/corpus")
  }

  /** Top-`k` docs for `terms` against the index at `dir`:
    * `(doc_id, n_terms, score_scaled)`, ranked by the integer BM25
    * score then doc_id. Each term reads only its zone-map-admitted
    * posting files; the corpus constants and query-term stats are a
    * bounded driver/broadcast model (two longs + |terms| rows). */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
             k: Int): DataFrame = {
    require(terms.nonEmpty, "TextIndex.search: empty term list")
    val c = spark.read.parquet(s"$dir/corpus").head()
    val (n, l) = (c.getAs[Long]("n_docs"), c.getAs[Long]("total_tokens"))
    val stats = broadcast(spark.read.parquet(s"$dir/terms")
      .filter(col("term").isin(terms: _*)))
    val matched = terms.map { t =>
      StatsIndex.prunedRead(spark, s"$dir/postings",
        Seq(ColRange("term", Some(t), Some(t))))
    }.reduce(_ unionByName _)
    score(matched, stats, n, l, k)
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
