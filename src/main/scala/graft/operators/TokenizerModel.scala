package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tokenizer-model INTERCHANGE — the documented parquet contract that
  * lets a trained [[Bpe]]/[[Unigram]]/[[WordPiece]] artifact leave the engine (and
  * arrive from outside it): the HuggingFace-style split of a ranks
  * file (BPE merges in application order) and a piece table (unigram
  * pieces with log-weights), each as ONE self-describing parquet table
  * with a format/version stamp in every row. Stable column contract:
  *
  *  - BPE ranks table (`format = "graft.bpe"`, `version = 1`):
  *    `(format string, version int, rank int, lhs string, rhs string,
  *    n bigint)` — `rank` is application priority (0 first; row order
  *    in the file is NOT significant), `lhs`/`rhs` the merged symbol
  *    pair over the trained alphabet (chars + `</w>`, or byte
  *    stand-ins from [[ByteLevel]] — the alphabet travels with the
  *    symbols), `n` the winning frequency (provenance).
  *  - Unigram piece table (`format = "graft.unigram"`, `version = 1`):
  *    `(format string, version int, piece string, log_weight double,
  *    count bigint)` — `log_weight` the piece's log-probability,
  *    `count` the final EM count (provenance / prune order).
  *
  * Loads VALIDATE loudly: a missing column, a foreign format tag, or a
  * newer version fails with the stamp in the message instead of
  * decoding garbage — the cross-process sibling of the streaming
  * filters' frozen-model digests. The tables are model-sized (≤ vocab
  * rows), so single-file layout and driver-side collect are the right
  * shape at any corpus scale. */
object TokenizerModel {

  val FormatBpe = "graft.bpe"
  val FormatUnigram = "graft.unigram"
  val FormatWordPiece = "graft.wordpiece"
  val Version = 1

  /** Persist a trained BPE rule list under the interchange contract. */
  def saveBpe(spark: SparkSession, rules: Seq[Bpe.MergeRule], path: String): Unit = {
    import spark.implicits._
    rules.map(r => (FormatBpe, Version, r.rank, r.lhs, r.rhs, r.n))
      .toDF("format", "version", "rank", "lhs", "rhs", "n")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[FormatBpe]] artifact, rank-ordered; fails loudly on a
    * foreign format or version. */
  def loadBpe(spark: SparkSession, path: String): Seq[Bpe.MergeRule] = {
    val df = spark.read.parquet(path)
    stampCheck(df.columns.toSet, Set("rank", "lhs", "rhs", "n"), FormatBpe, path)
    val rows = df.select("format", "version", "rank", "lhs", "rhs", "n").collect()
    rows.foreach(r => stampCheck(r.getString(0), r.getInt(1), FormatBpe, path))
    rows.map(r => Bpe.MergeRule(r.getInt(2), r.getString(3), r.getString(4), r.getLong(5)))
      .sortBy(_.rank).toSeq
  }

  /** Persist a trained unigram piece list under the interchange
    * contract. */
  def saveUnigram(spark: SparkSession, model: Seq[Unigram.Piece], path: String): Unit = {
    import spark.implicits._
    model.map(p => (FormatUnigram, Version, p.piece, p.weight, p.count))
      .toDF("format", "version", "piece", "log_weight", "count")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[FormatUnigram]] artifact (count desc, piece asc — the
    * trainer's order); fails loudly on a foreign format or version. */
  def loadUnigram(spark: SparkSession, path: String): Seq[Unigram.Piece] = {
    val df = spark.read.parquet(path)
    stampCheck(df.columns.toSet, Set("piece", "log_weight", "count"), FormatUnigram, path)
    val rows = df.select("format", "version", "piece", "log_weight", "count").collect()
    rows.foreach(r => stampCheck(r.getString(0), r.getInt(1), FormatUnigram, path))
    rows.map(r => Unigram.Piece(r.getString(2), r.getDouble(3), r.getLong(4)))
      .sortBy(p => (-p.count, p.piece)).toSeq
  }

  /** Persist a trained WordPiece vocabulary under the interchange
    * contract (`format = "graft.wordpiece"`, `version = 1`):
    * `(format string, version int, idx int, piece string)` — `idx` is
    * the canonical vocabulary index ([[WordPiece.vocab]]'s order:
    * `[UNK]`, alphabet, then fused pieces in merge-rank order; row
    * order in the file is NOT significant). */
  def saveWordPiece(spark: SparkSession, vocab: Seq[String], path: String): Unit = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (p, i) => (FormatWordPiece, Version, i, p) }
      .toDF("format", "version", "idx", "piece")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[FormatWordPiece]] artifact, index-ordered; fails loudly
    * on a foreign format or version. */
  def loadWordPiece(spark: SparkSession, path: String): Seq[String] = {
    val df = spark.read.parquet(path)
    stampCheck(df.columns.toSet, Set("idx", "piece"), FormatWordPiece, path)
    val rows = df.select("format", "version", "idx", "piece").collect()
    rows.foreach(r => stampCheck(r.getString(0), r.getInt(1), FormatWordPiece, path))
    rows.map(r => (r.getInt(2), r.getString(3))).sortBy(_._1).map(_._2).toSeq
  }

  private def stampCheck(cols: Set[String], need: Set[String],
                         fmt: String, path: String): Unit =
    require((need + "format" + "version").subsetOf(cols),
      s"TokenizerModel: $path is not a $fmt v$Version artifact — columns $cols")

  private def stampCheck(fmt: String, ver: Int, want: String, path: String): Unit = {
    require(fmt == want,
      s"TokenizerModel: $path carries format '$fmt', expected '$want' — " +
        "refusing to decode a foreign artifact")
    require(ver == Version,
      s"TokenizerModel: $path carries version $ver, this engine reads " +
        s"version $Version — upgrade the engine or re-export the model")
  }
}
