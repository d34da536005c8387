package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — the
  * canonical "train the tokenizer on the corpus" step of an LLM data
  * pipeline, shaped for 100 TB:
  *
  *  - The corpus is touched EXACTLY ONCE: [[wordFreq]] folds it to a
  *    `(word, freq)` vocabulary (one shuffle, map-side combined). At
  *    100 TB of text the vocabulary is tens of millions of rows — 4-5
  *    orders of magnitude smaller than the corpus — and every merge
  *    iteration runs against that table, never the corpus.
  *  - Each merge step is a narrow map over the vocabulary (the
  *    [[mergeOnce]] fold) plus one bounded aggregate ([[pairCounts]] —
  *    pair cardinality is alphabet², itself shrunk by `argmax` to a
  *    single driver-side row). N merges = N vocabulary-sized passes,
  *    each lineage-truncated so step k never replays steps 1..k-1.
  *  - Symbol sequences live as `array<string>` columns and the fold is
  *    a Spark higher-order function — no UDF, no driver loop over
  *    rows; the driver sees one 1-row argmax collect per merge (the
  *    same bounded-model gather as k-means centroids).
  *
  * The learned merge list is a bounded model (vocab-size-independent:
  * `nMerges` rows), so ENCODING ships it back over the broadcast bus
  * into the native `bpe_encode` expression ([[graft.expressions.BpeEncode]])
  * — training is vocabulary-relational, application is per-row codegen.
  *
  * Reference scope: the reference repo has no tokenizer; this is the
  * beyond-reference training-data surface (brief: token counting /
  * vocabulary induction) built on the published algorithm only.
  */
object Bpe {

  /** End-of-word marker appended as its own symbol (Sennrich §3.2) so
    * merges never cross word boundaries and a learned token "knows"
    * whether it ends a word. */
  val EndOfWord = "</w>"

  /** `(word, freq)` vocabulary — the single corpus-wide pass. Tokens
    * follow the corpus's single-space contract (same `split` as
    * [[TextStats.tokens]]); empty strings (leading/double spaces)
    * carry no symbols and are dropped. */
  def wordFreq(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(lower(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequences: one single-character symbol per char
    * plus the [[EndOfWord]] marker. Spelled with per-position `substr`
    * (character semantics, identical in Spark and DuckDB) rather than
    * `split(word, "")`, whose empty-regex trailing-element behavior is
    * engine- and version-dependent — the oracle must replay this
    * byte-exactly. */
  def withSymbols(wf: DataFrame): DataFrame =
    wf.withColumn("syms",
      concat(
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))),
        array(lit(EndOfWord))))

  /** Frequency-weighted adjacent-pair counts over the CURRENT symbol
    * sequences — the per-iteration aggregate. Output `(lhs, rhs, n)`.
    * A fully-merged word (one surviving symbol — its whole text became
    * a single token) has no adjacencies and is filtered BEFORE the
    * position expansion: `sequence(0, -1)` would otherwise count
    * DOWNWARD under Spark's default step and index out of bounds. */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("lhs"),
            element_at(col("syms"), i + 2).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("n"))

  /** One merge applied to a symbol-sequence column: every
    * non-overlapping `[lhs, rhs]` adjacency becomes the fused symbol,
    * greedily left to right (the BPE application order). A left fold:
    * append each symbol, except when the accumulator ends with `lhs`
    * and the incoming symbol is `rhs` — then replace the tail with the
    * fused symbol. Greedy-correct because a just-fused tail equals
    * `lhs + rhs`, which (rhs being non-empty) can never equal `lhs`,
    * so a fused symbol is never re-consumed by the same rule. */
  def mergeOnce(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(lhs) && s === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
        .otherwise(concat(acc, array(s))))

  /** One learned merge rule: `rank` is application priority (0 first),
    * `n` the frequency that won the argmax at training time. */
  final case class MergeRule(rank: Int, lhs: String, rhs: String, n: Long)

  /** Train `nMerges` BPE merges over `df[textCol]`. Stops early when
    * no adjacent pair reaches `minFreq` (the vocabulary has gone dry).
    * Ties on count break lexicographically on (lhs, rhs) so training
    * is deterministic across partitionings and engines.
    *
    * Each iteration localCheckpoints the vocabulary (truncating
    * lineage so step k doesn't replay the fold chain) and unpersists
    * the previous step's snapshot; the loop leaves NO persisted state
    * behind — its product is the bounded driver-side rule list.
    */
  def train(spark: SparkSession, df: DataFrame, textCol: Column,
            nMerges: Int, minFreq: Long = 2L): Seq[MergeRule] = {
    require(nMerges >= 0, s"train: nMerges must be >= 0, got $nMerges")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    var wf = withSymbols(wordFreq(df, textCol)).localCheckpoint(true)
    // track exactly which persisted RDDs back the CURRENT snapshot so
    // each superseded one is freed inside the loop — otherwise all
    // nMerges vocabulary materializations stay pinned simultaneously
    // and a real (thousands-of-rules) training run exhausts storage
    // mid-loop; the finally sweep alone only helps after the fact
    var wfIds = sc.getPersistentRDDs.keySet -- before
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    try {
      var dry = false
      while (rules.size < nMerges && !dry) {
        val top = pairCounts(wf)
          .orderBy(desc("n"), asc("lhs"), asc("rhs")).limit(1).collect()
        if (top.isEmpty || top(0).getAs[Long]("n") < minFreq) dry = true
        else {
          val (a, b, n) = (top(0).getAs[String]("lhs"),
            top(0).getAs[String]("rhs"), top(0).getAs[Long]("n"))
          rules += MergeRule(rules.size, a, b, n)
          val pre = sc.getPersistentRDDs.keySet
          val next = wf.withColumn("syms", mergeOnce(col("syms"), a, b))
            .localCheckpoint(true)
          val nextIds = sc.getPersistentRDDs.keySet -- pre
          val persisted = sc.getPersistentRDDs
          wfIds.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = false)))
          wf = next
          wfIds = nextIds
        }
      }
      rules.toSeq
    } finally {
      // safety net: whatever the loop still pins (the final snapshot,
      // or everything on an abnormal exit)
      val persisted = sc.getPersistentRDDs
      persisted.keys.filterNot(before)
        .foreach(id => persisted(id).unpersist(blocking = false))
    }
  }

  /** The rule list as a DataFrame `(rank, lhs, rhs, n)` — the model's
    * relational spelling for persistence or inspection. */
  def rulesDf(spark: SparkSession, rules: Seq[MergeRule]): DataFrame = {
    import spark.implicits._
    rules.toDF()
  }
}
