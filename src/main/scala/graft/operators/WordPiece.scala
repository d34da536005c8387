package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer TRAINING (Schuster & Nakajima 2012;
  * the BERT tokenizer) — the third production tokenizer family next to
  * [[Bpe]] (count-greedy merges) and [[Unigram]] (EM prune): WordPiece
  * is LIKELIHOOD-greedy — each step merges the adjacent pair
  * maximizing
  *
  *   score(a, b) = count(a·b) / (count(a) · count(b))
  *
  * (the corpus-likelihood gain of fusing the pair under a unigram LM),
  * and its pieces carry the `##` continuation convention: a word's
  * first piece is plain, every later piece is prefixed `##`, so the
  * encoder ([[graft.expressions.WordPieceEncode]]) is a greedy
  * longest-match against the final VOCABULARY rather than a merge
  * replay.
  *
  * Scale shape is [[Bpe.train]]'s, shared machinery and all: ONE
  * corpus pass folds to the `(word, freq)` vocabulary
  * ([[Bpe.wordFreq]]); the measured drain gate
  * ([[Bpe.DriverDrainMaxWords]] / [[Bpe.driverDrainMaxChars]]) routes
  * the merge loop to the driver with interned int symbols (the normal
  * path, even at 100 TB — the vocabulary is 4-5 orders of magnitude
  * smaller than the corpus), with a distributed per-iteration fallback
  * for a vocabulary over the bound. Score comparisons are EXACT on
  * both paths: `n1/(l1·r1) > n2/(l2·r2)` is decided by cross
  * multiplication in long arithmetic with a BigInt overflow escape —
  * never a floating-point ratio — so the two paths (and any
  * partitioning) are rule-for-rule identical; ties break on the
  * lexicographically smallest `(lhs, rhs)` in unsigned UTF-8 byte
  * order (UTF8String's `asc`, the [[Bpe]] contract).
  *
  * Unlike BPE's heap, the local loop's argmax is a SCAN of the live
  * pair-count map each iteration: a merge changes the DENOMINATOR
  * counts of every pair sharing a side with it, so lazily-repaired
  * heap entries would surface stale scores in both directions. The
  * scan rides the DISTINCT adjacent-pair count (alphabet² + merges —
  * model-shaped, not corpus-shaped); pair and symbol counts themselves
  * are maintained incrementally via the [[Bpe]] member-list machinery,
  * so per merge only the words containing the fused pair are touched.
  *
  * Reference scope: the reference repo has no tokenizer; this is the
  * beyond-reference training-data surface built on the published
  * algorithm only.
  */
object WordPiece {

  /** Continuation prefix of every non-word-initial piece. */
  val ContPrefix = "##"

  /** The `[UNK]` token the encoder emits for an unmatchable word —
    * part of every trained vocabulary by convention. */
  val UnkToken = "[UNK]"

  /** Initial piece sequences over a `(word, freq)` vocabulary: the
    * first code point plain, every later one `##`-prefixed — the
    * WordPiece analogue of [[Bpe.withSymbols]] (no end-of-word marker:
    * the boundary information lives in the `##` class). Spelled with
    * per-position `substr` (code-point semantics, identical in Spark
    * and DuckDB) so the oracle can replay it byte-exactly. */
  def withPieces(wf: DataFrame): DataFrame =
    wf.withColumn("syms",
      transform(sequence(lit(1), length(col("word"))),
        i => when(i === 1, col("word").substr(i, lit(1)))
          .otherwise(concat(lit(ContPrefix), col("word").substr(i, lit(1))))))

  /** Frequency-weighted symbol occurrence counts over the CURRENT
    * piece sequences — the score's denominator legs. Every occurrence
    * counts (a symbol repeated within one word counts each time),
    * matching the pair counts' overlap semantics. */
  def symbolCounts(syms: DataFrame): DataFrame =
    syms.select(col("freq"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum(col("freq")).as("c"))

  /** One learned merge: `rank` is creation order (0 first), `n` the
    * raw pair count and `nLhs`/`nRhs` the side counts that won the
    * argmax (provenance — the score is `n / (nLhs * nRhs)`). */
  final case class Merge(rank: Int, lhs: String, rhs: String,
                         n: Long, nLhs: Long, nRhs: Long)

  /** The fused piece of a merge: `lhs` keeps its position class, the
    * rhs sheds its continuation prefix (`("a", "##b") -> "ab"`,
    * `("##a", "##b") -> "##ab"`). */
  def fusedOf(lhs: String, rhs: String): String = {
    require(rhs.startsWith(ContPrefix),
      s"WordPiece: rhs '$rhs' is not a continuation piece — corrupt merge")
    lhs + rhs.substring(ContPrefix.length)
  }

  /** Unsigned UTF-8 byte order — UTF8String's `asc`, the engine's
    * string comparison the tie rule must reproduce on the driver. */
  private[operators] def utf8Cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The argmax combiner of the distributed fallback (a static method,
    * so the reduce closure captures nothing): higher exact score wins;
    * ties to the byte-lexicographically smaller (lhs, rhs). */
  private[operators] def betterOf(
      x: (String, String, Long, Long, Long),
      y: (String, String, Long, Long, Long)): (String, String, Long, Long, Long) = {
    val c = cmpScore(x._3, x._4, x._5, y._3, y._4, y._5)
    if (c > 0) x
    else if (c < 0) y
    else {
      val cl = utf8Cmp(x._1, y._1)
      if (cl < 0 || (cl == 0 && utf8Cmp(x._2, y._2) <= 0)) x else y
    }
  }

  /** Exact rational comparison of two scores
    * `n1/(l1·r1)` vs `n2/(l2·r2)` by cross multiplication: long
    * arithmetic when the products fit (the overwhelmingly common
    * case), BigInt on overflow — never floating point, so training is
    * deterministic at any corpus scale. */
  private[operators] def cmpScore(n1: Long, l1: Long, r1: Long,
                                  n2: Long, l2: Long, r2: Long): Int =
    try {
      java.lang.Long.compare(
        Math.multiplyExact(Math.multiplyExact(n1, l2), r2),
        Math.multiplyExact(Math.multiplyExact(n2, l1), r1))
    } catch {
      case _: ArithmeticException =>
        (BigInt(n1) * BigInt(l2) * BigInt(r2))
          .compare(BigInt(n2) * BigInt(l1) * BigInt(r1))
    }

  /** [[Bpe.mergeOnce]] with an explicit fused symbol (WordPiece's
    * fusion drops the rhs's `##`, so the fused piece is not the
    * concatenation): every non-overlapping `[lhs, rhs]` adjacency
    * becomes `fused`, greedily left to right. Greedy-correct for the
    * same reason as BPE's: `fused = lhs + <non-empty>` can never equal
    * `lhs`, so a just-fused tail is never re-consumed. */
  def mergeOnce(syms: Column, lhs: String, rhs: String, fused: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(lhs) && s === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
        .otherwise(concat(acc, array(s))))

  /** Train `nMerges` WordPiece merges over `df[textCol]` (lowercased
    * by [[Bpe.wordFreq]]'s contract). `minFreq` excludes pairs below
    * the raw-count floor from every argmax (a likelihood ratio over
    * vanishing counts is noise, not signal) and dries the loop when
    * nothing clears it. NOTE the floor is ABSOLUTE: unlike BPE (whose
    * count-argmax can never be won from below the floor), WordPiece's
    * score argmax CAN — rare-sided pairs score highest — so corpus
    * growth lifts previously-excluded candidates over a fixed floor
    * and the merge sequence legitimately shifts. Retraining that must
    * be bit-stable under uniform growth scales `minFreq` with the
    * corpus (gated in WordPieceSpec's clone trial, fixed-floor
    * divergence control included). Same two execution paths as BPE,
    * selected by the same MEASURED drain gate, producing identical
    * merges. */
  def train(spark: SparkSession, df: DataFrame, textCol: Column,
            nMerges: Int, minFreq: Long = 2L,
            driverDrainMaxWords: Long = Bpe.DriverDrainMaxWords): Seq[Merge] = {
    require(nMerges >= 0, s"train: nMerges must be >= 0, got $nMerges")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    var wf = withPieces(Bpe.wordFreq(df, textCol)).localCheckpoint(true)
    var wfIds = sc.getPersistentRDDs.keySet -- before
    val rules = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      val m = wf.agg(count(lit(1)), sum(length(col("word")))).head()
      if (m.getLong(0) <= driverDrainMaxWords &&
          (m.isNullAt(1) || m.getLong(1) <= Bpe.driverDrainMaxChars)) {
        val vocab = wf.select("word", "freq").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        return trainLocal(vocab, nMerges, minFreq)
      }
      // distributed fallback: per iteration ONE bounded pair aggregate
      // joined with the symbol counts, argmax via an exact-comparator
      // reduce (per-partition maxima, one driver merge — never a sort)
      import spark.implicits._
      var dry = false
      while (rules.size < nMerges && !dry) {
        val cand = Bpe.pairCounts(wf).filter(col("n") >= minFreq)
          .join(symbolCounts(wf).withColumnRenamed("sym", "lhs")
            .withColumnRenamed("c", "nl"), Seq("lhs"))
          .join(symbolCounts(wf).withColumnRenamed("sym", "rhs")
            .withColumnRenamed("c", "nr"), Seq("rhs"))
          .select(col("lhs"), col("rhs"), col("n"), col("nl"), col("nr"))
          .as[(String, String, Long, Long, Long)]
        if (cand.isEmpty) dry = true
        else {
          val best = cand.reduce(WordPiece.betterOf _)
          val fused = fusedOf(best._1, best._2)
          rules += Merge(rules.size, best._1, best._2, best._3, best._4, best._5)
          val pre = sc.getPersistentRDDs.keySet
          val next = wf.withColumn("syms",
            mergeOnce(col("syms"), best._1, best._2, fused)).localCheckpoint(true)
          val nextIds = sc.getPersistentRDDs.keySet -- pre
          val persisted = sc.getPersistentRDDs
          wfIds.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = false)))
          wf = next
          wfIds = nextIds
        }
      }
      rules.toSeq
    } finally {
      val persisted = sc.getPersistentRDDs
      persisted.keys.filterNot(before)
        .foreach(id => persisted(id).unpersist(blocking = false))
    }
  }

  /** Initial pieces of one word, locally — the exact mirror of
    * [[withPieces]] (code-point iteration, `##` from position 2). */
  private def piecesOf(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val s = new String(Character.toChars(cp))
      out += (if (i == 0) s else ContPrefix + s)
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** The LOCAL merge loop over a drained `(word, freq)` vocabulary —
    * merge-for-merge identical to the distributed loop by
    * construction (same raw counts, same exact score comparison, same
    * UTF-8 tie order). Pair/symbol counts are maintained INCREMENTALLY
    * through the [[Bpe]] member-list machinery (a merge touches only
    * words containing its pair); the per-iteration argmax is a scan of
    * the live pair map — see the class doc for why a lazy heap is
    * unsound under moving denominators. */
  private[graft] def trainLocal(vocab: Array[(String, Long)], nMerges: Int,
                                minFreq: Long): Seq[Merge] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val sym2id = new java.util.HashMap[String, Integer]
    val id2sym = new scala.collection.mutable.ArrayBuffer[String]
    val id2bytes = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    def intern(s: String): Int = {
      val got = sym2id.get(s)
      if (got != null) got.intValue()
      else {
        val id = id2sym.length
        sym2id.put(s, Integer.valueOf(id))
        id2sym += s
        id2bytes += s.getBytes(utf8)
        id
      }
    }
    def byteCmp(a: Int, b: Int): Int =
      java.util.Arrays.compareUnsigned(id2bytes(a), id2bytes(b))
    def pack(l: Int, r: Int): Long = (l.toLong << 32) | (r.toLong & 0xffffffffL)
    def lhsOf(p: Long): Int = (p >>> 32).toInt
    def rhsOf(p: Long): Int = (p & 0xffffffffL).toInt

    val syms: Array[Array[Int]] = vocab.map(v => piecesOf(v._1).map(intern))
    val freq: Array[Long] = vocab.map(_._2)
    val pairCounts = new java.util.HashMap[java.lang.Long, java.lang.Long]
    // symbol occurrence counts, indexed by interned id (grown on demand)
    var symCounts = new Array[Long](math.max(16, id2sym.length * 2))
    def bumpSym(id: Int, delta: Long): Unit = {
      if (id >= symCounts.length)
        symCounts = java.util.Arrays.copyOf(symCounts, math.max(id + 1, symCounts.length * 2))
      symCounts(id) += delta
    }
    val members = new java.util.HashMap[java.lang.Long, Bpe.IntVec]
    def bumpPair(pair: Long, delta: Long, w: Int): Unit = {
      val key = java.lang.Long.valueOf(pair)
      val n = pairCounts.merge(key, java.lang.Long.valueOf(delta),
        (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
      if (n.longValue() <= 0L) pairCounts.remove(key)
      if (delta > 0)
        members.computeIfAbsent(key, _ => new Bpe.IntVec).add(w)
    }
    var w = 0
    while (w < syms.length) {
      val s = syms(w)
      var i = 0
      while (i < s.length) {
        bumpSym(s(i), freq(w))
        if (i < s.length - 1) bumpPair(pack(s(i), s(i + 1)), freq(w), w)
        i += 1
      }
      w += 1
    }
    val rules = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var dry = false
    while (rules.size < nMerges && !dry) {
      // argmax scan over the live pair map (exact rational order)
      var bestPair = -1L
      var bestN = 0L
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val n = e.getValue.longValue()
        if (n >= minFreq) {
          val p = e.getKey.longValue()
          if (bestPair == -1L) { bestPair = p; bestN = n }
          else {
            val c = cmpScore(n, symCounts(lhsOf(p)), symCounts(rhsOf(p)),
              bestN, symCounts(lhsOf(bestPair)), symCounts(rhsOf(bestPair)))
            if (c > 0 || (c == 0 && {
              val cl = byteCmp(lhsOf(p), lhsOf(bestPair))
              cl < 0 || (cl == 0 && byteCmp(rhsOf(p), rhsOf(bestPair)) < 0)
            })) { bestPair = p; bestN = n }
          }
        }
      }
      if (bestPair == -1L) dry = true
      else {
        val (a, b) = (lhsOf(bestPair), rhsOf(bestPair))
        rules += Merge(rules.size, id2sym(a), id2sym(b),
          bestN, symCounts(a), symCounts(b))
        val fused = intern(fusedOf(id2sym(a), id2sym(b)))
        val affected = members.remove(java.lang.Long.valueOf(bestPair))
        if (affected != null) {
          var ai = 0
          while (ai < affected.n) {
            val wi = affected.a(ai)
            val old = syms(wi)
            val merged = Bpe.mergeLocal(old, a, b, fused)
            if (merged.length != old.length) { // stale membership → no-op
              val f = freq(wi)
              var i = 0
              while (i < old.length) {
                bumpSym(old(i), -f)
                if (i < old.length - 1) bumpPair(pack(old(i), old(i + 1)), -f, wi)
                i += 1
              }
              i = 0
              while (i < merged.length) {
                bumpSym(merged(i), f)
                if (i < merged.length - 1) bumpPair(pack(merged(i), merged(i + 1)), f, wi)
                i += 1
              }
              syms(wi) = merged
            }
            ai += 1
          }
        }
      }
    }
    rules.toSeq
  }

  /** The corpus ALPHABET as vocabulary pieces: every distinct initial
    * piece (plain first characters and `##`-prefixed continuations) —
    * bounded by twice the character set, the model-sized gather. */
  def alphabet(df: DataFrame, textCol: Column): Seq[String] = {
    val rows = withPieces(Bpe.wordFreq(df, textCol))
      .select(explode(col("syms")).as("p")).distinct()
      .orderBy("p").collect()
    rows.map(_.getString(0)).toSeq
  }

  /** The final VOCABULARY an encoder consumes: `[UNK]`, the alphabet
    * (UTF-8 order), then each merge's fused piece in rank order —
    * the canonical index layout of a BERT-style vocab file. */
  def vocab(alphabet: Seq[String], rules: Seq[Merge]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    seen += UnkToken
    alphabet.foreach(seen += _)
    rules.sortBy(_.rank).foreach(r => seen += fusedOf(r.lhs, r.rhs))
    seen.toSeq
  }

  /** The vocabulary as the `vocab` argument of the native
    * `wordpiece_encode` expression — a plan literal while small, a
    * [[graft.expressions.BroadcastRef]] for corpus-wide application. */
  def vocabLit(vocab: Seq[String]): Column =
    if (vocab.isEmpty) array().cast("array<string>")
    else array(vocab.map(lit): _*)
}
