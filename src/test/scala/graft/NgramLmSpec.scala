package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM quality scoring: hand-computed model counts, smoothing
  * denominators, surprisal values, unseen-context saturation, and the
  * empty-document drop. */
class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference corpus: "a b" and "a b c"
  // model: (<s>,a)=2, (a,b)=2, (b,c)=1; ctx: <s>=2, a=2, b=1; V=|{a,b,c}|=3
  private lazy val model = NgramLm.bigramModel(
    Seq(1L -> "a b", 2L -> "a b c").toDF("id", "text"), col("id"), col("text"))

  test("bigram model counts BOS transitions and within-doc adjacencies") {
    val m = model.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("<s>", "a") -> 2L, ("a", "b") -> 2L, ("b", "c") -> 1L))
  }

  test("scores are the hand-computed scaled smoothed surprisals") {
    val got = NgramLm.score(
        Seq(10L -> "a b", 11L -> "c q", 12L -> "").toDF("id", "text"),
        col("id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 10: (<s>,a): 1e6*(2+3) div (2+1) = 1666666; (a,b): same -> avg 1666666
    // doc 11: (<s>,c): unseen pair, seen ctx -> 1e6*(2+3) div 1 = 5000000
    //         (c,q): unseen ctx -> ceiling 1e6*(0+3) div 1 = 3000000 -> avg 4000000
    // doc 12: no tokens -> dropped
    assert(got == Map(10L -> ((2L, 1666666L)), 11L -> ((2L, 4000000L))))
  }

  test("in-domain text scores strictly below out-of-domain text") {
    val ref = (1L to 50L).map(i => i -> "the quick brown fox jumps").toDF("id", "text")
    val m = NgramLm.bigramModel(ref, col("id"), col("text"))
    val s = NgramLm.score(
        Seq(100L -> "the quick brown fox", 101L -> "zz yy xx ww").toDF("id", "text"),
        col("id"), col("text"), m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(100L) < s(101L))
  }

  // ---------------- order-3 stupid backoff ----------------

  /** INDEPENDENT local reference: plain Scala maps over padded token
    * streams, the three backoff tiers spelled directly from the Brants
    * et al. definition — no shared code with the operator beyond the
    * Scale constant. */
  private def localScore3(ref: Seq[String], docs: Seq[String]): Map[Int, (Long, Long)] = {
    val S = NgramLm.Scale
    def toks(s: String) = List("<s>", "<s>") ++ s.toLowerCase.split(" ").filter(_.nonEmpty)
    def tris(t: List[String]) = t.sliding(3).filter(_.size == 3).map {
      case List(a, b, c) => (a, b, c)
    }.toList
    val m3 = ref.map(toks).filter(_.size >= 3).flatMap(tris)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = m3.groupBy { case ((a, b, _), _) => (a, b) }.view.mapValues(_.values.sum).toMap
    val b2 = m3.groupBy { case ((_, b, c), _) => (b, c) }.view.mapValues(_.values.sum).toMap
    val c1 = m3.groupBy { case ((_, b, _), _) => b }.view.mapValues(_.values.sum).toMap
    val u1 = m3.groupBy { case ((_, _, c), _) => c }.view.mapValues(_.values.sum).toMap
    val nn = m3.values.sum
    val v = m3.keys.map(_._3).toSet.size.toLong
    docs.zipWithIndex.flatMap { case (d, i) =>
      val ts = tris(toks(d))
      if (ts.isEmpty) None
      else {
        val ss = ts.map { tri =>
          m3.get(tri) match {
            case Some(n3) => S * c2((tri._1, tri._2)) / n3
            case None => b2.get((tri._2, tri._3)) match {
              case Some(bn) => 5L * S * c1(tri._2) / (2L * bn)
              case None => 25L * S * (nn + v) / (4L * (u1.getOrElse(tri._3, 0L) + 1L))
            }
          }
        }
        Some(i -> ((ts.size.toLong, ss.sum / ts.size)))
      }
    }.toMap
  }

  test("scoreBackoff matches the independent local reference on a mixed corpus") {
    val ref = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick red fox runs", "a lazy dog sleeps all day",
      "the dog jumps", "quick brown foxes jump")
    val docs = Seq(
      "the quick brown fox jumps",  // mostly seen trigrams
      "the quick red dog sleeps",   // bigram-tier backoffs
      "zz yy xx",                   // OOV: unigram ceiling everywhere
      "the lazy fox zz sleeps day", // all three tiers mixed
      "")                           // dropped
    val refDf = ref.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text")
    val m = NgramLm.trigramModel(refDf, col("id"), col("text"))
    val got = NgramLm.scoreBackoff(
        docs.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text"),
        col("id"), col("text"), m)
      .collect().map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == localScore3(ref, docs))
  }

  test("backoff tiers order as expected: seen < bigram-backoff < unigram ceiling") {
    val ref = (1L to 20L).map(i => i -> "alpha beta gamma delta").toDF("id", "text")
    val m = NgramLm.trigramModel(ref, col("id"), col("text"))
    val s = NgramLm.scoreBackoff(
        Seq(1L -> "alpha beta gamma",  // all trigrams seen
            2L -> "delta alpha beta",  // backoff tiers (no seen trigram)
            3L -> "zz yy xx").toDF("id", "text"),  // pure OOV
        col("id"), col("text"), m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) < s(2L) && s(2L) <= s(3L))
  }

  // ---------------- arbitrary-order stupid backoff ----------------

  /** INDEPENDENT local reference at ANY order: plain Scala maps, the
    * tier ladder spelled directly from the definition — tier d scores
    * `5^d·S·ctx_d / (2^d·cnt_d)` over the (k−1)-BOS-padded windows,
    * final tier the add-one unigram ceiling. */
  private def localScoreK(ref: Seq[String], docs: Seq[String], k: Int): Map[Int, (Long, Long)] = {
    val S = NgramLm.Scale
    def toks(s: String) = List.fill(k - 1)("<s>") ++ s.toLowerCase.split(" ").filter(_.nonEmpty)
    def wins(t: List[String]) = t.sliding(k).filter(_.size == k).map(_.toVector).toList
    val mk = ref.map(toks).filter(_.size >= k).flatMap(wins)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // cnt_d: suffix of length k-d; ctx_d: that suffix minus its last word
    def marginal(f: Vector[String] => Vector[String]): Map[Vector[String], Long] =
      mk.groupBy { case (w, _) => f(w) }.view.mapValues(_.values.sum).toMap
    val cnts = (0 until k - 1).map(d => d -> marginal(_.drop(d))).toMap
    val ctxs = (0 until k - 1).map(d => d -> marginal(_.slice(d, k - 1))).toMap
    val u1 = marginal(w => Vector(w.last))
    val nn = mk.values.sum
    val v = mk.keys.map(_.last).toSet.size.toLong
    def p5(d: Int) = math.pow(5, d).toLong
    def p2(d: Int) = math.pow(2, d).toLong
    docs.zipWithIndex.flatMap { case (doc, i) =>
      val ws = wins(toks(doc))
      if (ws.isEmpty) None
      else {
        val ss = ws.map { w =>
          (0 until k - 1).collectFirst {
            case d if cnts(d).contains(w.drop(d)) =>
              p5(d) * S * ctxs(d)(w.slice(d, k - 1)) / (p2(d) * cnts(d)(w.drop(d)))
          }.getOrElse(
            p5(k - 1) * S * (nn + v) / (p2(k - 1) * (u1.getOrElse(Vector(w.last), 0L) + 1L)))
        }
        Some(i -> ((ws.size.toLong, ss.sum / ws.size)))
      }
    }.toMap
  }

  private val MixedRef = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick red fox runs far away from here",
    "a lazy dog sleeps all day long in the sun",
    "the dog jumps over a fence", "quick brown foxes jump high")
  private val MixedDocs = Seq(
    "the quick brown fox jumps over the lazy dog", // seen 5-grams
    "the quick red dog sleeps all day",            // mid-tier backoffs
    "zz yy xx ww vv",                              // OOV ceiling
    "the lazy fox zz sleeps day long",             // tiers mixed
    "")                                            // dropped

  test("scoreBackoffN at order 3 equals scoreBackoff score for score") {
    val refDf = MixedRef.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text")
    val docsDf = MixedDocs.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text")
    val m = NgramLm.trigramModel(refDf, col("id"), col("text"))
    val want = NgramLm.scoreBackoff(docsDf, col("id"), col("text"), m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = NgramLm.scoreBackoffN(docsDf, col("id"), col("text"),
        NgramLm.ngramModel(refDf, col("id"), col("text"), order = 3), order = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("scoreBackoffN at order 5 matches the independent local reference") {
    val refDf = MixedRef.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text")
    val docsDf = MixedDocs.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text")
    val m = NgramLm.ngramModel(refDf, col("id"), col("text"), order = 5)
    val got = NgramLm.scoreBackoffN(docsDf, col("id"), col("text"), m, order = 5)
      .collect().map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == localScoreK(MixedRef, MixedDocs, 5))
    // the local ladder itself agrees with the order-3 hand spelling
    assert(localScoreK(MixedRef, MixedDocs, 3) == localScore3(MixedRef, MixedDocs))
  }

  test("order-5 tiers order as expected and every lower order is a marginal") {
    val ref = (1L to 20L).map(i => i -> "alpha beta gamma delta epsilon zeta").toDF("id", "text")
    val m = NgramLm.ngramModel(ref, col("id"), col("text"), order = 5)
    val s = NgramLm.scoreBackoffN(
        Seq(1L -> "alpha beta gamma delta epsilon", // seen 5-grams
            2L -> "zeta alpha beta gamma delta",    // backoff tiers
            3L -> "zz yy xx ww vv").toDF("id", "text"),
        col("id"), col("text"), m, order = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) < s(2L) && s(2L) <= s(3L))
    // the one-artifact property: 4-gram counts derived from the 5-gram
    // table equal a directly-trained order-4 model's (suffix tail)
    val direct = NgramLm.ngramModel(ref, col("id"), col("text"), order = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)) -> r.getLong(4)).toMap
    val derived = m.groupBy("w2", "w3", "w4", "w5").agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)) -> r.getLong(4)).toMap
    assert(derived == direct)
  }

  /** INDEPENDENT local reference for the COUNT-PRUNED artifact: direct
    * per-order window counts over the (k−1)-BOS-padded stream, each
    * floored, tier lookups against the pruned maps. */
  private def localScorePruned(ref: Seq[String], docs: Seq[String], k: Int,
                               floors: Seq[Long]): Map[Int, (Long, Long)] = {
    val S = NgramLm.Scale
    def toks(s: String) = List.fill(k - 1)("<s>") ++ s.toLowerCase.split(" ").filter(_.nonEmpty)
    def grams(t: List[String], j: Int) =
      t.sliding(j).filter(_.size == j).map(_.mkString(" ")).toList
    val streams = ref.map(toks).filter(_.size >= k)
    val tables: Map[Int, Map[String, Long]] = (1 to k).map { j =>
      j -> streams.flatMap(grams(_, j)).groupBy(identity).view
        .mapValues(_.size.toLong).filter(_._2 >= floors(j - 1)).toMap
    }.toMap
    val nn = tables(1).values.sum
    val v = tables(1).size.toLong
    def p5(d: Int) = math.pow(5, d).toLong
    def p2(d: Int) = math.pow(2, d).toLong
    docs.zipWithIndex.flatMap { case (doc, i) =>
      val t = toks(doc).toVector
      val ws = t.sliding(k).filter(_.size == k).map(_.toVector).toList
      if (ws.isEmpty) None
      else {
        val ss = ws.map { w =>
          (0 until k - 1).collectFirst {
            case d if tables(k - d).contains(w.drop(d).mkString(" ")) =>
              p5(d) * S * tables(k - 1 - d)(w.slice(d, k - 1).mkString(" ")) /
                (p2(d) * tables(k - d)(w.drop(d).mkString(" ")))
          }.getOrElse(
            p5(k - 1) * S * (nn + v) / (p2(k - 1) * (tables(1).getOrElse(w.last, 0L) + 1L)))
        }
        Some(i -> ((ws.size.toLong, ss.sum / ws.size)))
      }
    }.toMap
  }

  test("count-pruned order-5 backoff matches the independent local reference; floors force deeper backoff") {
    val floors = Seq(1L, 1L, 2L, 2L, 2L)
    // MixedRef's sentences are distinct — every 5-gram is a singleton
    // EXCEPT in the doubled sentence below, so the floors really bite
    val ref = MixedRef ++ Seq(MixedRef.head)
    val refDf = ref.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text")
    val docsDf = MixedDocs.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text")
    val model = NgramLm.prunedBackoffModel(refDf, col("id"), col("text"),
      order = 5, minCounts = floors)
    val got = NgramLm.scoreBackoffPruned(docsDf, col("id"), col("text"), model, order = 5)
      .collect().map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == localScorePruned(ref, MixedDocs, 5, floors))
    // the artifact is genuinely smaller than exact per-order counts
    val unpruned = NgramLm.prunedBackoffModel(refDf, col("id"), col("text"),
      order = 5, minCounts = Seq(1L, 1L, 1L, 1L, 1L))
    assert(model.count() < unpruned.count(),
      s"floors pruned nothing: ${model.count()} vs ${unpruned.count()}")
    // a doc built of singleton reference 5-grams backs off deeper (its
    // windows were floored out), so it scores HIGHER pruned than exact
    val singletonDoc = Seq(0L -> MixedRef(1)).toDF("id", "text")
    val exact = NgramLm.scoreBackoffN(singletonDoc, col("id"), col("text"),
      NgramLm.ngramModel(refDf, col("id"), col("text"), order = 5), order = 5)
      .head.getLong(2)
    val pruned = NgramLm.scoreBackoffPruned(singletonDoc, col("id"), col("text"),
      model, order = 5).head.getLong(2)
    assert(pruned > exact, s"pruned $pruned should exceed exact $exact")
    // floor contract: non-monotone or non-exact-unigram floors fail
    intercept[IllegalArgumentException](NgramLm.prunedBackoffModel(
      refDf, col("id"), col("text"), 5, Seq(1L, 2L, 1L, 2L, 2L)))
    intercept[IllegalArgumentException](NgramLm.prunedBackoffModel(
      refDf, col("id"), col("text"), 5, Seq(2L, 2L, 2L, 2L, 2L)))
  }

  test("trigram model over plain clones is exactly flat (counts scale, support doesn't)") {
    val base = Seq(1L -> "a b c d", 2L -> "b c d e").toDF("id", "text")
    val m1 = NgramLm.trigramModel(base, col("id"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val cloned = (0 until 10).map(k => Seq((1L + 10 * k) -> "a b c d", (2L + 10 * k) -> "b c d e"))
      .flatten.toDF("id", "text")
    val m10 = NgramLm.trigramModel(cloned, col("id"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(m10.keySet == m1.keySet)
    assert(m10.forall { case (k, n) => n == 10 * m1(k) })
  }

  // ---- keyed (per-language) members: the CCNet reference-LM shape ----

  private lazy val keyedRef = Seq(
    (1L, "en", "a b"), (2L, "en", "a b c"),
    (3L, "fr", "x y"), (4L, "fr", "x y z"))
    .toDF("id", "lang", "text")

  test("bigramModelBy equals an independent bigramModel per key slice") {
    val keyed = NgramLm.bigramModelBy(keyedRef, col("id"), col("text"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    for (l <- Seq("en", "fr")) {
      val solo = NgramLm.bigramModel(keyedRef.filter(col("lang") === l),
          col("id"), col("text"))
        .collect().map(r => (l, r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(keyed.view.filterKeys(_._1 == l).toMap == solo)
    }
  }

  test("scoreBy equals an independent score per key slice (per-key smoothing V)") {
    val m = NgramLm.bigramModelBy(keyedRef, col("id"), col("text"), col("lang"))
    val docs = Seq((10L, "en", "a b"), (11L, "en", "c q"),
      (12L, "fr", "x y"), (13L, "fr", "q q")).toDF("id", "lang", "text")
    val keyed = NgramLm.scoreBy(docs, col("id"), col("text"), col("lang"), m)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    for (l <- Seq("en", "fr")) {
      val soloModel = NgramLm.bigramModel(keyedRef.filter(col("lang") === l),
        col("id"), col("text"))
      val solo = NgramLm.score(docs.filter(col("lang") === l),
          col("id"), col("text"), soloModel)
        .collect().map(r => (r.getLong(0), l) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(keyed.view.filterKeys(_._2 == l).toMap == solo)
    }
  }

  test("scoreBy SURFACES uncovered-key documents with null avg_surprisal (ADVICE r17)") {
    // model trained on en only; a frozen model missing 'fr' must not
    // silently vanish fr documents from the score output
    val m = NgramLm.bigramModelBy(keyedRef.filter(col("lang") === "en"),
      col("id"), col("text"), col("lang"))
    val docs = Seq((10L, "en", "a b"), (20L, "fr", "x y")).toDF("id", "lang", "text")
    val rows = NgramLm.scoreBy(docs, col("id"), col("text"), col("lang"), m)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(rows.keySet == Set((10L, "en"), (20L, "fr")), "fr doc must surface, not vanish")
    assert(rows((10L, "en"))._2.isDefined)
    assert(rows((20L, "fr")) == ((2L, None)),
      "uncovered key: bigrams counted, surprisal honestly unknown (null)")
  }
}
