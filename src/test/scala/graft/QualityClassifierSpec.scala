package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The learned quality classifier against an independent local
  * reference implementation: hashed char-n-gram features, the batch
  * perceptron's integer weight algebra, and scoring must agree value
  * for value — and on a separable planted corpus the trained model
  * must actually separate (100% train accuracy), since an operator
  * that "trains" without learning would still pass a parity-only
  * gate. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 3
  private val Dim = 256
  private val Epochs = 3

  // ---- independent reference implementation (plain Scala) ----

  /** FNV-1a-bucketed occurrence multiset `b -> count`, bias included —
    * the independent mirror of [[QualityClassifier.features]]. The
    * hash itself is checked against a third spelling below. */
  private def featsOf(t: String): Map[Long, Long] = {
    val tl = t.toLowerCase
    val grams =
      if (tl.length >= N) (0 to tl.length - N).map(i => tl.substring(i, i + N))
      else Seq.empty[String]
    val m = grams.groupBy(QualityClassifier.fnvBucketLocal(_, Dim))
      .map { case (b, v) => b -> v.size.toLong }
    m + (Dim.toLong -> 1L) // bias bucket; real buckets are < Dim
  }

  private def trainLocal(docs: Seq[(Long, String, Int)]): Map[Long, Long] = {
    val feats = docs.map { case (_, t, y) => (featsOf(t), y) }
    var w = Map.empty[Long, Long]
    (1 to Epochs).foreach { _ =>
      val mis = feats.filter { case (f, y) =>
        y * f.map { case (b, c) => c * w.getOrElse(b, 0L) }.sum <= 0 }
      val delta = mis.flatMap { case (f, y) => f.map { case (b, c) => b -> y * c } }
        .groupBy(_._1).map { case (b, v) => b -> v.map(_._2).sum }
      w = (w.keySet ++ delta.keySet).map(b =>
        b -> (w.getOrElse(b, 0L) + delta.getOrElse(b, 0L))).toMap
    }
    w
  }

  test("fnvBucketLocal == the textbook byte-at-a-time FNV-1a on ASCII") {
    // independent third spelling: fold over UTF-8 bytes (== codepoints
    // on ASCII, the oracled corpus's domain)
    def fnvBytes(s: String, dim: Int): Long = {
      var h = 2166136261L
      s.getBytes("UTF-8").foreach(b => h = ((h ^ (b & 0xffL)) * 16777619L) & 0xffffffffL)
      h % dim
    }
    Seq("the", "a b", "zzq", "x9!", "   ").foreach(g =>
      assert(QualityClassifier.fnvBucketLocal(g, Dim) == fnvBytes(g, Dim), g))
  }

  // separable planted corpus: two disjoint vocabularies
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", 1),
    (2L, "a good clear sentence with real words here", 1),
    (3L, "another fine readable line of plain text", 1),
    (4L, "zzq zzq vrk vrk jjx jjx wqq wqq", -1),
    (5L, "xkcd qwrt zxvb mnpl qqqq wwww", -1),
    (6L, "kjh gfd wqe rty zzz yyy xxx www", -1))

  test("train == independent reference (integer-exact weights), and it separates") {
    val df = docs.toDF("doc_id", "text", "y")
    val w = QualityClassifier.train(df, col("doc_id"), col("text"), col("y"),
        N, Dim, Epochs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = trainLocal(docs)
    assert(w == ref)

    val scored = QualityClassifier.score(df, col("doc_id"), col("text"),
        QualityClassifier.train(df, col("doc_id"), col("text"), col("y"), N, Dim, Epochs),
        N, Dim)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toList
    // score parity vs the reference dot product
    scored.foreach { case (id, s, keep) =>
      val (_, t, _) = docs.find(_._1 == id).get
      val refScore = featsOf(t).map { case (b, c) => c * ref.getOrElse(b, 0L) }.sum
      assert(s == refScore, s"doc $id")
      assert(keep == (if (s > 0) 1 else 0))
    }
    // the planted corpus is separable — the trained model must get it
    // all right (an operator that trains without learning fails here)
    scored.foreach { case (id, _, keep) =>
      val y = docs.find(_._1 == id).get._3
      assert((keep == 1) == (y == 1), s"doc $id misclassified after training")
    }
  }

  test("trainRates == independent reference (Rocchio scaled-rate difference)") {
    val df = docs.toDF("doc_id", "text", "y")
    val w = QualityClassifier.trainRates(df, col("doc_id"), col("text"), col("y"), N, Dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: per-bucket class occurrence counts, class
    // totals, two floored scaled divisions
    // .toSeq before the fill: flatMap on a Map collapses equal (b, y)
    // tuples and would silently dedupe occurrence counts
    val occ = docs.flatMap { case (_, t, y) =>
      featsOf(t).toSeq.flatMap { case (b, c) => Seq.fill(c.toInt)((b, y)) } }
    val pos = occ.filter(_._2 == 1).groupBy(_._1).map { case (b, v) => b -> v.size.toLong }
    val neg = occ.filter(_._2 == -1).groupBy(_._1).map { case (b, v) => b -> v.size.toLong }
    val (pt, nt) = (pos.values.sum, neg.values.sum)
    val S = QualityClassifier.RateScale
    val ref = (pos.keySet ++ neg.keySet).map(b =>
      b -> (S * pos.getOrElse(b, 0L) / pt - S * neg.getOrElse(b, 0L) / nt)).toMap
    assert(w == ref)
    // and it separates the planted corpus too (closed form, no epochs)
    val keeps = QualityClassifier.score(df, col("doc_id"), col("text"),
        QualityClassifier.trainRates(df, col("doc_id"), col("text"), col("y"), N, Dim),
        N, Dim)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    docs.foreach { case (id, _, y) =>
      assert((keeps(id) == 1) == (y == 1), s"doc $id misclassified by the rate model") }
  }

  test("incremental rate counts: merged state+batch == direct training (additivity)") {
    val df = docs.toDF("doc_id", "text", "y")
    val old = df.filter(col("doc_id") <= 4)
    val batch = df.filter(col("doc_id") > 4)
    def counts(d: org.apache.spark.sql.DataFrame) =
      QualityClassifier.rateCounts(d, col("doc_id"), col("text"), col("y"), N, Dim)
    val merged = QualityClassifier.mergeRateCounts(counts(old), counts(batch))
    val direct = counts(df)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(merged) == m(direct))
    val wInc = QualityClassifier.weightsFromCounts(merged)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wDir = QualityClassifier.trainRates(df, col("doc_id"), col("text"), col("y"), N, Dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wInc == wDir)
  }

  test("model interchange: round trip, geometry stamp, and loud-fail paths") {
    val df = docs.toDF("doc_id", "text", "y")
    val w = QualityClassifier.trainRates(df, col("doc_id"), col("text"), col("y"), N, Dim)
    val dir = java.nio.file.Files.createTempDirectory("graft_clfmodel_").toString + "/m"
    QualityClassifier.saveModel(spark, w, N, Dim, dir)
    val loaded = QualityClassifier.loadModel(spark, dir, N, Dim)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(loaded) == m(w))
    // scoring off the loaded artifact equals scoring off the live table
    val s1 = QualityClassifier.score(df, col("doc_id"), col("text"), w, N, Dim)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val s2 = QualityClassifier.score(df, col("doc_id"), col("text"), loaded, N, Dim)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(s1 == s2)
    // geometry mismatch is refused (buckets are incomparable)
    val e1 = intercept[IllegalArgumentException] {
      QualityClassifier.loadModel(spark, dir, N, Dim * 2) }
    assert(e1.getMessage.contains("incomparable"))
    // a foreign artifact is refused with the stamp in the message
    val tok = java.nio.file.Files.createTempDirectory("graft_clfmodel_tok_").toString + "/m"
    graft.operators.TokenizerModel.saveBpe(spark,
      Seq(graft.operators.Bpe.MergeRule(0, "a", "b", 1L)), tok)
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.loadModel(spark, tok, N, Dim) }
    assert(e2.getMessage.contains("is not a"), s"unexpected failure: ${e2.getMessage}")
  }

  test("null text is unscoreable (no row); short text rides the bias bucket") {
    val df = Seq((1L, "the quick brown fox"), (2L, null.asInstanceOf[String]), (3L, "ab"))
      .toDF("doc_id", "text")
    val w = Seq((Dim.toLong, 7L)).toDF("b", "w") // bias-only model
    val out = QualityClassifier.score(df, col("doc_id"), col("text"), w, N, Dim)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(2L), "null text must emit no row")
    // "ab" is shorter than the gram width: bias row only
    assert(out(3L) == ((1L, 7L)))
    assert(out(1L)._2 == 7L, "only the bias bucket carries weight here")
  }

  // ---- keyed (per-language) members: the CCNet per-partition shape ----

  private val keyedDocs = docs.map { case (id, t, y) => (id, "en", t, y) } ++
    docs.map { case (id, t, y) => (id + 100L, "fr", t.reverse, y) }

  test("trainRatesBy equals an independent trainRates per key slice") {
    val df = keyedDocs.toDF("doc_id", "lang", "text", "y")
    val keyed = QualityClassifier.trainRatesBy(df, col("doc_id"), col("text"),
        col("y"), col("lang"), N, Dim)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (l <- Seq("en", "fr")) {
      val solo = QualityClassifier.trainRates(df.filter(col("lang") === l),
          col("doc_id"), col("text"), col("y"), N, Dim)
        .collect().map(r => (l, r.getLong(0)) -> r.getLong(1)).toMap
      assert(keyed.view.filterKeys(_._1 == l).toMap == solo,
        s"keyed slice $l drifted from the independent model")
    }
  }

  test("scoreBy equals an independent score per key slice; keyed model separates per key") {
    val df = keyedDocs.toDF("doc_id", "lang", "text", "y")
    val w = QualityClassifier.trainRatesBy(df, col("doc_id"), col("text"),
      col("y"), col("lang"), N, Dim)
    val keyed = QualityClassifier.scoreBy(df, col("doc_id"), col("text"),
        col("lang"), w, N, Dim)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    for (l <- Seq("en", "fr")) {
      val soloW = QualityClassifier.trainRates(df.filter(col("lang") === l),
        col("doc_id"), col("text"), col("y"), N, Dim)
      val solo = QualityClassifier.score(df.filter(col("lang") === l),
          col("doc_id"), col("text"), soloW, N, Dim)
        .collect().map(r => (r.getLong(0), l) ->
          ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
      assert(keyed.view.filterKeys(_._2 == l).toMap == solo)
    }
    // per-key separation on the planted corpus
    keyedDocs.foreach { case (id, l, _, y) =>
      assert((keyed((id, l))._3 == 1) == (y == 1), s"doc $id ($l) misclassified") }
  }

  test("scoreBy SURFACES uncovered-key documents with null score/keep (ADVICE r17)") {
    val df = keyedDocs.toDF("doc_id", "lang", "text", "y")
    // model trained on en only; fr documents must surface, not silently
    // fail the keep gate with an all-zero score
    val w = QualityClassifier.trainRatesBy(df.filter(col("lang") === "en"),
      col("doc_id"), col("text"), col("y"), col("lang"), N, Dim)
    val rows = QualityClassifier.scoreBy(df, col("doc_id"), col("text"),
        col("lang"), w, N, Dim)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getInt(4))))).toMap
    assert(rows.keySet.map(_._2) == Set("en", "fr"), "fr docs must surface")
    rows.foreach { case ((_, l), (s, k)) =>
      if (l == "en") assert(s.isDefined && k.isDefined)
      else assert(s.isEmpty && k.isEmpty,
        "uncovered key: score and keep must be honestly unknown (null)")
    }
  }
}
