package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactRows drops full-row duplicates only") {
    val df = Seq((1, "a"), (1, "a"), (1, "b")).toDF("k", "v")
    assert(Dedup.exactRows(df).count() == 2)
  }

  test("exactByDigest: one row per distinct text, min-id representative, copy count") {
    val df = Seq((3L, "same text"), (1L, "same text"), (2L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactByDigest(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("shingles: distinct word 3-grams; short texts yield none") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text")
    val sh = Dedup.shingles(df, col("id"), col("text"), 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("repeatedSpans: planted cross-doc spans merge to maximal; within-doc repeats don't count") {
    def spans(rows: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] =
      Dedup.repeatedSpans(rows.toDF("id", "text"), col("id"), col("text"), n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // one shared 4-token span → anchors overlap → ONE maximal span per doc
    assert(spans(Seq(
      (1L, "u1 u2 X Y Z W u3"),
      (2L, "v1 X Y Z W v2 v3"))) ==
      Set((1L, 2L, 5L, 4L), (2L, 1L, 4L, 4L)))
    // two disjoint shared spans → two islands per doc
    assert(spans(Seq(
      (3L, "X Y Z q1 q2 q3 A B C q4"),
      (4L, "X Y Z r1 r2 A B C r3"))) ==
      Set((3L, 0L, 2L, 3L), (3L, 6L, 8L, 3L), (4L, 0L, 2L, 3L), (4L, 5L, 7L, 3L)))
    // an n-gram repeated only WITHIN one doc is not a cross-doc span
    assert(spans(Seq(
      (5L, "M N O p M N O"),
      (6L, "totally unrelated words here"))) == Set.empty)
    // verbatim means case-sensitive; short docs yield no grams
    assert(spans(Seq((7L, "a B c D e"), (8L, "a b c d e"), (9L, "a b"))) == Set.empty)
  }

  test("evalOverlapSpans: only eval-set grams anchor; corpus-internal repeats don't") {
    val eval = Seq((100L, "E1 E2 E3 E4 e5")).toDF("id", "text")
    val corpus = Seq(
      // quotes the eval 4-gram shifted by one extra anchor → ONE maximal span
      (1L, "c1 E1 E2 E3 E4 e5 c2"),
      // shares a BIGRAM with doc 1 but no eval trigram → no span
      (2L, "q1 E1 E2 zz yy xx ww"),
      (3L, "r1 E1 zz totally different words"))
      .toDF("id", "text")
    val state = Dedup.spanDigestState(eval, col("id"), col("text"), n = 3)
    val out = Dedup.evalOverlapSpans(corpus, col("id"), col("text"), state, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // anchors at pos 1,2,3 (grams E1E2E3, E2E3E4, E3E4e5) merge to [1,5]
    assert(out == Set((1L, 1L, 5L, 5L)))
    // matches repeatedSpans(eval ∪ corpus) restricted to corpus ids whose
    // partner is the eval doc — the blunt-variant parity the scaladoc claims
    val full = Dedup.repeatedSpans(eval.union(corpus), col("id"), col("text"), n = 3)
      .filter(col("id") === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(full == out)
    // the removal splice deletes EXACTLY the leaked tokens; untouched
    // docs pass through verbatim with n_removed = 0
    val cleaned = Dedup.removeEvalOverlaps(corpus, col("id"), col("text"), state, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(cleaned(1L) == ("c1 c2", 5L))
    assert(cleaned(2L) == ("q1 E1 E2 zz yy xx ww", 0L))
    assert(cleaned(3L) == ("r1 E1 zz totally different words", 0L))
  }

  test("identical texts share the full MinHash signature; LSH pairs them; Jaccard = 1.0") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words appear in this one here"))
      .toDF("id", "text")
    val sh = Dedup.shingles(df, col("id"), col("text"), 3)
    val cands = Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignature(sh, 8), 8, 2))
    val verified = Dedup.jaccardVerify(cands, sh, 0.6).collect()
    assert(verified.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(verified.head.getAs[Double]("jaccard") == 1.0)
  }

  test("a CacheScope releases exactly the pins jaccardVerify created") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val sh = Dedup.shingles(df, col("id"), col("text"), 3)
    val cands = Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignature(sh, 8), 8, 2))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scope = new graft.operators.CacheScope
    val verified = Dedup.jaccardVerify(cands, sh, 0.6, scope)
    assert(verified.count() == 1) // materializes the internal pin
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "expected jaccardVerify's candidate-shingle pin to be live")
    scope.close()
    // non-blocking unpersist: poll briefly for the blocks to drop
    val deadline = System.currentTimeMillis() + 10000
    while ((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "scope.close() must release the operator's internal pin")
  }

  test("raw-shingle signature equals distinct-shingle signature (MIN is duplicate-insensitive)") {
    val df = Seq(
      (1L, "a b c a b c a b c d e f"), // heavy positional duplication
      (2L, "p q r s t u v w"))
      .toDF("id", "text")
    val fromRaw = Dedup.minhashSignature(Dedup.shinglesRaw(df, col("id"), col("text"), 3), 8)
      .orderBy("id").collect().map(_.toSeq)
    val fromDistinct = Dedup.minhashSignature(Dedup.shingles(df, col("id"), col("text"), 3), 8)
      .orderBy("id").collect().map(_.toSeq)
    assert(fromRaw.toSeq == fromDistinct.toSeq)
  }

  test("per-document array signature equals the exploded-stream signature") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b c a b c a b c d"), // heavy duplication
      (3L, "too short"))           // < n tokens: stream yields no row
      .toDF("id", "text")
    val arr = Dedup.minhashSignatureArr(df, col("id"), col("text"), 3, 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val stream = Dedup.minhashSignature(Dedup.shinglesRaw(df, col("id"), col("text"), 3), 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(stream.keySet == Set(1L, 2L))
    stream.foreach { case (id, sig) => assert(arr(id) == sig) }
    // the shingle-less doc gets all-null minima in the array form
    assert(arr(3L).forall(_ == null))
  }

  test("fast xxhash64 path verifies the same near-dup pairs as the md5 path") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "an entirely unrelated document about winter weather in the far north"),
      (4L, "an entirely unrelated document about winter weather in the far north"),
      (5L, "nothing here resembles any other row of this little fixture at all"))
      .toDF("id", "text")
    val raw = Dedup.shinglesRaw(df, col("id"), col("text"), 3)
    def pairsOf(sig: org.apache.spark.sql.DataFrame, bands: org.apache.spark.sql.DataFrame) =
      Dedup.jaccardVerify(Dedup.candidatePairs(bands), raw, 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = Dedup.minhashSignature(raw, 8)
    val fast = Dedup.minhashSignatureFast(raw, 8)
    val slowPairs = pairsOf(slow, Dedup.lshBands(slow, 8, 2))
    val fastPairs = pairsOf(fast, Dedup.lshBandsFast(fast, 8, 2))
    assert(slowPairs == Set((1L, 2L), (3L, 4L)))
    assert(fastPairs == slowPairs)
  }

  test("clusters: transitive pairs collapse to min-id components; singletons untouched") {
    // 1-2, 2-3 chain → component {1,2,3}; 5-6 → {5,6}; 9 never appears
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("clusters: a long chain converges (diameter > 2 needs multiple rounds)") {
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("clusters: non-convergence within maxIters throws instead of returning wrong labels") {
    // driverDrainMaxEdges = 0 pins the DISTRIBUTED propagation path —
    // the driver union-find drain has no convergence budget to exhaust
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.clusters(chain, maxIters = 2, driverDrainMaxEdges = 0L)
    }
  }

  test("clusters: distributed path matches driver union-find drain exactly") {
    // same graph, both paths — the drain must be bit-identical to the
    // min-label propagation it replaces (chain, star, singleton pair,
    // and out-of-order ids that make min-tracking nontrivial)
    val pairs = Seq((7L, 2L), (2L, 9L), (9L, 1L), (20L, 21L), (30L, 25L))
      .toDF("id_a", "id_b")
    val drained = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val propagated = Dedup.clusters(pairs, driverDrainMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drained == propagated)
    assert(drained == Map(7L -> 1L, 2L -> 1L, 9L -> 1L, 1L -> 1L,
      20L -> 20L, 21L -> 20L, 30L -> 25L, 25L -> 25L))
  }

  test("clusters: driver drain handles string ids with UTF8-byte ordering") {
    val pairs = Seq(("b", "a"), ("a", "c")).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("lshBandsFast: all-null signature rows never become candidates") {
    // docs too short to shingle get all-null minima from the array
    // signature path; xxhash64 SKIPS nulls, so without the null guard
    // they would all hash to one bucket and form a clique
    val df = Seq((1L, "a"), (2L, "b"), (3L, "x y z w")).toDF("id", "text")
    val sig = Dedup.minhashSignatureArr(df, col("id"), col("text"), 3, 8)
    val cands = Dedup.candidatePairs(Dedup.lshBandsFast(sig, 8, 2)).collect()
    assert(cands.isEmpty, s"short docs must not pair: ${cands.mkString(",")}")
  }

  test("splitByCluster: near-dup cluster members share a split; singletons hash their own id") {
    val docs = (1L to 20L).map(i => (i, s"doc$i")).toDF("doc_id", "payload")
    // two clusters: {1,2,3} canon 1 and {10,11} canon 10
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "canon_id")
    val out = Dedup.splitByCluster(docs, col("doc_id"), labels, nSplits = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.values.forall { case (_, s) => s >= 0 && s < 4 })
    assert(Set(out(1L), out(2L), out(3L)).size == 1, "cluster {1,2,3} straddled splits")
    assert(out(10L) == out(11L), "cluster {10,11} straddled splits")
    assert(out(4L)._1 == 4L && out(20L)._1 == 20L, "singletons must represent themselves")
    // determinism
    val again = Dedup.splitByCluster(docs, col("doc_id"), labels, nSplits = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
  }

  test("contaminationScore: permille bounds, full hit for eval members, zero for disjoint docs") {
    val fps = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"), // doc 1: 2/4 contaminated
      (2L, "x"), (2L, "y"),                       // doc 2: clean
      (3L, "a"), (3L, "b"))                       // doc 3: the eval doc itself
      .toDF("id", "fp")
    val evalFps = fps.filter(col("id") === 3L)
    val got = Dedup.contaminationScore(fps, evalFps)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((4L, 2L, 500L)))
    assert(got(2L) == ((2L, 0L, 0L)))
    assert(got(3L) == ((2L, 2L, 1000L)))
  }

  test("incrementalCandidates: full candidate set minus old-x-old, both broadcast modes") {
    // three near-dup families straddling the old/new boundary + noise
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // old, dup of 2 and 11
      (2L, "alpha beta gamma delta epsilon zeta"),   // old  → pair (1,2) is old-old: EXCLUDED
      (11L, "alpha beta gamma delta epsilon zeta"),  // new  → (1,11),(2,11) included
      (3L, "one two three four five six seven"),     // old, dup of 12
      (12L, "one two three four five six seven"),    // new  → (3,12)
      (13L, "red orange yellow green blue indigo"),  // new, dup of 14
      (14L, "red orange yellow green blue indigo"),  // new  → (13,14)
      (4L, "lonely words that match nothing else")).toDF("doc_id", "text")
    val isNew = col("doc_id") >= 10
    def bands(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshBands(Dedup.minhashSignatureArr(df, col("doc_id"), col("text"), n = 3, k = 8), 8, 2)
    val full = Dedup.candidatePairs(bands(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantTouchingNew = full.filter { case (a, b) => a >= 10 || b >= 10 }
    Seq(true, false).foreach { bc =>
      val inc = Dedup.incrementalCandidates(
        bands(docs.filter(isNew)), bands(docs.filter(!isNew)), broadcastNew = bc)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(inc == wantTouchingNew, s"broadcastNew=$bc: $inc != $wantTouchingNew")
      assert(!inc.contains((1L, 2L)), "old-x-old pair leaked into the incremental set")
    }
    assert(Set((1L, 11L), (2L, 11L), (3L, 12L), (13L, 14L)).subsetOf(wantTouchingNew))
  }

  test("simhash: identical token sets get identical signatures, disjoint sets differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // same tokens, different order
      (3L, "zeta eta theta iota kappa lambda"))
      .toDF("id", "text")
    val out = Dedup.simhash(df, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out(1L).length == 16 && out(1L).forall(c => c == '0' || c == '1'))
  }

  test("simhash: widening the signature never rewrites the prefix (salted block continuity)") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa lambda mu nu"))
      .toDF("id", "text")
    def sigs(bits: Int) = Dedup.simhash(df, col("id"), col("text"), bits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s16 = sigs(16); val s32 = sigs(32); val s52 = sigs(52)
    Seq(1L, 2L).foreach { id =>
      assert(s52(id).length == 52)
      // block 0 is unsalted in every width — narrow signatures are
      // literal prefixes of wide ones
      assert(s52(id).take(32) == s32(id))
      assert(s32(id).take(16) == s16(id))
      // the salted tail is real signal, not padding
      assert(s52(id).drop(32).exists(_ == '1') || s52(id).drop(32).exists(_ == '0'))
    }
    assert(s52(1L).drop(32) != s52(2L).drop(32))
  }

  test("simhashPairsAdaptive: corpus-derived width, same pairs as the explicit-width call") {
    // 40 docs: 5 planted dup pairs (same token SET, reordered — simhash
    // distance exactly 0, immune to vote-margin noise) + 30 distinct
    val near = (0 until 5).flatMap { i =>
      Seq((100L + i, s"common base text block$i payload alpha beta gamma"),
        (200L + i, s"gamma beta alpha payload block$i text base common"))
    }
    val rest = (0 until 30).map(i => (300L + i, s"unique$i tokens$i only$i here$i words$i"))
    val df = (near ++ rest).toDF("id", "text")
    val w = Similarity.adaptiveBits(40L, 8) // 8-bit floor at this size
    assert(w == 8)
    val adaptive = Dedup.simhashPairsAdaptive(df, col("id"), col("text"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = Dedup.simhashPairs(
      Dedup.simhash(df, col("id"), col("text"), bits = 4 * w), maxDist = 2, sigLen = 4 * w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adaptive == explicit)
    // planted near-dups survive the radius; disjoint docs don't flood in
    val planted = (0 until 5).map(i => (100L + i, 200L + i)).toSet
    assert(planted.subsetOf(adaptive), s"missing planted pairs: ${planted -- adaptive}")
  }

  test("simhashPairsAdaptive pins its signature frame through the caller's CacheScope") {
    val df = Seq((1L, "a b c d"), (2L, "d c b a"), (3L, "p q r s")).toDF("id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scope = new graft.operators.CacheScope
    assert(Dedup.simhashPairsAdaptive(df, col("id"), col("text"), scope = scope).count() >= 1)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "expected the signature pin to be live")
    scope.close()
    val deadline = System.currentTimeMillis() + 10000
    while ((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "scope.close() must release the adaptive signature pin")
  }

  test("decontaminateBy screens within its key only — cross-language overlap costs nothing") {
    // doc 1 (en) verbatim-overlaps the FR eval doc 10; the keyed
    // screen must keep it (not en's benchmark), while the unkeyed
    // screen drops it — the exact difference the per-language stage
    // exists for. doc 2 (en) overlaps the EN eval doc 20: dropped.
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "one two three four five six seven"),
      (3L, "en", "totally unrelated clean english words here"),
      (10L, "fr", "alpha beta gamma delta epsilon zeta"),
      (20L, "en", "one two three four five six seven"))
      .toDF("doc_id", "lang", "text")
    val fps = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), n = 3, w = 4)
    val evalDocs = Seq((10L, "fr"), (20L, "en")).toDF("id", "k")
    val evalFps = fps.join(evalDocs, Seq("id")).select("k", "fp")
    val kept = Dedup.decontaminateBy(docs, col("doc_id"), col("lang"), fps, evalFps)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L),
      s"keyed screen: doc 1 survives (fr-only overlap), 2/10/20 drop, got $kept")
    // the UNKEYED screen would have dropped doc 1 too
    val keptGlobal = Dedup.decontaminate(docs, col("doc_id"), fps,
        fps.join(evalDocs, Seq("id")).select("id", "fp"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptGlobal == Set(3L), s"global screen drops the cross-language overlap: $keptGlobal")
  }
}
