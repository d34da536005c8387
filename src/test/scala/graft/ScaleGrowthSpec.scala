package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The occupancy regression gate behind the PLANS.md scale-growth
  * tables: clone the corpus with the SAME duplicate rate and assert
  * that mean band-bucket occupancy stays within a constant band as the
  * clone factor grows — the invariant that keeps every LSH-family
  * bucket self-join linear in the corpus. This is the spec form of the
  * measurement that caught the fixed-width simhash saturation in round
  * 7 (occupancy 45.6 → 195.7 over one 10×): any future change that
  * reintroduces a saturating bucket space fails here, at test time,
  * instead of in a 100-TB run. Reuses graft.ScaleGrowth's measurement
  * functions, so the gate and the published methodology cannot drift. */
class ScaleGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.01"
  private val Factor = 10
  // constant occupancy band: growth bounded by a scale-independent
  // multiple (2×), NOT by anything proportional to the clone factor —
  // the saturating control grew 4.3× over one 10× and fails this.
  private val Band = 2.0

  private def occBand(name: String, occ1: Double, occN: Double): Unit = {
    assert(occN <= occ1 * Band + 1e-9,
      f"$name%s: mean occupancy grew $occ1%.2f -> $occN%.2f over ${Factor}x — " +
        "bucket space is not tracking the corpus (saturation = quadratic pair join)")
  }

  test("minhash-lsh, simhash-adaptive, ann-lsh, embed-banded hold a constant occupancy band over a 10x clone") {
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val n1 = docs1.count()
    val docsN = ScaleGrowth.scaledDocs(docs1, Factor).cache()
    val nN = docsN.count()
    assert(nN == n1 * Factor)

    val mh1 = ScaleGrowth.minhashStats(docs1, n1)
    val mhN = ScaleGrowth.minhashStats(docsN, nN)
    occBand("minhash-lsh", mh1.meanOcc, mhN.meanOcc)
    // same-rate clone ⇒ verified pairs scale exactly with the factor
    assert(mhN.verified == mh1.verified * Factor,
      s"minhash verified pairs ${mh1.verified} -> ${mhN.verified}: not linear")

    val (_, sa1) = ScaleGrowth.simhashAdaptiveStats(docs1, n1)
    val (_, saN) = ScaleGrowth.simhashAdaptiveStats(docsN, nN)
    occBand("simhash-adaptive", sa1.meanOcc, saN.meanOcc)

    // prefix-filter join: replicas carry disjoint token spaces, so
    // bucket count grows with the factor, occupancy stays flat, and
    // the VERIFIED pair set scales exactly linearly
    val sj1 = ScaleGrowth.simjoinStats(docs1, n1)
    val sjN = ScaleGrowth.simjoinStats(docsN, nN)
    occBand("simjoin-prefix", sj1.meanOcc, sjN.meanOcc)
    assert(sjN.verified == sj1.verified * Factor,
      s"simjoin verified pairs ${sj1.verified} -> ${sjN.verified}: not linear")

    val dim = 64
    val emb1 = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val p1 = Similarity.prep(emb1, col("vec_id"), col("embedding")).cache()
    val v1 = p1.count()
    val pN = Similarity.prep(ScaleGrowth.scaledEmb(emb1, Factor, dim),
      col("vec_id"), col("embedding")).cache()
    val vN = pN.count()
    val (_, ann1) = ScaleGrowth.annLshStats(p1, v1, dim)
    val (_, annN) = ScaleGrowth.annLshStats(pN, vN, dim)
    occBand("ann-lsh", ann1.meanOcc, annN.meanOcc)

    val (_, eb1) = ScaleGrowth.embedBandedStats(p1, v1, dim)
    val (_, ebN) = ScaleGrowth.embedBandedStats(pN, vN, dim)
    occBand("embed-banded", eb1.meanOcc, ebN.meanOcc)

    spark.catalog.clearCache()
  }

  test("incremental text index: probe cost flat, per-delta cost tracks churn over a 10x clone") {
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val docsN = ScaleGrowth.scaledDocs(docs1, Factor).cache()
    def scratch(tag: String) = {
      val f = new java.io.File(
        s"${sys.props("java.io.tmpdir")}/graft_sgspec_index_${tag}_${java.util.UUID.randomUUID()}")
      f.toString
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val probes = Seq("vector", "scan", "merge")
    val (d1, dN) = (scratch("1"), scratch("N"))
    try {
      // `files` sized with the corpus, like any target-file-size knob —
      // the flat-admitted claim is tested against a GROWING file count
      val g1 = ScaleGrowth.textIndexGrowth(spark, docs1, d1, deltas = 3,
        files = 8, probeTerms = probes)
      val gN = ScaleGrowth.textIndexGrowth(spark, docsN, dN, deltas = 3,
        files = 8 * Factor, probeTerms = probes)
      // per-batch maintenance cost is flat IN HISTORY: every delta's
      // appended segment tracks that delta's churn, not the index size
      assert(g1.deltaRowsMax <= g1.deltaRowsMin * 1.5,
        s"1x delta segments ${g1.deltaRowsMin}-${g1.deltaRowsMax}: cost grows with history")
      assert(gN.deltaRowsMax <= gN.deltaRowsMin * 1.5,
        s"10x delta segments ${gN.deltaRowsMin}-${gN.deltaRowsMax}: cost grows with history")
      // ...and tracks the CHURN (~3%/delta), never the corpus
      assert(gN.deltaRowsMax * 10 < gN.seg0Rows,
        s"10x delta segment ${gN.deltaRowsMax} rows vs corpus ${gN.seg0Rows}: not churn-bounded")
      // probe reads are df-bounded: the clone suffixes every replica's
      // tokens, so probe df — and the postings a search touches — must
      // NOT grow with the corpus
      assert(gN.matchedPostings <= g1.matchedPostings * Band,
        s"matched postings ${g1.matchedPostings} -> ${gN.matchedPostings} over ${Factor}x: " +
          "search cost is scaling with the corpus, not the query")
      // zone maps confine the probe to a constant file set while the
      // live file count grows with the corpus — the invariant that lets
      // a 5-term query open a handful of files at 100 TB
      assert(gN.admittedFiles <= g1.admittedFiles * Band,
        s"admitted files ${g1.admittedFiles} -> ${gN.admittedFiles} over ${Factor}x: pruning is not corpus-independent")
      assert(gN.totalFiles >= g1.totalFiles * 5,
        s"total files ${g1.totalFiles} -> ${gN.totalFiles}: the growing-denominator premise broke")
    } finally {
      rm(new java.io.File(d1)); rm(new java.io.File(dN))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("ann join: cell count tracks the corpus, per-cell pair products stay flat over a 10x clone") {
    // the stride quantizer's model grows WITH the corpus (every 31st
    // vector is a centroid), so the co-located cell join's per-cell
    // occupancy — and with it every task's pair volume and the
    // candidate total per left row — must hold a constant band while
    // cells scale ~linearly; a fixed centroid set would saturate
    // exactly like the fixed-width simhash control
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val g1 = ScaleGrowth.annJoinGrowth(spark, emb, 1, dim = 64)
    val gN = ScaleGrowth.annJoinGrowth(spark, emb, Factor, dim = 64)
    assert(gN.rows == g1.rows * Factor)
    assert(gN.cells >= g1.cells * (Factor / 2),
      s"cells ${g1.cells} -> ${gN.cells}: the centroid model is not tracking the corpus")
    occBand("annjoin-cells", g1.meanProduct, gN.meanProduct)
    // flat occupancy + linear cells ⇒ near-linear candidate volume
    assert(gN.candidates <= g1.candidates * Factor * Band,
      s"candidates ${g1.candidates} -> ${gN.candidates} over ${Factor}x: super-linear join volume")
    assert(gN.hotCells == 0,
      s"${gN.hotCells} cells crossed the grid-block gate on a healthy clone")
    spark.catalog.clearCache()
  }

  test("substring spans: anchors linear, digest occupancy flat over a 10x clone") {
    // token-suffixed replicas share no grams across replicas, so the
    // original's repeated-span structure replicates EXACTLY s times —
    // repeated digests, anchors (the digest-join fan-in) and merged
    // maximal spans must all scale by the factor with occupancy flat;
    // occupancy growth would mean anchor lists concentrating on few
    // digests (a skewed digest join at corpus scale).
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val n1 = docs1.count()
    val docsN = ScaleGrowth.scaledDocs(docs1, Factor).cache()
    val s1 = ScaleGrowth.spansStats(docs1, n1)
    val sN = ScaleGrowth.spansStats(docsN, n1 * Factor)
    occBand("spans-exact", s1.meanOcc, sN.meanOcc)
    assert(s1.verified > 0, "fixture has no planted repeated spans — gate is vacuous")
    assert(sN.buckets == s1.buckets * Factor,
      s"repeated digests ${s1.buckets} -> ${sN.buckets}: not linear")
    assert(sN.candidates == s1.candidates * Factor,
      s"anchors ${s1.candidates} -> ${sN.candidates}: not linear")
    assert(sN.verified == s1.verified * Factor,
      s"merged spans ${s1.verified} -> ${sN.verified}: not linear")
    spark.catalog.clearCache()
  }

  test("edit-distance prefix join: verified pairs exactly linear, gram occupancy flat over a 10x clone") {
    // digit-remapped replicas (character bijections over disjoint
    // codepoint blocks) replicate the within-distance pair structure
    // exactly s times while keeping cross-replica distances above any
    // tested radius; the rarest-first prefix must keep the shared
    // letter grams (freq n·s) out of the join keys, so candidates and
    // verified pairs scale by the factor with occupancy flat — the
    // measurement discipline the r10 verdict flagged as missing for
    // the fuzzy family.
    val names1 = Tables.customer(spark, sf)
      .select(col("c_name").as("name")).distinct().cache()
    val n1 = names1.count()
    val namesN = ScaleGrowth.scaledNames(names1, Factor).cache()
    val nN = namesN.count()
    assert(nN == n1 * Factor, s"clone produced $nN names, expected ${n1 * Factor}")
    val f1 = ScaleGrowth.editDistStats(names1, n1)
    val fN = ScaleGrowth.editDistStats(namesN, nN)
    occBand("editdist-prefix", f1.meanOcc, fN.meanOcc)
    assert(f1.verified > 0, "fixture has no within-one-edit name pairs — gate is vacuous")
    assert(fN.candidates <= f1.candidates * Factor * Band,
      s"candidates ${f1.candidates} -> ${fN.candidates} over ${Factor}x: super-linear join volume")
    assert(fN.verified == f1.verified * Factor,
      s"verified pairs ${f1.verified} -> ${fN.verified}: not linear")
    spark.catalog.clearCache()
  }

  test("bigram LM: model exactly flat, scored docs exactly linear over a 10x plain clone") {
    // plain clones (same text, new ids): every bigram count scales by
    // the factor but the bigram SET — the model artifact scoring joins
    // against — does not; scored documents track the corpus exactly
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val docsN = ScaleGrowth.clonedDocs(docs1, Factor).cache()
    val g1 = ScaleGrowth.lmGrowth(docs1)
    val gN = ScaleGrowth.lmGrowth(docsN)
    assert(gN.rows == g1.rows * Factor)
    assert(gN.modelRows == g1.modelRows,
      s"model ${g1.modelRows} -> ${gN.modelRows} over ${Factor}x plain clones: " +
        "the artifact is growing with the corpus, not the vocabulary")
    assert(gN.vocab == g1.vocab)
    assert(gN.scored == g1.scored * Factor,
      s"scored ${g1.scored} -> ${gN.scored}: not linear")
    spark.catalog.clearCache()
  }

  test("trigram LM: one-table backoff model exactly flat, scored docs exactly linear over a 10x plain clone") {
    // the trigram-count table IS the whole backoff model (lower orders
    // are marginals), so the flat-artifact claim covers every tier
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val docsN = ScaleGrowth.clonedDocs(docs1, Factor).cache()
    val g1 = ScaleGrowth.lm3Growth(docs1)
    val gN = ScaleGrowth.lm3Growth(docsN)
    assert(gN.rows == g1.rows * Factor)
    assert(gN.modelRows == g1.modelRows,
      s"model ${g1.modelRows} -> ${gN.modelRows} over ${Factor}x plain clones: " +
        "the artifact is growing with the corpus, not the observed-trigram set")
    assert(gN.vocab == g1.vocab)
    assert(gN.scored == g1.scored * Factor,
      s"scored ${g1.scored} -> ${gN.scored}: not linear")
    spark.catalog.clearCache()
  }

  test("5-gram LM: one-table five-tier model exactly flat, scored docs exactly linear over a 10x plain clone") {
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val docsN = ScaleGrowth.clonedDocs(docs1, Factor).cache()
    val g1 = ScaleGrowth.lm5Growth(docs1)
    val gN = ScaleGrowth.lm5Growth(docsN)
    assert(gN.rows == g1.rows * Factor)
    assert(gN.modelRows == g1.modelRows,
      s"model ${g1.modelRows} -> ${gN.modelRows} over ${Factor}x plain clones: " +
        "the artifact is growing with the corpus, not the observed-5-gram set")
    assert(gN.vocab == g1.vocab)
    assert(gN.scored == g1.scored * Factor,
      s"scored ${g1.scored} -> ${gN.scored}: not linear")
    spark.catalog.clearCache()
  }

  test("unigram training: model pieces and weights invariant over a 10x plain clone") {
    // uniform R× on every substring/char count leaves the seed top-k
    // (lexicographic tie-breaks), every EM weight (ln(Rc/RT) = ln(c/T)),
    // and so the final model — pieces AND weights — bit-identical;
    // counts scale exactly by the factor
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val docsN = ScaleGrowth.clonedDocs(docs1, Factor).cache()
    val g1 = ScaleGrowth.unigramGrowth(spark, docs1, vocabSize = 50, seedSize = 200)
    val gN = ScaleGrowth.unigramGrowth(spark, docsN, vocabSize = 50, seedSize = 200)
    assert(gN.rows == g1.rows * Factor)
    assert(gN.vocab == g1.vocab)
    assert(gN.model.map(p => (p.piece, p.weight)) == g1.model.map(p => (p.piece, p.weight)),
      "model pieces/weights changed under uniform scaling — seed/EM is not scale-invariant")
    assert(gN.model.map(_.count) == g1.model.map(_.count * Factor),
      "piece counts did not scale exactly with the clone factor")
    spark.catalog.clearCache()
  }

  test("bpe training: vocabulary flat and rule list invariant over a 10x plain clone") {
    // plain clones (same text, new ids): the realistic growth shape —
    // corpus rows scale, vocabulary does not. Train cost per iteration
    // rides the vocabulary, so flat vocab IS the scale claim; and a
    // uniform R× on every pair count must leave the argmax sequence
    // (incl. lexicographic tie-breaks) untouched, so the MODEL is
    // invariant with n scaled exactly by the factor.
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val docsN = ScaleGrowth.clonedDocs(docs1, Factor).cache()
    val g1 = ScaleGrowth.bpeGrowth(spark, docs1, nMerges = 8)
    val gN = ScaleGrowth.bpeGrowth(spark, docsN, nMerges = 8)
    assert(gN.rows == g1.rows * Factor)
    assert(gN.vocab == g1.vocab,
      s"vocab ${g1.vocab} -> ${gN.vocab} over ${Factor}x plain clone: clone is not vocabulary-preserving")
    assert(gN.rules.map(r => (r.rank, r.lhs, r.rhs)) ==
      g1.rules.map(r => (r.rank, r.lhs, r.rhs)),
      "rule list changed under uniform scaling — argmax/tie-break is not scale-invariant")
    assert(gN.rules.map(_.n) == g1.rules.map(_.n * Factor),
      "winning pair counts did not scale exactly with the clone factor")
    spark.catalog.clearCache()
  }

  test("wordpiece training: vocab flat, merges invariant with the scale-calibrated floor over a 10x plain clone") {
    // plain clones keep the vocabulary flat, so the drain gate's
    // decision never flips under plain growth; a uniform R× divides
    // every likelihood score by exactly R (R·n / (R·nl · R·nr)), so
    // with the floor scaled 2 -> 2R the merge list is invariant and
    // every winning count scales exactly by R. (The fixed-floor
    // divergence control lives in WordPieceSpec.)
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val docsN = ScaleGrowth.clonedDocs(docs1, Factor).cache()
    val g1 = ScaleGrowth.wordpieceGrowth(spark, docs1, nMerges = 8, minFreq = 2L)
    val gN = ScaleGrowth.wordpieceGrowth(spark, docsN, nMerges = 8,
      minFreq = 2L * Factor)
    assert(gN.rows == g1.rows * Factor)
    assert(gN.vocab == g1.vocab,
      s"vocab ${g1.vocab} -> ${gN.vocab} over ${Factor}x plain clone")
    assert(g1.drained && gN.drained,
      "plain clones must not flip the vocabulary-watching drain gate")
    assert(gN.merges.map(m => (m.rank, m.lhs, m.rhs)) ==
      g1.merges.map(m => (m.rank, m.lhs, m.rhs)),
      "merge list changed under uniform scaling + scaled floor — " +
        "likelihood argmax/tie-break is not scale-invariant")
    assert(gN.merges.map(m => (m.n, m.nLhs, m.nRhs)) ==
      g1.merges.map(m => (m.n * Factor, m.nLhs * Factor, m.nRhs * Factor)),
      "winning counts did not scale exactly with the clone factor")
    spark.catalog.clearCache()
  }

  test("wordpiece drain gate: forcing the distributed path lands on identical merges (the flip changes the plan, never the model)") {
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val drain = ScaleGrowth.wordpieceGrowth(spark, docs1, nMerges = 8, minFreq = 2L)
    val dist = ScaleGrowth.wordpieceGrowth(spark, docs1, nMerges = 8, minFreq = 2L,
      driverDrainMaxWords = 0L)
    assert(drain.drained && !dist.drained,
      "the maxWords = 0 override must force the distributed path")
    assert(dist.merges == drain.merges,
      "drain and distributed paths diverged — the gate is not plan-only")
    spark.catalog.clearCache()
  }

  test("multilingual funnel: per-language legs exactly linear, the dedup leg collapses clones") {
    // frozen 1x router + per-language LMs (the deployed-model
    // discipline): clone text is identical, so predictions and
    // per-document surprisals replicate — routed/scored/LM-kept grow
    // EXACTLY xR per language (means are exact under DIV), and the
    // per-language dedup leg collapses every clone to its original's
    // digest — flat at the 1x value. Per-language cost rides the
    // language's share of the corpus.
    val g1 = ScaleGrowth.multilingualGrowth(spark, Tables.documents(spark, sf), 1)
    val gN = ScaleGrowth.multilingualGrowth(spark, Tables.documents(spark, sf), Factor)
    assert(g1.map(_.lang) == gN.map(_.lang), "language set drifted under cloning")
    assert(g1.forall(g => g.routed > 0 && g.lmKept > 0 && g.dedupKept > 0),
      s"vacuous trial — some language leg is empty: $g1")
    g1.zip(gN).foreach { case (a, b) =>
      assert(b.routed == a.routed * Factor,
        s"${a.lang}: routed ${a.routed} -> ${b.routed}, expected exactly x$Factor")
      assert(b.scored == a.scored * Factor,
        s"${a.lang}: scored ${a.scored} -> ${b.scored}, expected exactly x$Factor")
      assert(b.lmKept == a.lmKept * Factor,
        s"${a.lang}: lmKept ${a.lmKept} -> ${b.lmKept}, expected exactly x$Factor " +
          "(the frozen-model mean threshold is exact under DIV)")
      assert(b.dedupKept == a.dedupKept,
        s"${a.lang}: dedupKept ${a.dedupKept} -> ${b.dedupKept} — " +
          "the per-language dedup leg must collapse clones flat")
    }
    spark.catalog.clearCache()
  }

  test("multilingual near-dup: variants defeat the digest leg, the near-dup leg collapses them per language") {
    // NEAR-clone variants (one tail token per replica): exact digests
    // grow xR (the digest stage is structurally blind to them), the
    // pair graph inside each original's variant clique is quadratic by
    // definition, and the KEEP count collapses flat to the 1x value —
    // the near-dup leg doing the job exact dedup cannot. Factor kept
    // modest: pairs grow ~R^2 per clique by design.
    val F = 3
    val g1 = ScaleGrowth.multilingualNearDupGrowth(spark, Tables.documents(spark, sf), 1)
    val gN = ScaleGrowth.multilingualNearDupGrowth(spark, Tables.documents(spark, sf), F)
    assert(g1.map(_.lang) == gN.map(_.lang), "language set drifted under near-cloning")
    assert(g1.forall(g => g.routed > 0 && g.keep > 0),
      s"vacuous trial — some language leg is empty: $g1")
    g1.zip(gN).foreach { case (a, b) =>
      assert(b.routed == a.routed * F,
        s"${a.lang}: routed ${a.routed} -> ${b.routed}, expected exactly x$F " +
          "(variants inherit their parent's partition — base_text routing)")
      assert(b.exactDistinct == a.exactDistinct * F,
        s"${a.lang}: exact-distinct ${a.exactDistinct} -> ${b.exactDistinct} — " +
          "every variant carries a fresh digest; the exact leg must NOT collapse them")
      assert(b.verPairs > a.verPairs,
        s"${a.lang}: verified pairs ${a.verPairs} -> ${b.verPairs} — " +
          "variant cliques must pair within their language")
      // collapse is subject to the banded-LSH RECALL FLOOR, not exact:
      // a variant whose tail token takes the minhash minimum in ALL
      // k/w bands shares no bucket with its clique and is invisibly
      // isolated — for a T-token doc P ≈ (1−((T−2)/(T−1))²)^(k/w),
      // ~0.2% at T=10 and vanishing for longer docs (measured at
      // sf0.1/10x: exactly 1 of 45,000 variants — PLANS r18). Gate the
      // collapse against that floor, never silently widen it.
      assert(b.keep >= a.keep, s"${a.lang}: keep shrank ${a.keep} -> ${b.keep}")
      assert(b.keep - a.keep <= math.max(1L, a.routed / 500),
        s"${a.lang}: keep ${a.keep} -> ${b.keep} — beyond the LSH recall floor; " +
          "the near-dup leg is failing to collapse variant cliques")
    }
    spark.catalog.clearCache()
  }

  test("per-language classifier rates: keyed weight table bit-invariant over a 10x plain clone") {
    import org.apache.spark.sql.functions._
    import graft.operators.QualityClassifier
    // keyed Rocchio: per-key counts additive, per-key totals additive,
    // both divisions exact integral — every language's slice obeys
    // R·cnt div R·tot == cnt div tot independently, so the FULL keyed
    // table is bit-identical however much the corpus uniformly grows.
    // y and lang are materialized BEFORE cloning (clone ids shift, the
    // planted labels must not).
    val labeled1 = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" clfmark clfmark")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 3 === 0, 1).otherwise(-1).as("y"),
        col("lang")).cache()
    val labeledN = ScaleGrowth.clonedLabeled(labeled1, Factor).cache()
    def wmap(df: org.apache.spark.sql.DataFrame) =
      QualityClassifier.trainRatesBy(df, col("doc_id"), col("text"), col("y"),
          col("lang"), 3, 256)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w1 = wmap(labeled1)
    val wN = wmap(labeledN)
    assert(w1.nonEmpty && w1.keySet.map(_._1).size > 1, s"vacuous trial: ${w1.size} rows")
    assert(wN == w1,
      "keyed weights changed under uniform scaling — the per-key exact-division " +
        "model must be clone-invariant")
    assert(w1.size <= w1.keySet.map(_._1).size * 257,
      s"keyed model must stay L*(dim+1)-bounded, got ${w1.size}")
    labeled1.unpersist(); labeledN.unpersist()
    spark.catalog.clearCache()
  }

  test("lang-ID rates: weight table bit-invariant, counts exactly linear over a 10x plain clone") {
    import org.apache.spark.sql.functions._
    // the multi-class Rocchio closed form: counts additive, the rate
    // an exact integral division — R·cnt div R·tot == cnt div tot, so
    // the deployed model is BIT-identical however much the corpus is
    // uniformly grown (retraining on a grown corpus is a no-op)
    val labeled1 = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").cache()
    val labeledN = ScaleGrowth.clonedLabeled(labeled1, Factor).cache()
    val g1 = ScaleGrowth.langIdGrowth(labeled1, n = 3, dim = 512)
    val gN = ScaleGrowth.langIdGrowth(labeledN, n = 3, dim = 512)
    assert(gN.rows == g1.rows * Factor)
    assert(gN.modelRows == g1.modelRows,
      s"weight table ${g1.modelRows} -> ${gN.modelRows} rows over ${Factor}x — " +
        "the model must be L*(dim+1)-bounded, never corpus-sized")
    assert(gN.weights == g1.weights,
      "weights changed under uniform scaling — the exact-division model is not clone-invariant")
    assert(gN.counts == g1.counts.map { case (k, v) => k -> v * Factor },
      "class counts did not scale exactly with the clone factor")
    spark.catalog.clearCache()
  }

  test("quality classifier: weight table bounded, models clone-invariant, keeps exactly linear over a 10x plain clone") {
    import org.apache.spark.sql.functions._
    // the q_quality_clf planted-domain view (lang/source labels are
    // text-independent in this corpus, so they are the wrong target)
    val labeled1 = Tables.documents(spark, sf)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" curated reference corpus marker" * 3)))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 3 === 0, 1).otherwise(-1).as("y")).cache()
    val labeledN = ScaleGrowth.clonedLabeled(labeled1, Factor).cache()
    // deployed member (Rocchio rates): exact integral divisions make
    // the MODEL bit-invariant over plain clones (R·cnt div R·tot ==
    // cnt div tot), decisions identical, keeps exactly linear — and
    // the split must be nontrivial (the operator actually learns)
    val g1 = ScaleGrowth.clfRatesGrowth(labeled1, n = 3, dim = 256)
    val gN = ScaleGrowth.clfRatesGrowth(labeledN, n = 3, dim = 256)
    assert(gN.rows == g1.rows * Factor)
    assert(g1.weightRows <= 257 && gN.weightRows == g1.weightRows,
      s"weight table ${g1.weightRows} -> ${gN.weightRows}: not bounded by the hash dim")
    assert(gN.weights == g1.weights,
      "rate-difference weights changed under uniform scaling — not clone-invariant")
    assert(g1.nKeep > 0 && g1.nKeep < g1.rows, "degenerate split — gate is vacuous")
    assert(gN.nKeep == g1.nKeep * Factor,
      s"keeps ${g1.nKeep} -> ${gN.nKeep}: decisions changed under uniform scaling")
    // iterative member (batch perceptron): a uniform R× scales every
    // epoch's weights by exactly R (scores scale by R, so each
    // misclassification sign test is clone-invariant) — decisions
    // identical, whatever they are
    val p1 = ScaleGrowth.clfGrowth(labeled1, n = 3, dim = 256, epochs = 3)
    val pN = ScaleGrowth.clfGrowth(labeledN, n = 3, dim = 256, epochs = 3)
    assert(pN.weights == p1.weights.map { case (b, w) => b -> w * Factor },
      "perceptron weights are not exactly R-scaled — training is not clone-invariant")
    assert(pN.nKeep == p1.nKeep * Factor,
      s"perceptron keeps ${p1.nKeep} -> ${pN.nKeep}: decisions changed under scaling")
    spark.catalog.clearCache()
  }

  test("tokenizer-mix composition: routed x R, admissions track the alpha-law, top pairs rank-stable") {
    // the mT5 composition under a frozen 1x router: the α-sampled
    // tokenizer corpus's per-language shares must track the analytic
    // policy at EVERY scale (each scale against its OWN n·thresh/2^32
    // expectation — the draw is a fixed per-id fact), and the
    // shared-vocab corpus pass's top-pair RANKING must not move under
    // uniform growth (pair-count gaps dwarf admission noise).
    val F = 5
    val g1 = ScaleGrowth.tokenizerMixGrowth(spark, Tables.documents(spark, sf), 1)
    val gN = ScaleGrowth.tokenizerMixGrowth(spark, Tables.documents(spark, sf), F)
    assert(g1.langs.map(_._1) == gN.langs.map(_._1), "language set drifted")
    assert(g1.langs.forall(_._3 > 0), s"vacuous trial — a language sampled zero: ${g1.langs}")
    g1.langs.zip(gN.langs).foreach { case ((l, r1, s1, e1), (_, rN, sN, eN)) =>
      assert(rN == r1 * F, s"$l: routed $r1 -> $rN, expected exactly x$F")
      def inBand(adm: Long, exp: Double, tag: String): Unit =
        assert(math.abs(adm - exp) <= 4 * math.sqrt(exp) + 5,
          f"$l $tag: admissions $adm%d vs expectation $exp%.1f")
      inBand(s1, e1, "1x"); inBand(sN, eN, s"${F}x")
    }
    // the top-10 SET is admission-noise-proof (pair-count gaps at the
    // boundary dwarf the noise) and is the scale-robust law; RANKS are
    // not — near-tied neighbors (measured at sf0.1/10x: the two head
    // pairs differ by <1% and swap) can reorder under per-clone draws,
    // which is exactly why BPE training ties break by rule order, not
    // by trusting sampled counts to be stable
    assert(g1.topPairs.map(p => (p._1, p._2)).toSet ==
        gN.topPairs.map(p => (p._1, p._2)).toSet,
      s"shared-vocab top-pair SET moved under uniform growth:\n" +
        s"1x: ${g1.topPairs}\n${F}x: ${gN.topPairs}")
    spark.catalog.clearCache()
  }

  test("temperature mixture: per-domain thresholds scale-stable, admissions linear over a 10x clone") {
    import org.apache.spark.sql.functions._
    val docs1 = Tables.documents(spark, sf).select("doc_id", "lang").cache()
    // id-offset clone preserving the domain column: per-lang counts
    // scale EXACTLY R (the mixture's only count input)
    val docsN = (0 until Factor).map(r =>
        docs1.withColumn("doc_id", col("doc_id") + lit(r * 100000000L)))
      .reduce(_ unionByName _).cache()
    def mix(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sample.temperatureMix(df, col("doc_id"), col("lang"))
    def policy(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      mix(df).select("lang", "n_dom", "thresh").distinct()
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def admitted(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      mix(df).groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (p1, pN) = (policy(docs1), policy(docsN))
    val (a1, aN) = (admitted(docs1), admitted(docsN))
    assert(p1.keySet == pN.keySet && p1.size >= 3, s"domain sets drifted: ${p1.keySet} vs ${pN.keySet}")
    p1.foreach { case (lang, (n1, th1)) =>
      val (nN, thN) = pN(lang)
      assert(nN == n1 * Factor, s"$lang: counts $n1 -> $nN not exactly ${Factor}x")
      // thresholds are RATIOS of R-scaled quantities: exactly invariant
      // up to the integral-division floors — pin a 2% + 2-ulp band so a
      // policy that silently re-weights under growth fails here
      assert(math.abs(thN - th1) <= th1 / 50 + 2,
        s"$lang: admission threshold drifted $th1 -> $thN under a uniform ${Factor}x")
      // the salted-md5 draw admits ~n·thresh/2^32 per domain: at 1x the
      // small-domain counts sit several binomial sigmas wide (fr drew 13
      // on an expectation of ~19 — comparing R×observed would flag pure
      // draw noise), so assert each scale against its ANALYTIC
      // expectation with a 4-sigma band. The draw is deterministic per
      // id, so this is a fixed fact of the corpus, not a flaky sample.
      def inBand(adm: Long, n: Long, th: Long, tag: String): Unit = {
        val exp = n.toDouble * th / 4294967296d
        assert(math.abs(adm - exp) <= 4 * math.sqrt(exp) + 5,
          f"$lang%s $tag%s: admissions $adm%d vs expectation $exp%.1f — " +
            "the draw is not tracking the policy")
      }
      val (adm1, admN) = (a1.getOrElse(lang, 0L), aN.getOrElse(lang, 0L))
      assert(adm1 > 0, s"$lang: zero admissions at 1x — the trial is vacuous")
      inBand(adm1, n1, th1, "1x")
      inBand(admN, nN, thN, s"${Factor}x")
    }
    spark.catalog.clearCache()
  }

  test("boilerplate strip: span volume bounded by the fixed budget over a 10x clone") {
    import org.apache.spark.sql.functions._
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val docsN = ScaleGrowth.scaledDocs(docs1, Factor).cache()
    def stripped(df: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Dedup.boilerplateSpans(df, col("doc_id"), col("text"),
          n = 3, topM = 150)
        .agg(sum("span_tokens")).head() match {
          case r if r.isNullAt(0) => 0L // no spans → let the vacuous-trial assert fire
          case r => r.getLong(0)
        }
    val (s1, sN) = (stripped(docs1), stripped(docsN))
    assert(s1 > 0, "no boilerplate found at 1x — the trial is vacuous")
    // the strip list is a FIXED budget (top-M grams), so the stripped
    // volume tracks the budget, not the corpus: the contrast row to the
    // spans family's linear anchors above. Band 2x, same as occupancy.
    assert(sN <= s1 * 2,
      s"stripped tokens $s1 -> $sN over ${Factor}x — the fixed-budget strip grew with the corpus")
    spark.catalog.clearCache()
  }

  test("the saturating fixed-width control FAILS the band (the gate detects the bug class)") {
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val n1 = docs1.count()
    val docsN = ScaleGrowth.scaledDocs(docs1, Factor).cache()
    // fixed 4×8-bit simhash: 1024 possible buckets, occupancy must grow
    // ~linearly with the corpus — the exact failure mode the gate exists
    // to catch; if THIS passes the band, the gate has gone soft
    val f1 = ScaleGrowth.simhashStats(docs1, n1, w = 8)
    val fN = ScaleGrowth.simhashStats(docsN, n1 * Factor, w = 8)
    assert(fN.meanOcc > f1.meanOcc * Band,
      s"fixed-width control stayed in band (${f1.meanOcc} -> ${fN.meanOcc}) — gate is not discriminating")
    spark.catalog.clearCache()
  }

  test("curation funnel: pre-dedup legs exactly corpus-linear, the dedup leg collapses clones") {
    val docs = Tables.documents(spark, sf)
    val g1 = ScaleGrowth.curationFunnelGrowth(spark, docs, 1)
    val gN = ScaleGrowth.curationFunnelGrowth(spark, docs, Factor)
    assert(g1.gate > 0 && g1.clf > 0 && g1.lm > 0 && g1.exact > 0,
      s"vacuous trial: 1x funnel $g1")
    // frozen 1x models + a %6-aligned clone make every replica's
    // decisions identical — the growth law is exact, not a band
    assert(gN.input == g1.input * Factor, s"input ${g1.input} -> ${gN.input}")
    assert(gN.gate == g1.gate * Factor, s"gate ${g1.gate} -> ${gN.gate}")
    assert(gN.clf == g1.clf * Factor, s"clf ${g1.clf} -> ${gN.clf}")
    assert(gN.lm == g1.lm * Factor, s"lm ${g1.lm} -> ${gN.lm}")
    // exact dedup must catch every clone: the survivor count is the
    // 1x count, FLAT in the clone factor
    assert(gN.exact == g1.exact,
      s"exact-dedup survivors ${g1.exact} -> ${gN.exact} over ${Factor}x — clones leaked through")
    spark.catalog.clearCache()
  }

  test("k-center: driver job count rides k alone — same k, 10x corpus, same jobs") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val k = 6
    val g1 = ScaleGrowth.kcenterGrowth(spark, emb, 1, k)
    val gN = ScaleGrowth.kcenterGrowth(spark, emb, Factor, k)
    assert(g1.rows > 0 && gN.rows == g1.rows * Factor)
    assert(g1.jobs > 0, "vacuous trial: no jobs recorded at 1x")
    // the ladder is k sequential rounds; what each round submits is
    // corpus-INDEPENDENT (one cache-materializing argmax collect + one
    // seed/vector lookup amortized) — a corpus-sized job count here
    // would mean the traversal re-pairs or re-sorts the corpus
    assert(gN.jobs == g1.jobs,
      s"job count ${g1.jobs} -> ${gN.jobs} over a ${Factor}x corpus at fixed k=$k — " +
        "per-round work is no longer one bounded argmax")
    // Gonzalez ladder sanity at both scales: k rows, radius non-increasing
    assert(g1.k == k && gN.k == k)
    spark.catalog.clearCache()
  }
}
