package graft.queries

import graft.Tables
import graft.operators.QualityClassifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation family: the LEARNED quality classifier (the third
  * leg of the CCNet filter triad — heuristic gates and the LM
  * perplexity filter are q_quality_gate / q_lm_score*) and the
  * domain-level curation pass (RefinedWeb-style blocklist + per-domain
  * cap). Everything integer-exact and mirrored in DuckDB: the
  * classifier's weights are exact longs, the domain ranking is the
  * md5-prefix order both engines share.
  *
  * The classifier queries run on a PLANTED reference-domain view (the
  * q_vocab_drift / q_text_search_incr discipline): this corpus's
  * `lang`/`source` labels are text-INDEPENDENT by construction (the
  * language-ID profiles draw from one shared vocabulary — verified:
  * per-lang token rates are proportional to lang doc counts), so any
  * honest classifier on a "real" label is a coin flip and the demo
  * degenerate. Every third document gets a marker suffix and the
  * positive label; the operator must LEARN the planted n-grams from
  * the labeled half and recover the domain on the full corpus, and
  * the oracle replays training on exactly the same view. */
object CurationQueries extends QueryModule {

  /** Classifier geometry: char-3-gram features hashed into 512 buckets
    * (+1 bias); the perceptron member runs 3 epochs. The SAME
    * constants feed the Spark plan and the generated oracle SQL. */
  private[graft] val ClfN = 3
  private[graft] val ClfDim = 512
  private[graft] val ClfEpochs = 3

  /** The planted reference-domain suffix (3 repetitions — enough
    * marker windows that the rate difference clears the body noise;
    * one borderline doc at sf0.01 keeps the margin honest). */
  private[graft] val ClfMarker: String = " curated reference corpus marker" * 3

  /** The classifier corpus view: positives (`doc_id % 3 = 0`) carry
    * [[ClfMarker]]; `y` is the domain label; training uses the even
    * half, scoring the whole view. */
  private def clfCorpus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(ClfMarker)))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 3 === 0, 1).otherwise(-1).as("y"))

  private def labeledView(spark: SparkSession, sfDir: String): DataFrame =
    clfCorpus(spark, sfDir).filter(col("doc_id") % 2 === 0)

  /** The DEPLOYED model — [[QualityClassifier.trainRates]] (Rocchio
    * scaled-rate difference: one aggregate pass, no oscillation) — as
    * a persisted artifact, the lmModelStore discipline: train once,
    * score forever; every consumer reads the same table. */
  private def clfWeightsStore(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark) // fnv_ngrams
    FrameFixture(spark, "quality_clf", sfDir) {
      QualityClassifier.trainRates(labeledView(spark, sfDir),
        col("doc_id"), col("text"), col("y"), ClfN, ClfDim)
    }
  }

  /** The deployed model on the oracle gate (q_quality_clf_train): the
    * full `(b, w)` rate-difference table — DuckDB replays feature
    * hashing, the per-class occurrence counts, and both exact
    * integral divisions; one drifted bucket anywhere mismatches. */
  def qualityClfTrain(spark: SparkSession, sfDir: String): DataFrame =
    clfWeightsStore(spark, sfDir).orderBy("b")

  /** The ITERATIVE member's artifact on the oracle gate
    * (q_quality_clf_percep): the batch-perceptron weight table after
    * [[ClfEpochs]] epochs on the same planted view — the oracle
    * replays every epoch's misclassified set and the label-signed
    * occurrence folds. Its DECISION quality lives in
    * QualityClassifierSpec (separable-corpus accuracy) — on
    * overlapping classes the batch updates overshoot per epoch, which
    * is exactly why the deployed scorer above is the closed form. */
  def qualityClfPercep(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark)
    QualityClassifier.train(labeledView(spark, sfDir),
        col("doc_id"), col("text"), col("y"), ClfN, ClfDim, ClfEpochs)
      .orderBy("b")
  }

  /** The INCREMENTAL training member's persisted state: class counts
    * over the first 80% of the labeled view (`doc_id % 10 < 8`) — an
    * incremental trainer keeps these on disk between label batches
    * and only ever counts the arriving batch (the gramState /
    * sigOldStore discipline), so the query measures the BATCH leg. */
  private def clfCountsOldStore(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark)
    FrameFixture(spark, "quality_clf_counts_old", sfDir) {
      val old = labeledView(spark, sfDir).filter(col("doc_id") % 10 < 8)
      QualityClassifier.rateCounts(old, col("doc_id"), col("text"), col("y"),
        ClfN, ClfDim)
    }
  }

  /** INCREMENTAL rate-model training (q_quality_clf_incr): the
    * arriving label batch (`doc_id % 10 ≥ 8` of the labeled view)
    * counts once, folds into the persisted state bucket-wise, and the
    * weights derive from the merged counts. Counts are ADDITIVE, so
    * the result must EQUAL direct training over the whole labeled
    * view — which is what the oracle computes (the
    * q_dedup_incremental "incremental == full" trial). Output is the
    * merged state WITH its weights `(b, n_pos, n_neg, w)`. */
  def qualityClfIncr(spark: SparkSession, sfDir: String): DataFrame = {
    val delta = QualityClassifier.rateCounts(
      labeledView(spark, sfDir).filter(col("doc_id") % 10 >= 8),
      col("doc_id"), col("text"), col("y"), ClfN, ClfDim)
    val merged = QualityClassifier.mergeRateCounts(
      clfCountsOldStore(spark, sfDir), delta)
      // feeds the weight derivation (totals + rates) AND the output join
      .cache()
    QualityClassifier.weightsFromCounts(merged)
      .join(merged, Seq("b"))
      .select(col("b"), col("n_pos"), col("n_neg"), col("w"))
      .orderBy("b")
  }

  /** Every document scored under the deployed model (q_quality_clf):
    * one narrow feature pass + a broadcast join against the 513-row
    * weight table — the map-side shape the learned filter has at
    * 100 TB. `keep` recovers the planted domain (0 false keeps, one
    * missed positive at sf0.01). */
  def qualityClf(spark: SparkSession, sfDir: String): DataFrame =
    QualityClassifier.score(clfCorpus(spark, sfDir),
        col("doc_id"), col("text"), clfWeightsStore(spark, sfDir), ClfN, ClfDim)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** CURRICULUM ordering (q_curriculum_order): the corpus in training
    * order by reference-LM quality — cleanest-first (ascending mean
    * scaled surprisal under the persisted bigram artifact, the
    * q_lm_score model store), position assigned by the distributed
    * dense rank ([[graft.operators.DenseId]] range-sort +
    * zipWithIndex — never a 1-partition window). The data-ordering
    * step between curation and the loader: downstream shards read
    * contiguous `pos` ranges and see easy-to-hard (Bengio et al. 2009
    * curriculum; perplexity-ordered pretraining data). Composes two
    * oracled operators; the composed oracle chains the full LM replay
    * into the rank. */
  def curriculumOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val scored = graft.operators.NgramLm.score(docs, col("doc_id"), col("text"),
        TextQueries.lmModelStore(spark, sfDir))
      .withColumnRenamed("id", "doc_id")
    graft.operators.DenseId.withDenseId(scored,
        Seq(col("avg_surprisal"), col("doc_id")), "pos")
      .select(col("doc_id"), col("avg_surprisal"), col("pos"))
      .orderBy("pos")
  }

  /** The incremental curriculum's persisted state: the OLD corpus's
    * score DISTRIBUTION — per distinct `avg_surprisal` value, how many
    * old docs carry it (the quota-ledger discipline applied to ranks:
    * an incremental curator keeps this table on disk and never
    * re-scores or re-sorts scheduled data; its size is bounded by
    * distinct score values, and the scores are already scaled
    * integers, so a production system quantizes the same way). Old =
    * `doc_id % 10 < 8`, scored under the SAME frozen en-reference
    * bigram artifact every curriculum consumer reads. */
  private def curriculumDistOldStore(spark: SparkSession, sfDir: String): DataFrame =
    FrameFixture(spark, "curriculum_dist_old", sfDir) {
      val old = Tables.documents(spark, sfDir).filter(col("doc_id") % 10 < 8)
      graft.operators.NgramLm.score(old, col("doc_id"), col("text"),
          TextQueries.lmModelStore(spark, sfDir))
        .groupBy("avg_surprisal").agg(count(lit(1)).as("n_at"))
    }

  /** INCREMENTAL curriculum ordering (q_curriculum_incr): the arriving
    * batch (`doc_id % 10 ≥ 8`) is assigned its positions in the MERGED
    * curriculum against the persisted score distribution — old docs
    * are never re-scored, re-sorted, or even re-read (only their
    * aggregated distribution is). Ties in score break OLD-FIRST (the
    * stable-insert rule: an arriving batch never reorders already-
    * scheduled data among itself, it interleaves after equals), then
    * by doc_id within the batch.
    *
    * Scale shape: ONE distributed prefix-sum pass
    * ([[graft.operators.PrefixSum.withRunningTotal]] — range-sort +
    * per-partition subtotals, never a whole-frame window) over the
    * tagged union of distribution deltas (weight = n_at) and batch
    * rows (weight = 1): a batch row's inclusive running total IS its
    * merged 1-based position — `#old(score ≤ s) + #new((s,id) ≤
    * (s,id))` in one number, O(|state| + |batch|) per batch.
    *
    * The oracle states "incremental == full" directly: it ranks the
    * WHOLE corpus by `(score, is_new, doc_id)` and restricts to the
    * batch — one drifted position anywhere mismatches. */
  def curriculumIncr(spark: SparkSession, sfDir: String): DataFrame = {
    val batch = Tables.documents(spark, sfDir).filter(col("doc_id") % 10 >= 8)
    val scored = graft.operators.NgramLm.score(batch, col("doc_id"), col("text"),
        TextQueries.lmModelStore(spark, sfDir))
      .withColumnRenamed("id", "doc_id")
      .select(col("doc_id"), col("avg_surprisal"))
    val tagged = curriculumDistOldStore(spark, sfDir)
      .select(col("avg_surprisal"), lit(0).as("__side"),
        lit(-1L).as("doc_id"), col("n_at").as("__w"))
      .unionByName(scored.select(col("avg_surprisal"), lit(1).as("__side"),
        col("doc_id"), lit(1L).as("__w")))
    graft.operators.PrefixSum.withRunningTotal(tagged,
        Seq(col("avg_surprisal"), col("__side"), col("doc_id")), col("__w"), "pos",
        // (score, side, doc_id) is already total: state rows are unique
        // per score, batch rows per doc_id — skip the content hash
        tieBreaker = Some(col("doc_id")))
      .filter(col("__side") === 1)
      .select(col("doc_id"), col("avg_surprisal"), col("pos"))
      .orderBy("pos")
  }

  /** Domain blocklist + per-domain cap — the SAME constants feed both
    * engines. */
  private[graft] val DomainBlocklist = Seq("src3", "src7")
  private[graft] val DomainCap = 20

  /** Domain-level curation (q_domain_cap, RefinedWeb-style): documents
    * keyed by their `source` domain go through (1) a broadcast
    * blocklist ANTI-join (blocklists are tables, not literals, in
    * production — the join is the real shape), (2) a per-domain
    * document count (the curation report column), and (3) a
    * per-domain cap: at most [[DomainCap]] survivors per domain, drawn
    * in md5-of-id order (deterministic proportional down-sampling).
    * The cap rides the native bounded-state `top_k_by` aggregate — at
    * any domain size each partial buffer holds k entries, so no
    * domain's documents ever funnel through one task's sort (the
    * q_topk_per_group argument; a window ROW_NUMBER here would be the
    * low-cardinality-group whole-frame sort). */
  def domainCap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.GraftFunctions.ensure(spark)
    val block = DomainBlocklist.toDF("source")
    val kept = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(block), Seq("source"), "left_anti")
      // feeds the per-domain count AND the cap — one scan, two legs
      .cache()
    val counts = kept.groupBy("source").agg(count(lit(1)).as("n_src"))
    // md5-prefix draw order: negate so top-k-desc == hash-ascending
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    kept.select(col("source"), col("doc_id"), (-h).as("__s"))
      .groupBy("source")
      .agg(call_function("top_k_by", col("__s"), col("doc_id"), lit(DomainCap)).as("__top"))
      .select(col("source"), posexplode(col("__top")))
      .select(col("source"), col("col.payload").as("doc_id"),
        (col("pos") + 1).cast("long").as("rk"))
      .join(broadcast(counts), Seq("source"))
      .select(col("source"), col("doc_id"), col("rk"), col("n_src"))
      .orderBy("source", "rk")
  }

  /** The incremental cap's persisted state: per-domain ADMITTED counts
    * after the old corpus (the md5-gated ~6% slice, first hex char
    * '0' — DECORRELATED from `source`, which is a function of
    * doc_id mod 20, so a modular slice would land entirely in one
    * domain; and small enough that the ledger is PARTIALLY filled at
    * both harness scales, with a few domains saturating at sf0.1 — an
    * 80% old side saturates every cap and the query would verify
    * nothing, the 0-row trap) went through the cap — the
    * DomainCapStream ledger shape as a fixture (an incremental curator
    * keeps it on disk; the old corpus is never re-ranked). */
  private def domainUsedOldStore(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark)
    FrameFixture(spark, "domain_used_old", sfDir) {
      import spark.implicits._
      val block = DomainBlocklist.toDF("source")
      val old = Tables.documents(spark, sfDir)
        .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) === "0")
        .select(col("doc_id"), col("source"))
        .join(broadcast(block), Seq("source"), "left_anti")
      val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
      old.select(col("source"), col("doc_id"), (-h).as("__s"))
        .groupBy("source")
        .agg(call_function("top_k_by", col("__s"), col("doc_id"), lit(DomainCap)).as("__top"))
        .select(col("source"), size(col("__top")).cast("long").as("used_before"))
    }
  }

  /** INCREMENTAL domain-cap admission (q_domain_cap_incr): the
    * arriving 20% batch admits per domain up to `cap` minus the
    * PERSISTED admitted count — the quota-ledger semantics
    * [[graft.streaming.DomainCapStream]] runs at ingestion, as an
    * oracled batch member. Scale shape: the batch ranks per domain
    * through the bounded `top_k_by` aggregate (remaining ≤ cap always,
    * so the admitted set is inside the batch's per-domain top-cap —
    * never a corpus window), the ledger join is domain-cardinality
    * broadcast. The oracle replays old-side admission, the ledger, and
    * the batch ranks. */
  def domainCapIncr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.GraftFunctions.ensure(spark)
    val block = DomainBlocklist.toDF("source")
    val batch = Tables.documents(spark, sfDir)
      .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) =!= "0")
      .select(col("doc_id"), col("source"))
      .join(broadcast(block), Seq("source"), "left_anti")
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    batch.select(col("source"), col("doc_id"), (-h).as("__s"))
      .groupBy("source")
      .agg(call_function("top_k_by", col("__s"), col("doc_id"), lit(DomainCap)).as("__top"))
      .select(col("source"), posexplode(col("__top")))
      .select(col("source"), col("col.payload").as("doc_id"),
        (col("pos") + 1).cast("long").as("rk"))
      .join(broadcast(domainUsedOldStore(spark, sfDir)), Seq("source"), "left")
      .withColumn("used_before", coalesce(col("used_before"), lit(0L)))
      .filter(col("rk") <= lit(DomainCap.toLong) - col("used_before"))
      .select(col("source"), col("doc_id"), col("rk"), col("used_before"))
      .orderBy("source", "rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_clf_train" -> qualityClfTrain,
    "q_quality_clf_percep" -> qualityClfPercep,
    "q_quality_clf" -> qualityClf,
    "q_quality_clf_incr" -> qualityClfIncr,
    "q_curriculum_order" -> curriculumOrder,
    "q_curriculum_incr" -> curriculumIncr,
    "q_domain_cap" -> domainCap,
    "q_domain_cap_incr" -> domainCapIncr)

  override def warmFixtures(spark: SparkSession, sfDir: String): Unit = {
    clfWeightsStore(spark, sfDir)
    clfCountsOldStore(spark, sfDir)
    domainUsedOldStore(spark, sfDir)
    curriculumDistOldStore(spark, sfDir)
    ()
  }

  /** The planted-view docs + FNV-hashed occurrence features + labeled
    * half — the shared head of every classifier oracle. Generated from
    * the SAME constants (and the same FNV fold) as the Spark side. */
  private def clfHeadSql: String = {
    val fnv = QualityClassifier.fnvBucketSql("t", "i", ClfN, ClfDim)
    s"""docs AS (SELECT doc_id,
       |    lower(CASE WHEN doc_id % 3 = 0 THEN text || '$ClfMarker' ELSE text END) AS t,
       |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE -1 END AS y
       |  FROM documents WHERE text IS NOT NULL),
       |feat AS (
       |  SELECT doc_id, $fnv AS b FROM (
       |    SELECT doc_id, t, unnest(range(1, len(t) - ${ClfN - 2})) AS i FROM docs)
       |  UNION ALL SELECT doc_id, $ClfDim AS b FROM docs),
       |lab AS (SELECT doc_id, y FROM docs WHERE doc_id % 2 = 0),
       |tf AS (SELECT f.doc_id, f.b, l.y FROM feat f JOIN lab l USING (doc_id))""".stripMargin
  }

  /** The deployed model's replay: per-bucket class occurrence counts,
    * class totals, both exact integral divisions. */
  private def clfRatesSql: String =
    s"""cls AS (SELECT b,
       |    CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |    CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n
       |  FROM tf GROUP BY b),
       |tot AS (SELECT CAST(SUM(p) AS BIGINT) AS pt, CAST(SUM(n) AS BIGINT) AS nt FROM cls),
       |w AS (SELECT b,
       |    CAST((${QualityClassifier.RateScale} * p) // pt
       |       - (${QualityClassifier.RateScale} * n) // nt AS BIGINT) AS w
       |  FROM cls, tot)""".stripMargin

  /** The perceptron replay up to the epoch-[[ClfEpochs]] table: epoch
    * 1 from zero weights (everything misclassified), then per epoch
    * the misclassified set under the previous weights and the
    * label-signed occurrence fold. */
  private def clfPercepSql: String = {
    val head = "w1 AS (SELECT b, CAST(SUM(y) AS BIGINT) AS w FROM tf GROUP BY b)"
    val epochs = (2 to ClfEpochs).map { e =>
      s""",
         |m${e - 1} AS (SELECT doc_id, MIN(y) AS y
         |  FROM (SELECT t.doc_id, t.y, COALESCE(w, 0) AS w
         |        FROM tf t LEFT JOIN w${e - 1} USING (b))
         |  GROUP BY doc_id HAVING MIN(y) * SUM(w) <= 0),
         |d${e - 1} AS (SELECT t.b, CAST(SUM(m.y) AS BIGINT) AS d
         |  FROM tf t JOIN m${e - 1} m USING (doc_id) GROUP BY t.b),
         |w$e AS (SELECT COALESCE(a.b, d.b) AS b,
         |    CAST(COALESCE(a.w, 0) + COALESCE(d.d, 0) AS BIGINT) AS w
         |  FROM w${e - 1} a FULL OUTER JOIN d${e - 1} d ON a.b = d.b)""".stripMargin
    }.mkString
    head + epochs
  }

  val oracles: Map[String, String] = Map(
    "q_quality_clf_train" ->
      s"""WITH $clfHeadSql,
         |$clfRatesSql
         |SELECT b, w FROM w ORDER BY b""".stripMargin,
    "q_quality_clf_percep" ->
      s"""WITH $clfHeadSql,
         |$clfPercepSql
         |SELECT b, w FROM w$ClfEpochs ORDER BY b""".stripMargin,
    // incremental == full: counts are additive, so the merged
    // old-state + batch counts (and their weights) must equal direct
    // training over the whole labeled view
    "q_quality_clf_incr" ->
      s"""WITH $clfHeadSql,
         |$clfRatesSql
         |SELECT cls.b, cls.p AS n_pos, cls.n AS n_neg, w.w
         |FROM cls JOIN w USING (b) ORDER BY cls.b""".stripMargin,
    "q_quality_clf" ->
      s"""WITH $clfHeadSql,
         |$clfRatesSql,
         |sc AS (SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
         |    CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS score
         |  FROM feat f LEFT JOIN w USING (b) GROUP BY f.doc_id)
         |SELECT doc_id, n_feats, score,
         |  CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,
    // "incremental == full" stated directly: the oracle ranks the WHOLE
    // corpus in the merged order (score, old-first, doc_id) and
    // restricts to the batch — the incremental prefix-sum positions
    // must equal the full re-rank's
    "q_curriculum_incr" ->
      s"""WITH base AS (${TextQueries.oracles("q_lm_score")}),
         |m AS (SELECT doc_id, avg_surprisal,
         |    ROW_NUMBER() OVER (ORDER BY avg_surprisal, (doc_id % 10 >= 8), doc_id) AS pos
         |  FROM base)
         |SELECT doc_id, avg_surprisal, pos FROM m
         |WHERE doc_id % 10 >= 8 ORDER BY pos""".stripMargin,
    // the full q_lm_score replay (training + smoothing + scoring)
    // chained into the curriculum rank
    "q_curriculum_order" ->
      s"""WITH base AS (${TextQueries.oracles("q_lm_score")})
         |SELECT doc_id, avg_surprisal,
         |  ROW_NUMBER() OVER (ORDER BY avg_surprisal, doc_id) AS pos
         |FROM base ORDER BY pos""".stripMargin,
    // quota-ledger replay: old-side admission fills the ledger, the
    // batch admits per domain up to the remainder in md5-draw order
    "q_domain_cap_incr" ->
      s"""WITH old AS (SELECT doc_id, source FROM documents
         |  WHERE source NOT IN (${DomainBlocklist.map(s => s"'$s'").mkString(", ")})
         |    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
         |newb AS (SELECT doc_id, source FROM documents
         |  WHERE source NOT IN (${DomainBlocklist.map(s => s"'$s'").mkString(", ")})
         |    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'),
         |oldr AS (SELECT source, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
         |               doc_id) AS rk
         |  FROM old),
         |used AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS used_before
         |  FROM oldr WHERE rk <= $DomainCap GROUP BY source),
         |newr AS (SELECT source, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
         |               doc_id) AS rk
         |  FROM newb)
         |SELECT n.source, n.doc_id, n.rk, COALESCE(u.used_before, 0) AS used_before
         |FROM newr n LEFT JOIN used u USING (source)
         |WHERE n.rk <= $DomainCap - COALESCE(u.used_before, 0)
         |ORDER BY n.source, n.rk""".stripMargin,
    "q_domain_cap" ->
      s"""WITH keep AS (SELECT doc_id, source FROM documents
         |  WHERE source NOT IN (${DomainBlocklist.map(s => s"'$s'").mkString(", ")})),
         |n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM keep GROUP BY source),
         |r AS (SELECT source, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
         |               doc_id) AS rk
         |  FROM keep)
         |SELECT r.source, r.doc_id, r.rk, n.n_src
         |FROM r JOIN n USING (source) WHERE rk <= $DomainCap
         |ORDER BY source, rk""".stripMargin)
}
