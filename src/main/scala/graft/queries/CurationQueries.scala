package graft.queries

import graft.Tables
import graft.operators.{CacheScope, QualityClassifier}
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
  def qualityClfIncr(spark: SparkSession, sfDir: String,
                     scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val delta = QualityClassifier.rateCounts(
      labeledView(spark, sfDir).filter(col("doc_id") % 10 >= 8),
      col("doc_id"), col("text"), col("y"), ClfN, ClfDim)
    // feeds the weight derivation (totals + rates) AND the output join
    val merged = scope.pin(QualityClassifier.mergeRateCounts(
      clfCountsOldStore(spark, sfDir), delta))
    QualityClassifier.weightsFromCounts(merged)
      .join(merged, Seq("b"))
      .select(col("b"), col("n_pos"), col("n_neg"), col("w"))
      .orderBy("b")
  }

  /** PER-LANGUAGE quality classifier (q_quality_clf_lang — VERDICT r17
    * item 6, the CCNet/fastText production shape): quality models
    * train PER LANGUAGE — the router partitions the labeled corpus and
    * every language gets its own Rocchio rate-difference table, all
    * `L` models from ONE keyed aggregate
    * ([[QualityClassifier.trainRatesBy]], the `bigramModelBy`
    * pattern); each key's slice equals an independent
    * [[QualityClassifier.trainRates]] over that slice, with the rate
    * divisions using each language's OWN class totals. Output the full
    * `(predicted_lang, b, w)` table — ≤ `L·(dim+1)` rows. The oracle
    * composes the router replay with the keyed count/division replay:
    * one drifted bucket in any language's model mismatches. Scale
    * shape: one routing pass + one feature pass + one `(k, b)` keyed
    * aggregate (map-side combined), totals broadcast per key; the
    * model is bounded, bit-invariant under uniform corpus growth
    * (per-key `R·cnt div R·tot = cnt div tot` — ScaleGrowthSpec). */
  def qualityClfLang(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark)
    val labeled = labeledView(spark, sfDir)
      .join(TextQueries.langRoutes(spark, sfDir), Seq("doc_id"))
    QualityClassifier.trainRatesBy(labeled, col("doc_id"), col("text"),
        col("y"), col("predicted_lang"), ClfN, ClfDim)
      .withColumnRenamed("k", "predicted_lang")
      .orderBy("predicted_lang", "b")
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
  def domainCap(spark: SparkSession, sfDir: String,
                scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    import spark.implicits._
    graft.GraftFunctions.ensure(spark)
    val block = DomainBlocklist.toDF("source")
    // feeds the per-domain count AND the cap — one scan, two legs
    val kept = scope.pin(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(block), Seq("source"), "left_anti"))
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

  /** The pipeline's per-domain cap — deliberately TIGHTER than
    * [[DomainCap]]: at the flagship's post-filter survivor density the
    * production cap of 20 never binds (a stage that verifies nothing —
    * the 0-row trap's quieter sibling), while 2 binds PARTIALLY at
    * sf0.01 (28 → 21 measured) and saturates most domains at sf0.1
    * (≈310 → 36) — both ledger regimes on the gate. */
  private[graft] val PipelineCap = 2

  /** The END-TO-END text-curation FLAGSHIP (q_curation_pipeline — the
    * text analog of q_multimodal_pipeline, VERDICT r14 item 2): the
    * complete curation family as ONE plan over the planted corpus view
    * ([[clfCorpus]]'s marked text — the frozen classifier artifact's
    * own training domain, so the learned stage is honest):
    *
    *   1. heuristic gates ([[graft.operators.TextStats.withGateFlags]]
    *      — the Gopher/C4 rule conjunction),
    *   2. learned contamination screen ([[QualityClassifier.score]]
    *      under the DEPLOYED rate artifact [[clfWeightsStore]]: docs
    *      the model assigns to the planted curated-reference domain
    *      (score > 0) are EXCLUDED — the decontamination polarity,
    *      which also keeps the downstream stages dense (the keep
    *      polarity would thin the corpus to the marked third's gate
    *      survivors),
    *   3. reference-LM filter ([[graft.operators.NgramLm
    *      .scoreBackoffPruned]] against the persisted PRUNED 5-gram
    *      artifact): keep docs at or below the survivor-mean scaled
    *      surprisal — a distribution-relative cut (CCNet buckets by
    *      perplexity quantile; the integer mean is the exact-arithmetic
    *      stand-in) computed as one tiny aggregate broadcast back,
    *   4. exact dedup among survivors ([[graft.operators.Dedup
    *      .exactByDigest]] — digests shuffle, never text bytes),
    *   5. near-dup drop by the CORPUS-WIDE minhash cluster labels
    *      ([[DedupQueries.clusterLabelsStore]] — the dedup service's
    *      PUBLISHED label artifact; the whole corpus is labeled once,
    *      not per-pipeline-run),
    *   6. domain curation: blocklist anti-join + per-domain cap
    *      [[PipelineCap]] in md5-draw order (the [[domainCap]]
    *      machinery, bounded `top_k_by` — no corpus window),
    *   7. curriculum ordering by the STAGE-3 scores (one LM pass feeds
    *      both the filter and the order — cleanest-first positions via
    *      the distributed dense rank), and
    *   8. sequence packing ([[graft.operators.PrefixSum.packByBudget]])
    *      of the ordered survivors into [[SampleQueries.PackBudget]]
    *      bins — the loader-facing artifact.
    *
    * Every stage is an individually-oracled operator; the composed
    * DuckDB oracle (the q_corpus_pipeline pattern) replays ALL of them
    * — classifier training, the pruned-LM build, the minhash closure —
    * in one statement, so one drifted stage anywhere breaks the
    * flagship row. Scale shape is inherited stage-wise: the corpus
    * crosses one narrow gate pass, one feature aggregate, one 5-gram
    * join ladder, one digest aggregate, and one bounded per-domain
    * top-k; clusters/blocklist/threshold ride broadcasts. */
  def curationPipeline(spark: SparkSession, sfDir: String,
                       scope: CacheScope = CacheScope.unmanaged): DataFrame =
    packTail(curationSurvivors(spark, sfDir, scope))

  /** The rank/pack tail (stages 7–8): curriculum order by the stage-3
    * scores, then budget packing — shared by the live flagship and the
    * persisted-store build so both emit byte-identical frames. */
  private def packTail(capped: DataFrame): DataFrame = {
    // r18: rank + pack FUSED — the position IS the running row count of
    // the same (avg_surprisal, doc_id) total order the packer consumed,
    // so one range-sorted pass emits both (was: DenseId's sort +
    // zipWithIndex, then packByBudget's second sort + subtotal pass
    // over the pos order — two extra jobs and a full re-sort).
    // Identical frames: pos = row_number of the same total order,
    // bin_end = running n_chars in pos order, bin = the same floor.
    val packed = graft.operators.PrefixSum.withDenseIdAndRunningTotal(
      capped, Seq(col("avg_surprisal"), col("doc_id")), col("n_chars"),
      "pos", "bin_end", tieBreaker = Some(col("doc_id")))
      .withColumn("bin",
        floor((col("bin_end") - col("n_chars").cast("long")) /
          SampleQueries.PackBudget).cast("long"))
    packed
      .select(col("doc_id"), col("source"), col("avg_surprisal"), col("pos"),
        col("n_chars"), col("bin_end").as("offset_end"), col("bin"))
      .orderBy("pos")
  }

  /** The survivor frame after EACH pipeline stage — shared by the
    * flagship (which consumes only [[CurationStages.capped]]) and the
    * funnel report (which counts every member). `gate`/`clf`/`lm`…
    * are id-frames; `capped` carries the metadata the rank/pack tail
    * needs. */
  private final case class CurationStages(
      pv: DataFrame, gate: DataFrame, clf: DataFrame, lm: DataFrame,
      exact: DataFrame, near: DataFrame, unblocked: DataFrame, capped: DataFrame)

  /** Stages 1–6 of [[curationPipeline]] (everything before the rank /
    * packing tail, whose [[graft.operators.DenseId]] RDD hop hides the
    * upstream plan from inspection) — split out so PlanContractSpec
    * can pin the filter chain's physical shape. */
  private[graft] def curationSurvivors(spark: SparkSession, sfDir: String,
                                       scope: CacheScope = CacheScope.unmanaged): DataFrame =
    curationStages(spark, sfDir, scope).capped

  private def curationStages(spark: SparkSession, sfDir: String,
                             scope: CacheScope = CacheScope.unmanaged): CurationStages = {
    import spark.implicits._
    graft.GraftFunctions.ensure(spark)
    // the pipeline's corpus: the planted view WITH domain/packing
    // metadata — feeds the gate pass, both scoring passes, the digest,
    // and the metadata joins (one scan, pinned)
    val pv = scope.pin(Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(ClfMarker)))
          .otherwise(col("text")).as("text")))
    // 1. heuristic gates
    val gk = scope.pin(graft.operators.TextStats.withGateFlags(pv, col("text"))
      .filter(col("keep")).select("doc_id")) // feeds the clf conjunction AND the funnel count
    // 2. learned screen: drop classifier-flagged reference-domain docs
    val ck = QualityClassifier.score(pv, col("doc_id"), col("text"),
        clfWeightsStore(spark, sfDir), ClfN, ClfDim)
      .filter(col("score") <= 0).select(col("id").as("doc_id"))
    val s12 = scope.pin(gk.join(ck, Seq("doc_id"), "left_semi"))
    // ^ feeds the LM scan input AND the funnel count
    // 3. pruned-LM filter at the survivor-mean surprisal
    val lms = graft.operators.NgramLm.scoreBackoffPruned(
        pv.join(s12, Seq("doc_id"), "left_semi"), col("doc_id"),
        col("text"), TextQueries.lm5pModelStore(spark, sfDir), order = 5)
      .withColumnRenamed("id", "doc_id")
      .select("doc_id", "avg_surprisal")
    val lmsP = scope.pin(lms) // feeds the mean AND the filter
    val thr = lmsP.agg(expr("sum(avg_surprisal) DIV count(1)").as("__thr"))
    val lk = lmsP.crossJoin(broadcast(thr))
      .filter(col("avg_surprisal") <= col("__thr")).drop("__thr")
    // 4. exact dedup among survivors (min doc_id per content digest)
    val ek = graft.operators.Dedup.exactByDigest(
        pv.join(lk.select("doc_id"), Seq("doc_id"), "left_semi"),
        col("doc_id"), col("text"))
      .select(col("keep_id").as("doc_id"))
    // 5. near-dup drop by corpus-wide cluster labels (the PUBLISHED
    // dedup-service artifact — VERDICT r16 item 1: the label graph is
    // derived once per corpus snapshot, not per pipeline run)
    val labels = DedupQueries.clusterLabelsStore(spark, sfDir)
    val dropped = labels.filter(col("id") =!= col("canon_id"))
      .select(col("id").as("__drop"))
    val s4 = scope.pin(lk.join(ek, Seq("doc_id"), "left_semi"))
    // ^ feeds the near-dup anti-join AND the funnel count
    val s45 = s4
      .join(broadcast(dropped), col("doc_id") === col("__drop"), "left_anti")
    // 6. domain curation: blocklist + per-domain cap in md5-draw order
    val block = DomainBlocklist.toDF("source")
    val enriched = scope.pin(s45
      .join(pv.select("doc_id", "source", "n_chars"), Seq("doc_id"))
      .join(broadcast(block), Seq("source"), "left_anti"))
    // ^ feeds the cap draw AND the survivor re-join below
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val capped = enriched.select(col("source"), col("doc_id"), (-h).as("__s"))
      .groupBy("source")
      .agg(call_function("top_k_by", col("__s"), col("doc_id"), lit(PipelineCap)).as("__top"))
      .select(posexplode(col("__top")))
      .select(col("col.payload").as("doc_id"))
    CurationStages(pv = pv, gate = gk, clf = s12, lm = lk.select("doc_id"),
      exact = s4, near = s45, unblocked = enriched,
      capped = enriched.join(capped, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), col("avg_surprisal"), col("n_chars")))
  }

  /** PERSISTED flagship artifacts (VERDICT r15 item 1): at 100 TB the
    * curation pipeline runs ONCE and every consumer — funnel report,
    * shard manifest, pair curation — reads its PUBLISHED frames; no
    * audit re-derives the whole chain. The [[FrameFixture]] discipline
    * already applied to the fingerprint and model stores, extended to
    * the flagship: one build per (JVM, scale) runs the stage chain
    * once and writes each stage's survivor frame plus the packed
    * output to parquet; every later consumer reads the store. The
    * flagship query itself (q_curation_pipeline) stays a LIVE
    * derivation — it is the producer — and every consumer's oracle
    * still replays the full chain, so a drifted store breaks the
    * consumers' hash gates. */
  private final case class CurationStore(
      input: DataFrame, gate: DataFrame, clf: DataFrame, lm: DataFrame,
      exact: DataFrame, near: DataFrame, unblocked: DataFrame,
      capped: DataFrame, packed: DataFrame)

  private def curationStore(spark: SparkSession, sfDir: String): CurationStore = {
    val scope = new CacheScope // build-only pins; parquet outlives them
    try {
      lazy val st = curationStages(spark, sfDir, scope) // forced at most once per (JVM, scale)
      def f(tag: String)(b: => DataFrame): DataFrame = FrameFixture(spark, tag, sfDir)(b)
      CurationStore(
        input = f("cur_input")(st.pv.select("doc_id")),
        gate = f("cur_gate")(st.gate),
        clf = f("cur_clf")(st.clf),
        lm = f("cur_lm")(st.lm),
        exact = f("cur_exact")(st.exact.select("doc_id")),
        near = f("cur_near")(st.near.select("doc_id")),
        unblocked = f("cur_unblocked")(st.unblocked.select("doc_id")),
        capped = f("cur_capped")(st.capped),
        packed = f("cur_packed")(packTail(st.capped)))
    } finally scope.close()
  }

  /** The curation FUNNEL report (q_curation_report): survivors after
    * every [[curationPipeline]] stage — the per-stage kill-rate audit
    * every production curation run publishes next to its output (the
    * RefinedWeb/Dolma removal-rate table; without it a silently
    * over-aggressive stage reads as "pipeline ran fine"). One number
    * per stage, counted from the SAME [[curationStore]] frames the
    * other consumers read (one pipeline run publishes them), so the
    * report can never disagree with the pipeline it audits. The
    * oracle replays the full chain and counts the same eight sets. */
  def curationReport(spark: SparkSession, sfDir: String): DataFrame = {
    val st = curationStore(spark, sfDir)
    def c(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("survivors"))
        .select(lit(stage).as("stage"), col("survivors"))
    c("0_input", st.input)
      .unionByName(c("1_gate", st.gate))
      .unionByName(c("2_classifier", st.clf))
      .unionByName(c("3_lm", st.lm))
      .unionByName(c("4_exact_dedup", st.exact))
      .unionByName(c("5_near_dedup", st.near))
      .unionByName(c("6_blocklist", st.unblocked))
      .unionByName(c("7_domain_cap", st.capped))
      .orderBy("stage")
  }

  /** The flagship's SHARD MANIFEST (q_curation_manifest): the curated,
    * ordered, packed corpus no longer ends at a frame — its per-shard
    * manifest ([[graft.operators.ShardManifest]]: row count, unit sum,
    * order-free XOR digest) is BUILT, SAVED under the stamped
    * contract, RE-LOADED through the validating loader, and emitted —
    * so a training loader can consume and verify the flagship's
    * output end to end (the q_shard_manifest discipline applied to
    * the curation pipeline's own bins). Reads the [[curationStore]]
    * packed frame — the manifest is built from the PUBLISHED corpus,
    * not a private re-derivation. The oracle replays the whole
    * pipeline chain into per-shard counts and digests. */
  def curationManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val packed = curationStore(spark, sfDir).packed
    val m = graft.operators.ShardManifest.build(
      packed, col("bin"), col("doc_id"), col("n_chars"), SampleQueries.PackBudget)
    val path = s"${Scratch.root}/curation_manifest_${new java.io.File(sfDir).getName}"
    graft.operators.ShardManifest.save(m, path)
    graft.operators.ShardManifest.load(spark, path)
      .select(col("shard"), col("n_rows"), col("n_units"), col("digest"))
      .orderBy("shard")
  }

  /** The text flagship's keep-list as a published artifact (one
    * [[DedupQueries.corpusPipeline]] run per JVM + scale). */
  private def textKeepStore(spark: SparkSession, sfDir: String): DataFrame =
    FrameFixture(spark, "xm_text_keep", sfDir) {
      DedupQueries.corpusPipeline(spark, sfDir).select("doc_id")
    }

  /** The media flagship's keep-list as a published artifact (one
    * [[MediaQueries.multimodalPipeline]] run per JVM + scale). */
  private def mediaKeepStore(spark: SparkSession, sfDir: String): DataFrame =
    FrameFixture(spark, "xm_media_keep", sfDir) {
      MediaQueries.multimodalPipeline(spark, sfDir).select("media_id")
    }

  /** CROSS-MODAL pair curation (q_crossmodal_pairs — VERDICT r14 item
    * 3, the LAION pair-filter shape): the corpus's natural doc↔media
    * pairing (document `d` is the caption of media `d` — media ids ARE
    * doc ids with `kind = doc_id mod 3` by the corpus contract), kept
    * iff BOTH sides survive their modality's curation: the text side's
    * [[DedupQueries.corpusPipeline]] keep-list (exact dedup → near-dup
    * drop → decontamination → repetition gate) and the media side's
    * [[MediaQueries.multimodalPipeline]] keep-list (image/audio/video
    * near-dup closure). Emits keep/drop with per-side flags and a
    * reason — the audit columns a pair-curation report needs. No new
    * operator math: the value on trial is the composition, so the
    * oracle chains BOTH flagship replays into the pair join. Scale
    * shape: the pair frame joins each keep-list BY KEY (id-partitioned
    * hash joins — keep-lists are corpus-sized, never driver-collected;
    * at harness scale AQE broadcasts them, at 100 TB they shuffle on
    * the same id key the pair table already carries). Both keep-lists
    * are PUBLISHED artifacts ([[FrameFixture]], built once per JVM +
    * scale by one run of each flagship): pair curation consumes the
    * curation services' outputs, it does not re-run them. */
  def crossmodalPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val textKeep = textKeepStore(spark, sfDir).select(col("doc_id").as("__tk"))
    val mediaKeep = mediaKeepStore(spark, sfDir).select(col("media_id").as("__mk"))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .withColumn("media_id", col("doc_id"))
      .withColumn("kind",
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video"))
      .join(textKeep, col("doc_id") === col("__tk"), "left")
      .join(mediaKeep, col("media_id") === col("__mk"), "left")
      .select(col("doc_id"), col("media_id"), col("kind"),
        col("__tk").isNotNull.cast("int").as("doc_kept"),
        col("__mk").isNotNull.cast("int").as("media_kept"),
        (col("__tk").isNotNull && col("__mk").isNotNull).cast("int").as("keep"),
        when(col("__tk").isNotNull && col("__mk").isNotNull, "ok")
          .when(col("__tk").isNull && col("__mk").isNull, "both_dropped")
          .when(col("__tk").isNull, "doc_dropped")
          .otherwise("media_dropped").as("reason"))
      .orderBy("doc_id")
  }

  /** The per-document QUALITY-SIGNALS table (q_quality_signals — the
    * Dolma/RedPajama "annotate, don't filter" artifact): every
    * curation signal the engine computes, attached to every ORIGINAL
    * corpus document as columns, with NO filtering — downstream
    * consumers choose their own thresholds without re-running the
    * scans. One row per document carrying:
    *
    *  - the gate rule inputs + conjunction
    *    ([[graft.operators.TextStats.withGateFlags]]),
    *  - the deployed classifier's reference-domain score
    *    ([[QualityClassifier.score]] under [[clfWeightsStore]] — on
    *    the original text this is a LIKENESS signal, not a verdict),
    *  - the pruned reference-LM mean surprisal
    *    ([[graft.operators.NgramLm.scoreBackoffPruned]]),
    *  - exact-dup standing (copy count + canonical flag, by content
    *    digest),
    *  - near-dup standing (minhash cluster canonical id — own id when
    *    unclustered),
    *  - eval-set contamination (winnow-fingerprint hit permille,
    *    [[DedupQueries.contaminationScore]]).
    *
    * Every signal join is LEFT: a null-text document (unscoreable by
    * the text-derived signals) still gets its row, with the classifier
    * / LM / exact-dup columns null — the annotate-don't-filter
    * contract holds for the whole corpus, not just its scoreable part.
    *
    * Each signal is an individually-oracled operator; the composed
    * oracle replays all six chains into one row set. Scale shape: six
    * independent per-document passes (each linear, each already
    * plan-audited in its home query) joined BY doc_id — no pass ever
    * sees another's intermediate state, so the whole table
    * materializes in one id-partitioned join tree. */
  def qualitySignals(spark: SparkSession, sfDir: String,
                     scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    graft.GraftFunctions.ensure(spark)
    val docs = scope.pin(Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "n_chars", "text"))
    val gates = graft.operators.TextStats.withGateFlags(docs, col("text"))
      .select(col("doc_id"), col("n_words"), col("mwl_pm"), col("distinct_pm"),
        col("stop_hits"), col("keep").cast("int").as("gate_keep"))
    val clf = QualityClassifier.score(docs, col("doc_id"), col("text"),
        clfWeightsStore(spark, sfDir), ClfN, ClfDim)
      .select(col("id").as("doc_id"), col("score").as("clf_score"))
    val lm = graft.operators.NgramLm.scoreBackoffPruned(docs, col("doc_id"),
        col("text"), TextQueries.lm5pModelStore(spark, sfDir), order = 5)
      .select(col("id").as("doc_id"), col("avg_surprisal"))
    val ex = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("__dg"))
      .join(graft.operators.Dedup.exactByDigest(docs, col("doc_id"), col("text"))
          .withColumnRenamed("digest", "__dg"),
        Seq("__dg"))
      .select(col("doc_id"), col("n_copies"),
        (col("doc_id") === col("keep_id")).cast("int").as("is_exact_canonical"))
    // near-dup labels and contamination permilles come off the
    // PUBLISHED dedup-service artifacts (VERDICT r16 item 1) — the
    // report consumes the stores; its oracle still replays both chains
    val labels = DedupQueries.clusterLabelsStore(spark, sfDir)
      .select(col("id").as("doc_id"), col("canon_id"))
    val cont = DedupQueries.contaminationStore(spark, sfDir)
      .select(col("doc_id"), col("n_fps"), col("n_hits"),
        col("permille").as("contamination_pm"))
    docs.select("doc_id", "lang", "source", "n_chars")
      .join(gates, Seq("doc_id"))
      .join(clf, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .join(ex, Seq("doc_id"), "left")
      .join(broadcast(labels), Seq("doc_id"), "left")
      .withColumn("near_canon_id", coalesce(col("canon_id"), col("doc_id")))
      .drop("canon_id")
      .join(cont, Seq("doc_id"), "left")
      .withColumn("n_fps", coalesce(col("n_fps"), lit(0L)))
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contamination_pm", coalesce(col("contamination_pm"), lit(0L)))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation_pipeline" -> ((s, d) => curationPipeline(s, d)),
    "q_curation_report" -> curationReport,
    "q_curation_manifest" -> curationManifest,
    "q_quality_signals" -> ((s, d) => qualitySignals(s, d)),
    "q_crossmodal_pairs" -> crossmodalPairs,
    "q_quality_clf_train" -> qualityClfTrain,
    "q_quality_clf_percep" -> qualityClfPercep,
    "q_quality_clf" -> qualityClf,
    "q_quality_clf_lang" -> ((s, d) => qualityClfLang(s, d)),
    "q_quality_clf_incr" -> ((s, d) => qualityClfIncr(s, d)),
    "q_curriculum_order" -> curriculumOrder,
    "q_curriculum_incr" -> curriculumIncr,
    "q_domain_cap" -> ((s, d) => domainCap(s, d)),
    "q_domain_cap_incr" -> domainCapIncr)

  override def warmFixtures(spark: SparkSession, sfDir: String): Unit = {
    clfWeightsStore(spark, sfDir)
    clfCountsOldStore(spark, sfDir)
    domainUsedOldStore(spark, sfDir)
    curriculumDistOldStore(spark, sfDir)
    curationStore(spark, sfDir)
    textKeepStore(spark, sfDir)
    mediaKeepStore(spark, sfDir)
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
    * class totals, both exact integral divisions. The weight CTE's
    * name is a parameter because the signals composition also carries
    * the winnow chain, whose own `w` would collide. */
  private def clfRatesSql(wName: String = "w"): String =
    s"""cls AS (SELECT b,
       |    CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |    CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n
       |  FROM tf GROUP BY b),
       |tot AS (SELECT CAST(SUM(p) AS BIGINT) AS pt, CAST(SUM(n) AS BIGINT) AS nt FROM cls),
       |$wName AS (SELECT b,
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

  /** The flagship's composed replay: every stage of
    * [[curationPipeline]] in ONE statement — the planted view, the
    * gate conjunction (the q_quality_gate literals), the full
    * classifier training + scoring chain ([[clfHeadSql]] /
    * [[clfRatesSql]]), the pruned 5-gram build + survivor scoring
    * ([[TextQueries.lm5pModelChainSql]] — per-window CTE renamed `lsc`
    * to dodge the classifier chain's `sc`), the digest dedup, the
    * recursive minhash closure ([[DedupQueries.pairChainSql]]), the
    * capped md5 draw, and the rank + packing windows. */
  private def pipelineChainSql: String = {
    val blockList = DomainBlocklist.map(s => s"'$s'").mkString(", ")
    s"""WITH RECURSIVE
       |pv AS (SELECT doc_id, source, n_chars,
       |    CASE WHEN doc_id % 3 = 0 THEN text || '$ClfMarker' ELSE text END AS tm
       |  FROM documents WHERE text IS NOT NULL),
       |gs AS (SELECT doc_id,
       |    len(string_split(lower(tm), ' ')) AS n_words,
       |    greatest(len(string_split(lower(tm), ' ')), 1) AS n1,
       |    (length(tm) - len(string_split(lower(tm), ' ')) + 1) * 1000 AS wc1000,
       |    len(list_distinct(string_split(lower(tm), ' '))) * 1000 AS d1000,
       |    len(list_intersect(list_distinct(string_split(lower(tm), ' ')),
       |      ['a','the','and','of','to','in','is','that'])) AS stop_hits
       |  FROM pv),
       |gk AS (SELECT doc_id FROM gs WHERE n_words BETWEEN 30 AND 90
       |  AND wc1000 // n1 BETWEEN 4000 AND 5000 AND stop_hits >= 2
       |  AND d1000 // n1 >= 450),
       |$clfHeadSql,
       |${clfRatesSql()},
       |csc AS (SELECT f.doc_id, CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS score
       |  FROM feat f LEFT JOIN w USING (b) GROUP BY f.doc_id),
       |ck AS (SELECT doc_id FROM csc WHERE score <= 0),
       |s12 AS (SELECT gk.doc_id FROM gk JOIN ck USING (doc_id)),
       |${TextQueries.lm5pModelChainSql},
       |${TextQueries.lm5pScoreChainSql(
          """
            |  SELECT p.doc_id, list_concat(['<s>', '<s>', '<s>', '<s>'],
            |    list_filter(string_split(lower(p.tm), ' '), w -> w <> '')) AS t
            |  FROM pv p JOIN s12 USING (doc_id)""".stripMargin, "lsc")},
       |lms AS (SELECT doc_id, CAST(SUM(s) // COUNT(*) AS BIGINT) AS avg_surprisal
       |  FROM lsc GROUP BY doc_id),
       |thr AS (SELECT CAST(SUM(avg_surprisal) // COUNT(*) AS BIGINT) AS t FROM lms),
       |lk AS (SELECT doc_id, avg_surprisal FROM lms, thr WHERE avg_surprisal <= thr.t),
       |ek AS (SELECT MIN(p.doc_id) AS doc_id FROM pv p JOIN lk USING (doc_id)
       |  GROUP BY md5(p.tm)),
       |${DedupQueries.pairChainSql},
       |edges AS (SELECT id_a AS src, id_b AS dst FROM ver
       |  UNION ALL SELECT id_b, id_a FROM ver),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(a, b) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
       |labels AS (SELECT a AS id, MIN(b) AS canon_id FROM reach GROUP BY a),
       |dropped AS (SELECT id FROM labels WHERE id <> canon_id),
       |s4 AS (SELECT lk.doc_id, lk.avg_surprisal FROM lk JOIN ek USING (doc_id)),
       |s45 AS (SELECT doc_id, avg_surprisal FROM s4
       |  WHERE doc_id NOT IN (SELECT id FROM dropped)),
       |ub AS (SELECT p.source, s.doc_id, s.avg_surprisal, p.n_chars
       |  FROM s45 s JOIN pv p USING (doc_id)
       |  WHERE p.source NOT IN ($blockList)),
       |capr AS (SELECT source, doc_id, avg_surprisal, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
       |               doc_id) AS rk
       |  FROM ub),
       |capk AS (SELECT source, doc_id, avg_surprisal, n_chars FROM capr
       |  WHERE rk <= $PipelineCap)""".stripMargin
  }

  private def pipelineOracleSql: String =
    s"""$pipelineChainSql,
       |ranked AS (SELECT doc_id, source, avg_surprisal, n_chars,
       |    ROW_NUMBER() OVER (ORDER BY avg_surprisal, doc_id) AS pos
       |  FROM capk)
       |SELECT doc_id, source, avg_surprisal, pos, n_chars,
       |  CAST(SUM(n_chars) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT) AS offset_end,
       |  CAST(FLOOR((SUM(n_chars) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING) - n_chars)
       |    / ${SampleQueries.PackBudget}.0) AS BIGINT) AS bin
       |FROM ranked ORDER BY pos""".stripMargin

  /** The funnel replay: the same chain, counted after every stage. */
  private def reportOracleSql: String =
    s"""$pipelineChainSql
       |SELECT '0_input' AS stage, CAST(COUNT(*) AS BIGINT) AS survivors FROM pv
       |UNION ALL SELECT '1_gate', CAST(COUNT(*) AS BIGINT) FROM gk
       |UNION ALL SELECT '2_classifier', CAST(COUNT(*) AS BIGINT) FROM s12
       |UNION ALL SELECT '3_lm', CAST(COUNT(*) AS BIGINT) FROM lk
       |UNION ALL SELECT '4_exact_dedup', CAST(COUNT(*) AS BIGINT) FROM s4
       |UNION ALL SELECT '5_near_dedup', CAST(COUNT(*) AS BIGINT) FROM s45
       |UNION ALL SELECT '6_blocklist', CAST(COUNT(*) AS BIGINT) FROM ub
       |UNION ALL SELECT '7_domain_cap', CAST(COUNT(*) AS BIGINT) FROM capk
       |ORDER BY stage""".stripMargin

  /** The signals replay: all six chains — gate inputs, classifier
    * training (planted view) + original-text scoring, the pruned-LM
    * build + scoring, digest dedup standing, the recursive minhash
    * closure, and winnow contamination — joined into one row set. */
  private def signalsOracleSql: String = {
    val fnv2 = QualityClassifier.fnvBucketSql("t2", "i", ClfN, ClfDim)
    s"""WITH RECURSIVE
       |gs AS (SELECT doc_id,
       |    len(string_split(lower(text), ' ')) AS n_words,
       |    greatest(len(string_split(lower(text), ' ')), 1) AS n1,
       |    (length(text) - len(string_split(lower(text), ' ')) + 1) * 1000 AS wc1000,
       |    len(list_distinct(string_split(lower(text), ' '))) * 1000 AS d1000,
       |    len(list_intersect(list_distinct(string_split(lower(text), ' ')),
       |      ['a','the','and','of','to','in','is','that'])) AS stop_hits
       |  FROM documents),
       |$clfHeadSql,
       |${clfRatesSql("cw")},
       |od AS (SELECT doc_id, lower(text) AS t2 FROM documents WHERE text IS NOT NULL),
       |feat2 AS (
       |  SELECT doc_id, $fnv2 AS b FROM (
       |    SELECT doc_id, t2, unnest(range(1, len(t2) - ${ClfN - 2})) AS i FROM od)
       |  UNION ALL SELECT doc_id, $ClfDim AS b FROM od),
       |csc2 AS (SELECT f.doc_id, CAST(SUM(COALESCE(cw.w, 0)) AS BIGINT) AS clf_score
       |  FROM feat2 f LEFT JOIN cw USING (b) GROUP BY f.doc_id),
       |${TextQueries.lm5pModelChainSql},
       |${TextQueries.lm5pScoreChainSql(
          """
            |  SELECT doc_id, list_concat(['<s>', '<s>', '<s>', '<s>'],
            |    list_filter(string_split(lower(text), ' '), w -> w <> '')) AS t
            |  FROM documents""".stripMargin, "lsc")},
       |lms AS (SELECT doc_id, CAST(SUM(s) // COUNT(*) AS BIGINT) AS avg_surprisal
       |  FROM lsc GROUP BY doc_id),
       |ecnt AS (SELECT md5(text) AS dg, MIN(doc_id) AS kid,
       |    CAST(COUNT(*) AS BIGINT) AS nc
       |  FROM documents GROUP BY 1),
       |${DedupQueries.pairChainSql},
       |edges AS (SELECT id_a AS src, id_b AS dst FROM ver
       |  UNION ALL SELECT id_b, id_a FROM ver),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(a, b) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
       |labels AS (SELECT a AS id, MIN(b) AS canon_id FROM reach GROUP BY a),
       |${DedupQueries.winnowChainSql},
       |efp AS (SELECT DISTINCT fp FROM wfp WHERE id % 50 = 0),
       |cont AS (SELECT w.id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
       |    CAST(COUNT(e.fp) AS BIGINT) AS n_hits,
       |    CAST(FLOOR(COUNT(e.fp) * 1000.0 / COUNT(*)) AS BIGINT) AS contamination_pm
       |  FROM wfp w LEFT JOIN efp e ON e.fp = w.fp
       |  GROUP BY w.id)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars,
       |  gs.n_words, gs.wc1000 // gs.n1 AS mwl_pm, gs.d1000 // gs.n1 AS distinct_pm,
       |  gs.stop_hits,
       |  CAST(gs.n_words BETWEEN 30 AND 90 AND gs.wc1000 // gs.n1 BETWEEN 4000 AND 5000
       |    AND gs.stop_hits >= 2 AND gs.d1000 // gs.n1 >= 450 AS INT) AS gate_keep,
       |  csc2.clf_score,
       |  lms.avg_surprisal,
       |  ecnt.nc AS n_copies,
       |  CAST(d.doc_id = ecnt.kid AS INT) AS is_exact_canonical,
       |  COALESCE(l.canon_id, d.doc_id) AS near_canon_id,
       |  COALESCE(cont.n_fps, 0) AS n_fps,
       |  COALESCE(cont.n_hits, 0) AS n_hits,
       |  COALESCE(cont.contamination_pm, 0) AS contamination_pm
       |FROM documents d
       |JOIN gs USING (doc_id)
       |LEFT JOIN csc2 USING (doc_id)
       |LEFT JOIN lms ON lms.doc_id = d.doc_id
       |LEFT JOIN ecnt ON ecnt.dg = md5(d.text)
       |LEFT JOIN labels l ON l.id = d.doc_id
       |LEFT JOIN cont ON cont.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The manifest replay: the pipeline chain packed in curriculum
    * order, then per-shard counts, unit sums, and the order-free XOR
    * of row signatures. */
  private def manifestOracleSql: String =
    s"""$pipelineChainSql,
       |ranked AS (SELECT doc_id, source, avg_surprisal, n_chars,
       |    ROW_NUMBER() OVER (ORDER BY avg_surprisal, doc_id) AS pos
       |  FROM capk),
       |pk AS (SELECT doc_id, n_chars,
       |    CAST(FLOOR((SUM(n_chars) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING) - n_chars)
       |      / ${SampleQueries.PackBudget}.0) AS BIGINT) AS bin
       |  FROM ranked)
       |SELECT bin AS shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_units,
       |  CAST(bit_xor(${graft.operators.ShardManifest.rowSigSql("doc_id", "n_chars")}) AS BIGINT) AS digest
       |FROM pk GROUP BY bin ORDER BY shard""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_curation_pipeline" -> pipelineOracleSql,
    "q_curation_report" -> reportOracleSql,
    "q_curation_manifest" -> manifestOracleSql,
    "q_quality_signals" -> signalsOracleSql,
    // both flagship replays nested verbatim as keep-lists, chained
    // into the pair join — one drifted stage in EITHER modality's
    // pipeline breaks the pair row
    "q_crossmodal_pairs" ->
      s"""WITH tk AS (SELECT doc_id FROM (${DedupQueries.oracles("q_corpus_pipeline")})),
         |mk AS (SELECT media_id FROM (${MediaQueries.oracles("q_multimodal_pipeline")}))
         |SELECT d.doc_id, d.doc_id AS media_id,
         |  CASE WHEN d.doc_id % 3 = 0 THEN 'image'
         |       WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(t.doc_id IS NOT NULL AS INT) AS doc_kept,
         |  CAST(m.media_id IS NOT NULL AS INT) AS media_kept,
         |  CAST(t.doc_id IS NOT NULL AND m.media_id IS NOT NULL AS INT) AS keep,
         |  CASE WHEN t.doc_id IS NOT NULL AND m.media_id IS NOT NULL THEN 'ok'
         |       WHEN t.doc_id IS NULL AND m.media_id IS NULL THEN 'both_dropped'
         |       WHEN t.doc_id IS NULL THEN 'doc_dropped'
         |       ELSE 'media_dropped' END AS reason
         |FROM documents d
         |LEFT JOIN tk t ON t.doc_id = d.doc_id
         |LEFT JOIN mk m ON m.media_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q_quality_clf_train" ->
      s"""WITH $clfHeadSql,
         |${clfRatesSql()}
         |SELECT b, w FROM w ORDER BY b""".stripMargin,
    // the router replay composed with the KEYED count/division replay
    // (CTE names c-prefixed: the router chain owns docs/feat/lab/tot)
    "q_quality_clf_lang" -> {
      val fnv = QualityClassifier.fnvBucketSql("t", "i", ClfN, ClfDim)
      s"""WITH ${TextQueries.langIdPredChainCtes},
         |cdocs AS (SELECT d.doc_id,
         |    lower(CASE WHEN d.doc_id % 3 = 0 THEN d.text || '$ClfMarker' ELSE d.text END) AS t,
         |    CASE WHEN d.doc_id % 3 = 0 THEN 1 ELSE -1 END AS y,
         |    p.predicted_lang AS k
         |  FROM documents d JOIN pred p USING (doc_id)
         |  WHERE d.doc_id % 2 = 0),
         |cfeat AS (
         |  SELECT doc_id, $fnv AS b FROM (
         |    SELECT doc_id, t, unnest(range(1, len(t) - ${ClfN - 2})) AS i FROM cdocs)
         |  UNION ALL SELECT doc_id, $ClfDim AS b FROM cdocs),
         |ctf AS (SELECT f.doc_id, d.k, f.b, d.y FROM cfeat f JOIN cdocs d USING (doc_id)),
         |ccls AS (SELECT k, b,
         |    CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
         |    CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n
         |  FROM ctf GROUP BY k, b),
         |ctot AS (SELECT k, CAST(SUM(p) AS BIGINT) AS pt, CAST(SUM(n) AS BIGINT) AS nt
         |  FROM ccls GROUP BY k)
         |SELECT ccls.k AS predicted_lang, ccls.b,
         |  CAST((${QualityClassifier.RateScale} * p) // pt
         |     - (${QualityClassifier.RateScale} * n) // nt AS BIGINT) AS w
         |FROM ccls JOIN ctot USING (k)
         |ORDER BY predicted_lang, b""".stripMargin
    },
    "q_quality_clf_percep" ->
      s"""WITH $clfHeadSql,
         |$clfPercepSql
         |SELECT b, w FROM w$ClfEpochs ORDER BY b""".stripMargin,
    // incremental == full: counts are additive, so the merged
    // old-state + batch counts (and their weights) must equal direct
    // training over the whole labeled view
    "q_quality_clf_incr" ->
      s"""WITH $clfHeadSql,
         |${clfRatesSql()}
         |SELECT cls.b, cls.p AS n_pos, cls.n AS n_neg, w.w
         |FROM cls JOIN w USING (b) ORDER BY cls.b""".stripMargin,
    "q_quality_clf" ->
      s"""WITH $clfHeadSql,
         |${clfRatesSql()},
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
