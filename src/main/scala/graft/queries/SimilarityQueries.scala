package graft.queries

import graft.Tables
import graft.operators.{AnnJoin, CacheScope, Dedup, Pq, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings.parquet` (64-dim float vectors).
  * The oracle rebuilds the identical quantized-integer arithmetic via an
  * unnest/range formulation, so cosine values hash-match exactly.
  */
object SimilarityQueries extends QueryModule {

  private val K = 5

  private def prepped(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.prep(Tables.embeddings(spark, sfDir), col("vec_id"), col("embedding"))

  /** Brute-force cosine top-5 for the first 10 vectors as queries. */
  def simTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val all = prepped(spark, sfDir)
    Similarity.bruteTopK(all, all.filter(col("id") < 10), K)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rk")
  }

  /** Bucketed ANN: all same-signature pairs with their cosine. The
    * plane count is corpus-aware (9 bits at 500 rows, 11 at 2000 —
    * the oracle recomputes the identical integer-shift rule), so
    * bucket occupancy stays O(1) as the corpus grows. */
  def simLsh(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.lshPairsAdaptive(prepped(spark, sfDir), dim = EmbDim)
      .select(col("vec_a"), col("vec_b"), Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("vec_a", "vec_b")

  /** Embedding-cosine near-dup (the dedup family's vector member):
    * BANDED LSH candidates (4 bands × log₂(n)-bit width — agree on any
    * one band to become a candidate; each extra band buys recall)
    * thresholded on exact quantized cosine. The filter runs on the raw
    * cosine (bit-identical across engines); only the output is
    * rounded. */
  def dedupEmbed(spark: SparkSession, sfDir: String,
                 scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val p = scope.pin(prepped(spark, sfDir)) // backs signature + both scoring sides
    Similarity.lshBandedPairs(p, dim = EmbDim, scope = scope)
      .filter(col("cos") >= NearDupThreshold)
      .select(col("vec_a"), col("vec_b"), Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** SemDeDup within-cell cosine bar: above [[NearDupThreshold]]
    * because cell members already share a centroid (within-cell cosines
    * skew high — 7.4k within-cell pairs at sf0.01, 59 at ≥0.35, 1 at
    * ≥0.5); 0.35 keeps a multi-cluster surface with transitive merges
    * AND kept singletons, so every branch of the keep logic is
    * oracle-exercised. */
  private val SemThreshold = 0.35

  /** SemDeDup (Abbas et al. 2023) composed end-to-end:
    * [[Similarity.semanticPairs]] (map-side stride-centroid cells →
    * within-cell blocked pairs at exact quantized cosine ≥
    * [[SemThreshold]]) → [[Dedup.clusters]] connected components →
    * keep-list (drop every cluster member except the min-id
    * representative). The label-propagation graph and the drop/rep id
    * sets are cluster-sized → broadcast joins; the corpus itself never
    * all-pairs and never shuffles on the keep step (the q_dedup_keep
    * discipline over the EMBEDDING near-dup metric). */
  def dedupSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Similarity.semanticPairs(prepped(spark, sfDir), IvfStride, SemThreshold)
    val labels = Dedup.clusters(
      pairs.select(col("vec_a").as("id_a"), col("vec_b").as("id_b")))
    val drop = labels.filter(col("id") =!= col("canon_id"))
      .select(col("id").as("__drop_id"))
    val reps = labels.filter(col("id") === col("canon_id"))
      .select(col("id").as("__rep_id"))
    Tables.embeddings(spark, sfDir)
      .join(broadcast(drop), col("vec_id") === col("__drop_id"), "left_anti")
      .join(broadcast(reps), col("vec_id") === col("__rep_id"), "left")
      .select(col("vec_id"), col("label"),
        col("__rep_id").isNotNull.cast("int").as("is_cluster_rep"))
      .orderBy("vec_id")
  }

  /** The incremental-semantic state pair, persisted per JVM (the
    * on-disk artifacts a sustained pipeline keeps): the OLD split's
    * stride-centroid model and its cell-assignment table, both under
    * the 80% vec_id-mod split. */
  private def semStateStore(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val cents = FrameFixture(spark, "sem_centroids", sfDir)(
      Similarity.strideCentroids(
        prepped(spark, sfDir).filter(pmod(col("id"), lit(10)) < 8), IvfStride))
    lazy val model = cents.select("cent_id", "cq").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    val cells = FrameFixture(spark, "sem_cells", sfDir)(
      prepped(spark, sfDir).filter(pmod(col("id"), lit(10)) < 8)
        .withColumn("cell", Similarity.cellAssignExpr(model, col("q"), col("norm"))))
    (cents, cells)
  }

  /** INCREMENTAL SemDeDup ([[Similarity.incrementalSemanticPairs]]):
    * within-cell pairs TOUCHING the new 20% batch only — new×new
    * blocked self-pairing plus new×persisted-cells probe under the
    * FROZEN old-split centroid model; old×old never re-pairs (the
    * q_dedup_incremental discipline on the cell metric). The oracle
    * replays the same frozen quantizer over ALL vectors and keeps
    * batch-touching pairs. */
  def dedupSemanticIncr(spark: SparkSession, sfDir: String): DataFrame = {
    val (cents, cells) = semStateStore(spark, sfDir)
    val model = cents.select("cent_id", "cq").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    val fresh = prepped(spark, sfDir).filter(pmod(col("id"), lit(10)) >= 8)
    Similarity.incrementalSemanticPairs(fresh, cells, model, SemThreshold)
      .select(col("vec_a"), col("vec_b"), Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** Semantic eval-decontamination bar: 61 of 450 corpus vectors sit at
    * max-eval-cosine ≥ 0.35 at sf0.01 (max observed 0.49) — a real
    * drop surface with real survivors. */
  private val SemDecontThreshold = 0.35

  /** SEMANTIC (embedding-level) eval decontamination — the third
    * decontamination metric next to exact-fingerprint
    * (q_decontaminate) and verbatim-span (q_decontaminate_spans):
    * drop every corpus vector whose EXACT max cosine against the eval
    * set reaches [[SemDecontThreshold]]. The eval set is
    * benchmark-sized, so it rides [[Similarity.maxCosExpr]] as a
    * broadcast model — one map-side corpus pass, zero joins, the
    * corpus never shuffles (the q_decontaminate broadcast discipline
    * on the embedding metric). Survivors report their max eval
    * proximity for observability. */
  def decontaminateEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark)
    val p = prepped(spark, sfDir)
    val refs = p.filter(pmod(col("id"), lit(10)) === 0)
      .select("id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq
    p.filter(pmod(col("id"), lit(10)) =!= 0)
      .withColumn("__m", Similarity.maxCosExpr(refs, col("q"), col("norm")))
      .filter(col("__m") < SemDecontThreshold)
      .select(col("id").as("vec_id"), Rnd.r(col("__m"), 6).as("eval_cos"))
      .orderBy("vec_id")
  }

  private val EmbDim = 64

  private val NearDupThreshold = 0.25
  private val IvfStride = 31

  /** IVF (inverted-file) ANN: every 31st vector is a centroid, vectors
    * assign to their max-cosine centroid, queries probe only their own
    * cell. Approximate by design; the oracle replays the identical
    * quantizer, so the result is exact under the hash compare. */
  def simIvf(spark: SparkSession, sfDir: String,
             scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // prepped feeds BOTH the centroid extraction and the assignment side
    // of ivfCells — pin it so the scan + quantization run once
    val cells = scope.pin(
      Similarity.ivfCellsMapSide(scope.pin(prepped(spark, sfDir)), IvfStride))
    Similarity.ivfTopK(cells, id => id < 10, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rk")
  }

  private val NProbe = 2

  /** IVF with nprobe=2: each query searches its two nearest cells — the
    * recall knob over [[simIvf]], with the query→cells step on the
    * native bounded top_k_by aggregate. */
  def simIvfProbe(spark: SparkSession, sfDir: String,
                  scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val p = scope.pin(prepped(spark, sfDir))
    val cells = scope.pin(Similarity.ivfCellsMapSide(p, IvfStride))
    Similarity.ivfTopKProbe(cells, Similarity.strideCentroids(p, IvfStride),
      id => id < 10, k = 3, nprobe = NProbe)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rk")
  }

  private val PqM = 4
  private val PqKsub = 8
  private val PqStride = 31

  /** Product-quantization ANN: stride-sampled codebooks (8 codewords ×
    * 4 subspaces of 16 dims), corpus encoded map-side by the native
    * `pq_encode`, queries scored by `pq_adc` table lookups — all
    * exact-integer squared-L2, so codes and distances hash-match the
    * oracle. The compression story: 64 longs → 4 ints per vector. */
  def simPq(spark: SparkSession, sfDir: String,
            scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // prepped feeds the codebook collect AND the encode — pin it
    val p = scope.pin(prepped(spark, sfDir))
    val cb = Pq.strideCodebook(p, PqStride, PqKsub, PqM)
    val codes = p.select(col("id"), Pq.encode(col("q"), cb, PqM).as("codes"))
    val qs = p.filter(col("id") < 10)
      .select(col("id").as("query_id"), Pq.adcTable(col("q"), cb, PqM, PqKsub).as("tbl"))
    Pq.topKAdc(codes, qs, k = K)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("adist"))
      .orderBy("query_id", "rk")
  }

  /** IVF-PQ — the billion-vector composition: IVF prunes WHERE to
    * search (each query scores only its own cell), PQ shrinks WHAT is
    * scored (codes, not vectors). Non-residual variant: codes quantize
    * the raw vectors, not (vec − centroid) residuals — the residual
    * upgrade reuses this exact plumbing since stride centroids are
    * integer vectors (residuals stay exact longs), at the price of
    * per-(query, cell) tables. Same k and cells as q_sim_ivf, so the
    * two results diff the PQ approximation directly. */
  def simIvfPq(spark: SparkSession, sfDir: String,
               scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val p = scope.pin(prepped(spark, sfDir))
    val cb = Pq.strideCodebook(p, PqStride, PqKsub, PqM)
    // cells feed both the encode side and the query side — pin
    val cells = scope.pin(Similarity.ivfCellsMapSide(p, IvfStride))
    val coded = cells.select(col("id"), col("cell"),
      Pq.encode(col("q"), cb, PqM).as("codes"))
    val qs = cells.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("cell"),
        Pq.adcTable(col("q"), cb, PqM, PqKsub).as("tbl"))
    Pq.topKAdc(coded, qs, k = 3, using = Seq("cell"))
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("adist"))
      .orderBy("query_id", "rk")
  }

  /** Residual IVF-PQ (IVFADC): same cells and k as q_sim_ivfpq, but the
    * codes quantize vec − centroid and the codebook is stride-sampled
    * from the RESIDUAL frame. Stride centroids are integer vectors, so
    * residuals stay exact longs and the whole composition sits on the
    * hash-compared oracle path; diffing against q_sim_ivfpq measures
    * what residual coding buys at identical compression. */
  def simIvfPqRes(spark: SparkSession, sfDir: String,
                  scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val p = scope.pin(prepped(spark, sfDir))
    // cells/residuals each feed the codebook collect AND the scoring
    // sides; CacheManager dedups the structurally-equal residual plan
    // built inside topKAdcResidual against this pinned one
    val cells = scope.pin(Similarity.ivfCellsMapSide(p, IvfStride))
    val cents = Similarity.strideCentroids(p, IvfStride)
    val res = scope.pin(Pq.residuals(cells, cents))
    val cb = Pq.strideCodebook(res, PqStride, PqKsub, PqM)
    Pq.topKAdcResidual(cells, cents, cb, _ < 10, k = 3, m = PqM, ksub = PqKsub)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("adist"))
      .orderBy("query_id", "rk")
  }

  /** ANN quality harness: per-query recall@3 of the IVF index against
    * the brute-force ground truth — the measurement an index rollout
    * gates on. Both legs are the exact quantized-integer arithmetic of
    * q_sim_topk / q_sim_ivf, so the intersection (and the recall) is
    * deterministic and fully oracled, not a flaky float compare.
    * Scale: ground truth cost is bounded by the QUERY SAMPLE (10 ids
    * broadcast against the corpus, one pass); the approx leg reuses the
    * IVF plan unchanged; the final joins touch ≤ k·|sample| rows. */
  def simRecall(spark: SparkSession, sfDir: String,
                scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // one pinned scan feeds ground truth (both sides) and the IVF leg
    val p = scope.pin(prepped(spark, sfDir))
    val truth = Similarity.bruteTopK(p, p.filter(col("id") < 10), 3)
      .select(col("query_id"), col("neighbor_id"))
    // pin the cell assignments too — ivfTopK reads them on both the
    // query and the candidate side (the simIvf idiom)
    val approx = Similarity.ivfTopK(
        scope.pin(Similarity.ivfCellsMapSide(p, IvfStride)),
        id => id < 10, k = 3)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    // base the output on the truth's query set: a query whose IVF cell
    // is otherwise empty still reports recall 0, not a missing row
    truth.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        Rnd.r(coalesce(col("hits"), lit(0L)).cast("double") / lit(3.0), 6).as("recall_at_3"))
      .orderBy("query_id")
  }

  /** ANN JOIN of two corpus-scale collections ([[AnnJoin.annJoin]]):
    * even-id vectors (the "new corpus") each find their top-3 cosine
    * neighbors among odd-id vectors (the "reference corpus"), both
    * sides cell-assigned map-side against the shared stride-quantizer
    * model and joined CO-LOCATED on cell — nothing broadcasts but the
    * bounded centroid model; ranking is the mergeable bounded
    * `top_k_by`. The oracle replays the identical quantizer and cell
    * rule, so the approximate result is exact under the hash compare.
    * (The adaptive grid-block path is exercised by AnnJoinSpec with a
    * forced tiny pair budget — same output, bounded tasks.) */
  def simJoinAnn(spark: SparkSession, sfDir: String,
                 scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val cells = scope.pin(
      Similarity.ivfCellsMapSide(scope.pin(prepped(spark, sfDir)), IvfStride))
    AnnJoin.annJoin(cells.filter(col("id") % 2 === 0),
        cells.filter(col("id") % 2 === 1), k = 3)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rk")
  }

  /** [[AnnJoin.annJoinProbe]] at nprobe=2 — the recall knob on the
    * corpus×corpus join: every even-id vector probes its TWO nearest
    * cells of the odd-id collection (fan-out multiplies only the left
    * side). Same tie rule as cell assignment, so the oracle's
    * rn <= 2 ranking replays the probe set exactly. */
  def simJoinAnnProbe(spark: SparkSession, sfDir: String,
                      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val p = scope.pin(prepped(spark, sfDir))
    val cells = scope.pin(Similarity.ivfCellsMapSide(p, IvfStride))
    AnnJoin.annJoinProbe(cells.filter(col("id") % 2 === 0),
        cells.filter(col("id") % 2 === 1),
        Similarity.strideCentroids(p, IvfStride), k = 3, nprobe = NProbe)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rk")
  }

  /** Recall gate for the CORPUS×CORPUS join (the q_sim_recall pattern
    * extended to [[AnnJoin.annJoin]]): a bounded query sample (even ids
    * < 20) runs through the grid-blocked cell join against the full odd
    * reference side, and its top-3 is intersected with the brute-force
    * ground truth over the same split. Deterministic quantized-integer
    * ranking on both legs, so recall is DuckDB-oracle-able, not a
    * flaky float compare. Scale: ground truth is bounded by the sample
    * (10 queries broadcast against one corpus pass); the join leg is
    * the production plan with the left side filtered. */
  private def joinRecallHarness(spark: SparkSession, sfDir: String,
      scope: CacheScope = CacheScope.unmanaged)(
      approxOf: (DataFrame, DataFrame, DataFrame) => DataFrame): DataFrame = {
    val p = scope.pin(prepped(spark, sfDir))
    val cells = scope.pin(Similarity.ivfCellsMapSide(p, IvfStride))
    val isQuery = col("id") % 2 === 0 && col("id") < 20
    val truth = Similarity.bruteTopK(
        p.filter(col("id") % 2 === 1), p.filter(isQuery), 3)
      .select(col("query_id"), col("neighbor_id"))
    val approx = approxOf(cells.filter(isQuery),
        cells.filter(col("id") % 2 === 1), p)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    truth.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        Rnd.r(coalesce(col("hits"), lit(0L)).cast("double") / lit(3.0), 6)
          .as("recall_at_3"))
      .orderBy("query_id")
  }

  def simJoinRecall(spark: SparkSession, sfDir: String): DataFrame =
    joinRecallHarness(spark, sfDir)((l, r, _) => AnnJoin.annJoin(l, r, k = 3))

  /** The same recall gate at nprobe=2 ([[AnnJoin.annJoinProbe]]) — the
    * measured answer to "what does the second probe buy on the
    * corpus×corpus join": diff this result against q_sim_join_recall. */
  def simJoinRecallProbe(spark: SparkSession, sfDir: String): DataFrame =
    joinRecallHarness(spark, sfDir)((l, r, p) =>
      AnnJoin.annJoinProbe(l, r,
        Similarity.strideCentroids(p, IvfStride), k = 3, nprobe = NProbe))

  /** Selection budget for the k-center query — small by the algorithm's
    * nature (a coreset is a constant-size summary), and each extra step
    * unrolls one more oracle stage. */
  private val KCenterK = 8

  /** GREEDY k-CENTER diversity selection (q_select_kcenter,
    * [[Similarity.selectKCenter]]): the coreset data-selection step —
    * pick [[KCenterK]] embeddings by farthest-point traversal on the
    * exact quantized-integer squared-L2 grid, seeded at the min id,
    * ties to the lower id. `dist_sq` is each pick's distance to the
    * prior set (the covering-radius ladder — necessarily
    * non-increasing). The oracle replays the greedy loop as
    * [[KCenterK]] − 1 UNROLLED SQL stages (the clfPercepSql epoch
    * discipline): each stage's argmax and min-distance fold are exact
    * integers, so one drifted pick anywhere mismatches. */
  def selectKcenter(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Similarity.selectKCenter(
        Tables.embeddings(spark, sfDir), col("vec_id"), col("embedding"), KCenterK)
      .select(col("step"), col("id").as("vec_id"), col("dist_sq"))
      .orderBy("step")

  /** LABEL-AGREEMENT audit (q_label_agreement — the confident-learning
    * / cleanlab mislabel screen): for a deterministic md5-gated ~6%
    * audit sample, find each vector's exact 1-NN by cosine over the
    * whole corpus and report whether the neighbor shares its label —
    * the `label` column's curation use (a vector whose nearest
    * neighbor disagrees is the mislabel candidate a labeling pass
    * re-queues). The exact brute pass is the AUDIT shape: query side
    * sampled and broadcast, corpus side streamed once (the q_sim_topk
    * contract); production screens the full corpus with the ANN
    * index and audits the sample exactly — this query IS the audit.
    * Float cosines divide identical integer dots by identical norms,
    * so the 1-NN argmax is engine-exact (the q_sim_topk precedent). */
  def labelAgreement(spark: SparkSession, sfDir: String,
                     scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val p = scope.pin(prepped(spark, sfDir)) // corpus side + query filter
    val audit = p.filter(
      substring(md5(col("id").cast("string").cast("binary")), 1, 1) === "0")
    val lbl = emb.select(col("vec_id"), col("label"))
    Similarity.bruteTopK(p, audit, 1)
      .join(lbl.select(col("vec_id").as("query_id"), col("label")), Seq("query_id"))
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("nn_label")),
        Seq("neighbor_id"))
      .select(col("query_id").as("vec_id"), col("label"),
        col("neighbor_id").as("nn_id"), col("nn_label"),
        (col("label") === col("nn_label")).cast("int").as("agree"),
        Rnd.r(col("cos"), 6).as("cos"))
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_select_kcenter" -> selectKcenter,
    "q_label_agreement" -> ((s, d) => labelAgreement(s, d)),
    "q_sim_join" -> ((s, d) => simJoinAnn(s, d)),
    "q_sim_join_recall" -> simJoinRecall,
    "q_sim_join_recall_probe" -> simJoinRecallProbe,
    "q_sim_join_probe" -> ((s, d) => simJoinAnnProbe(s, d)),
    "q_sim_topk" -> simTopK,
    "q_sim_recall" -> ((s, d) => simRecall(s, d)),
    "q_sim_lsh" -> simLsh,
    "q_sim_ivf_probe" -> ((s, d) => simIvfProbe(s, d)),
    "q_dedup_embed" -> ((s, d) => dedupEmbed(s, d)),
    "q_dedup_semantic" -> dedupSemantic,
    "q_dedup_semantic_incr" -> dedupSemanticIncr,
    "q_decontaminate_embed" -> decontaminateEmbed,
    "q_sim_ivf" -> ((s, d) => simIvf(s, d)),
    "q_sim_pq" -> ((s, d) => simPq(s, d)),
    "q_sim_ivfpq" -> ((s, d) => simIvfPq(s, d)),
    "q_sim_ivfpq_res" -> ((s, d) => simIvfPqRes(s, d)))

  override def warmFixtures(spark: SparkSession, sfDir: String): Unit = {
    semStateStore(spark, sfDir)
    ()
  }

  // dimension bound derives from each vector's length (ADVICE r2: no
  // silent truncation cap)
  private val qvSql =
    """SELECT vec_id, u['i'] AS i,
      |  CAST(FLOOR(CAST(u['e'] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
      |FROM (SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1),
      |        i -> {'i': i, 'e': embedding[i]})) AS u
      |      FROM embeddings)""".stripMargin

  private val nrmSql = "SELECT vec_id, SUM(q*q) AS nn FROM qv GROUP BY vec_id"

  /** The centroid-assignment replay every IVF-family oracle shares:
    * integer dots against the stride centroids (cd) and their cosines
    * (ccos). ONE definition, interpolated into all seven oracles, so a
    * quantizer or tie-rule change cannot silently desynchronize one
    * oracle from the Spark side. */
  private val cdCcosSql: String = cdCcosSqlWhere("")

  /** [[cdCcosSql]] with an extra centroid-side predicate — the
    * incremental member's FROZEN old-split model is the same chain
    * restricted to old-split centroids, interpolated from one builder
    * so the two can never desynchronize. */
  private def cdCcosSqlWhere(centPred: String): String =
    s"""cd AS (SELECT a.vec_id, b.vec_id AS cent_id, SUM(a.q * b.q) AS dp
       |  FROM qv a JOIN qv b ON a.i = b.i AND b.vec_id % $IvfStride = 0$centPred
       |  GROUP BY a.vec_id, b.vec_id),
       |ccos AS (SELECT cd.vec_id, cd.cent_id,
       |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
       |  FROM cd JOIN nrm na ON na.vec_id = cd.vec_id JOIN nrm nb ON nb.vec_id = cd.cent_id),""".stripMargin

  /** ONE builder for both corpus×corpus recall oracles: the brute-force
    * truth chain (tr) and the hits/recall harness are shared verbatim —
    * only the candidate CTE chain (plain cell join vs nprobe fan-out)
    * is injected, so the pair can never desynchronize (the
    * spansChainSql discipline). */
  private def joinRecallOracleSql(candChainSql: String): String =
    s"""WITH qv AS ($qvSql),
       |nrm AS ($nrmSql),
       |dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.q*b.q) AS dp
       |  FROM qv a JOIN qv b ON a.i = b.i
       |    AND a.vec_id % 2 = 0 AND a.vec_id < 20 AND b.vec_id % 2 = 1
       |  GROUP BY 1, 2),
       |bcos AS (SELECT query_id, neighbor_id,
       |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
       |  FROM dots JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
       |tr AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
       |    FROM bcos) WHERE rk <= 3),
       |$cdCcosSql
       |$candChainSql,
       |nd AS (SELECT cand.query_id, cand.neighbor_id, SUM(qa.q * qb.q) AS dp
       |  FROM cand
       |  JOIN qv qa ON qa.vec_id = cand.query_id
       |  JOIN qv qb ON qb.vec_id = cand.neighbor_id AND qb.i = qa.i
       |  GROUP BY 1, 2),
       |ncos AS (SELECT query_id, neighbor_id,
       |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
       |  FROM nd JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
       |ar AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
       |    FROM ncos) WHERE rk <= 3),
       |h AS (SELECT a.query_id, COUNT(t.neighbor_id) AS hits
       |  FROM ar a LEFT JOIN tr t
       |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
       |  GROUP BY 1)
       |SELECT q.query_id,
       |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       |  ${Rnd.sql("CAST(COALESCE(h.hits, 0) AS DOUBLE) / 3.0", 6)} AS recall_at_3
       |FROM (SELECT DISTINCT query_id FROM tr) q LEFT JOIN h ON h.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin

  /** The k-center replay: the greedy loop unrolled — stage i holds the
    * running min-distance frame `d<i>` and the pick `s<i+1>` (argmax by
    * (d DESC, vec_id)); every distance is the exact integer Σ(aⱼ−bⱼ)².
    * Every stage CTE is MATERIALIZED: each `d<i>` is referenced twice
    * (its pick AND the next fold), so DuckDB's default inlining grows
    * the evaluation tree 2× per stage — measured 8 s at sf0.01 and an
    * OOM at sf0.1 for the plain spelling vs 0.2 s / 0.8 s materialized
    * (the stages are tiny tables; the blow-up was pure re-evaluation). */
  private def kcenterOracleSql: String = {
    def dist(a: String, b: String): String =
      s"""CAST(list_sum(list_transform(range(1, len($a.q) + 1),
         |      j -> ($a.q[j] - $b.q[j]) * ($a.q[j] - $b.q[j]))) AS BIGINT)""".stripMargin
    val stages = (2 to KCenterK).map { i =>
      val prev = s"d${i - 1}"
      val pick = s"""s$i AS MATERIALIZED (SELECT vec_id, q, d FROM $prev
                    |  ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin
      val next =
        if (i == KCenterK) ""
        else s""",
                |d$i AS MATERIALIZED (SELECT $prev.vec_id, $prev.q,
                |    LEAST($prev.d, ${dist(prev, s"s$i")}) AS d
                |  FROM $prev, s$i WHERE $prev.vec_id <> s$i.vec_id)""".stripMargin
      pick + next
    }.mkString(",\n")
    val tail = (2 to KCenterK)
      .map(i => s"UNION ALL SELECT $i, vec_id, d FROM s$i").mkString("\n")
    s"""WITH qv AS ($qvSql),
       |vv AS MATERIALIZED (SELECT vec_id, list(q ORDER BY i) AS q FROM qv GROUP BY vec_id),
       |sv1 AS (SELECT vec_id, q FROM vv WHERE vec_id = (SELECT MIN(vec_id) FROM vv)),
       |d1 AS MATERIALIZED (SELECT vv.vec_id, vv.q, ${dist("vv", "sv1")} AS d
       |  FROM vv, sv1 WHERE vv.vec_id <> sv1.vec_id),
       |$stages
       |SELECT CAST(1 AS INT) AS step, (SELECT MIN(vec_id) FROM vv) AS vec_id,
       |  CAST(0 AS BIGINT) AS dist_sq
       |$tail
       |ORDER BY step""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_select_kcenter" -> kcenterOracleSql,
    // exact 1-NN over the audit sample + both label joins — the
    // q_sim_topk arithmetic restricted to rk = 1
    "q_label_agreement" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |qs AS (SELECT vec_id FROM embeddings
         |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'),
         |dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.q*b.q) AS dp
         |  FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id <> b.vec_id
         |  JOIN qs ON qs.vec_id = a.vec_id
         |  GROUP BY 1, 2),
         |cosv AS (SELECT query_id, neighbor_id,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM dots JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
         |  FROM cosv)
         |SELECT r.query_id AS vec_id, la.label, r.neighbor_id AS nn_id,
         |  lb.label AS nn_label,
         |  CAST(la.label = lb.label AS INT) AS agree,
         |  ${Rnd.sql("r.c", 6)} AS cos
         |FROM r
         |JOIN embeddings la ON la.vec_id = r.query_id
         |JOIN embeddings lb ON lb.vec_id = r.neighbor_id
         |WHERE r.rk = 1 ORDER BY vec_id""".stripMargin,
    // q_sim_join_probe: the q_sim_ivf_probe replay with the collection
    // split — left side probes its nprobe nearest cells (rn <= NProbe,
    // the same (c DESC, cent_id) tie rule as assignment), right side
    // stays in its own cell; no self-pair clause needed (sides disjoint)
    "q_sim_join_probe" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |$cdCcosSql
         |ranked AS (SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos),
         |cells AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE rn = 1),
         |qcells AS (SELECT vec_id AS query_id, cent_id AS cell
         |  FROM ranked WHERE rn <= $NProbe AND vec_id % 2 = 0),
         |cand AS (SELECT q.query_id, c.vec_id AS neighbor_id
         |  FROM qcells q JOIN cells c ON c.cell = q.cell
         |  WHERE c.vec_id % 2 = 1),
         |nd AS (SELECT cand.query_id, cand.neighbor_id, SUM(qa.q * qb.q) AS dp
         |  FROM cand
         |  JOIN qv qa ON qa.vec_id = cand.query_id
         |  JOIN qv qb ON qb.vec_id = cand.neighbor_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |ncos AS (SELECT query_id, neighbor_id,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM nd JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
         |  FROM ncos)
         |SELECT query_id, neighbor_id, rk, ${Rnd.sql("c", 6)} AS cos
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    // same quantizer/cell replay as q_sim_ivf, with the collection
    // split (even = queries, odd = references) instead of a query gate
    "q_sim_join" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |$cdCcosSql
         |cells AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos) WHERE rn = 1),
         |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM cells q JOIN cells c ON c.cell = q.cell
         |  WHERE q.vec_id % 2 = 0 AND c.vec_id % 2 = 1),
         |nd AS (SELECT cand.query_id, cand.neighbor_id, SUM(qa.q * qb.q) AS dp
         |  FROM cand
         |  JOIN qv qa ON qa.vec_id = cand.query_id
         |  JOIN qv qb ON qb.vec_id = cand.neighbor_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |ncos AS (SELECT query_id, neighbor_id,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM nd JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
         |  FROM ncos)
         |SELECT query_id, neighbor_id, rk, ${Rnd.sql("c", 6)} AS cos
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    "q_sim_topk" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.q*b.q) AS dp
         |  FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
         |  GROUP BY 1, 2),
         |cosv AS (SELECT query_id, neighbor_id,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM dots JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
         |  FROM cosv)
         |SELECT query_id, neighbor_id, rk, ${Rnd.sql("c", 6)} AS cos
         |FROM r WHERE rk <= $K ORDER BY query_id, rk""".stripMargin,
    // plane weight = md5 nibble rule, plane count = exact integer-shift
    // ceil-log2 of the corpus count — both mirror Similarity.planeWeight
    // and Similarity.adaptiveBits bit-for-bit (md5 is md5; no float log)
    "q_sim_lsh" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |pl AS (SELECT GREATEST(8, MIN(p)) AS np FROM range(1, 63) r(p)
         |  WHERE (CAST(1 AS BIGINT) << p) >= (SELECT COUNT(*) FROM embeddings)),
         |bits AS (SELECT vec_id, p,
         |    SUM(CASE WHEN substring(md5('plane:' || p::VARCHAR || ':' || (i-1)::VARCHAR), 1, 1)
         |             BETWEEN '0' AND '7' THEN q ELSE -q END) AS s
         |  FROM qv, range(0, 64) pp(p)
         |  WHERE p < (SELECT np FROM pl)
         |  GROUP BY vec_id, p),
         |sig AS (SELECT vec_id,
         |    STRING_AGG(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
         |  FROM bits GROUP BY vec_id),
         |pairs AS (SELECT a.vec_id AS x, b.vec_id AS y
         |  FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id),
         |pd AS (SELECT p.x, p.y, SUM(qa.q * qb.q) AS dp
         |  FROM pairs p
         |  JOIN qv qa ON qa.vec_id = p.x
         |  JOIN qv qb ON qb.vec_id = p.y AND qb.i = qa.i
         |  GROUP BY p.x, p.y)
         |SELECT x AS vec_a, y AS vec_b,
         |  ${Rnd.sql("CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))", 6)} AS cos
         |FROM pd JOIN nrm na ON na.vec_id = x JOIN nrm nb ON nb.vec_id = y
         |ORDER BY vec_a, vec_b""".stripMargin,
    // banded: 4 bands of ceil-log2(n) planes each; candidates agree on
    // every bit of at least one band (DISTINCT before scoring)
    "q_dedup_embed" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |pl AS (SELECT GREATEST(4, MIN(p)) AS w FROM range(1, 63) r(p)
         |  WHERE (CAST(1 AS BIGINT) << p) >= (SELECT COUNT(*) FROM embeddings)),
         |bits AS (SELECT vec_id, p,
         |    SUM(CASE WHEN substring(md5('plane:' || p::VARCHAR || ':' || (i-1)::VARCHAR), 1, 1)
         |             BETWEEN '0' AND '7' THEN q ELSE -q END) AS s
         |  FROM qv, range(0, 256) pp(p)
         |  WHERE p < 4 * (SELECT w FROM pl)
         |  GROUP BY vec_id, p),
         |bsig AS (SELECT vec_id, p // (SELECT w FROM pl) AS band,
         |    STRING_AGG(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
         |  FROM bits GROUP BY 1, 2),
         |pairs AS (SELECT DISTINCT a.vec_id AS x, b.vec_id AS y
         |  FROM bsig a JOIN bsig b
         |  ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
         |pd AS (SELECT p.x, p.y, SUM(qa.q * qb.q) AS dp
         |  FROM pairs p
         |  JOIN qv qa ON qa.vec_id = p.x
         |  JOIN qv qb ON qb.vec_id = p.y AND qb.i = qa.i
         |  GROUP BY p.x, p.y),
         |cosv AS (SELECT x, y,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM pd JOIN nrm na ON na.vec_id = x JOIN nrm nb ON nb.vec_id = y)
         |SELECT x AS vec_a, y AS vec_b, ${Rnd.sql("c", 6)} AS cos
         |FROM cosv WHERE c >= 0.25
         |ORDER BY vec_a, vec_b""".stripMargin,
    // SemDeDup replay: stride-centroid cell argmax (the shared cd/ccos
    // chain), within-cell pairs at cosine >= threshold, RECURSIVE
    // transitive closure to min-id labels, keep-list (the
    // q_dedup_keep oracle shape over the embedding metric)
    "q_dedup_semantic" ->
      s"""WITH RECURSIVE qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |$cdCcosSql
         |cells AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos) WHERE rn = 1),
         |pd AS (SELECT a.vec_id AS x, b.vec_id AS y, SUM(qa.q * qb.q) AS dp
         |  FROM cells a JOIN cells b ON b.cell = a.cell AND a.vec_id < b.vec_id
         |  JOIN qv qa ON qa.vec_id = a.vec_id
         |  JOIN qv qb ON qb.vec_id = b.vec_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |pv AS (SELECT x, y FROM pd
         |  JOIN nrm na ON na.vec_id = x JOIN nrm nb ON nb.vec_id = y
         |  WHERE CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= $SemThreshold),
         |edges AS (SELECT x AS src, y AS dst FROM pv UNION ALL SELECT y, x FROM pv),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(a, b) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         |labels AS (SELECT a AS id, MIN(b) AS canon_id FROM reach GROUP BY a),
         |dropped AS (SELECT id FROM labels WHERE id <> canon_id),
         |reps AS (SELECT id FROM labels WHERE id = canon_id)
         |SELECT e.vec_id, e.label,
         |  CAST(CASE WHEN r.id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS is_cluster_rep
         |FROM embeddings e
         |LEFT JOIN reps r ON r.id = e.vec_id
         |WHERE e.vec_id NOT IN (SELECT id FROM dropped)
         |ORDER BY e.vec_id""".stripMargin,
    // semantic decontamination replay: brute-force max cosine of every
    // non-eval vector against the eval split, survivors below the bar
    "q_decontaminate_embed" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |pd AS (SELECT a.vec_id AS c, b.vec_id AS e, SUM(a.q * b.q) AS dp
         |  FROM qv a JOIN qv b ON a.i = b.i
         |    AND a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
         |  GROUP BY 1, 2),
         |mx AS (SELECT c AS vec_id,
         |    MAX(CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))) AS m
         |  FROM pd JOIN nrm na ON na.vec_id = c JOIN nrm nb ON nb.vec_id = e
         |  GROUP BY c)
         |SELECT vec_id, ${Rnd.sql("m", 6)} AS eval_cos
         |FROM mx WHERE m < $SemDecontThreshold
         |ORDER BY vec_id""".stripMargin,
    // incremental SemDeDup replay: the SAME quantizer chain under the
    // frozen old-split centroid model (all vectors assign against it),
    // within-cell pairs restricted to those touching the 20% batch
    "q_dedup_semantic_incr" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |${cdCcosSqlWhere(" AND b.vec_id % 10 < 8")}
         |cells AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos) WHERE rn = 1),
         |pd AS (SELECT a.vec_id AS x, b.vec_id AS y, SUM(qa.q * qb.q) AS dp
         |  FROM cells a JOIN cells b ON b.cell = a.cell AND a.vec_id < b.vec_id
         |  JOIN qv qa ON qa.vec_id = a.vec_id
         |  JOIN qv qb ON qb.vec_id = b.vec_id AND qb.i = qa.i
         |  WHERE a.vec_id % 10 >= 8 OR b.vec_id % 10 >= 8
         |  GROUP BY 1, 2),
         |cv AS (SELECT x, y,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM pd JOIN nrm na ON na.vec_id = x JOIN nrm nb ON nb.vec_id = y)
         |SELECT x AS vec_a, y AS vec_b, ${Rnd.sql("c", 6)} AS cos
         |FROM cv WHERE c >= $SemThreshold
         |ORDER BY vec_a, vec_b""".stripMargin,
    // recall@3 = |brute top-3 ∩ IVF top-3| / 3 per query: the `tr` chain
    // is q_sim_topk's at k=3, the `ar` chain is q_sim_ivf's, and both
    // rank with the same (cos DESC, neighbor_id) tie rule, so the
    // intersection is exact
    "q_sim_recall" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.q*b.q) AS dp
         |  FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
         |  GROUP BY 1, 2),
         |bcos AS (SELECT query_id, neighbor_id,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM dots JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
         |tr AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
         |    FROM bcos) WHERE rk <= 3),
         |$cdCcosSql
         |cells AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos) WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, cell FROM cells WHERE vec_id < 10),
         |cand AS (SELECT q.query_id, c.vec_id AS neighbor_id
         |  FROM qs q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.query_id),
         |nd AS (SELECT cand.query_id, cand.neighbor_id, SUM(qa.q * qb.q) AS dp
         |  FROM cand
         |  JOIN qv qa ON qa.vec_id = cand.query_id
         |  JOIN qv qb ON qb.vec_id = cand.neighbor_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |ncos AS (SELECT query_id, neighbor_id,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM nd JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
         |ar AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
         |    FROM ncos) WHERE rk <= 3),
         |h AS (SELECT a.query_id, COUNT(t.neighbor_id) AS hits
         |  FROM ar a LEFT JOIN tr t
         |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
         |  GROUP BY 1)
         |SELECT q.query_id,
         |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
         |  ${Rnd.sql("CAST(COALESCE(h.hits, 0) AS DOUBLE) / 3.0", 6)} AS recall_at_3
         |FROM (SELECT DISTINCT query_id FROM tr) q LEFT JOIN h ON h.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin,
    // q_sim_join_recall: q_sim_recall's intersect-with-brute harness
    // over the COLLECTION SPLIT — tr is the brute top-3 of even-id
    // queries (< 20) against odd-id references, ar is q_sim_join's
    // cell-join chain with the same left filter
    "q_sim_join_recall" -> joinRecallOracleSql(
      """cells AS (SELECT vec_id, cent_id AS cell FROM (
        |  SELECT vec_id, cent_id,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
        |  FROM ccos) WHERE rn = 1),
        |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM cells q JOIN cells c ON c.cell = q.cell
        |  WHERE q.vec_id % 2 = 0 AND q.vec_id < 20 AND c.vec_id % 2 = 1)""".stripMargin),
    // the nprobe=2 variant: identical truth + harness (shared builder),
    // candidates from the q_sim_join_probe chain (rn <= NProbe cells)
    "q_sim_join_recall_probe" -> joinRecallOracleSql(
      s"""ranked AS (SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos),
         |cells AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE rn = 1),
         |qcells AS (SELECT vec_id AS query_id, cent_id AS cell
         |  FROM ranked WHERE rn <= $NProbe AND vec_id % 2 = 0 AND vec_id < 20),
         |cand AS (SELECT q.query_id, c.vec_id AS neighbor_id
         |  FROM qcells q JOIN cells c ON c.cell = q.cell
         |  WHERE c.vec_id % 2 = 1)""".stripMargin),
    "q_sim_ivf_probe" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |$cdCcosSql
         |ranked AS (SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos),
         |cells AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE rn = 1),
         |qcells AS (SELECT vec_id AS query_id, cent_id AS cell
         |  FROM ranked WHERE rn <= $NProbe AND vec_id < 10),
         |cand AS (SELECT q.query_id, c.vec_id AS neighbor_id
         |  FROM qcells q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.query_id),
         |nd AS (SELECT cand.query_id, cand.neighbor_id, SUM(qa.q * qb.q) AS dp
         |  FROM cand
         |  JOIN qv qa ON qa.vec_id = cand.query_id
         |  JOIN qv qb ON qb.vec_id = cand.neighbor_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |ncos AS (SELECT query_id, neighbor_id,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM nd JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
         |  FROM ncos)
         |SELECT query_id, neighbor_id, rk, ${Rnd.sql("c", 6)} AS cos
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    "q_sim_ivf" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |$cdCcosSql
         |cells AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos) WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, cell FROM cells WHERE vec_id < 10),
         |cand AS (SELECT q.query_id, c.vec_id AS neighbor_id
         |  FROM qs q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.query_id),
         |nd AS (SELECT cand.query_id, cand.neighbor_id, SUM(qa.q * qb.q) AS dp
         |  FROM cand
         |  JOIN qv qa ON qa.vec_id = cand.query_id
         |  JOIN qv qb ON qb.vec_id = cand.neighbor_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |ncos AS (SELECT query_id, neighbor_id,
         |    CAST(dp AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS c
         |  FROM nd JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
         |  FROM ncos)
         |SELECT query_id, neighbor_id, rk, ${Rnd.sql("c", 6)} AS cos
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    // PQ mirror: codeword c of subspace j is row 31c's subvector j
    // (dsub=16); codes are argmin of integer squared-L2 (ties → lowest
    // c, the ROW_NUMBER tie order); ADC re-joins each neighbor's codes
    // to the QUERY's distance rows — every number an exact integer
    "q_sim_pq" ->
      s"""WITH qv AS ($qvSql),
         |sub AS (SELECT vec_id, (i-1) // 16 AS j, (i-1) % 16 AS p, q FROM qv),
         |cbv AS (SELECT vec_id // $PqStride AS c, j, p, q
         |  FROM sub WHERE vec_id % $PqStride = 0 AND vec_id < ${PqStride * PqKsub}),
         |d AS (SELECT s.vec_id, s.j, b.c,
         |    CAST(SUM((s.q - b.q) * (s.q - b.q)) AS BIGINT) AS dist2
         |  FROM sub s JOIN cbv b ON b.j = s.j AND b.p = s.p
         |  GROUP BY 1, 2, 3),
         |codes AS (SELECT vec_id, j, c FROM (
         |    SELECT vec_id, j, c,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist2, c) AS rn
         |    FROM d) WHERE rn = 1),
         |adc AS (SELECT qd.vec_id AS query_id, x.vec_id AS neighbor_id,
         |    CAST(SUM(qd.dist2) AS BIGINT) AS adist
         |  FROM codes x JOIN d qd ON qd.j = x.j AND qd.c = x.c
         |  WHERE qd.vec_id < 10 AND qd.vec_id <> x.vec_id
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rk
         |  FROM adc)
         |SELECT query_id, neighbor_id, rk, adist
         |FROM r WHERE rk <= $K ORDER BY query_id, rk""".stripMargin,
    // IVF-PQ = q_sim_ivf's cell assignment ∘ q_sim_pq's codes/ADC:
    // candidates come from shared cells, scores from code lookups
    "q_sim_ivfpq" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |$cdCcosSql
         |cells AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos) WHERE rn = 1),
         |sub AS (SELECT vec_id, (i-1) // 16 AS j, (i-1) % 16 AS p, q FROM qv),
         |cbv AS (SELECT vec_id // $PqStride AS c, j, p, q
         |  FROM sub WHERE vec_id % $PqStride = 0 AND vec_id < ${PqStride * PqKsub}),
         |d AS (SELECT s.vec_id, s.j, b.c,
         |    CAST(SUM((s.q - b.q) * (s.q - b.q)) AS BIGINT) AS dist2
         |  FROM sub s JOIN cbv b ON b.j = s.j AND b.p = s.p
         |  GROUP BY 1, 2, 3),
         |codes AS (SELECT vec_id, j, c FROM (
         |    SELECT vec_id, j, c,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist2, c) AS rn
         |    FROM d) WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, cell FROM cells WHERE vec_id < 10),
         |cand AS (SELECT q.query_id, cl.vec_id AS neighbor_id
         |  FROM qs q JOIN cells cl ON cl.cell = q.cell AND cl.vec_id <> q.query_id),
         |adc AS (SELECT cand.query_id, cand.neighbor_id,
         |    CAST(SUM(qd.dist2) AS BIGINT) AS adist
         |  FROM cand
         |  JOIN codes x ON x.vec_id = cand.neighbor_id
         |  JOIN d qd ON qd.vec_id = cand.query_id AND qd.j = x.j AND qd.c = x.c
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rk
         |  FROM adc)
         |SELECT query_id, neighbor_id, rk, adist
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    // q_sim_ivfpq's chain with ONE extra CTE: subvector values become
    // vec − assigned-centroid residuals before codebook sampling,
    // encoding, and ADC — the IVFADC composition, still exact integers
    "q_sim_ivfpq_res" ->
      s"""WITH qv AS ($qvSql),
         |nrm AS ($nrmSql),
         |$cdCcosSql
         |cells AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
         |  FROM ccos) WHERE rn = 1),
         |sub AS (SELECT vec_id, (i-1) // 16 AS j, (i-1) % 16 AS p, q FROM qv),
         |resid AS (SELECT s.vec_id, s.j, s.p, s.q - cs.q AS q
         |  FROM sub s JOIN cells cl ON cl.vec_id = s.vec_id
         |  JOIN sub cs ON cs.vec_id = cl.cell AND cs.j = s.j AND cs.p = s.p),
         |cbv AS (SELECT vec_id // $PqStride AS c, j, p, q
         |  FROM resid WHERE vec_id % $PqStride = 0 AND vec_id < ${PqStride * PqKsub}),
         |d AS (SELECT s.vec_id, s.j, b.c,
         |    CAST(SUM((s.q - b.q) * (s.q - b.q)) AS BIGINT) AS dist2
         |  FROM resid s JOIN cbv b ON b.j = s.j AND b.p = s.p
         |  GROUP BY 1, 2, 3),
         |codes AS (SELECT vec_id, j, c FROM (
         |    SELECT vec_id, j, c,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist2, c) AS rn
         |    FROM d) WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, cell FROM cells WHERE vec_id < 10),
         |cand AS (SELECT q.query_id, cl.vec_id AS neighbor_id
         |  FROM qs q JOIN cells cl ON cl.cell = q.cell AND cl.vec_id <> q.query_id),
         |adc AS (SELECT cand.query_id, cand.neighbor_id,
         |    CAST(SUM(qd.dist2) AS BIGINT) AS adist
         |  FROM cand
         |  JOIN codes x ON x.vec_id = cand.neighbor_id
         |  JOIN d qd ON qd.vec_id = cand.query_id AND qd.j = x.j AND qd.c = x.c
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rk
         |  FROM adc)
         |SELECT query_id, neighbor_id, rk, adist
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin)
}
