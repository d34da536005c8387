package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Numeric design: floats are quantized per element to `bigint`
  * (`floor(x·10⁶ + 0.5)` — no double sits exactly on a half-way point of
  * the 10⁻⁶ grid, so every engine rounds identically). Dot products and
  * squared norms are then EXACT integer sums: order-independent,
  * overflow-safe (|q| ≤ ~10⁶ ⇒ 64-dim dot ≤ ~10¹⁴ ≪ 2⁶³), and
  * bit-identical across engines; the final cosine is a few IEEE ops on
  * identical inputs. That puts brute-force AND bucketed ANN on the
  * DuckDB-oracled path with exact hash compares.
  *
  * Scale design: [[bruteTopK]] broadcasts the (small) query set and
  * keeps the corpus partitioned — every scorer ranks through the
  * bounded [[rankTopK]] aggregate, so a query's candidate set never
  * funnels through one task. The 100 TB path is [[lshSignature]]:
  * deterministic hyperplane signs bucket the corpus (one narrow shuffle
  * on a short string key) and scoring happens only inside buckets — the
  * ANN analog of the dedup band join, never all-pairs. The plane COUNT
  * is corpus-aware ([[adaptiveBits]]): buckets track the corpus size,
  * so occupancy — and with it the within-bucket pair join — stays flat
  * as rows double. Production would draw seeded Gaussian planes once
  * and broadcast them; the harness derives ±1 weights from md5 so the
  * oracle stays self-contained.
  */
object Similarity {

  /** Per-element quantization: array<float> → array<long>. */
  def quantize(vec: Column, scale: Double = 1e6): Column =
    transform(vec, x => floor(x.cast("double") * scale + lit(0.5)).cast("long"))

  /** Exact integer dot product of two quantized vectors, via the native
    * codegen'd [[graft.expressions.QuantizedDot]] (registered by
    * [[graft.GraftFunctions]]): a tight primitive loop instead of the
    * higher-order-function spelling below. */
  def dotQ(a: Column, b: Column): Column =
    call_function("quantized_dot", a, b)

  /** Built-in spelling of the same dot product (zip + fold) — kept as
    * the reference semantics the native expression must match. */
  def dotQBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Double dot product of a quantized (long) vector against a trained
    * (double) centroid — the k-means / trained-IVF scoring primitive. */
  private def dotDbl(q: Column, c: Column): Column =
    aggregate(zip_with(q, c, (x, y) => x.cast("double") * y), lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm of a quantized vector (double). */
  def normQ(a: Column): Column = sqrt(dotQ(a, a).cast("double"))

  /** Prepare a frame: (id, q, norm) from (idCol, vecCol). */
  def prep(df: DataFrame, idCol: Column, vecCol: Column): DataFrame = {
    graft.GraftFunctions.ensure(df.sparkSession)
    df.select(idCol.as("id"), quantize(vecCol).as("q"))
      .withColumn("norm", normQ(col("q")))
  }

  /** Rank scored (query_id, neighbor_id, cos) candidates to each query's
    * top-k via the native bounded [[graft.expressions.TopKBy]] aggregate:
    * map-side combine ships at most k rows per partition per query and
    * merges are k+k heap unions, so no task ever materializes or sorts a
    * query's full candidate set. (The `row_number() OVER (PARTITION BY
    * query_id)` spelling this replaces funnels each query's millions of
    * scored candidates through ONE task's sort at corpus scale.) Same
    * order contract as that window: cos desc, ties to the lower
    * neighbor_id; rk is 1-based best-first. */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    graft.GraftFunctions.ensure(scored.sparkSession)
    scored.groupBy("query_id")
      .agg(call_function("top_k_by", col("cos"), col("neighbor_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.payload").as("neighbor_id"),
        (col("pos") + 1).as("rk"), col("col.score").as("cos"))
  }

  /** Brute-force cosine top-k: every query row against the whole corpus.
    * The baseline — exact, O(|Q|·|C|); keep |Q| small and broadcast. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c")
      .join(broadcast(queries.as("qs")), col("qs.id") =!= col("c.id"))
      .select(
        col("qs.id").as("query_id"),
        col("c.id").as("neighbor_id"),
        (dotQ(col("qs.q"), col("c.q")).cast("double") / (col("qs.norm") * col("c.norm"))).as("cos"))
    rankTopK(joined, k)
  }

  /** Deterministic ±1 hyperplane weight for (plane p, position i): +1
    * iff the first hex nibble of md5("plane:p:i") is < 8 — an unbiased,
    * pattern-free coin every engine recomputes exactly (DuckDB:
    * `substring(md5('plane:' || p || ':' || i), 1, 1) BETWEEN '0' AND
    * '7'`). Replaces the old arithmetic rule `(p·73 + i·151) mod 7 < 3`,
    * which was 7-PERIODIC in both arguments: plane p+7 duplicated plane
    * p bit-for-bit, silently capping every signature at 7 informative
    * bits (128 buckets) no matter how many planes were requested. */
  def planeWeight(p: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0xf) < 8) 1L else -1L
  }

  /** Hyperplane-sign signature: bit p = (Σᵢ w(p,i)·qᵢ ≥ 0). The weight
    * rows are data-independent driver-computed literals, so each
    * plane's sum plans as one native `quantized_dot` against a literal
    * array (the DotProductRewrite rule fires on the zip_with spelling)
    * — no per-row hash work. Vectors must be exactly `dim` wide; a
    * silently zip-padded short vector would land in a wrong bucket, so
    * the mismatch raises instead. */
  def lshSignature(qvec: Column, planes: Int, dim: Int): Column = {
    require(planes >= 1 && planes <= 256, s"lshSignature: planes out of [1,256]: $planes")
    require(dim >= 1, s"lshSignature: dim must be positive, got $dim")
    val sig = concat((0 until planes).map { p =>
      val w = typedLit((0 until dim).map(i => planeWeight(p, i)))
      when(aggregate(zip_with(qvec, w, (x, ww) => x * ww), lit(0L), (acc, v) => acc + v) >= 0,
        "1").otherwise("0")
    }: _*)
    when(size(qvec) === dim, sig).otherwise(raise_error(concat(
      lit(s"lshSignature: expected a $dim-dim vector, got "), size(qvec).cast("string"))))
  }

  /** Smallest p ≥ 1 with 2^p ≥ n, floored at `minBits` — the
    * corpus-aware bucket-count rule. Bucket count (2^bits) then tracks
    * the corpus linearly, so expected bucket occupancy stays O(1) as
    * rows double and within-bucket pair enumeration stays linear — a
    * FIXED plane count is asymptotically quadratic at 100×, however
    * many planes it is. Exact integer arithmetic: no float log whose
    * final ulp could disagree with the oracle's SQL spelling
    * `GREATEST(minBits, MIN(p) WHERE (1::BIGINT << p) >= n)`. */
  def adaptiveBits(n: Long, minBits: Int): Int = {
    require(minBits >= 1 && minBits <= 63, s"adaptiveBits: bad minBits=$minBits")
    val p = if (n <= 2) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.max(minBits, p)
  }

  /** IVF cell assignment: a training-free coarse quantizer — every
    * `stride`-th vector is a centroid (deterministic "sample"), and each
    * vector joins the centroid with the highest quantized cosine
    * (ties → lowest centroid id). The centroid set is tiny → broadcast;
    * assignment costs ONE N-row exchange (the argmax hash aggregate),
    * never the N×C expansion. Production would k-means the centroids;
    * the cell-assignment/search plumbing is identical. */
  def ivfCells(prepped: DataFrame, stride: Int): DataFrame = {
    val scored = prepped.join(broadcast(strideCentroids(prepped, stride)))
      .select(col("id"), col("q"), col("norm"), col("cent_id"),
        (dotQ(col("q"), col("cq")).cast("double") / (col("norm") * col("cnorm"))).as("ccos"))
    // argmax via max_by in a hash aggregate: partial aggregation keeps
    // the map side at one row per (vector, centroid) partial and the
    // exchange at N rows — a row_number window here would shuffle the
    // full N×C expansion, each row dragging the 64-element vector.
    // Tie-break: highest cosine, then LOWEST centroid id (the -cent_id
    // in the ordering struct).
    scored
      .groupBy(col("id"), col("q"), col("norm"))
      .agg(max_by(col("cent_id"), struct(col("ccos"), -col("cent_id"))).as("cell"))
  }

  /** The training-free coarse-quantizer centroid set: every `stride`-th
    * vector, as (cent_id, cq, cnorm). */
  def strideCentroids(prepped: DataFrame, stride: Int): DataFrame =
    prepped.filter(col("id") % stride === 0)
      .select(col("id").as("cent_id"), col("q").as("cq"), col("norm").as("cnorm"))

  /** IVF probe: top-k neighbors of each query, searching ONLY the
    * query's cell (nprobe=1) — the inverted-file scale path. */
  def ivfTopK(cells: DataFrame, queryIds: Column => Column, k: Int): DataFrame = {
    val queries = cells.filter(queryIds(col("id")))
      .select(col("id").as("query_id"), col("q").as("qq"), col("norm").as("qnorm"), col("cell"))
    val joined = cells.join(broadcast(queries), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (dotQ(col("qq"), col("q")).cast("double") / (col("qnorm") * col("norm"))).as("cos"))
    rankTopK(joined, k)
  }

  /** Multi-cell IVF probe — the standard recall/latency knob: each query
    * searches its `nprobe` NEAREST cells instead of only its own
    * (nprobe=1 reproduces [[ivfTopK]]'s choice; nprobe=#cells
    * degenerates to exact search). The query→cells step composes the
    * native bounded [[graft.expressions.TopKBy]] aggregate over the
    * broadcast centroid set, so it stays a |queries|-row exchange; each
    * query then fans out to nprobe bucket probes (queries broadcast, the
    * corpus cells frame never reshuffles). A neighbor lives in exactly
    * one cell, so no pair is scored twice. */
  def ivfTopKProbe(cells: DataFrame, cents: DataFrame, queryIds: Column => Column,
      k: Int, nprobe: Int): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    graft.GraftFunctions.ensure(cells.sparkSession)
    val queries = cells.filter(queryIds(col("id")))
      .select(col("id").as("query_id"), col("q").as("qq"), col("norm").as("qnorm"))
    val qcells = queries.join(broadcast(cents))
      .select(col("query_id"), col("qq"), col("qnorm"), col("cent_id"),
        (dotQ(col("qq"), col("cq")).cast("double") / (col("qnorm") * col("cnorm"))).as("ccos"))
      .groupBy(col("query_id"), col("qq"), col("qnorm"))
      // same (cos desc, cent_id asc) tie rule as ivfCells' argmax, so
      // nprobe=1 probes exactly the ivfTopK cell
      .agg(call_function("top_k_by", col("ccos"), col("cent_id"), lit(nprobe)).as("top"))
      .select(col("query_id"), col("qq"), col("qnorm"), explode(col("top")).as("tc"))
      .select(col("query_id"), col("qq"), col("qnorm"), col("tc").getField("payload").as("cell"))
    val joined = cells.join(broadcast(qcells), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (dotQ(col("qq"), col("q")).cast("double") / (col("qnorm") * col("norm"))).as("cos"))
    rankTopK(joined, k)
  }

  /** k-means‖ initialization (Bahmani et al., VLDB 2012): pick k seed
    * directions in O(log k) full-corpus passes.
    *
    *   1. Seed with the vector of minimum md5(id) — a deterministic
    *      uniform draw.
    *   2. For ceil(log₂ k) (≥2) rounds: score every point's cosine
    *      distance to its nearest candidate (candidates broadcast; one
    *      parallel aggregate), then keep point x with probability
    *      min(1, 2k·d(x)/φ) where φ = Σd — the draw is a pure md5
    *      function of (round, id), so re-runs and retries sample the
    *      SAME set. Expected ≤ 2k new candidates per round, collected
    *      to the driver (bounded model state, like the centroids).
    *   3. Weight every candidate by the number of points it wins
    *      (one more parallel argmax pass), then solve the tiny weighted
    *      k-center problem driver-side: greedy max of
    *      weight·(1 − nearest-chosen cosine), ties to the earliest
    *      candidate — deterministic, no RNG.
    *
    * Job count is O(log k) corpus passes total vs farthest-first's k−1
    * sequential rounds; the quality argument is the k-means‖ paper's:
    * cost-proportional oversampling lands ≥1 candidate per separated
    * mass, and the weighted recluster keeps exactly one. If the corpus
    * has fewer than k distinct DIRECTIONS, the greedy step runs out of
    * positive-score candidates and returns one centroid per direction
    * found (never duplicates). Empty input fails loudly. */
  def kmeansParInit(prepped: DataFrame, k: Int): Seq[Seq[Double]] = {
    val spark = prepped.sparkSession
    import spark.implicits._
    val seed = prepped
      .orderBy(md5(col("id").cast("string").cast("binary")), col("id")).limit(1)
      .select(col("q")).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        "kmeansCentroids: empty input frame — nothing to cluster"))
      .getSeq[Long](0).map(_.toDouble)
    if (k == 1) return Seq(seed)
    var cands: Vector[Seq[Double]] = Vector(seed)
    val rounds = math.max(2, 32 - Integer.numberOfLeadingZeros(k - 1)) // ceil(log2 k)
    var saturated = false
    for (r <- 1 to rounds if !saturated) {
      val candsDf = cands.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("cent_id", "cvec")
        .withColumn("cnorm", sqrt(dotDbl(col("cvec"), col("cvec"))))
      // per-point distance to the nearest candidate; feeds BOTH the
      // normalizer aggregate and the sample filter — pin for the round
      // (a round-local scope: both consumers run before the round ends)
      val roundScope = new CacheScope
      try {
        val costs = roundScope.pin(prepped.join(broadcast(candsDf))
          .select(col("id"), col("q"),
            (lit(1.0) - dotDbl(col("q"), col("cvec")) / (col("norm") * col("cnorm"))).as("d"))
          .groupBy(col("id"), col("q")).agg(min(col("d")).as("dist")))
        val phi = costs.agg(sum(col("dist"))).head().getDouble(0)
        if (phi <= 1e-12) saturated = true // every point sits on a candidate
        else {
          // deterministic uniform draw in [0,1): high 32 bits of md5(round:id)
          val draw = conv(substring(
            md5(concat(lit(s"kmpp:$r:"), col("id").cast("string")).cast("binary")), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0)
          val picked = costs
            .filter(draw < least(lit(1.0), lit(2.0 * k) * col("dist") / lit(phi)))
            .select(col("id"), col("q")).collect()
            .sortBy(_.getLong(0)) // partition order is not a contract
            .map(_.getSeq[Long](1).map(_.toDouble))
          cands = (cands ++ picked).distinct
        }
      } finally roundScope.close()
    }
    // weight candidates by won points (one argmax pass), then greedy
    // weighted k-center on the driver (|cands| ~ 2k·log k entries)
    val candsDf = cands.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("cent_id", "cvec")
      .withColumn("cnorm", sqrt(dotDbl(col("cvec"), col("cvec"))))
    val weights = prepped.join(broadcast(candsDf))
      .select(col("id"),
        (dotDbl(col("q"), col("cvec")) / (col("norm") * col("cnorm"))).as("ccos"),
        col("cent_id"))
      .groupBy("id").agg(max_by(col("cent_id"), struct(col("ccos"), -col("cent_id"))).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val wt = cands.indices.map(i => weights.getOrElse(i.toLong, 0L).toDouble)
    val first = cands.indices.maxBy(i => (wt(i), -i)) // heaviest, ties earliest
    var chosenIdx = Vector(first)
    var nearest = cands.indices.map(i => cos(cands(i), cands(first))).toArray
    while (chosenIdx.size < k && {
      val next = cands.indices.filterNot(chosenIdx.contains)
        .maxByOption(i => (wt(i) * (1.0 - nearest(i)), -i))
      next.exists(i => wt(i) * (1.0 - nearest(i)) > 1e-12) && {
        val i = next.get
        chosenIdx :+= i
        cands.indices.foreach(j => nearest(j) = math.max(nearest(j), cos(cands(j), cands(i))))
        true
      }
    }) ()
    chosenIdx.map(cands).toList
  }

  /** Distributed Lloyd's k-means over the quantized vectors — the
    * TRAINED coarse quantizer for IVF (upgrade of [[ivfCells]]'s
    * training-free stride rule; the cell-assignment/probe plumbing is
    * shared). Each round is
    *   assign: the native map-side `nearest_centroid_dbl` argmax over
    *           the driver-side model ([[cellAssignExprDbl]]) — ZERO
    *           exchanges, never the N×C expansion;
    *   update: per-position means via posexplode + hash aggregate
    *           (map-side combine collapses to cells×dim rows per
    *           partition before the exchange).
    * Init is k-means‖ ([[kmeansParInit]]): O(log k) full-corpus passes
    * regardless of k, where the former farthest-first traversal ran k−1
    * SEQUENTIAL corpus rounds — thousands of scans at a realistic IVF k
    * (1024–65536 cells). Like farthest-first it lands one seed per
    * well-separated cluster (cost-proportional sampling concentrates on
    * far points), which keeps Lloyd's out of the split-one-blob/
    * merge-two local optimum.
    *
    * Driver state is k×dim doubles per round (the classic k-means
    * broadcast pattern — bounded, like any centroid model; data rows
    * never reach the driver). Empty cells keep their previous centroid.
    * An empty input fails loudly; if the input has fewer than k
    * DISTINCT DIRECTIONS, init stops early and returns one centroid per
    * direction found (never duplicates). "Distinct" is cosine-space
    * distinctness: colinear vectors ([1,0] and [2,0]) are the SAME
    * point on the unit sphere and correctly collapse to one centroid.
    *
    * Not on the oracled path: iterative float means are not portable
    * SQL. Spec contract instead: clustering cost is monotonically
    * non-increasing per round and well-separated blobs land in distinct
    * cells ([[graft.SimilaritySpec]]).
    *
    * Returns (cent_id, cvec: array<double>, cnorm). */
  def kmeansCentroids(prepped: DataFrame, k: Int, iters: Int = 5): DataFrame = {
    val spark = prepped.sparkSession
    import spark.implicits._
    graft.GraftFunctions.ensure(spark) // foreign sessions lack the extension
    require(k > 0 && iters >= 0, s"kmeansCentroids: bad k=$k / iters=$iters")
    var cents: Seq[(Long, Seq[Double])] =
      kmeansParInit(prepped, k).zipWithIndex.map { case (v, i) => i.toLong -> v }
    for (_ <- 0 until iters) {
      // assign map-side (native nearest_centroid_dbl): no join, no
      // exchange — each round's only exchange is the update aggregate
      val assigned = prepped
        .select(cellAssignExprDbl(cents, col("q"), col("norm")).as("cell"), col("q"))
      // per-position means; bounded collect (cells × dim rows)
      val means = assigned
        .select(col("cell"), posexplode(col("q")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cvec"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      cents = cents.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    }
    cents.toDF("cent_id", "cvec")
      .withColumn("cnorm", sqrt(dotDbl(col("cvec"), col("cvec"))))
  }

  /** MAP-SIDE cell assignment: the centroid argmax as ONE native
    * codegen'd expression — `nearest_centroid(q, norm, flat-model,
    * cnorms)` ([[graft.expressions.NearestCentroid]]) returns the
    * 0-based index of the best centroid, then a k-long literal lookup
    * maps index → cent_id. Where [[ivfCells]]' join + `max_by`
    * aggregate pays an N-row exchange to group per id, this pays NONE:
    * assignment fuses into the scan's stage and its WholeStageCodegen.
    * Identical output to [[ivfCells]] including the tie rule — the
    * expression keeps the lowest index on equal cosine, and the model
    * is sorted by cent_id here, so ties go to the LOWEST cent_id
    * regardless of caller order (spec-pinned equal).
    *
    * This is also the STREAMING-safe spelling: a stateless per-row map
    * needs no aggregation state, so a stream of vectors can be routed
    * to cells under any output mode. The model is a driver-side
    * centroid seq (the k-means-broadcast pattern); norms are computed
    * driver-side in exact long arithmetic so the division matches the
    * executor-side spelling bit-for-bit. Plan-size note: k centroid
    * array literals (k·dim longs) — the bloom/codebook regime starts at
    * k·dim ≫ 10⁵, where the [[graft.expressions.BroadcastRef]] form of
    * the model is the right delivery (same expression shape). */
  def cellAssignExpr(cents: Seq[(Long, Seq[Long])], qCol: Column, normCol: Column): Column = {
    require(cents.nonEmpty, "cellAssignExpr: empty centroid model")
    val sorted = cents.sortBy(_._1) // lowest-index ties == lowest cent_id
    val dim = sorted.head._2.length
    require(sorted.forall(_._2.length == dim), "cellAssignExpr: ragged centroid model")
    val flat = sorted.flatMap(_._2)
    // exact long sum, then one sqrt — bit-identical to the executor-side
    // sqrt(cast(quantized_dot as double)) the aggregate path computes
    val cnorms = sorted.map { case (_, cv) => math.sqrt(cv.map(v => v * v).sum.toDouble) }
    val idx = call_function("nearest_centroid",
      qCol, normCol, typedLit(flat), typedLit(cnorms))
    // index → centroid id via a tiny k-long literal lookup
    element_at(typedLit(sorted.map(_._1)), idx + 1)
  }

  /** [[ivfCells]] through [[cellAssignExpr]]: same (id, q, norm, cell)
    * frame, ZERO exchanges (the stride-centroid collect is the bounded
    * model read, as everywhere). */
  def ivfCellsMapSide(prepped: DataFrame, stride: Int): DataFrame = {
    graft.GraftFunctions.ensure(prepped.sparkSession) // foreign sessions lack the extension
    val model = strideCentroids(prepped, stride)
      .select(col("cent_id"), col("cq")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    prepped.withColumn("cell", cellAssignExpr(model, col("q"), col("norm")))
  }

  /** [[cellAssignExpr]] against TRAINED (double) centroids — the same
    * exchange-free native argmax via `nearest_centroid_dbl`. The dot
    * accumulates in index order (the `aggregate(zip_with)` fold order)
    * and the driver-side norms fold the same doubles in the same order,
    * so assignments are bit-identical to the former join + `max_by`
    * spelling (spec-pinned by the k-means blob/cost contracts). */
  def cellAssignExprDbl(cents: Seq[(Long, Seq[Double])], qCol: Column, normCol: Column): Column = {
    require(cents.nonEmpty, "cellAssignExprDbl: empty centroid model")
    val sorted = cents.sortBy(_._1) // lowest-index ties == lowest cent_id
    val dim = sorted.head._2.length
    require(sorted.forall(_._2.length == dim), "cellAssignExprDbl: ragged centroid model")
    val flat = sorted.flatMap(_._2)
    val cnorms = sorted.map { case (_, v) => math.sqrt(v.map(x => x * x).sum) }
    val idx = call_function("nearest_centroid_dbl", qCol, normCol, typedLit(flat), typedLit(cnorms))
    element_at(typedLit(sorted.map(_._1)), idx + 1)
  }

  /** IVF cell assignment against TRAINED (double) centroids — map-side
    * via [[cellAssignExprDbl]]: the centroid frame collapses to its
    * bounded driver-side model and the assignment fuses into the scan
    * stage (zero exchanges, like [[ivfCellsMapSide]]). */
  def ivfCellsTrained(prepped: DataFrame, centroids: DataFrame): DataFrame = {
    graft.GraftFunctions.ensure(prepped.sparkSession)
    val model = centroids.select("cent_id", "cvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    prepped.withColumn("cell", cellAssignExprDbl(model, col("q"), col("norm")))
  }

  /** Mean clustering cost (1 - best cosine) of `prepped` against
    * `centroids` — the quantity Lloyd's minimizes; used by the spec to
    * assert each round improves (or holds) the objective. */
  def kmeansCost(prepped: DataFrame, centroids: DataFrame): Double = {
    prepped.join(broadcast(centroids))
      .select(col("id"),
        (dotDbl(col("q"), col("cvec")) / (col("norm") * col("cnorm"))).as("ccos"))
      .groupBy("id").agg(max("ccos").as("best"))
      .agg(avg(lit(1.0) - col("best"))).head().getDouble(0)
  }

  /** Bucketed ANN: cosine for all same-signature pairs (id_a < id_b).
    *
    * Cache contract (this and the query layers that pin frames): the
    * pinned frame backs BOTH sides of the self-join of the RETURNED
    * lazy plan, so the operator cannot unpersist it itself — the caller
    * owns the lifetime: pass a tracking [[CacheScope]] and `close()` it
    * after materializing, or rely on a session-level sweep (Bench/
    * Verify/EtlPipeline clear the session cache between queries —
    * the default unmanaged scope's contract). */
  def lshPairs(prepped: DataFrame, planes: Int, dim: Int,
               scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // both sides of the bucket self-join — pin so quantization + the
    // signature compute once per row, not twice
    val sig = scope.pin(prepped.withColumn("sig", lshSignature(col("q"), planes, dim)))
    // blocked triangular enumeration: a content cluster (identical
    // vectors → identical signature) beyond the block size splits into
    // bounded cells instead of one c²/2 task (PairEnum rationale)
    PairEnum.bucketPairs(sig, Seq("sig"), payloadCols = Seq("q", "norm"))
      .select(
        col("id_a").as("vec_a"), col("id_b").as("vec_b"),
        (dotQ(col("q_a"), col("q_b")).cast("double") / (col("norm_a") * col("norm_b"))).as("cos"))
  }

  /** [[lshPairs]] with the plane count derived from the corpus size:
    * one column-pruned count job, then `adaptiveBits(n, minPlanes)`
    * planes — the bucket population tracks the corpus, so doubling the
    * rows doubles the buckets instead of quadrupling every bucket's
    * pair join. */
  def lshPairsAdaptive(prepped: DataFrame, dim: Int, minPlanes: Int = 8): DataFrame =
    lshPairs(prepped, adaptiveBits(prepped.count(), minPlanes), dim)

  /** Banded hyperplane LSH — the high-recall near-dup shape (the
    * [[Dedup]] band-join precedent, on vectors): a bands·width
    * signature, candidates = pairs agreeing on EVERY bit of AT LEAST
    * ONE band, then exact cosine on candidates only. Width scales with
    * log₂(n) ([[adaptiveBits]]), so each band offers ~n buckets and
    * expected occupancy stays O(1); `bands` is the recall knob (each
    * band is one more chance for a true near-dup to collide), costing
    * one explode row per band — never all-pairs, never a bucket that
    * widens with the corpus.
    *
    * Plan shape: the band self-join carries only (id, band, bsig) —
    * vectors never ride the bucket exchange; a pair colliding in
    * several bands is deduplicated BEFORE scoring (scored once); the
    * candidate set then re-joins the vectors by id. Callers should
    * cache `prepped` (it backs the signature pass and both scoring
    * sides; same caller-owned-lifetime contract as [[lshPairs]]). */
  /** Banded hyperplane assignments at an EXPLICIT width: (id, band,
    * bsig) — the persisted ANN band-state shape. The width is a state
    * property: an incremental consumer must band new vectors at the
    * width the state was built with (bands at different widths never
    * co-bucket), and re-derives the state — cheap, it's derived data —
    * when the corpus doubles past the next power of two. */
  def bandAssignments(prepped: DataFrame, dim: Int, bands: Int, width: Int): DataFrame = {
    require(bands >= 1 && width >= 1, s"bandAssignments: bad bands=$bands width=$width")
    prepped
      .select(col("id"), lshSignature(col("q"), bands * width, dim).as("sig"))
      .select(col("id"), explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), substring(col("sig"), b * width + 1, width).as("bsig"))): _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
  }

  /** INCREMENTAL banded ANN: cosine-scored candidate pairs touching the
    * NEW vector batch only — new×new (blocked self-join) plus new×STATE
    * (probe join, batch side broadcast) — never old×old. The vector-side
    * twin of [[Dedup.incrementalCandidates]]: the persisted band table is
    * the ANN index, each arriving batch pays its own banding plus one
    * probe, and per-batch cost stays flat as the corpus grows. Old
    * vectors are read back ONLY for candidate scoring (`oldPrepped` —
    * the embedding store in [[prep]]ped shape; the candidate semi-join
    * confines the read). Signatures are per-vector, so the result equals
    * the full-corpus [[lshBandedPairs]] at the same width restricted to
    * pairs touching the batch (pinned by SimilaritySpec). */
  def incrementalBandedPairs(
      newPrepped: DataFrame, oldPrepped: DataFrame, stateBanded: DataFrame,
      dim: Int, bands: Int, width: Int, broadcastNew: Boolean = true,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // per-call pin: a streaming consumer calls this once per micro-batch
    // and must pass a batch-owned scope (the jaccardVerify contract) —
    // the default keeps the session-sweep convention for one-shot callers
    val newBanded = scope.pin(bandAssignments(newPrepped, dim, bands, width))
    val n = if (broadcastNew) broadcast(newBanded) else newBanded
    val cross = n.as("n").join(stateBanded.as("o"),
        col("n.band") === col("o.band") && col("n.bsig") === col("o.bsig"))
      .select(least(col("n.id"), col("o.id")).as("vec_a"),
        greatest(col("n.id"), col("o.id")).as("vec_b"))
    val cand = PairEnum.bucketPairs(newBanded, Seq("band", "bsig"))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))
      .union(cross).distinct()
    val vecs = newPrepped.unionByName(oldPrepped)
    val va = vecs.select(col("id").as("vec_a"), col("q").as("qa"), col("norm").as("na"))
    val vb = vecs.select(col("id").as("vec_b"), col("q").as("qb"), col("norm").as("nb"))
    cand.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dotQ(col("qa"), col("qb")).cast("double") / (col("na") * col("nb"))).as("cos"))
  }

  /** SemDeDup-style SEMANTIC near-dup pairs (Abbas et al. 2023): assign
    * every vector to its nearest centroid map-side ([[ivfCellsMapSide]]
    * — the bounded broadcast model, zero assignment exchanges), then
    * pair only WITHIN a cell and keep pairs at exact quantized cosine
    * ≥ `threshold`. The cell restriction is the published algorithm's
    * scale trade: the corpus is never all-paired — candidate volume is
    * Σ cell²/2, and a hot cell splits into bounded triangular blocks
    * through [[PairEnum.bucketPairs]] (vectors ride the blocks as
    * payload, so no join back to the corpus). Cross-cell near-dups are
    * invisible by design; more centroids sharpen cells, `threshold`
    * trades recall for dedup aggressiveness. Compose with
    * [[Dedup.clusters]] + a keep-list for the full SemDeDup step
    * (q_dedup_semantic). Returns `(vec_a, vec_b, cos)`, `vec_a <
    * vec_b`. */
  def semanticPairs(prepped: DataFrame, stride: Int, threshold: Double,
                    blockSize: Int = 4096,
                    scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // assignment frame feeds both sides of the within-cell self-pairing
    // (caller-owned lifetime — the lshPairs cache contract)
    val cells = scope.pin(ivfCellsMapSide(prepped, stride))
    PairEnum.bucketPairs(cells, Seq("cell"), payloadCols = Seq("q", "norm"),
        blockSize = blockSize)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
        (dotQ(col("q_a"), col("q_b")).cast("double") / (col("norm_a") * col("norm_b"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** EXACT max cosine of each row's vector against a bounded BROADCAST
    * vector set — the [[cellAssignExpr]] machinery pointed at
    * "how close is this row to ANY reference vector": the native
    * `nearest_centroid` argmax picks the best reference (exact — it
    * maximizes cosine), then one literal lookup re-derives that
    * reference's vector/norm and the cosine is computed exactly once.
    * Map-side and codegen'd: ZERO joins, the corpus never shuffles —
    * the right shape when the reference set is benchmark-sized
    * (semantic eval-decontamination, dataset-vs-dataset proximity
    * screens). Ties between references share the max, so the VALUE is
    * tie-free even though the argmax picks the lowest id. */
  def maxCosExpr(refs: Seq[(Long, Seq[Long])], qCol: Column, normCol: Column): Column = {
    require(refs.nonEmpty, "maxCosExpr: empty reference set")
    val sorted = refs.sortBy(_._1)
    val idx = call_function("nearest_centroid", qCol, normCol,
      typedLit(sorted.flatMap(_._2)),
      typedLit(sorted.map { case (_, v) => math.sqrt(v.map(x => x * x).sum.toDouble) }))
    val best = element_at(typedLit(sorted.map(_._2)), idx + 1)
    val bestNorm = element_at(
      typedLit(sorted.map { case (_, v) => math.sqrt(v.map(x => x * x).sum.toDouble) }),
      idx + 1)
    dotQ(qCol, best).cast("double") / (normCol * bestNorm)
  }

  /** INCREMENTAL [[semanticPairs]]: within-cell cosine pairs TOUCHING
    * the new vector batch only — new×new (blocked triangular
    * self-pairing) plus new×STATE (grid-blocked cross probe through
    * [[PairEnum.bucketJoin]], so a hot cell never funnels |new|×|old|
    * pairs through one task) — never old×old; per-batch cost stays
    * flat as the corpus grows. `model` is the FROZEN centroid table
    * (cell identity is a state property — vectors assigned under
    * different centroids never co-cell, the [[bandAssignments]] width
    * rule on the cell metric); `stateCells` is the persisted
    * `(id, q, norm, cell)` assignment table. Result equals the
    * full-corpus [[semanticPairs]] under the same model restricted to
    * pairs touching the batch (spec-pinned). Same-id batch/state rows
    * are NOT dropped — the stream discipline keeps generations
    * id-disjoint, and its crash-replay guard is what prevents a batch
    * from meeting its own state (a cosine-1 (x, x) row here is that
    * guard's loud failure shape, not noise to filter). */
  def incrementalSemanticPairs(newPrepped: DataFrame, stateCells: DataFrame,
      model: Seq[(Long, Seq[Long])], threshold: Double, blockSize: Int = 4096,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // feeds the self-pairing (both sides) and the cross probe — pin
    val newCells = scope.pin(
      newPrepped.withColumn("cell", cellAssignExpr(model, col("q"), col("norm"))))
    def score(pairs: DataFrame) = pairs
      .select(least(col("id_a"), col("id_b")).as("vec_a"),
        greatest(col("id_a"), col("id_b")).as("vec_b"),
        (dotQ(col("q_a"), col("q_b")).cast("double") /
          (col("norm_a") * col("norm_b"))).as("cos"))
      .filter(col("cos") >= threshold)
    score(PairEnum.bucketPairs(newCells, Seq("cell"),
        payloadCols = Seq("q", "norm"), blockSize = blockSize))
      .unionByName(score(PairEnum.bucketJoin(newCells, stateCells, Seq("cell"),
        payloadCols = Seq("q", "norm"), blockSize = blockSize)))
  }

  def lshBandedPairs(prepped: DataFrame, dim: Int, bands: Int = 4, minWidth: Int = 4,
                     scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(bands >= 1, s"lshBandedPairs: bands must be >= 1, got $bands")
    val width = adaptiveBits(prepped.count(), minWidth)
    val banded = scope.pin( // both sides of the bucket self-join
      bandAssignments(prepped, dim, bands, width))
    val cand = PairEnum.bucketPairs(banded, Seq("band", "bsig"))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))
      .distinct()
    val va = prepped.select(col("id").as("vec_a"), col("q").as("qa"), col("norm").as("na"))
    val vb = prepped.select(col("id").as("vec_b"), col("q").as("qb"), col("norm").as("nb"))
    cand.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dotQ(col("qa"), col("qb")).cast("double") / (col("na") * col("nb"))).as("cos"))
  }

  /** Exact integer SQUARED L2 between a quantized vector column and a
    * literal quantized vector: Σ(aᵢ−bᵢ)². Bounded: 64 dims × (2·10⁶)²
    * ≈ 2.6·10¹⁴ per vector — far inside long. */
  private def distSqLit(q: Column, b: Seq[Long]): Column =
    aggregate(zip_with(q, typedLit(b), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** GREEDY k-CENTER selection (farthest-point traversal, Gonzalez
    * 1985 — the coreset/diversity data-selection step of a training
    * pipeline, Sener & Savarese 2018): seed at the MIN id, then k−1
    * times pick the vector farthest (exact integer squared L2 on the
    * quantized grid; ties to the lower id) from everything selected so
    * far. Output `(step, id, dist_sq)` — `dist_sq` is the selected
    * point's distance to the prior set (the 2-approximation's covering
    * radius ladder; 0 for the seed).
    *
    * Scale shape: k is a small constant, and each round is ONE
    * map-side distance update against the single newly-selected vector
    * (broadcast as a literal) + ONE TakeOrdered(1) argmax
    * (per-partition maxima, a k-free driver merge) — never an
    * all-pairs, never a corpus sort. Driver state is the k selected
    * vectors (model-sized, the bounded-gather discipline); the
    * running min-distance frame is re-cached per round so lineage
    * stays one update deep. */
  def selectKCenter(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
                    scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(k >= 1, s"selectKCenter: k must be >= 1, got $k")
    val spark = df.sparkSession
    val base = scope.pin(df.select(idCol.as("id"), quantize(vecCol).as("q")))
    val seed = base.agg(min("id")).head() match {
      case r if r.isNullAt(0) =>
        throw new IllegalArgumentException(
          "selectKCenter: input is empty — no vector to seed the traversal")
      case r => r.getLong(0)
    }
    def vecOf(id: Long): Seq[Long] =
      base.filter(col("id") === id).head().getSeq[Long](1)
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]((1, seed, 0L))
    var lastVec = vecOf(seed)
    // (id, q, d): min squared distance to the selected set so far
    var minDist = base.filter(col("id") =!= seed)
      .select(col("id"), col("q"), distSqLit(col("q"), lastVec).as("d"))
    (2 to k).foreach { step =>
      val cur = scope.pin(minDist)
      cur.orderBy(col("d").desc, col("id")).limit(1).collect().headOption match {
        case None => () // corpus exhausted below k — emit what exists
        case Some(far) =>
          val (farId, farD) = (far.getLong(0), far.getLong(2))
          picked += ((step, farId, farD))
          lastVec = far.getSeq[Long](1)
          minDist = cur.filter(col("id") =!= farId)
            .select(col("id"), col("q"),
              least(col("d"), distSqLit(col("q"), lastVec)).as("d"))
      }
    }
    import spark.implicits._
    picked.toSeq.toDF("step", "id", "dist_sq")
  }
}
