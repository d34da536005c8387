package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization over the engine's quantized embeddings — the
  * memory-compression side of ANN at corpus scale (IVF narrows WHERE to
  * search; PQ shrinks WHAT is resident: a 64-dim vector becomes m
  * codeword indices, 32-64× smaller, which is what lets a
  * billion-vector index fit executor memory).
  *
  * Layout contract (shared with the native expressions and the DuckDB
  * oracle): codebooks flatten as `cb[(j·ksub + c)·dsub + i]` — subspace
  * j, codeword c, position i; `cb.length = ksub · dim`.
  *
  * The codebook here is TRAINING-FREE (stride-sampled rows, the
  * [[Similarity.ivfCells]] precedent): deterministic, engine-portable,
  * and exactly the plumbing a k-means-per-subspace upgrade would reuse
  * ([[Similarity.kmeansCentroids]] on each subvector frame — not on the
  * oracled path for the same iterative-float-means reason documented
  * there). All distances are exact integer squared-L2 over quantized
  * longs, so codes AND ADC scores hash-match across engines.
  *
  * Scale shape: the codebook is a driver-side model of ksub·dim longs
  * (bounded, like any centroid set); encoding is map-side native
  * codegen over N rows — no shuffle; scoring broadcasts the |Q| query
  * tables and ranks per query through the bounded `top_k_by` aggregate.
  * The corpus crosses one exchange at k rows per partition per query,
  * never an N×C expansion or a single-task per-query sort.
  */
object Pq {

  /** Training-free codebook: codeword c of EVERY subspace comes from
    * the row with id = c·stride (c < ksub) — a deterministic "sample"
    * of the corpus. Collects ksub·dim longs to the driver (a bounded
    * model). Fails loudly if any sampled id is missing. */
  def strideCodebook(prepped: DataFrame, stride: Int, ksub: Int, m: Int): Array[Long] = {
    require(stride > 0 && ksub > 0 && m > 0, s"bad stride=$stride ksub=$ksub m=$m")
    val rows = prepped
      .filter(col("id") % stride === 0 && col("id") < stride.toLong * ksub)
      .orderBy("id").select("q").collect()
    require(rows.length == ksub,
      s"strideCodebook: expected $ksub codeword rows (ids 0, $stride, ...), found ${rows.length}")
    val vecs = rows.map(_.getSeq[Long](0).toArray)
    val dim = vecs.head.length
    require(vecs.forall(_.length == dim), "strideCodebook: ragged vectors")
    require(dim % m == 0, s"strideCodebook: dim=$dim not divisible by m=$m")
    val dsub = dim / m
    val cb = new Array[Long](ksub * dim)
    for (j <- 0 until m; c <- 0 until ksub; i <- 0 until dsub)
      cb((j * ksub + c) * dsub + i) = vecs(c)(j * dsub + i)
    cb
  }

  /** Map-side encode via the native codegen'd
    * [[graft.expressions.PqEncode]]: array<bigint> → array<int> of m
    * codeword indices. The codebook rides the plan as a literal —
    * right while it is KBs (ksub=16 × dim=8 here); for a production
    * codebook (ksub=256, dim=1024 → 2 MB of longs) use
    * [[encodeBroadcast]] so the model ships once per executor instead
    * of inside every serialized task. */
  def encode(vec: Column, cb: Array[Long], m: Int): Column =
    call_function("pq_encode", vec, typedLit(cb.toSeq), lit(m))

  /** [[encode]] with the codebook delivered as a
    * [[graft.expressions.BroadcastRef]] — same native expression, same
    * codes (spec-pinned byte-identical), but the plan carries a
    * broadcast handle instead of ksub·dim literal longs. */
  def encodeBroadcast(vec: Column, cb: org.apache.spark.broadcast.Broadcast[Array[Long]],
                      m: Int): Column =
    call_function("pq_encode", vec,
      graft.expressions.BroadcastRef.column(
        cb, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
      lit(m))

  /** TRAINED codebook: Lloyd refinement of an initial codebook (use
    * [[strideCodebook]] — deterministic init, so the trained book is
    * reproducible with no RNG) under the squared-L2 objective PQ
    * actually optimizes. All m subspaces train in ONE job per round:
    *
    *   assign: the native `pq_encode` against the current codebook
    *           gives every row its m codeword assignments map-side;
    *   update: `posexplode` splits each vector into (subspace j,
    *           position i, value) and a hash aggregate means the values
    *           per (j, assigned codeword, i) — map-side combine
    *           collapses each partition to ≤ m·ksub·dsub = ksub·dim
    *           partial rows before the exchange, the same bounded-state
    *           shape as [[Similarity.kmeansCentroids]]'s update.
    *
    * Driver state is the ksub·dim-long codebook per round (bounded
    * model, never rows). Means round half-up back to the quantized
    * integer domain, so encode/ADC stay exact-integer; empty cells keep
    * their previous codeword (the k-means convention). Not on the
    * oracled path — iterative means are not portable SQL; the spec
    * contract is monotone distortion vs the stride init and planted-
    * cluster recall ([[graft.PqSpec]]). */
  def trainedCodebook(prepped: DataFrame, init: Array[Long], m: Int, ksub: Int,
                      iters: Int = 5): Array[Long] = {
    graft.GraftFunctions.ensure(prepped.sparkSession)
    require(m > 0 && ksub > 0 && iters >= 0, s"trainedCodebook: bad m=$m ksub=$ksub iters=$iters")
    require(init.length % ksub == 0 && (init.length / ksub) % m == 0,
      s"trainedCodebook: init of ${init.length} is not ksub=$ksub codewords of dim divisible by m=$m")
    val dim = init.length / ksub
    val dsub = dim / m
    var cb = init.clone()
    for (_ <- 0 until iters) {
      val means = prepped
        .select(col("q"), encode(col("q"), cb, m).as("codes"))
        .select(col("codes"), posexplode(col("q")))
        .select((col("pos") / dsub).cast("int").as("j"), pmod(col("pos"), lit(dsub)).as("i"),
          element_at(col("codes"), (col("pos") / dsub).cast("int") + 1).as("c"), col("col").as("v"))
        .groupBy("j", "c", "i").agg(avg(col("v")).as("mean"))
        .collect()
      val next = cb.clone() // empty cells keep their previous codeword
      means.foreach { r =>
        val (j, c, i) = (r.getInt(0), r.getInt(1), r.getInt(2))
        next((j * ksub + c) * dsub + i) = math.floor(r.getDouble(3) + 0.5).toLong
      }
      cb = next
    }
    cb
  }

  /** Mean squared-L2 quantization error of `prepped` under a codebook —
    * the objective [[trainedCodebook]] minimizes (ADC distance of each
    * row to its own code is exactly ‖v − reconstruction‖²). */
  def distortion(prepped: DataFrame, cb: Array[Long], m: Int, ksub: Int): Double = {
    graft.GraftFunctions.ensure(prepped.sparkSession)
    prepped
      .select(adc(encode(col("q"), cb, m), adcTable(col("q"), cb, m, ksub)).as("d"))
      .agg(avg(col("d"))).head().getDouble(0)
  }

  /** Residual frame for IVFADC: each vector minus its cell's centroid,
    * returned AS the `q` column of (id, cell, q) so every codebook
    * builder ([[strideCodebook]], [[trainedCodebook]]) and encode path
    * composes on residuals unchanged. Stride centroids are themselves
    * quantized integer vectors, so residuals stay exact longs — the
    * reason the residual upgrade keeps the hash-stable integer story. */
  def residuals(cells: DataFrame, cents: DataFrame): DataFrame =
    cells.join(broadcast(cents.select(col("cent_id").as("cell"), col("cq"))), Seq("cell"))
      .select(col("id"), col("cell"),
        zip_with(col("q"), col("cq"), (a, b) => a - b).as("q"))

  /** Residual IVF-PQ (the IVFADC composition of Jégou et al.): IVF
    * prunes WHERE (each query searches its own cell), PQ codes quantize
    * the RESIDUAL vec − centroid — residuals cluster tightly around
    * zero, so the same ksub codewords spend their resolution on the
    * within-cell geometry instead of re-describing the coarse grid
    * (spec pins residual distortion ≤ raw distortion on clustered
    * data). `cb` must be trained/sampled on [[residuals]] of the same
    * (cells, cents). nprobe=1 by construction: a query's residual is
    * defined against its OWN cell's centroid; multi-probe would need a
    * per-(query, probed-cell) residual — the documented upgrade, same
    * plumbing with the probe join of [[Similarity.ivfTopKProbe]]. */
  def topKAdcResidual(cells: DataFrame, cents: DataFrame, cb: Array[Long],
                      queryIds: Column => Column, k: Int, m: Int, ksub: Int): DataFrame = {
    val res = residuals(cells, cents)
    val coded = res.select(col("id"), col("cell"), encode(col("q"), cb, m).as("codes"))
    val qs = res.filter(queryIds(col("id")))
      .select(col("id").as("query_id"), col("cell"), adcTable(col("q"), cb, m, ksub).as("tbl"))
    topKAdc(coded, qs, k, using = Seq("cell"))
  }

  /** Multi-probe residual IVF-PQ — [[topKAdcResidual]] with the
    * recall knob: each query searches its `nprobe` NEAREST cells (by
    * the same quantized-cosine + tie rule as
    * [[Similarity.ivfTopKProbe]], so nprobe=1 reproduces
    * [[topKAdcResidual]] exactly — spec-pinned). The residual is
    * per-(query, probed cell): rebuilt against THAT cell's centroid, so
    * every ADC score estimates the same true ‖q − x‖² and scores are
    * comparable across cells (the IVFADC invariant that makes
    * multi-probe sound). A corpus vector lives in exactly one cell, so
    * no (query, neighbor) pair is scored twice.
    *
    * Plan shape: query→cells rides the bounded `top_k_by` aggregate
    * over broadcast centroids (|Q|-row exchange); the nprobe-row-per-
    * query probe frame re-joins broadcast centroids to recover the
    * centroid VECTOR (top_k_by carries only the id — the payload stays
    * a Long on purpose), builds nprobe residual tables per query, and
    * broadcasts into the coded corpus; ranking is the global bounded
    * top-k. The corpus crosses one aggregate exchange at k rows per
    * partition per query — never a per-query sort. */
  def topKAdcResidualProbe(cells: DataFrame, cents: DataFrame, cb: Array[Long],
                           queryIds: Column => Column, k: Int, nprobe: Int,
                           m: Int, ksub: Int): DataFrame = {
    require(nprobe > 0, s"topKAdcResidualProbe: nprobe must be positive, got $nprobe")
    require(cb.length % ksub == 0 && (cb.length / ksub) % m == 0,
      s"topKAdcResidualProbe: codebook of ${cb.length} is not ksub=$ksub codewords " +
        s"of dim divisible by m=$m")
    graft.GraftFunctions.ensure(cells.sparkSession)
    val coded = residuals(cells, cents)
      .select(col("id"), col("cell"), encode(col("q"), cb, m).as("codes"))
    val queries = cells.filter(queryIds(col("id")))
      .select(col("id").as("query_id"), col("q").as("qq"), col("norm").as("qnorm"))
    val probed = queries.join(broadcast(cents))
      .select(col("query_id"), col("qq"), col("qnorm"), col("cent_id"),
        (Similarity.dotQ(col("qq"), col("cq")).cast("double") /
          (col("qnorm") * col("cnorm"))).as("ccos"))
      .groupBy(col("query_id"), col("qq"))
      .agg(call_function("top_k_by", col("ccos"), col("cent_id"), lit(nprobe)).as("top"))
      .select(col("query_id"), col("qq"), explode(col("top")).as("tc"))
      .select(col("query_id"), col("qq"), col("tc").getField("payload").as("cell"))
    val qs = probed.join(broadcast(cents.select(col("cent_id").as("cell"), col("cq"))), Seq("cell"))
      .select(col("query_id"), col("cell"),
        adcTableCore(zip_with(col("qq"), col("cq"), (a, b) => a - b),
          typedLit(cb.toSeq), cb.length, m, ksub).as("tbl"))
    topKAdc(coded, qs, k, using = Seq("cell"))
  }

  /** Query-side ADC table: the query's exact integer squared-L2 to
    * every codeword, flattened in the codebook layout. HOF spelling on
    * purpose — it runs on |Q| rows only, and the lambdas index the row
    * array and a literal (bounded ksub·dim work per row; NOT the
    * data-dependent lambda re-evaluation of the q_text_repetition
    * lesson, which is why this one may stay interpreted). */
  def adcTable(vec: Column, cb: Array[Long], m: Int, ksub: Int): Column = {
    require(cb.length % ksub == 0 && (cb.length / ksub) % m == 0,
      s"adcTable: codebook of ${cb.length} is not ksub=$ksub codewords of dim divisible by m=$m")
    adcTableCore(vec, typedLit(cb.toSeq), cb.length, m, ksub)
  }

  /** [[adcTable]] with the codebook on the broadcast bus (see
    * [[encodeBroadcast]]) — the query side is |Q| rows so the per-row
    * cost is identical; what shrinks is the serialized plan. */
  def adcTableBroadcast(vec: Column, cbB: org.apache.spark.broadcast.Broadcast[Array[Long]],
                        m: Int, ksub: Int): Column = {
    val len = cbB.value.length // driver-local read of the broadcast
    require(len % ksub == 0 && (len / ksub) % m == 0,
      s"adcTable: codebook of $len is not ksub=$ksub codewords of dim divisible by m=$m")
    adcTableCore(vec,
      graft.expressions.BroadcastRef.column(
        cbB, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
      len, m, ksub)
  }

  private def adcTableCore(vec: Column, cbCol: Column, cbLen: Int, m: Int, ksub: Int): Column = {
    val dim = cbLen / ksub
    val dsub = dim / m
    flatten(transform(sequence(lit(0), lit(m - 1)), j =>
      transform(sequence(lit(0), lit(ksub - 1)), c =>
        aggregate(sequence(lit(0), lit(dsub - 1)), lit(0L), (acc, p) => {
          val d = element_at(vec, j * dsub + p + 1) -
            element_at(cbCol, (j * ksub + c) * dsub + p + 1)
          acc + d * d
        }))))
  }

  /** Asymmetric-distance score via the native codegen'd
    * [[graft.expressions.PqAdc]]. */
  def adc(codes: Column, table: Column): Column =
    call_function("pq_adc", codes, table)

  /** Top-k by ADC distance: `codes` (id, codes, [bucket cols]) ×
    * broadcast `queries` (query_id, tbl, [bucket cols]), scored by the
    * native lookup, ranked per query (ascending distance, ties to the
    * lower neighbor id). With `using` empty every query scans the whole
    * encoded corpus (flat PQ); with `using = Seq("cell")` scoring is
    * confined to shared IVF cells — the IVF-PQ composition, where IVF
    * prunes WHERE to search and PQ shrinks WHAT is scored.
    *
    * Ranking rides the native bounded `top_k_by` aggregate on the
    * NEGATED distance (descending −adist = ascending adist; long
    * negation is exact, unlike a >2⁵³ double cast), so the encoded
    * corpus crosses the one per-query aggregate exchange at k rows per
    * partition per query — never a single-task per-query window sort. */
  def topKAdc(codes: DataFrame, queries: DataFrame, k: Int,
              using: Seq[String] = Nil): DataFrame = {
    graft.GraftFunctions.ensure(codes.sparkSession)
    val joined = (if (using.isEmpty) codes.join(broadcast(queries), col("id") =!= col("query_id"))
                  else codes.join(broadcast(queries), using).filter(col("id") =!= col("query_id")))
      .select(col("query_id"), col("id").as("neighbor_id"),
        adc(col("codes"), col("tbl")).as("adist"))
    joined.groupBy("query_id")
      .agg(call_function("top_k_by", -col("adist"), col("neighbor_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.payload").as("neighbor_id"),
        (col("pos") + 1).as("rk"), (-col("col.score")).as("adist"))
  }
}
