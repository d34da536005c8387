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
