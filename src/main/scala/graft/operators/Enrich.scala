package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** §2.9 — the reference's centerpiece: a batch-at-a-time enrichment
  * operator with bounded concurrency, retry, and per-batch failure
  * semantics (`data_transformer.py:91-110`, `enricher.go:89-163`).
  *
  * Shape (all knobs mirror the reference):
  *  - rows are grouped into fixed-size batches of [[EnrichConfig.batchSize]]
  *    (25 — `config.yaml:22`, `tools.py:30-48`) keyed by a *global* batch
  *    id derived from the dense `item_id` (P2), so batch membership is
  *    deterministic and independent of physical partitioning;
  *  - batches are scored in waves of [[EnrichConfig.inflight]] concurrent
  *    calls (4 — `data_transformer.py:91` asyncio.gather,
  *    `enricher.go:144-162` goroutine waves) with a per-batch timeout
  *    (60 s — `data_transformer.py:50`, `enricher.go:20`);
  *  - a failing batch is retried up to [[EnrichConfig.retries]] times
  *    (3 ×, `enricher.go:89-121`), then handled per [[FailureMode]]:
  *    [[FailureMode.NullFill]] emits every row of the batch with null
  *    outputs (the Python ETL, `data_transformer.py:100-109`);
  *    [[FailureMode.Drop]] emits nothing, so the downstream inner join
  *    drops the batch (the Go client, `loader.go:30-62` / J3).
  *
  * Scale design: the input is shuffled once on `batch_id` and sorted
  * within partitions, so each task streams its contiguous batches without
  * materializing the partition; concurrency is per-task (the reference's
  * per-process HTTP window), and total parallelism = tasks × inflight.
  * No driver-side loop, no collect.
  *
  * The scorer is pluggable. Production would put an HTTP client per
  * partition behind [[Scorer]]; the harness uses deterministic scorers
  * whose "model" reads a precomputed `signal` column, so a DuckDB oracle
  * can mirror the whole operator exactly (SURVEY.md §7.4).
  */
trait Scorer extends Serializable {
  /** Fields appended per item (item_id stays the join key). */
  def outputFields: Seq[StructField]
  /** Score one batch (≤ batchSize rows, sorted by item_id) identified by
    * its global `batchId`. Returns one value-sequence per input row,
    * aligned with [[outputFields]], keyed by the row's item_id. A
    * Failure marks the WHOLE batch failed. */
  def score(batchId: Long, batch: Seq[Row], attempt: Int): Try[Seq[(Long, Seq[Any])]]
}

sealed trait FailureMode
object FailureMode {
  /** Python ETL semantics: whole failed batch emitted with null outputs. */
  case object NullFill extends FailureMode
  /** Go client semantics: failed batch dropped (inner-join drop, J3). */
  case object Drop extends FailureMode
  /** Standalone-client semantics (`llama_cpp_client.py:102-110`,
    * `ollama_client.py:87-95`, SURVEY §2.4 → `left_anti`): a response
    * may legally answer only part of the batch; the missing ids — the
    * anti-join of batch ids vs echoed ids — are re-sent on the next
    * attempt, and partial successes merge across attempts. Ids still
    * unanswered after every retry are null-filled. */
  case object Requeue extends FailureMode
}

final case class EnrichConfig(
    batchSize: Int = 25,
    inflight: Int = 4,
    retries: Int = 3,
    timeout: Duration = Duration("60s"),
    onFailure: FailureMode = FailureMode.NullFill)

object Enrich {

  /** Batch id of a 1-based dense item id: floor((item_id-1)/batchSize). */
  def batchId(itemId: org.apache.spark.sql.Column, batchSize: Int): org.apache.spark.sql.Column =
    floor((itemId - 1) / batchSize).cast("long")

  /** Run the enrichment over `items` (must carry a dense `item_id` long
    * column). Returns the analysis frame: (item_id, scorer outputs) — the
    * reference's `analysis_df` (`data_transformer.py:148`). Merge it back
    * with [[merge]] / [[mergeDrop]].
    */
  def enrich(items: DataFrame, scorer: Scorer, cfg: EnrichConfig = EnrichConfig()): DataFrame = {
    val outSchema = StructType(
      StructField("item_id", LongType, nullable = false) +: scorer.outputFields)
    batchPass(items, scorer, cfg, outSchema)((_, scored, _, _) => scored)
  }

  /** Fused enrich + merge: scores batches exactly like [[enrich]] but
    * carries every input column through the batch pass, emitting
    * input-row ++ scorer-outputs directly. Semantically identical to
    * `merge(items, enrich(items.select("item_id", ...), scorer))`
    * ([[FailureMode.NullFill]]/[[FailureMode.Requeue]] → left-merge with
    * null outputs on failed batches) or `mergeDrop(...)`
    * ([[FailureMode.Drop]] → failed batches' rows vanish) — pinned by
    * EnrichSpec. Scale rationale: the two-operator spelling evaluates
    * the `items` plan TWICE (once per join side — Spark does not
    * common-subexpression DataFrame reuse) and pays a sort-merge join
    * on item_id; the fused pass computes the input once, shuffles it
    * once (on batch_id), and joins nothing. Use it whenever the
    * analysis frame itself is not needed downstream.
    */
  def enrichCarry(items: DataFrame, scorer: Scorer, cfg: EnrichConfig = EnrichConfig()): DataFrame = {
    val outSchema = StructType(items.schema.fields ++ scorer.outputFields)
    batchPass(items, scorer, cfg, outSchema) { (batch, scored, itemIdIdx, batchIdIdx) =>
      // scored rows are keyed by the echoed item_id (col 0) and may be
      // partial (Drop: whole failed batch absent) — assemble by lookup,
      // dropping the internal __batch_id column from the carried row
      val byId = scored.iterator.map(r => (r.getLong(0), r)).toMap
      batch.flatMap { r =>
        byId.get(r.getLong(itemIdIdx)).map { s =>
          Row.fromSeq(r.toSeq.patch(batchIdIdx, Nil, 1) ++ s.toSeq.tail)
        }
      }
    }
  }

  /** The shared batch machinery behind [[enrich]] and [[enrichCarry]]:
    * one shuffle on the global batch id, per-task wave-of-`inflight`
    * scoring with the hung-scorer backstop, then `assemble(batch,
    * scoredRows, itemIdIdx, batchIdIdx)` turns each batch's scored rows
    * into output rows. */
  private def batchPass(
      items: DataFrame, scorer: Scorer, cfg: EnrichConfig, outSchema: StructType)(
      assemble: (Seq[Row], Seq[Row], Int, Int) => Seq[Row]): DataFrame = {
    val spark = items.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // withColumn would silently REPLACE a caller's __batch_id and the
    // carry path's row patch would then mis-assemble — reject loudly
    // (the PairEnum/mixByWeights reserved-name rule)
    require(!items.columns.contains("__batch_id"),
      "enrich: column name __batch_id is reserved")
    val withBatch = items.withColumn("__batch_id", batchId(col("item_id"), cfg.batchSize))
    val batchIdIdx = withBatch.schema.fieldIndex("__batch_id")
    val itemIdIdx = withBatch.schema.fieldIndex("item_id")

    val scored = withBatch
      .repartition(n, col("__batch_id"))
      .sortWithinPartitions(col("__batch_id"), col("item_id"))
      .mapPartitions { rows =>
        val batches = chunkByBatch(rows, batchIdIdx)
        // Waves of `inflight` concurrent batch calls, like the
        // reference's asyncio.gather / goroutine waves. Each task gets
        // its own bounded pool so executor threads are never starved.
        // Daemon threads: a short-circuited downstream (limit) may never
        // exhaust the iterator, and a live non-daemon pool would then
        // block JVM shutdown.
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          cfg.inflight,
          (r: Runnable) => { val t = new Thread(r, "graft-enrich"); t.setDaemon(true); t })
        // Per-attempt timeouts belong to the scorer (the reference
        // passes 60 s to its HTTP client, which raises → caught →
        // retried → null-fill). The get() below is the operator-level
        // BACKSTOP for a scorer that hangs instead of raising: the batch
        // degrades to its failure mode — a hung model call must never
        // fail the Spark task — and cancel(true) interrupts the worker
        // so an interrupt-responsive scorer frees its pool thread
        // instead of silently shrinking the in-flight window.
        // Sized at TWO timeouts per attempt: OpenAiCompatScorer bounds
        // an attempt by its deadline plus at most one in-flight socket
        // read (the JDK freezes SO_TIMEOUT when the response stream
        // opens, so a read started just inside the deadline can overrun
        // by up to the frozen timeout — see the scorer's post() note).
        val backstop = cfg.timeout * (2 * (cfg.retries + 1)).toDouble + Duration("5s")
        val out = batches.grouped(cfg.inflight).flatMap { wave =>
          val futs = wave.map { case (bid, batch) =>
            (batch, pool.submit(new java.util.concurrent.Callable[Seq[Row]] {
              def call(): Seq[Row] = scoreWithRetry(bid, batch, itemIdIdx, scorer, cfg)
            }))
          }
          futs.flatMap { case (batch, f) =>
            val scoredRows =
              try f.get(backstop.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
              catch {
                case _: java.util.concurrent.TimeoutException =>
                  f.cancel(true)
                  failureRows(batch, itemIdIdx, scorer, cfg)
                case _: java.util.concurrent.ExecutionException =>
                  // scoreWithRetry wraps scorer calls in Try — defensive only
                  failureRows(batch, itemIdIdx, scorer, cfg)
              }
            assemble(batch, scoredRows, itemIdIdx, batchIdIdx)
          }
        }
        // Close the pool when the (lazy) iterator is exhausted.
        new Iterator[Row] {
          def hasNext: Boolean = { val h = out.hasNext; if (!h) pool.shutdown(); h }
          def next(): Row = out.next()
        }
      }(Encoders.row(outSchema))
    scored.toDF()
  }

  /** J1 — the ETL merge: facts ⟕ analysis on item_id; rows from failed
    * (null-filled) batches keep null outputs (`data_transformer.py:150`). */
  def merge(items: DataFrame, analysis: DataFrame): DataFrame =
    items.join(analysis, Seq("item_id"), "left")

  /** J3 — the Go merge: inner join, unreviewed rows dropped
    * (`loader.go:30-62`). */
  def mergeDrop(items: DataFrame, analysis: DataFrame): DataFrame =
    items.join(analysis, Seq("item_id"), "inner")

  /** Chunk a sorted row iterator into per-batch-id groups without
    * materializing the partition. */
  private def chunkByBatch(rows: Iterator[Row], batchIdIdx: Int): Iterator[(Long, Seq[Row])] =
    new Iterator[(Long, Seq[Row])] {
      private val it = rows.buffered
      def hasNext: Boolean = it.hasNext
      def next(): (Long, Seq[Row]) = {
        val bid = it.head.getLong(batchIdIdx)
        val buf = scala.collection.mutable.ArrayBuffer[Row]()
        while (it.hasNext && it.head.getLong(batchIdIdx) == bid) buf += it.next()
        (bid, buf.toSeq)
      }
    }

  /** The reference's response contract (`models_schema.py:16-22`,
    * `types.go:38` minItems/maxItems): every echoed id must belong to the
    * batch, no id may be echoed twice, and — unless partial responses are
    * legal ([[FailureMode.Requeue]]) — the response must cover the batch
    * exactly. A violating response is converted into a batch FAILURE (it
    * is retried, then degraded to the failure mode) instead of flowing
    * foreign or duplicate keys silently into the merge join. */
  private def validateEcho(
      batch: Seq[Row], itemIdIdx: Int,
      scored: Seq[(Long, Seq[Any])], partialOk: Boolean): Try[Seq[(Long, Seq[Any])]] = {
    val batchIds = batch.map(_.getLong(itemIdIdx)).toSet
    val ids = scored.map(_._1)
    if (ids.exists(!batchIds.contains(_)))
      Failure(new IllegalStateException("scorer echoed ids outside the batch"))
    else if (ids.distinct.size != ids.size)
      Failure(new IllegalStateException("scorer echoed duplicate ids"))
    else if (!partialOk && ids.size != batch.size)
      Failure(new IllegalStateException(
        s"scorer answered ${ids.size} of ${batch.size} items"))
    else Success(scored)
  }

  private def interrupted(r: Try[_]): Boolean =
    Thread.currentThread().isInterrupted ||
      r.failed.toOption.exists(_.isInstanceOf[InterruptedException])

  private def scoreWithRetry(
      bid: Long, batch: Seq[Row], itemIdIdx: Int, scorer: Scorer, cfg: EnrichConfig): Seq[Row] = {
    if (cfg.onFailure == FailureMode.Requeue)
      return scoreRequeue(bid, batch, itemIdIdx, scorer, cfg)
    // attempts = 1 initial + cfg.retries retries (the reference's
    // shape: enricher.go retries up to 3× AFTER the first call). An
    // interrupt (backstop cancel) aborts the loop immediately.
    def once(attempt: Int): Try[Seq[(Long, Seq[Any])]] =
      Try(scorer.score(bid, batch, attempt)).flatten
        .flatMap(validateEcho(batch, itemIdIdx, _, partialOk = false))
    var attempt = 1
    var result = once(attempt)
    while (result.isFailure && attempt <= cfg.retries && !interrupted(result)) {
      attempt += 1
      result = once(attempt)
    }
    result match {
      case Success(scoredItems) =>
        // Key strictly by the echoed item_id (the reference's id
        // contract; its buggy positional fallback is NOT reproduced —
        // SURVEY.md §2.9 "id contract").
        scoredItems.map { case (id, values) => Row.fromSeq(id +: values) }
      case Failure(_) => failureRows(batch, itemIdIdx, scorer, cfg)
    }
  }

  /** [[FailureMode.Requeue]]: each attempt sends only the still-missing
    * rows (the anti-join of batch ids vs ids echoed so far); partial
    * successes accumulate across attempts; leftovers after the final
    * attempt are null-filled (the ETL null contract applied per ROW
    * instead of per batch). */
  private def scoreRequeue(
      bid: Long, batch: Seq[Row], itemIdIdx: Int, scorer: Scorer, cfg: EnrichConfig): Seq[Row] = {
    val acc = scala.collection.mutable.ArrayBuffer[(Long, Seq[Any])]()
    var remaining = batch
    var attempt = 1
    var stop = false
    while (remaining.nonEmpty && attempt <= cfg.retries + 1 && !stop) {
      val result = Try(scorer.score(bid, remaining, attempt)).flatten
        .flatMap(validateEcho(remaining, itemIdIdx, _, partialOk = true))
      result match {
        case Success(scoredItems) =>
          acc ++= scoredItems
          val answered = scoredItems.map(_._1).toSet
          remaining = remaining.filterNot(r => answered(r.getLong(itemIdIdx)))
        case failure => stop = interrupted(failure) // failed attempt: re-send as-is
      }
      attempt += 1
    }
    val nulls = scorer.outputFields.map(_ => null)
    acc.toSeq.map { case (id, values) => Row.fromSeq(id +: values) } ++
      remaining.map(r => Row.fromSeq(r.getLong(itemIdIdx) +: nulls))
  }

  /** The per-batch failure contract: whole-batch null-fill
    * (`data_transformer.py:100-109`) or drop (`enricher.go:118-121`). */
  private def failureRows(
      batch: Seq[Row], itemIdIdx: Int, scorer: Scorer, cfg: EnrichConfig): Seq[Row] =
    cfg.onFailure match {
      case FailureMode.NullFill | FailureMode.Requeue =>
        // Requeue reaches here only via the hung-scorer backstop in
        // enrich(); its per-row leftovers are null-filled, so a whole
        // hung batch degrades the same way.
        val nulls = scorer.outputFields.map(_ => null)
        batch.map(r => Row.fromSeq(r.getLong(itemIdIdx) +: nulls))
      case FailureMode.Drop => Seq.empty
    }
}
