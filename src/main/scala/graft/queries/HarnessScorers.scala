package graft.queries

import graft.operators.Scorer
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.util.{Failure, Success, Try}

/** Deterministic stand-ins for the reference's LLM scorers, so the whole
  * enrichment operator (batching, waves, retry, null-fill/drop) sits on
  * the DuckDB-oracled path (SURVEY.md §7.4, FIXTURES.md §3).
  *
  * The "model" reads a precomputed boolean `signal` column from its input
  * rows — the SQL mirror of the signal is therefore the SQL mirror of a
  * successful score. Failure injection is keyed on the global batch id
  * the operator passes in:
  *  - `bid % failEvery == failEvery-1` → fails EVERY attempt
  *    (perma-failure → null-fill / drop, `data_transformer.py:100-109`);
  *  - `bid % flakyEvery == flakyMod` → fails the first attempt only, so
  *    the retry loop (`enricher.go:89-121`) must save it; any retry bug
  *    surfaces as a correctness mismatch, not just a test failure.
  */
private object ScorerRules {
  def shouldPermaFail(bid: Long, failEvery: Int): Boolean =
    failEvery > 0 && bid % failEvery == failEvery - 1

  def shouldFlake(bid: Long, attempt: Int, flakyEvery: Int, flakyMod: Int): Boolean =
    flakyEvery > 0 && bid % flakyEvery == flakyMod && attempt == 1
}

/** ETL-shaped sentiment scorer: {item_id, sentiment: bool}
  * (`models_schema.py:5-13`). */
final case class SentimentScorer(
    signalCol: String,
    failEvery: Int = 10,
    flakyEvery: Int = 7,
    flakyMod: Int = 3) extends Scorer {
  import ScorerRules._
  val outputFields: Seq[StructField] = Seq(StructField("sentiment", BooleanType, nullable = true))
  def score(bid: Long, batch: Seq[Row], attempt: Int): Try[Seq[(Long, Seq[Any])]] =
    if (shouldPermaFail(bid, failEvery))
      Failure(new RuntimeException(s"batch $bid permanently failed"))
    else if (shouldFlake(bid, attempt, flakyEvery, flakyMod))
      Failure(new RuntimeException(s"batch $bid transient failure, attempt $attempt"))
    else
      Success(batch.map(r =>
        (r.getAs[Long]("item_id"), Seq[Any](r.getAs[Boolean](signalCol)))))
}

/** Partial-response scorer for [[graft.operators.FailureMode.Requeue]]:
  * attempt 1 answers only the items whose id is NOT divisible by
  * `dropMod` (the reference's short-LLM-response shape —
  * `llama_cpp_client.py:102-110` re-queues exactly the missing ids);
  * attempts ≥ 2 answer everything they are sent. Perma-fail batches
  * (`bid % failEvery == failEvery-1`) fail whole on every attempt, so
  * their rows exercise the straggler null-fill. */
final case class PartialScorer(
    signalCol: String,
    dropMod: Int = 3,
    failEvery: Int = 10) extends Scorer {
  import ScorerRules._
  val outputFields: Seq[StructField] = Seq(StructField("sentiment", BooleanType, nullable = true))
  def score(bid: Long, batch: Seq[Row], attempt: Int): Try[Seq[(Long, Seq[Any])]] =
    if (shouldPermaFail(bid, failEvery))
      Failure(new RuntimeException(s"batch $bid permanently failed"))
    else
      Success(batch
        .filter(r => attempt > 1 || r.getAs[Long]("item_id") % dropMod != 0)
        .map(r => (r.getAs[Long]("item_id"), Seq[Any](r.getAs[Boolean](signalCol)))))
}

/** Go-shaped review scorer: {item_id, classification, review}
  * (`types.go:30-39`). Strings are deterministic functions of the input
  * so DuckDB can mirror them: classification = positive|negative from the
  * signal; review = "review : <classification> item <item_id>". */
final case class ReviewScorer(
    signalCol: String,
    failEvery: Int = 10) extends Scorer {
  import ScorerRules._
  val outputFields: Seq[StructField] = Seq(
    StructField("classification", StringType, nullable = true),
    StructField("review", StringType, nullable = true))
  def score(bid: Long, batch: Seq[Row], attempt: Int): Try[Seq[(Long, Seq[Any])]] =
    if (shouldPermaFail(bid, failEvery))
      Failure(new RuntimeException(s"batch $bid permanently failed"))
    else
      Success(batch.map { r =>
        val id = r.getAs[Long]("item_id")
        val cls = if (r.getAs[Boolean](signalCol)) "positive" else "negative"
        (id, Seq[Any](cls, s"review : $cls item $id"))
      })
}
