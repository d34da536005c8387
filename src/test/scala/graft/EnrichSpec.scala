package graft

import graft.operators._
import graft.queries.{ReviewScorer, SentimentScorer}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The enrichment operator's semantics on literal frames (SURVEY.md §2.9,
  * §5.2): batch unity of failure, null-fill vs drop, short tail batches,
  * retry recovery, id-multiset preservation, J1 vs J3 merge. */
class EnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n items, item_id 1..n, signal = even id. */
  private def items(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, i % 2 == 0)).toDF("item_id", "signal")

  private def sentiments(df: DataFrame): Map[Long, Option[Boolean]] =
    df.collect().map { r =>
      r.getAs[Long]("item_id") ->
        (if (r.isNullAt(r.fieldIndex("sentiment"))) None else Some(r.getAs[Boolean]("sentiment")))
    }.toMap

  test("happy path: every item scored with the signal value") {
    val out = Enrich.enrich(items(10),
      SentimentScorer("signal", failEvery = 0, flakyEvery = 0),
      EnrichConfig(batchSize = 5))
    val s = sentiments(out)
    assert(s.size == 10)
    assert((1 to 10).forall(i => s(i.toLong).contains(i % 2 == 0)))
  }

  test("null-fill: a failed batch emits ALL its rows with null output (batch unity)") {
    // batchSize 5, failEvery 2 → batches 1 and 3 (ids 6-10, 16-20) fail
    val out = Enrich.enrich(items(20),
      SentimentScorer("signal", failEvery = 2, flakyEvery = 0),
      EnrichConfig(batchSize = 5))
    val s = sentiments(out)
    assert(s.size == 20)
    val nullIds = s.collect { case (id, None) => id }.toSet
    assert(nullIds == ((6L to 10L) ++ (16L to 20L)).toSet)
  }

  test("drop: a failed batch emits nothing (Go semantics, J3)") {
    val out = Enrich.enrich(items(20),
      SentimentScorer("signal", failEvery = 2, flakyEvery = 0),
      EnrichConfig(batchSize = 5, onFailure = FailureMode.Drop))
    val s = sentiments(out)
    assert(s.keySet == ((1L to 5L) ++ (11L to 15L)).toSet)
    assert(s.values.forall(_.isDefined))
  }

  test("short tail batch (n % batchSize != 0) is scored, not rejected (tools.py:30-48)") {
    val out = Enrich.enrich(items(7),
      SentimentScorer("signal", failEvery = 0, flakyEvery = 0),
      EnrichConfig(batchSize = 5))
    assert(sentiments(out).size == 7)
  }

  test("short tail batch still fails as a unit") {
    // 7 items, batch 5 → tail = batch id 1; failEvery 2 → tail fails
    val out = Enrich.enrich(items(7),
      SentimentScorer("signal", failEvery = 2, flakyEvery = 0),
      EnrichConfig(batchSize = 5))
    val s = sentiments(out)
    assert(s.collect { case (id, None) => id }.toSet == Set(6L, 7L))
  }

  test("retry: first-attempt failures recover within 3 attempts") {
    // flakyEvery=1, flakyMod=0 → EVERY batch fails attempt 1
    val out = Enrich.enrich(items(10),
      SentimentScorer("signal", failEvery = 0, flakyEvery = 1, flakyMod = 0),
      EnrichConfig(batchSize = 5, retries = 3))
    assert(sentiments(out).values.forall(_.isDefined))
  }

  test("retry exhaustion: retries=0 means one attempt only, flaky batches null-fill") {
    val out = Enrich.enrich(items(10),
      SentimentScorer("signal", failEvery = 0, flakyEvery = 1, flakyMod = 0),
      EnrichConfig(batchSize = 5, retries = 0))
    assert(sentiments(out).values.forall(_.isEmpty))
  }

  test("retries=1 means ONE retry after the initial attempt (reference shape)") {
    // first-attempt-only failures must recover with a single retry
    val out = Enrich.enrich(items(10),
      SentimentScorer("signal", failEvery = 0, flakyEvery = 1, flakyMod = 0),
      EnrichConfig(batchSize = 5, retries = 1))
    assert(sentiments(out).values.forall(_.isDefined))
  }

  test("id multiset preserved under null-fill across many batches") {
    val n = 137 // deliberately not a multiple of the batch size
    val out = Enrich.enrich(items(n),
      SentimentScorer("signal", failEvery = 3, flakyEvery = 0),
      EnrichConfig(batchSize = 25))
    assert(out.collect().map(_.getAs[Long]("item_id")).sorted.toSeq == (1L to n.toLong))
  }

  test("J1 merge keeps unscored rows (left), J3 mergeDrop drops them (inner)") {
    val base = items(10)
    val analysis = Enrich.enrich(base,
      SentimentScorer("signal", failEvery = 2, flakyEvery = 0),
      EnrichConfig(batchSize = 5, onFailure = FailureMode.Drop))
    assert(Enrich.merge(base, analysis).count() == 10)
    assert(Enrich.mergeDrop(base, analysis).count() == 5)
  }

  test("a hung scorer degrades to the failure mode — it must not fail the task") {
    val out = Enrich.enrich(items(5), HangingScorer,
      EnrichConfig(batchSize = 5, retries = 1,
        timeout = scala.concurrent.duration.Duration("200ms")))
    // backstop fires (~retries*timeout+5s) and null-fills the batch
    assert(sentiments(out).values.forall(_.isEmpty))
  }

  test("a scorer that THROWS (instead of returning Failure) is caught and null-filled") {
    val out = Enrich.enrich(items(5), ThrowingScorer, EnrichConfig(batchSize = 5))
    assert(sentiments(out).values.forall(_.isEmpty))
  }

  test("id-echo contract: foreign ids degrade the batch to its failure mode") {
    val out = Enrich.enrich(items(5), ForeignIdScorer, EnrichConfig(batchSize = 5))
    assert(sentiments(out) == (1L to 5L).map(_ -> None).toMap)
  }

  test("id-echo contract: duplicate ids degrade the batch to its failure mode") {
    val out = Enrich.enrich(items(5), DuplicateIdScorer, EnrichConfig(batchSize = 5))
    assert(sentiments(out) == (1L to 5L).map(_ -> None).toMap)
  }

  test("id-echo contract: a short (partial) response is a violation outside Requeue mode") {
    val out = Enrich.enrich(items(6),
      graft.queries.PartialScorer("signal", dropMod = 3, failEvery = 0),
      EnrichConfig(batchSize = 6, retries = 0)) // NullFill mode, no retry
    // attempt 1 answers 4 of 6 → contract violation → whole batch null
    assert(sentiments(out).values.forall(_.isEmpty))
  }

  test("id-echo contract violations are retried before degrading") {
    // PartialScorer answers everything from attempt 2 on: with a retry
    // budget the short first response must recover to a full batch.
    val out = Enrich.enrich(items(6),
      graft.queries.PartialScorer("signal", dropMod = 3, failEvery = 0),
      EnrichConfig(batchSize = 6, retries = 1))
    assert(sentiments(out).values.forall(_.isDefined))
  }

  test("requeue: attempt 2 receives EXACTLY the missing ids; partials merge") {
    RecordingPartialScorer.sent.clear()
    val out = Enrich.enrich(items(10), RecordingPartialScorer,
      EnrichConfig(batchSize = 10, onFailure = FailureMode.Requeue))
    val s = sentiments(out)
    assert(s.size == 10 && s.values.forall(_.isDefined))
    assert((1 to 10).forall(i => s(i.toLong).contains(i % 2 == 0)))
    // the anti-join: attempt 1 saw all 10 ids, attempt 2 only 3,6,9
    assert(RecordingPartialScorer.sent.get(1).map(_.sorted).contains((1L to 10L).toList))
    assert(RecordingPartialScorer.sent.get(2).map(_.sorted).contains(List(3L, 6L, 9L)))
  }

  test("requeue: ids never answered within the retry budget are null-filled per row") {
    // drops ids % 3 == 0 on EVERY attempt (dropAlways) → only those stay null
    val out = Enrich.enrich(items(10), AlwaysDroppingScorer,
      EnrichConfig(batchSize = 10, onFailure = FailureMode.Requeue))
    val s = sentiments(out)
    assert(s.size == 10)
    assert(s.collect { case (id, None) => id }.toSet == Set(3L, 6L, 9L))
  }

  test("requeue: a batch that perma-fails every attempt null-fills whole") {
    val out = Enrich.enrich(items(5),
      graft.queries.PartialScorer("signal", dropMod = 3, failEvery = 1),
      EnrichConfig(batchSize = 5, onFailure = FailureMode.Requeue))
    assert(sentiments(out).values.forall(_.isEmpty))
  }

  test("Go-shaped review scorer emits classification + review strings") {
    val out = Enrich.enrich(items(5),
      ReviewScorer("signal", failEvery = 0),
      EnrichConfig(batchSize = 5))
    val rows = out.collect().map(r => r.getAs[Long]("item_id") ->
      (r.getAs[String]("classification"), r.getAs[String]("review"))).toMap
    assert(rows(2L) == (("positive", "review : positive item 2")))
    assert(rows(3L) == (("negative", "review : negative item 3")))
  }

  /** The fused pass must be indistinguishable from the two-operator
    * spelling it replaces, in every failure mode — including a payload
    * column the scorer never reads. */
  private def carriedItems(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, i % 2 == 0, s"payload_$i")).toDF("item_id", "signal", "extra")

  private def asMaps(df: DataFrame): Set[Map[String, Any]] =
    df.collect().map(r =>
      r.schema.fieldNames.map(f => f -> r.get(r.fieldIndex(f))).toMap).toSet

  test("enrichCarry == merge(items, enrich(items)) under NullFill") {
    val src = carriedItems(40)
    val cfg = EnrichConfig(batchSize = 5)
    val scorer = SentimentScorer("signal", failEvery = 2, flakyEvery = 3, flakyMod = 0)
    val fused = Enrich.enrichCarry(src, scorer, cfg)
    val joined = Enrich.merge(src, Enrich.enrich(src.select("item_id", "signal"), scorer, cfg))
      .select(fused.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(asMaps(fused) == asMaps(joined))
  }

  test("enrichCarry == mergeDrop(items, enrich(items)) under Drop") {
    val src = carriedItems(40)
    val cfg = EnrichConfig(batchSize = 5, onFailure = FailureMode.Drop)
    val scorer = SentimentScorer("signal", failEvery = 2, flakyEvery = 0)
    val fused = Enrich.enrichCarry(src, scorer, cfg)
    val joined = Enrich.mergeDrop(src, Enrich.enrich(src.select("item_id", "signal"), scorer, cfg))
      .select(fused.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(asMaps(fused) == asMaps(joined))
    // failed batches' rows are GONE, not null-filled: 8 batches of 5,
    // failEvery=2 fails the 4 odd bids → 20 of 40 rows survive
    assert(fused.count() == 20)
  }

  test("enrichCarry under Requeue: partial echoes merge, leftovers null-fill per row") {
    val src = carriedItems(40)
    val cfg = EnrichConfig(batchSize = 5, onFailure = FailureMode.Requeue)
    val scorer = graft.queries.PartialScorer("signal", dropMod = 3, failEvery = 2)
    val fused = Enrich.enrichCarry(src, scorer, cfg)
    val joined = Enrich.merge(src, Enrich.enrich(src.select("item_id", "signal"), scorer, cfg))
      .select(fused.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(asMaps(fused) == asMaps(joined))
  }
}

/** Echoes an id that is not in the batch (the reference's schema
  * validation rejects this — `models_schema.py:16-22`). */
object ForeignIdScorer extends Scorer {
  val outputFields = Seq(org.apache.spark.sql.types.StructField(
    "sentiment", org.apache.spark.sql.types.BooleanType, nullable = true))
  def score(bid: Long, batch: Seq[org.apache.spark.sql.Row], attempt: Int): scala.util.Try[Seq[(Long, Seq[Any])]] =
    scala.util.Success(batch.indices.map(i => (999000L + i, Seq[Any](true))))
}

/** Echoes the first id twice (and drops the last), keeping the count right. */
object DuplicateIdScorer extends Scorer {
  val outputFields = Seq(org.apache.spark.sql.types.StructField(
    "sentiment", org.apache.spark.sql.types.BooleanType, nullable = true))
  def score(bid: Long, batch: Seq[org.apache.spark.sql.Row], attempt: Int): scala.util.Try[Seq[(Long, Seq[Any])]] = {
    val first = batch.head.getLong(batch.head.fieldIndex("item_id"))
    scala.util.Success(batch.indices.map(_ => (first, Seq[Any](true))))
  }
}

/** Requeue probe: drops ids % 3 == 0 on attempt 1 only, and records the
  * id set each attempt received (local-mode static — executors share the
  * JVM in tests). */
object RecordingPartialScorer extends Scorer {
  val sent = new scala.collection.concurrent.TrieMap[Int, List[Long]]()
  val outputFields = Seq(org.apache.spark.sql.types.StructField(
    "sentiment", org.apache.spark.sql.types.BooleanType, nullable = true))
  def score(bid: Long, batch: Seq[org.apache.spark.sql.Row], attempt: Int): scala.util.Try[Seq[(Long, Seq[Any])]] = {
    val ids = batch.map(r => r.getLong(r.fieldIndex("item_id"))).toList
    sent.put(attempt, ids)
    scala.util.Success(batch
      .filter(r => attempt > 1 || r.getLong(r.fieldIndex("item_id")) % 3 != 0)
      .map(r => (r.getLong(r.fieldIndex("item_id")), Seq[Any](r.getAs[Boolean]("signal")))))
  }
}

/** Drops ids % 3 == 0 on EVERY attempt — requeue can never finish them. */
object AlwaysDroppingScorer extends Scorer {
  val outputFields = Seq(org.apache.spark.sql.types.StructField(
    "sentiment", org.apache.spark.sql.types.BooleanType, nullable = true))
  def score(bid: Long, batch: Seq[org.apache.spark.sql.Row], attempt: Int): scala.util.Try[Seq[(Long, Seq[Any])]] =
    scala.util.Success(batch
      .filter(r => r.getLong(r.fieldIndex("item_id")) % 3 != 0)
      .map(r => (r.getLong(r.fieldIndex("item_id")), Seq[Any](r.getAs[Boolean]("signal")))))
}

/** Simulates a model call that hangs instead of raising. */
object HangingScorer extends Scorer {
  val outputFields = Seq(org.apache.spark.sql.types.StructField(
    "sentiment", org.apache.spark.sql.types.BooleanType, nullable = true))
  def score(bid: Long, batch: Seq[org.apache.spark.sql.Row], attempt: Int): scala.util.Try[Seq[(Long, Seq[Any])]] = {
    Thread.sleep(60000); scala.util.Success(Seq.empty)
  }
}

/** Simulates a scorer that throws instead of returning Failure. */
object ThrowingScorer extends Scorer {
  val outputFields = Seq(org.apache.spark.sql.types.StructField(
    "sentiment", org.apache.spark.sql.types.BooleanType, nullable = true))
  def score(bid: Long, batch: Seq[org.apache.spark.sql.Row], attempt: Int): scala.util.Try[Seq[(Long, Seq[Any])]] =
    throw new IllegalStateException("model client blew up")
}
