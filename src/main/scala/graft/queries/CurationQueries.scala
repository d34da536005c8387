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
  * perceptron's weights are exact longs, the domain ranking is the
  * md5-prefix order both engines share. */
object CurationQueries extends QueryModule {

  /** Classifier geometry: char-3-gram features hashed into 512 buckets
    * (+1 bias), trained 3 batch-perceptron epochs. The SAME constants
    * feed the Spark plan and the generated oracle SQL. */
  private[graft] val ClfN = 3
  private[graft] val ClfDim = 512
  private[graft] val ClfEpochs = 3

  /** Labeled training view: even-id documents, labeled +1 when the
    * document is reference-domain (`en`) — the GPT-3/CCNet "looks like
    * the reference corpus" classification target. */
  private def labeledView(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"),
        when(col("lang") === "en", 1).otherwise(-1).as("y"))

  /** The trained weight table as a persisted model artifact — the
    * lmModelStore discipline: a production pipeline trains once and
    * scores forever, so the fixture is built once per JVM and every
    * consumer (the train query's output, the scorer, the streaming
    * filter's parity spec) reads the same artifact. */
  private def clfWeightsStore(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark) // fnv_ngrams
    FrameFixture(spark, "quality_clf", sfDir) {
      val labeled = labeledView(spark, sfDir)
      QualityClassifier.train(labeled, col("doc_id"), col("text"), col("y"),
        ClfN, ClfDim, ClfEpochs)
    }
  }

  /** The trained model itself on the oracle gate (q_quality_clf_train):
    * the full `(b, w)` weight table after 3 epochs — DuckDB replays
    * feature hashing, every epoch's misclassified set, and the integer
    * weight algebra; one drifted update anywhere mismatches. */
  def qualityClfTrain(spark: SparkSession, sfDir: String): DataFrame =
    clfWeightsStore(spark, sfDir).orderBy("b")

  /** Every document scored under the trained model (q_quality_clf):
    * one narrow feature pass + a broadcast join against the 513-row
    * weight table — the map-side shape the learned filter has at
    * 100 TB. `keep` is the perceptron decision (score > 0). */
  def qualityClf(spark: SparkSession, sfDir: String): DataFrame =
    QualityClassifier.score(Tables.documents(spark, sfDir),
        col("doc_id"), col("text"), clfWeightsStore(spark, sfDir), ClfN, ClfDim)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_clf_train" -> qualityClfTrain,
    "q_quality_clf" -> qualityClf,
    "q_domain_cap" -> domainCap)

  override def warmFixtures(spark: SparkSession, sfDir: String): Unit = {
    clfWeightsStore(spark, sfDir)
    ()
  }

  /** The classifier replay up to the epoch-[[ClfEpochs]] weight table
    * `w3(b, w)`: FNV-1a-hashed 3-gram occurrences + the bias bucket,
    * the labeled half, epoch 1 from zero weights (everything
    * misclassified), then per epoch the misclassified set under the
    * previous weights and the label-signed occurrence fold. Generated
    * from the SAME constants (and the same FNV fold) as the Spark
    * side. */
  private def clfChainSql: String = {
    val fnv = QualityClassifier.fnvBucketSql("t", "i", ClfN, ClfDim)
    val head =
      s"""docs AS (SELECT doc_id, lower(text) AS t,
         |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
         |  FROM documents WHERE text IS NOT NULL),
         |feat AS (
         |  SELECT doc_id, $fnv AS b FROM (
         |    SELECT doc_id, t, unnest(range(1, len(t) - ${ClfN - 2})) AS i FROM docs)
         |  UNION ALL SELECT doc_id, $ClfDim AS b FROM docs),
         |lab AS (SELECT doc_id, y FROM docs WHERE doc_id % 2 = 0),
         |tf AS (SELECT f.doc_id, f.b, l.y FROM feat f JOIN lab l USING (doc_id)),
         |w1 AS (SELECT b, CAST(SUM(y) AS BIGINT) AS w FROM tf GROUP BY b)""".stripMargin
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
      s"""WITH $clfChainSql
         |SELECT b, w FROM w$ClfEpochs ORDER BY b""".stripMargin,
    "q_quality_clf" ->
      s"""WITH $clfChainSql,
         |sc AS (SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
         |    CAST(SUM(COALESCE(w, 0)) AS BIGINT) AS score
         |  FROM feat f LEFT JOIN w$ClfEpochs USING (b) GROUP BY f.doc_id)
         |SELECT doc_id, n_feats, score,
         |  CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,
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
