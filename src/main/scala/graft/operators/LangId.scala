package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CORPUS-TRAINED language identification — the fastText-style
  * multi-class linear classifier (Joulin et al. 2016; the lid.176
  * production shape) built from [[QualityClassifier]]'s machinery:
  * hashed char-n-gram occurrence features (the same codegen'd FNV-1a
  * pass, the same `(n, dim)` geometry contract), one per-class
  * scaled-rate weight vector (the Rocchio closed form — one aggregate
  * pass, integer-exact, clone-invariant), prediction by ARGMAX over
  * the class scores with an alphabetical tie-break.
  *
  * This replaces the planted 5-word profile heuristic
  * ([[TextStats.withLangId]], which stays as the cheap screening
  * member) with a model LEARNED from labeled corpus text: training
  * never sees a hand-written profile, only `(text, lang)` rows.
  *
  * Everything integer-exact and engine-replayable: counts are longs,
  * weights are two exact integral divisions
  * (`RateScale·cnt_L(b) div tot_L`), scores are long dot products, so
  * a DuckDB replay of training + scoring lands on the same numbers
  * bit for bit.
  *
  * 100 TB shape: the model is `L · (dim+1)` rows — broadcast
  * everywhere; training is ONE bucket×class-keyed aggregate over the
  * labeled frame (map-side combined; class cardinality is a constant);
  * scoring is one narrow feature pass + the broadcast join + one
  * per-document aggregate. Nothing pairs with anything.
  *
  * Reference scope: beyond-reference (the brief's language-ID
  * surface); published technique only. */
object LangId {

  /** Per-class per-bucket occurrence counts `(lang, b, cnt)` over the
    * labeled frame — the model's additive, persistable state (counts
    * over a corpus equal the bucket-wise sum over any partition of it,
    * the [[QualityClassifier.rateCounts]] discipline). */
  def classCounts(labeled: DataFrame, idCol: Column, textCol: Column,
                  langCol: Column, n: Int, dim: Int): DataFrame = {
    val labels = labeled.filter(textCol.isNotNull)
      .select(idCol.as("id"), langCol.as("lang"))
    QualityClassifier.features(labeled, idCol, textCol, n, dim)
      .join(labels, Seq("id"))
      .groupBy("lang", "b").agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Fold a new label batch's [[classCounts]] into persisted state:
    * (lang, bucket)-wise sums over the full outer join — counts are
    * additive, so incremental training EQUALS direct training over
    * the union (the [[QualityClassifier.mergeRateCounts]] discipline
    * with the class in the key). */
  def mergeClassCounts(state: DataFrame, delta: DataFrame): DataFrame =
    state.join(delta.withColumnRenamed("cnt", "__d"), Seq("lang", "b"), "full_outer")
      .select(col("lang"), col("b"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__d"), lit(0L))).as("cnt"))

  /** The `(lang, b, w)` weight table from a [[classCounts]] state:
    * `w = RateScale·cnt div tot_lang` — each class's per-bucket
    * occurrence RATE as a scaled integer. Rates (not raw counts) make
    * classes with unequal corpus shares comparable under argmax, and
    * the exact division makes the model clone-invariant. */
  def weightsFromCounts(counts: DataFrame,
                        scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val cls = scope.pin(counts)
    val tot = cls.groupBy("lang").agg(sum("cnt").as("__t"))
    cls.join(broadcast(tot), Seq("lang"))
      .select(col("lang"), col("b"),
        expr(s"${QualityClassifier.RateScale} * cnt DIV __t").as("w"))
  }

  /** Train the rate model in one pass: [[classCounts]] →
    * [[weightsFromCounts]]. */
  def trainRates(labeled: DataFrame, idCol: Column, textCol: Column,
                 langCol: Column, n: Int, dim: Int,
                 scope: CacheScope = CacheScope.unmanaged): DataFrame =
    weightsFromCounts(classCounts(labeled, idCol, textCol, langCol, n, dim), scope)

  /** Coverage checks already passed this JVM, keyed by
    * `(frozen artifact path, class list)` — see [[score]].
    * Test-visible: the spec observes the memo directly. */
  private[graft] val coverageChecked =
    new scala.collection.concurrent.TrieMap[(String, String), Boolean]

  /** The scan identity of a PURE file-scan model plan (sorted root
    * paths), when the plan is nothing but a relation under plain
    * column projections — the frozen-artifact shape (`loadModel`,
    * `spark.read.parquet(modelDir)`, a FrameFixture read). A plan
    * carrying any real computation returns None: its content is not
    * pinned by its paths. */
  private def frozenScanKey(weights: DataFrame): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    @annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(es, child) if es.forall(_.isInstanceOf[AttributeReference]) =>
        strip(child)
      case SubqueryAlias(_, child) => strip(child)
      case other => other
    }
    strip(weights.queryExecution.analyzed) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some(fs.location.rootPaths.map(_.toString).sorted.mkString(","))
        case _ => None
      }
      case _ => None
    }
  }

  /** Score `docs` under a trained `(lang, b, w)` table: one row per
    * non-null-text document carrying `score_<lang>` (the long dot
    * product against that class's rate vector) for every language in
    * `langs` (sorted) and `predicted_lang` — the argmax, ties to the
    * alphabetically FIRST language. `langs` must cover the model's
    * classes: a weight row outside it would silently drop from every
    * score, so it fails loudly instead. The coverage check (one
    * model-sized distinct) is MEMOIZED per (frozen-artifact path,
    * class list) when the model plan is a pure file scan — frozen
    * artifact dirs are immutable by contract (FrameFixture,
    * LangIdRouteStream's digest-guarded modelDir), so a stream's
    * per-micro-batch re-read and repeated query builds pay the
    * driver job once per JVM, not per call (ADVICE r17). */
  def score(docs: DataFrame, idCol: Column, textCol: Column,
            weights: DataFrame, langs: Seq[String], n: Int, dim: Int): DataFrame = {
    require(langs.nonEmpty, "LangId.score: langs must be non-empty")
    val ls = langs.sorted
    // Enforce the documented contract (ADVICE r16): the class list must
    // COVER the model — a weight row whose lang is outside `langs` hits
    // no score column and its class silently loses every argmax. The
    // check is one model-sized distinct (L rows), bounded at any scale.
    def checkCoverage(): Boolean = {
      val modelLangs =
        weights.select("lang").distinct().collect().map(_.getString(0)).toSet
      val uncovered = modelLangs -- ls.toSet
      require(uncovered.isEmpty,
        s"LangId.score: model carries class(es) ${uncovered.toSeq.sorted.mkString(", ")} " +
          s"outside langs=[${ls.mkString(", ")}] — their weights would silently " +
          "vanish from every score; pass the model's full class list")
      true
    }
    frozenScanKey(weights) match {
      case Some(k) => coverageChecked.getOrElseUpdate((k, ls.mkString(",")), checkCoverage())
      case None => checkCoverage()
    }
    val feats = QualityClassifier.features(docs, idCol, textCol, n, dim)
    val scoreCols = ls.map(l =>
      sum(when(col("lang") === l, col("w")).otherwise(0L)).as(s"score_$l"))
    val scored = feats.join(broadcast(weights), Seq("b"))
      .groupBy("id")
      .agg(scoreCols.head, scoreCols.tail: _*)
    scored.withColumn("predicted_lang", predictExpr(ls))
  }

  /** The argmax-with-alphabetical-ties column over sorted `score_<l>`
    * columns: lang `l_i` wins iff its score is >= every LATER class's
    * (earlier classes already failed their own check) — the exact
    * CASE chain the oracle SQL generates from the same class list. */
  private def predictExpr(ls: Seq[String]): Column =
    ls.init.zipWithIndex.foldRight(lit(ls.last)) { case ((l, i), rest) =>
      val later = ls.drop(i + 1).map(x => col(s"score_$x"))
      val bestLater =
        if (later.size == 1) later.head else greatest(later: _*)
      when(col(s"score_$l") >= bestLater, l).otherwise(rest)
    }

  /** Interchange stamp for persisted lang-ID models (the
    * [[QualityClassifier.saveModel]] contract with a class column). */
  val Format = "graft.langid-clf"
  val Version = 1

  /** Persist a trained `(lang, b, w)` table:
    * `(format, version, n, dim, lang, b, w)` — geometry travels with
    * the weights (buckets are incomparable across `(n, dim)`). */
  def saveModel(spark: SparkSession, weights: DataFrame, n: Int, dim: Int,
                path: String): Unit =
    weights.select(lit(Format).as("format"), lit(Version).as("version"),
        lit(n).as("n"), lit(dim).as("dim"), col("lang"), col("b"), col("w"))
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Load a [[Format]] artifact under the caller's geometry; fails
    * loudly on foreign format/version/geometry. */
  def loadModel(spark: SparkSession, path: String, n: Int, dim: Int): DataFrame = {
    val df = spark.read.parquet(path)
    require(Set("format", "version", "n", "dim", "lang", "b", "w")
        .subsetOf(df.columns.toSet),
      s"LangId: $path is not a $Format v$Version artifact — columns ${df.columns.toSet}")
    val stamp = df.select("format", "version", "n", "dim").distinct().collect()
    require(stamp.length == 1,
      s"LangId: $path carries ${stamp.length} distinct stamps — corrupt artifact")
    val s = stamp.head
    require(s.getString(0) == Format,
      s"LangId: $path carries format '${s.getString(0)}', expected '$Format' — " +
        "refusing to decode a foreign artifact")
    require(s.getInt(1) == Version,
      s"LangId: $path carries version ${s.getInt(1)}, this engine reads " +
        s"version $Version — upgrade the engine or re-export the model")
    require(s.getInt(2) == n && s.getInt(3) == dim,
      s"LangId: $path was trained under n=${s.getInt(2)} dim=${s.getInt(3)}, " +
        s"probed with n=$n dim=$dim — buckets are incomparable across geometries")
    df.select("lang", "b", "w")
  }
}
