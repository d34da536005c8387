package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing on the oracled path: documents' text bytes play
  * the opaque media payload (ASCII, so byte positions == character
  * positions and DuckDB can mirror the stub decoder exactly). The
  * queries run the REAL [[Multimodal.HeaderDecoder]]: text payloads
  * are not PNG/JPEG containers, so every row takes its documented
  * stub fallback — real image bytes would get real dimensions through
  * the same plan (MultimodalSpec covers that path with synthesized
  * headers). */
object MediaQueries extends QueryModule {

  private def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("media"))

  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.extractFeatures(mediaTable(spark, sfDir), Multimodal.HeaderDecoder, batchSize = 16)
      .toDF()
      .orderBy("media_id")

  private val MaxW = 32
  private val MaxH = 24
  private val Stride = 2

  /** Resize + frame-sample wired into a DataFrame-level query: decode →
    * aspect-fit every frame into a 32×24 box (integer-exact stub) →
    * every-2nd-frame sample plan. `sampled_frames` is emitted as a
    * comma-joined string so both engines compare a scalar. */
  def mediaResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Multimodal.extractFeatures(mediaTable(spark, sfDir), Multimodal.HeaderDecoder, batchSize = 16)
      .map { f =>
        val r = Multimodal.resizeStub(f, MaxW, MaxH)
        val frames = Multimodal.sampleFrames(f, Stride)
        (f.media_id, f.kind, f.width, f.height, r.width, r.height,
          frames.length, frames.mkString(","))
      }
      .toDF("media_id", "kind", "width", "height", "w2", "h2", "n_sampled", "sampled_frames")
      .orderBy("media_id")
  }

  private val GridW = 9
  private val GridH = 8
  private val HashDist = 2

  /** The oracled perceptual-hash measurement surface: a [[GridW]]×
    * [[GridH]] intensity grid probed from the payload's first 48 bytes
    * (min document length per the corpus contract, so positions never
    * wrap differently per doc — near-identical payloads get
    * near-identical grids). Real images take the same downstream via
    * [[Multimodal.PixelOps.grayGrid]] pooling instead (MultimodalSpec
    * gates that tier on planted near-identical PNGs). */
  private def stubGrid(text: Column, cells: Int = GridW * GridH): Column =
    transform(sequence(lit(0), lit(cells - 1)),
      i => ascii(text.substr(pmod(i * 7, lit(48)) + 1, lit(1))))

  /** Perceptual-hash IMAGE near-dup matching (q_media_dedup): dHash bit
    * strings ([[Multimodal.dhashBits]] — horizontal-gradient bits over
    * the intensity grid) matched by the banded Hamming machinery
    * [[graft.operators.Dedup.simhashPairs]] (4 bands × 16 bits;
    * pigeonhole-complete at radius [[HashDist]] < 4, hot buckets
    * triangular-blocked). The corpus's image rows never all-pair; the
    * oracle is DELIBERATELY brute-force all-pairs — the banding's
    * no-false-negative contract is what's on trial. */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // BIND the grid as a column before hashing: the hash builders
    // reference their grid argument once per element_at, and an inline
    // expression would re-evaluate the whole probe transform per
    // reference (64 refs × 72 substrs per row — measured pathological
    // on the 4032-ref WHT sibling below)
    val sig = mediaTable(spark, sfDir)
      .filter(col("kind") === "image")
      .withColumn("__grid", stubGrid(col("media").cast("string")))
      .select(col("media_id").as("id"),
        Multimodal.dhashBits(col("__grid"), GridW, GridH).as("simhash"))
    graft.operators.Dedup.simhashPairs(sig, maxDist = HashDist,
        sigLen = GridH * (GridW - 1), bands = 4)
      .orderBy("id_a", "id_b")
  }

  /** pHash-style LOW-FREQUENCY image matching (q_media_phash):
    * [[Multimodal.phashBits]] Walsh-Hadamard sign bits over the same
    * 8×8 probe grid, matched at radius [[HashDist]] through 3×21-bit
    * bands (63 non-DC coefficients; pigeonhole-complete at 2 < 3).
    * The structural complement of [[mediaDedup]]'s local-gradient
    * dHash — MultimodalSpec plants the separation (grid-scale noise
    * flips ONE WHT bit but half the dHash bits). */
  def mediaPhash(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark) // wht_hash
    val sig = mediaTable(spark, sfDir)
      .filter(col("kind") === "image")
      .withColumn("__grid", stubGrid(col("media").cast("string"), 64))
      .select(col("media_id").as("id"),
        Multimodal.phashBits(col("__grid")).as("simhash"))
    graft.operators.Dedup.simhashPairs(sig, maxDist = HashDist, sigLen = 63, bands = 3)
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> mediaFeatures,
    "q_media_resize" -> mediaResize,
    "q_media_dedup" -> mediaDedup,
    "q_media_phash" -> mediaPhash)

  // min(n_chars)=48 > 22, so byte positions 0/1/7/14/21 never wrap.
  private def by(pos: Int) = s"ascii(substr(text, ${pos + 1}, 1))"

  // stub decoder mirrors (same as q_media_features)
  private val wSql = s"1 + ${by(0)} % 64"
  private val hSql = s"1 + ${by(1)} % 64"
  private val framesSql =
    "CASE WHEN doc_id % 3 = 2 THEN 1 + CAST(FLOOR(length(text) / 100.0) AS INTEGER) ELSE 1 END"

  val oracles: Map[String, String] = Map(
    // deliberately brute force: all image pairs' dHash Hamming distance
    // at radius 2 — the banded matcher's recall contract is on trial
    "q_media_dedup" ->
      s"""WITH img AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         |grid AS (SELECT doc_id, i,
         |    ascii(substr(text, 1 + (i * 7) % 48, 1)) AS v
         |  FROM img, range(0, ${GridW * GridH}) r(i)),
         |bits AS (SELECT a.doc_id, a.i - (a.i // $GridW) AS bitpos,
         |    CASE WHEN b.v > a.v THEN '1' ELSE '0' END AS bit
         |  FROM grid a JOIN grid b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |  WHERE a.i % $GridW <> ${GridW - 1}),
         |sig AS (SELECT doc_id, STRING_AGG(bit, '' ORDER BY bitpos) AS h
         |  FROM bits GROUP BY doc_id),
         |d AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(list_sum(list_transform(range(1, ${GridH * (GridW - 1) + 1}), i ->
         |      CASE WHEN substr(a.h, i, 1) <> substr(b.h, i, 1) THEN 1 ELSE 0 END)) AS INTEGER) AS dist
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, dist FROM d WHERE dist <= $HashDist
         |ORDER BY id_a, id_b""".stripMargin,
    // same brute-force trial as q_media_dedup, over the WHT sign hash:
    // grid -> 63 non-DC coefficient signs -> all-pairs Hamming <= 2
    "q_media_phash" ->
      s"""WITH img AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         |grid AS (SELECT doc_id,
         |    list_transform(range(0, 64), i ->
         |      ascii(substr(text, 1 + (i * 7) % 48, 1))) AS g
         |  FROM img),
         |sig AS (SELECT doc_id,
         |    array_to_string(list_transform(range(1, 64), k ->
         |      CASE WHEN list_sum(list_transform(range(0, 64), j ->
         |        g[j + 1] * CASE WHEN bit_count(CAST(k AS BIGINT) & j) % 2 = 0
         |                        THEN 1 ELSE -1 END)) > 0
         |      THEN '1' ELSE '0' END), '') AS h
         |  FROM grid),
         |d AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(list_sum(list_transform(range(1, 64), i ->
         |      CASE WHEN substr(a.h, i, 1) <> substr(b.h, i, 1) THEN 1 ELSE 0 END)) AS INTEGER) AS dist
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, dist FROM d WHERE dist <= $HashDist
         |ORDER BY id_a, id_b""".stripMargin,
    "q_media_resize" ->
      // integer-exact aspect-fit mirror: all operands < 2^53, so the
      // double FLOOR equals the Scala long integer division
      s"""WITH f AS (SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |  $wSql AS w, $hSql AS h, $framesSql AS n_frames
         |FROM documents)
         |SELECT media_id, kind, w AS width, h AS height,
         |  CASE WHEN w <= $MaxW AND h <= $MaxH THEN w
         |       WHEN h * $MaxW <= w * $MaxH THEN $MaxW
         |       ELSE greatest(1, CAST(FLOOR(w * $MaxH * 1.0 / h) AS INTEGER)) END AS w2,
         |  CASE WHEN w <= $MaxW AND h <= $MaxH THEN h
         |       WHEN h * $MaxW <= w * $MaxH THEN greatest(1, CAST(FLOOR(h * $MaxW * 1.0 / w) AS INTEGER))
         |       ELSE $MaxH END AS h2,
         |  CAST(len(range(0, n_frames, $Stride)) AS INTEGER) AS n_sampled,
         |  array_to_string(range(0, n_frames, $Stride), ',') AS sampled_frames
         |FROM f ORDER BY media_id""".stripMargin,
    "q_media_features" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  1 + ${by(0)} % 64 AS width,
         |  1 + ${by(1)} % 64 AS height,
         |  CASE WHEN doc_id % 3 = 2 THEN 1 + CAST(FLOOR(length(text) / 100.0) AS INTEGER) ELSE 1 END AS n_frames,
         |  ${by(0)} / 255.0 AS f0, ${by(7)} / 255.0 AS f1,
         |  ${by(14)} / 255.0 AS f2, ${by(21)} / 255.0 AS f3,
         |  CASE WHEN doc_id % 3 = 1 THEN 8000 * (1 + ${by(2)} % 3) ELSE 0 END AS sample_rate,
         |  CASE WHEN doc_id % 3 = 1 THEN CAST(length(text) AS BIGINT) ELSE 0 END AS duration_ms
         |FROM documents ORDER BY media_id""".stripMargin)
}
