package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Bronze-zone ingestion (SURVEY.md §2.1 S1-S3, P3): ordered file
  * listing with sentinel skip, declared-schema JSON scan, multi-file
  * row-union.
  *
  * Reference: `data_extractor.py:26-60` (list sorted by created_at,
  * strip `.emptyFolderPlaceholder`, download + parse each file, concat),
  * Go `extractor.go:37-101` (same, goroutine waves of 10 — Spark reads
  * files concurrently across tasks natively, S5).
  *
  * Scale notes: listing is driver-side metadata only (same as Spark's
  * own InMemoryFileIndex); the DATA path is a single multi-file
  * `spark.read.json` whose file set Spark splits across tasks. The
  * declared schema kills the inference pass (one full extra scan on
  * JSON) — the engine never infers (SURVEY.md §7.1).
  */
object Bronze {

  /** The reference's bronze product record (FIXTURES.md §1,
    * `types.go:16-27`). */
  val productSchema: StructType = StructType(Seq(
    StructField("product_name", StringType),
    StructField("price", DoubleType),
    StructField("quantity", IntegerType),
    StructField("category", StringType),
    StructField("description", StringType),
    StructField("availability", BooleanType),
    StructField("discount_percentage", DoubleType),
    StructField("date", StringType),
    StructField("id", StringType),
    StructField("shop_id", StringType)))

  /** The harness documents record, for parquet→JSON round-trips. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** S1 + P3 + O1 — list a directory's files ordered by modification
    * time (the reference's `created_at asc`, `data_extractor.py:34-37`)
    * with a deterministic name tie-break, skipping sentinel/hidden
    * entries (`.emptyFolderPlaceholder`, `data_extractor.py:40`). */
  def listFiles(spark: SparkSession, dir: String, sentinelSuffix: String = ".emptyFolderPlaceholder"): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else
      fs.listStatus(path).toSeq
        .filter(s => s.isFile && !s.getPath.getName.endsWith(sentinelSuffix)
          && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .sortBy(s => (s.getModificationTime, s.getPath.getName))
        .map(_.getPath.toString)
  }

  /** S2 + S3 — declared-schema JSON scan over an explicit file list (the
    * union of per-file frames is native to the multi-path reader). */
  def readJson(spark: SparkSession, schema: StructType, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "empty bronze file list")
    spark.read.schema(schema).json(files: _*)
  }

  /** Directory variant: sentinel skip via pathGlobFilter, no listing
    * round-trip (preferred at scale — the glob is evaluated by the
    * distributed file index, not the driver). */
  def readJsonDir(spark: SparkSession, schema: StructType, dir: String, glob: String = "*.json"): DataFrame =
    spark.read.schema(schema).option("pathGlobFilter", glob).json(dir)

  /** Explicit S3 for heterogeneous frames (Go `extractor.go:81` appends
    * row-wise): resolve by column name, fail on drift. */
  def unionAll(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_))

  /** CSV variant of the declared-schema scan: header + explicit types,
    * FAILFAST so a malformed row is an error, not a silent null row
    * (the engine never trusts inference or permissive parsing). */
  def readCsvDir(spark: SparkSession, schema: StructType, dir: String, glob: String = "*.csv"): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .option("pathGlobFilter", glob)
      .csv(dir)
}
