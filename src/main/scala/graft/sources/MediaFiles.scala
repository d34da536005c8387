package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directory-of-files media ingestion over Spark's built-in
  * `binaryFile` source — the path raw image/audio/video payloads
  * actually arrive by (object-store prefixes full of files), feeding
  * [[graft.operators.Multimodal]] without any bespoke reader.
  *
  * Scale notes: one file = one row — binaryFile never splits a file,
  * so task parallelism is file-count-bound and a row carries the whole
  * payload (guard pathological inputs with
  * `spark.sql.sources.binaryFile.maxLength`). The glob prunes at
  * LISTING time (excluded files are never opened — the S1 sentinel-skip
  * discipline), and filters on the metadata columns (`length`,
  * `modificationTime`) push into the file index, gating which files
  * are READ, not just which rows survive.
  */
object MediaFiles {

  /** Kind classification by extension — the coarse routing key the
    * decode stage batches by. */
  private val KindByExt: Map[String, String] = Map(
    "png" -> "image", "jpg" -> "image", "jpeg" -> "image", "gif" -> "image",
    "wav" -> "audio", "mp3" -> "audio", "flac" -> "audio",
    "mp4" -> "video", "avi" -> "video", "mkv" -> "video")

  /** Default glob derives from [[KindByExt]] (both letter cases — the
    * glob is case-sensitive, routing is not), so every kind the router
    * advertises is actually listable and the two can never drift. */
  val DefaultGlob: String = KindByExt.keys.toSeq.sorted
    .flatMap(e => Seq(e, e.toUpperCase)).mkString("*.{", ",", "}")

  /** Raw file frame: (path, modificationTime, length, content). */
  def read(spark: SparkSession, dir: String,
           glob: String = DefaultGlob): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** Map a [[read]] frame to the Multimodal record shape
    * `(media_id, kind, media)`: media_id = xxhash64(path) — stable
    * across runs and executors with no global sort or exchange (a
    * 64-bit hash collision over a file listing is a ~2^-32-scale
    * birthday event at a billion files; use a dense id where ids must
    * be contiguous). Unrecognized extensions classify as "binary" and
    * take the stub-decode path. */
  def records(files: DataFrame): DataFrame = {
    val ext = lower(substring_index(col("path"), ".", -1))
    val kind = KindByExt.foldLeft(lit("binary")) { case (acc, (e, k)) =>
      when(ext === e, lit(k)).otherwise(acc)
    }
    files.select(
      xxhash64(col("path")).as("media_id"),
      kind.as("kind"),
      col("content").as("media"))
  }
}
