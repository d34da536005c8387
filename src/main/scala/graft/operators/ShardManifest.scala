package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shard-manifest INTERCHANGE — the stamped parquet contract that lets
  * a packed training dataset leave the engine and be CONSUMED AND
  * VERIFIED by a training loader (the [[TokenizerModel]] discipline
  * applied to data instead of models): per shard of a packed corpus
  * (the [[PrefixSum.packByBudget]] bins), one manifest row carrying
  * the row count, the summed budget units, and an order-free content
  * digest, all recomputable by any engine from the shard data alone.
  *
  * Manifest table (`format = "graft.shards"`, `version = 1`), one row
  * per shard: `(format string, version int, budget bigint,
  * shard bigint, n_rows bigint, n_units bigint, digest bigint)` —
  * `budget` is the packing budget the shards were cut at (the loader's
  * sequence length), `n_units` the summed unit column (tokens/chars),
  * and `digest` the bit_xor over the shard's 60-bit row signatures
  * `hex60(md5(id || ':' || units))`. XOR is ORDER-FREE and mergeable,
  * so the digest is deterministic under any partitioning/shuffle and
  * two manifests can be folded shard-wise; 60 bits (15 hex digits)
  * keep the signature a positive int64 in every engine. A row
  * signature binds membership AND the row's unit count — a dropped
  * row, a duplicated row, or a drifted count all flip the digest.
  *
  * Loads VALIDATE loudly (missing columns, foreign format, newer
  * version, mixed stamps) instead of decoding garbage; [[verify]] is
  * the loader-side check — recompute [[build]] over the delivered data
  * and compare every shard. The manifest is |shards|-sized, so
  * single-file layout is the right shape at any corpus scale; the
  * digest computation itself is one map-side-combining aggregate pass
  * over the shard data (constant state per shard, no sort, no
  * collect). */
object ShardManifest {

  val Format = "graft.shards"
  val Version = 1

  /** The shared 60-bit row signature — `id` and `units` stringified
    * exactly as the DuckDB mirror ([[rowSigSql]]) does. */
  private def rowSig(idCol: Column, unitCol: Column): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(":"),
      unitCol.cast("string")).cast("binary")), 1, 15), 16, 10).cast("long")

  /** The DuckDB spelling of [[rowSig]] over column names `id`/`units`. */
  def rowSigSql(id: String, units: String): String =
    s"CAST('0x' || substr(md5(CAST($id AS VARCHAR) || ':' || CAST($units AS VARCHAR)), 1, 15) AS BIGINT)"

  /** One manifest row per shard of `packed`. `budget` is recorded, not
    * enforced — the packer owns the cut; the manifest owns integrity. */
  def build(packed: DataFrame, shardCol: Column, idCol: Column, unitCol: Column,
            budget: Long): DataFrame =
    packed
      .select(shardCol.cast("long").as("shard"), unitCol.cast("long").as("__u"),
        rowSig(idCol, unitCol).as("__h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum(col("__u")).as("n_units"),
        expr("bit_xor(__h)").as("digest"))
      .select(lit(Format).as("format"), lit(Version).as("version"),
        lit(budget).as("budget"), col("shard"), col("n_rows"), col("n_units"),
        col("digest"))

  /** Persist a manifest under the interchange contract. */
  def save(manifest: DataFrame, path: String): Unit =
    manifest.repartition(1).write.mode("overwrite").parquet(path)

  /** Load a manifest; fails loudly on a foreign or corrupt artifact. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(Set("format", "version", "budget", "shard", "n_rows", "n_units",
        "digest").subsetOf(df.columns.toSet),
      s"ShardManifest: $path is not a $Format v$Version artifact — " +
        s"columns ${df.columns.toSet}")
    val stamp = df.select("format", "version").distinct().collect()
    require(stamp.length == 1,
      s"ShardManifest: $path carries ${stamp.length} distinct stamps — corrupt artifact")
    require(stamp.head.getString(0) == Format,
      s"ShardManifest: $path carries format '${stamp.head.getString(0)}', " +
        s"expected '$Format' — refusing to decode a foreign artifact")
    require(stamp.head.getInt(1) == Version,
      s"ShardManifest: $path carries version ${stamp.head.getInt(1)}, this " +
        s"engine reads version $Version — upgrade the engine or re-export")
    df.select("format", "version", "budget", "shard", "n_rows", "n_units", "digest")
  }

  /** The loader-side integrity check: recompute [[build]] over the
    * delivered shard data and compare EVERY manifest row. Fails loudly
    * with the first drifted shard (missing, extra, or content-drifted);
    * the comparison frame is |shards|-sized, so the collect is bounded
    * by contract. */
  def verify(manifest: DataFrame, packed: DataFrame, shardCol: Column,
             idCol: Column, unitCol: Column): Unit = {
    val budget = manifest.select("budget").distinct().collect()
    require(budget.length == 1,
      s"ShardManifest.verify: manifest carries ${budget.length} distinct budgets")
    val fresh = build(packed, shardCol, idCol, unitCol, budget.head.getLong(0))
      .select(col("shard"), col("n_rows").as("__r"), col("n_units").as("__u"),
        col("digest").as("__d"))
    val drift = manifest.join(fresh, Seq("shard"), "full_outer")
      .filter(col("n_rows").isNull || col("__r").isNull ||
        col("n_rows") =!= col("__r") || col("n_units") =!= col("__u") ||
        col("digest") =!= col("__d"))
      .select("shard").limit(5).collect().map(_.getLong(0))
    require(drift.isEmpty,
      s"ShardManifest.verify: shard(s) ${drift.mkString(", ")} drifted from " +
        "the manifest — the delivered data is not what was packed")
  }
}
