package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness star-schema parquet tables (TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and read via these helpers so
  * that scan options (pushdown, pruning) are configured in exactly one
  * place. Parquet carries its own schema; we never infer over JSON here
  * (bronze JSON ingestion with declared schemas lives in
  * [[graft.sources.Bronze]]).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark only
    * reads as a raw long under `spark.sql.legacy.parquet.nanosAsLong`
    * (set by every session builder here). Convert with INTEGRAL `div`:
    * `/` would promote to double and round-trip through a 53-bit
    * mantissa, landing 1 µs off exact truncation for ~12% of realistic
    * epoch-nanos values — DuckDB truncates exactly, so the oracle would
    * flake at any value near a window/session boundary. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      // `timestamp[us]` without a zone reads as TIMESTAMP_NTZ, which
      // time-arithmetic functions (unix_micros & co) reject; with the
      // session zone pinned to UTC this cast maps wall-clock micros to
      // the same instant micros, exactly what DuckDB's naive TIMESTAMP
      // arithmetic computes on the oracle side
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
