package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** Keyed upsert into a REAL JDBC database — the production spelling of
  * [[Sinks.upsertByKey]]'s MERGE algebra (the reference upserts its
  * three KPI tables into Postgres with on-conflict-update semantics;
  * `etl_pipeline/load/data_loader.py:54-60`).
  *
  * Shape per (micro-)batch:
  *   1. stage: `CREATE TABLE <stg> AS SELECT * FROM <target> WITH NO
  *      DATA` clones the target's exact column types (deliberately NOT
  *      Spark's JDBC DDL mapping, whose Derby string type is CLOB —
  *      non-comparable in a MERGE ON), then the batch lands in it via
  *      Spark's parallel JDBC writer (one INSERT stream per partition);
  *   2. merge: ONE upsert statement, spelled per [[UpsertDialect]]:
  *      ANSI `MERGE INTO target USING stg ON keys` (Derby, Oracle, SQL
  *      Server, DB2, Postgres ≥15) or Postgres-native `INSERT … SELECT
  *      … ON CONFLICT (keys) DO UPDATE` — the reference's actual store
  *      is Supabase Postgres via `upsert(on_conflict=key)`
  *      (`data_loader.py:54-60`), where the ON CONFLICT spelling works
  *      on EVERY version (MERGE needs 15+). One statement runs in one
  *      transaction, so readers never observe a half-applied batch;
  *   3. drop the staging table (also on failure).
  *
  * Retry contract (the `foreachBatch` question): re-running the same
  * batch re-updates rows to the values they already hold — upsert
  * is IDEMPOTENT per batch, which is exactly what a streaming sink
  * needs under Structured Streaming's at-least-once `foreachBatch`
  * replay. Duplicate keys WITHIN one batch are rejected loudly before
  * any write (SQL MERGE raises a cardinality violation mid-statement
  * otherwise — this surfaces it as a clear precondition instead):
  * aggregate the batch to one row per key first, as the KPI queries do.
  * The batch is persisted before the check so the rows VALIDATED are
  * the rows WRITTEN — a nondeterministic input plan re-evaluating
  * differently between the check and the staging write cannot smuggle
  * duplicates past the precondition.
  *
  * Scale shape: the batch never funnels through the driver — executors
  * write partitions straight to the staging table; the driver runs two
  * constant-size DDL/DML statements. The database is the bottleneck by
  * design (it is the serving store, not the analytics path). Identifier
  * hygiene: table/column names must be plain SQL identifiers (letters,
  * digits, underscore) — anything else is rejected, never interpolated.
  *
  * Tested against embedded Derby (`jdbc:derby:memory:`) in
  * JdbcMergeSpec — real connections, real MERGE, all three KPI tables
  * round-tripped with conflict-key updates; statement generation for
  * both dialects is unit-tested.
  */
object JdbcMerge {

  /** How the upsert statement is spelled. [[forUrl]] picks the native
    * spelling for Postgres (any version; ON CONFLICT requires a unique
    * index on the key columns — the serving tables' primary keys) and
    * ANSI MERGE for everything else. */
  sealed trait UpsertDialect
  object UpsertDialect {
    case object AnsiMerge extends UpsertDialect
    case object PostgresOnConflict extends UpsertDialect
    def forUrl(url: String): UpsertDialect =
      if (url.startsWith("jdbc:postgresql:")) PostgresOnConflict else AnsiMerge
  }

  private val Ident = "^[A-Za-z][A-Za-z0-9_]*$".r

  private def checkIdent(name: String): String = {
    require(Ident.matches(name), s"JdbcMerge: '$name' is not a plain SQL identifier")
    name
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  /** ANSI `MERGE INTO` upsert statement (package-visible for unit tests). */
  private[graft] def mergeStatement(
      table: String, staging: String, cols: Seq[String], keys: Seq[String]): String = {
    val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
    val nonKeys = cols.filterNot(keys.contains)
    val matched =
      if (nonKeys.isEmpty) "" // all-key table: nothing to update, dupes just no-op
      else "WHEN MATCHED THEN UPDATE SET " + nonKeys.map(c => s"$c = s.$c").mkString(", ") + " "
    s"MERGE INTO $table t USING $staging s ON $on " + matched +
      s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"s.$c").mkString(", ")})"
  }

  /** Postgres-native `INSERT … ON CONFLICT` upsert statement (visible
    * for unit tests). `EXCLUDED` is Postgres's row-proposed-for-insert
    * alias — the exact semantics of the reference's
    * `upsert(on_conflict=key)`. */
  private[graft] def onConflictStatement(
      table: String, staging: String, cols: Seq[String], keys: Seq[String]): String = {
    val nonKeys = cols.filterNot(keys.contains)
    val action =
      if (nonKeys.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"SELECT ${cols.mkString(", ")} FROM $staging " +
      s"ON CONFLICT (${keys.mkString(", ")}) $action"
  }

  /** Upsert `batch` into `table` on `keys`. The target table must
    * already exist (the serving schema is the DBA's contract, not the
    * pipeline's). `dialect` defaults to [[UpsertDialect.forUrl]]. */
  def mergeInto(batch: DataFrame, url: String, table: String, keys: Seq[String],
                props: Properties = new Properties): Unit =
    mergeInto(batch, url, table, keys, props, UpsertDialect.forUrl(url))

  /** As above with an explicit dialect (e.g. forcing ANSI MERGE on
    * Postgres ≥15, where both spellings work). */
  def mergeInto(batch: DataFrame, url: String, table: String, keys: Seq[String],
                props: Properties, d: UpsertDialect): Unit = {
    require(keys.nonEmpty, "JdbcMerge: at least one key column required")
    val cols = batch.columns.toSeq
    val missing = keys.filterNot(cols.contains)
    require(missing.isEmpty, s"JdbcMerge: key column(s) ${missing.mkString(", ")} not in batch")
    (table +: cols).foreach(checkIdent)
    // Pin the batch so the dup-check and the staging write read the SAME
    // materialized rows (MEMORY_AND_DISK: eviction spills, never
    // recomputes a possibly-nondeterministic input plan). The count()
    // below materializes it as a side effect of the check.
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dups = pinned.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(1).count()
      require(dups == 0,
        s"JdbcMerge: batch has multiple rows per key (${keys.mkString(", ")}) — " +
          "aggregate to one row per key before upserting")
      val staging = s"${table}_stg_${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
      val conn = DriverManager.getConnection(url, props)
      try {
        exec(conn, s"CREATE TABLE $staging AS SELECT * FROM $table WITH NO DATA")
        pinned.write.mode("append").jdbc(url, staging, props)
        exec(conn, d match {
          case UpsertDialect.AnsiMerge => mergeStatement(table, staging, cols, keys)
          case UpsertDialect.PostgresOnConflict => onConflictStatement(table, staging, cols, keys)
        })
      } finally {
        try exec(conn, s"DROP TABLE $staging")
        catch { case _: java.sql.SQLException => () } // create itself failed — nothing staged
        conn.close()
      }
    } finally pinned.unpersist(blocking = false)
  }

  /** The `writeStream.foreachBatch` adapter: each micro-batch becomes
    * one staged upsert (idempotent under replay — see class doc). */
  def foreachBatchMerge(url: String, table: String, keys: Seq[String],
                        props: Properties = new Properties): (DataFrame, Long) => Unit =
    (batch, _) => mergeInto(batch, url, table, keys, props)
}
