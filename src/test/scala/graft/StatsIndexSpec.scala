package graft

import java.nio.file.Files

import graft.sinks.Sinks
import graft.sources.StatsIndex
import graft.sources.StatsIndex.{ColRange, FileColStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-level zone maps + pruning read (StatsIndex).
  *
  * The contract under test: footer stats agree with a full data scan;
  * pruning on a clustered layout opens only range-overlapping files
  * (measured through the executed scan's numFiles metric, the
  * PlanContractSpec technique); every distrust path — opaque lanes,
  * schema evolution, NaN, all-null files — degrades to KEEP, never to
  * a wrong skip; and the pruned result always equals the full scan
  * with the same predicate. */
class StatsIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_stats_$name").toString + "/t"

  /** numFiles of the parquet scan(s) in df's executed plan — AQE off
    * so the inspected plan IS the executed one (the PlanContractSpec
    * technique). */
  private def scannedFiles(df: => org.apache.spark.sql.DataFrame): Long = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no parquet scan in plan")
      plan.executeCollect()
      scans.map(_.metrics("numFiles").value).sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }


  test("fromFooters matches fromScan on every lane (long, date, timestamp, double, string)") {
    val dir = tmp("lanes")
    val df = spark.range(0, 1000).select(
      col("id"),
      (col("id") % 7).cast("int").as("small"),
      date_add(lit(java.sql.Date.valueOf("2026-01-01")), (col("id") % 30).cast("int")).as("day"),
      timestamp_micros(col("id") * 1000000L).as("ts"),
      (col("id").cast("double") / 3.0).as("score"),
      concat(lit("doc_"), format_string("%04d", col("id"))).as("name"))
    // Spark's DEFAULT parquet timestamp is INT96 (no trustworthy
    // stats → opaque lane, pinned in its own test below); annotated
    // INT64 micros is what a stats-indexed table should write
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try df.repartition(4).write.parquet(dir)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val cols = Seq("id", "small", "day", "ts", "score", "name")
    val foot = StatsIndex.fromFooters(spark, dir, cols).collect().toSet
    val scan = StatsIndex.fromScan(spark, dir, cols).collect().toSet
    // both carry relocatable basenames — directly comparable
    assert(foot == scan)
    // and the lanes actually landed where expected (ts must be laned,
    // not opaque — Spark writes annotated INT64 timestamps here)
    val kinds = foot.map(r => r.column -> r.kind).toMap
    assert(kinds == Map("id" -> "long", "small" -> "long", "day" -> "long",
      "ts" -> "long", "score" -> "double", "name" -> "string"))
  }

  test("clustered layout: pruned read opens only overlapping files and matches the full scan") {
    val dir = tmp("clustered")
    val df = spark.range(0, 800).select(col("id"), (col("id") * 2).as("v"))
    Sinks.writeClustered(df.toDF(), dir, Seq("id"), files = 8)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("id"))
    StatsIndex.writeSidecar(stats, dir)
    // sidecar is invisible to a plain read
    assert(spark.read.parquet(dir).count() == 800)

    val pred = Seq(ColRange("id", Some(100L), Some(199L)))
    val pruned = StatsIndex.prunedRead(spark, dir, pred)
    val full = spark.read.parquet(dir).where(col("id").between(100, 199))
    assert(pruned.collect().toSet == full.collect().toSet)
    // 8 disjoint ranges over 800 ids: a 100-id range touches ≤ 2 files
    assert(scannedFiles(pruned) <= 2, "zone maps failed to prune a clustered layout")
    assert(scannedFiles(full) == 8)
  }

  test("z-ordered layout prunes on either dimension alone") {
    val dir = tmp("zorder")
    val n = 4096
    val df = spark.range(0, n).select(
      (col("id") % 64).as("x"), (col("id") / 64).as("y"), col("id").as("payload"))
    Sinks.writeZOrdered(df.toDF(), dir, col("x"), col("y"), files = 16)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("x", "y"))
    // a quarter-range on x alone, then on y alone, each prunes files —
    // the property single-column clustering can't give both of
    for (c <- Seq("x", "y")) {
      val pruned = StatsIndex.prunedRead(spark, dir, Seq(ColRange(c, Some(0L), Some(15L))),
        stats = Some(stats))
      val full = spark.read.parquet(dir).where(col(c).between(0, 15))
      assert(pruned.collect().toSet == full.collect().toSet, s"mismatch on $c")
      assert(scannedFiles(pruned) <= 8, s"no pruning on $c")
    }
  }

  test("all-null file skips; mixed-null file stays; null counts are exact") {
    val dir = tmp("nulls")
    val allNull = spark.range(0, 10).select(lit(null).cast("long").as("k"), col("id").as("p"))
    val mixed = spark.range(10, 20).select(
      when(col("id") % 2 === 0, col("id")).as("k"), col("id").as("p"))
    allNull.coalesce(1).write.parquet(dir)
    mixed.coalesce(1).write.mode("append").parquet(dir)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("k")).collect().toSeq
    assert(stats.map(_.nulls).sum == 15)
    val kept = StatsIndex.pruneFiles(stats, Seq(ColRange("k", Some(0L), Some(100L))))
    assert(kept.size == 1, "all-null file must skip, mixed file must stay")
    val pruned = StatsIndex.prunedRead(spark, dir, Seq(ColRange("k", Some(0L), Some(100L))),
      stats = Some(StatsIndex.fromFooters(spark, dir, Seq("k"))))
    assert(pruned.select("p").as[Long].collect().toSet == Set(10L, 12L, 14L, 16L, 18L))
  }

  test("schema evolution: a file missing the column is kept, never skipped") {
    val dir = tmp("evolve")
    spark.range(0, 5).select(col("id").as("p")).coalesce(1).write.parquet(dir)
    spark.range(5, 10).select(col("id").as("p"), (col("id") * 10).as("k"))
      .coalesce(1).write.mode("append").parquet(dir)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("k")).collect().toSeq
    assert(stats.count(_.kind == "opaque") == 1)
    val kept = StatsIndex.pruneFiles(stats, Seq(ColRange("k", Some(1000L), None)))
    // the k-bearing file proves disjoint [50..90]; the k-less file must stay
    assert(kept.size == 1 && stats.filter(_.file == kept.head).forall(_.kind == "opaque"))
  }

  test("NaN: a file of NaNs is never skipped by a lone lower bound") {
    val dir = tmp("nan")
    val nanFile = spark.range(0, 4).select(lit(Double.NaN).as("d"), col("id").as("p"))
    val lowFile = spark.range(4, 8).select((col("id") / 100.0).as("d"), col("id").as("p"))
    nanFile.coalesce(1).write.parquet(dir)
    lowFile.coalesce(1).write.mode("append").parquet(dir)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("d")).collect().toSeq
    // the all-NaN file has NO usable stats (parquet excludes NaN from
    // min/max) → opaque → it can never be skipped
    assert(stats.count(_.kind == "opaque") == 1)
    // lone lower bound: NaN sorts above everything in Spark — both files must stay
    assert(StatsIndex.pruneFiles(stats, Seq(ColRange("d", Some(1000.0), None))).size == 2)
    // bounded range: the low file is proven disjoint and skips; the
    // opaque NaN file stays
    val bounded = StatsIndex.pruneFiles(stats, Seq(ColRange("d", Some(1000.0), Some(2000.0))))
    assert(bounded.size == 1)
    // and the executed semantics agree with a full scan either way
    for (pred <- Seq(Seq(ColRange("d", Some(1000.0), None)),
        Seq(ColRange("d", Some(1000.0), Some(2000.0))))) {
      val pruned = StatsIndex.prunedRead(spark, dir, pred,
        stats = Some(StatsIndex.fromFooters(spark, dir, Seq("d"))))
      val full = pred.foldLeft(spark.read.parquet(dir))((df, p) =>
        df.where(StatsIndex.predFilter(p)))
      assert(pruned.collect().toSet == full.collect().toSet)
    }
  }

  test("NaN hidden among real values: max < lo skips only under a finite upper bound") {
    val dir = tmp("nanmix")
    // ONE file whose stats say max ≈ 0.07 but which hides NaN rows —
    // the case where trusting `max < lo` alone loses data
    val mixed = spark.range(0, 8).select(
      when(col("id") < 4, col("id") / 100.0).otherwise(lit(Double.NaN)).as("d"),
      col("id").as("p"))
    mixed.coalesce(1).write.parquet(dir)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("d")).collect().toSeq
    // parquet-mr refuses to write min/max for a chunk containing NaN
    // (PARQUET-1222) → opaque → conservative by construction
    assert(stats.head.kind == "opaque")
    val pruned = StatsIndex.prunedRead(spark, dir, Seq(ColRange("d", Some(1000.0), None)),
      stats = Some(StatsIndex.fromFooters(spark, dir, Seq("d"))))
    assert(pruned.count() == 4, "the NaN rows match a lone lower bound and must survive pruning")
    // a FOREIGN writer may publish NaN-blind min/max for such a file;
    // the keep rule must then refuse `max < lo` skips unless the range
    // also has a finite upper bound (NaN fails `<= hi`, passes `>= lo`)
    val foreign = FileColStats("f", "d", "double", 8, 0,
      None, None, Some(0.0), Some(0.07), None, None)
    assert(StatsIndex.pruneFiles(Seq(foreign), Seq(ColRange("d", Some(1000.0), None))) == Seq("f"))
    assert(StatsIndex.pruneFiles(Seq(foreign),
      Seq(ColRange("d", Some(1000.0), Some(2000.0)))).isEmpty)
  }

  test("INT96 timestamps (Spark's default parquet output) degrade to opaque, never skip") {
    val dir = tmp("int96")
    spark.range(0, 10).select(timestamp_micros(col("id") * 1000000L).as("ts"))
      .coalesce(1).write.parquet(dir)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("ts")).collect().toSeq
    assert(stats.forall(_.kind == "opaque"))
    assert(StatsIndex.pruneFiles(stats,
      Seq(ColRange("ts", Some(java.time.Instant.parse("2050-01-01T00:00:00Z")), None))).size == 1)
  }

  test("string lane prunes lexicographically and keeps UTF-8 byte order") {
    val dir = tmp("str")
    val df = spark.range(0, 260).select(
      concat(lit("k"), format_string("%03d", col("id"))).as("s"), col("id").as("p"))
    Sinks.writeClustered(df.toDF(), dir, Seq("s"), files = 4)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("s"))
    val pruned = StatsIndex.prunedRead(spark, dir,
      Seq(ColRange("s", Some("k000"), Some("k064"))), stats = Some(stats))
    val full = spark.read.parquet(dir).where(col("s").between("k000", "k064"))
    assert(pruned.collect().toSet == full.collect().toSet)
    assert(scannedFiles(pruned) <= 2)
    // unsigned UTF-8 compare: 'é' (0xC3A9) must sort above 'z' (0x7A),
    // matching Spark's UTF8String order — not UTF-16ish surprises
    val s1 = FileColStats("f", "s", "string", 1, 0, None, None, None, None, Some("é"), Some("é"))
    assert(StatsIndex.pruneFiles(Seq(s1), Seq(ColRange("s", Some("z"), None))) == Seq("f"))
  }

  test("date and timestamp bounds prune through the long lane") {
    val dir = tmp("time")
    val df = spark.range(0, 365).select(
      date_add(lit(java.sql.Date.valueOf("2026-01-01")), col("id").cast("int")).as("day"),
      timestamp_micros(col("id") * 86400000000L).as("ts"),
      col("id").as("p"))
    Sinks.writeClustered(df.toDF(), dir, Seq("day"), files = 6)
    val stats = StatsIndex.fromFooters(spark, dir, Seq("day", "ts"))
    val pred = Seq(
      ColRange("day", Some(java.time.LocalDate.parse("2026-02-01")),
        Some(java.time.LocalDate.parse("2026-02-28"))),
      ColRange("ts", Some(java.time.Instant.parse("1970-01-20T00:00:00Z")), None))
    val pruned = StatsIndex.prunedRead(spark, dir, pred, stats = Some(stats))
    val full = pred.foldLeft(spark.read.parquet(dir))((df, p) => df.where(StatsIndex.predFilter(p)))
    assert(pruned.collect().toSet == full.collect().toSet)
    assert(pruned.count() > 0)
    assert(scannedFiles(pruned) <= 2)
  }

  test("whole-table COUNT/MIN/MAX answers from footers via v2 aggregate pushdown") {
    // the same footer statistics StatsIndex indexes also serve Spark's
    // own aggregate pushdown: on the v2 parquet source, a bare
    // COUNT/MIN/MAX never touches data pages — the 100-TB "how many
    // rows" query costs #files metadata reads. Pinned here because it
    // needs TWO non-default confs a deployment must know about.
    val dir = tmp("aggpush")
    spark.range(0, 100000).select(col("id"), (col("id") % 7).as("k")).write.parquet(dir)
    val (aggConf, v1Conf) = ("spark.sql.parquet.aggregatePushdown", "spark.sql.sources.useV1SourceList")
    val oldV1 = spark.conf.get(v1Conf)
    spark.conf.set(aggConf, "true"); spark.conf.set(v1Conf, "")
    try {
      // literally count(*): count(lit(1)) does not match the pushdown
      // pattern (V2ScanRelationPushDown translates COUNT(*)/COUNT(col)/
      // MIN/MAX only)
      val df = spark.read.parquet(dir)
        .selectExpr("count(*) as n", "min(id) as mn", "max(id) as mx")
      val explained = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(explained.contains("PushedAggregation"),
        s"aggregate not pushed to the parquet scan:\n$explained")
      assert(df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        == Seq((100000L, 0L, 99999L)))
    } finally {
      spark.conf.set(aggConf, "false"); spark.conf.set(v1Conf, oldV1)
    }
  }

  test("empty prune result returns an empty frame with the table schema") {
    val dir = tmp("empty")
    spark.range(0, 10).select(col("id").as("k")).write.parquet(dir)
    val pruned = StatsIndex.prunedRead(spark, dir, Seq(ColRange("k", Some(1000L), Some(2000L))),
      stats = Some(StatsIndex.fromFooters(spark, dir, Seq("k"))))
    assert(pruned.columns.toSeq == Seq("k") && pruned.count() == 0)
  }

  test("clustered compaction preserves layout and rebuilds the sidecar") {
    val dir = tmp("compact")
    val df = spark.range(0, 800).select(col("id"), (col("id") * 3).as("v"))
    // many small clustered files + sidecar
    Sinks.writeClustered(df.toDF(), dir, Seq("id"), files = 16)
    StatsIndex.writeSidecar(StatsIndex.fromFooters(spark, dir, Seq("id")), dir)
    val (before, after) = Sinks.compact(spark, dir,
      targetFileBytes = 64L << 10, clusterCols = Seq("id"))
    assert(before == 16 && after < before, s"compaction $before -> $after")
    // sidecar references exactly the NEW files (a stale one would point
    // pruned reads at deleted files)
    val side = StatsIndex.readSidecar(spark, dir).get.collect().map(_.file).toSet
    val live = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(side == live, s"sidecar files $side != live files $live")
    // layout preserved: a narrow range still prunes, and content is intact
    val pred = Seq(ColRange("id", Some(0L), Some(99L)))
    val pruned = StatsIndex.prunedRead(spark, dir, pred)
    assert(pruned.collect().map(_.getLong(0)).toSet == (0L to 99L).toSet)
    if (after > 1)
      assert(scannedFiles(pruned) < after, "clustered compaction lost the layout")
    assert(spark.read.parquet(dir).count() == 800)
  }

  test("round-robin compaction of an unindexed table grows no sidecar") {
    val dir = tmp("compact_plain")
    spark.range(0, 100).toDF().write.parquet(dir)
    Sinks.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(StatsIndex.readSidecar(spark, dir).isEmpty)
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("appendClustered: per-batch sidecar extension keeps pruning correct under ingestion") {
    val dir = tmp("append")
    // three micro-batches over disjoint-ish key ranges
    for (b <- 0 until 3) {
      val batch = spark.range(b * 300, (b + 1) * 300)
        .select(col("id"), (col("id") * 7).as("v"))
      Sinks.appendClustered(spark, batch.toDF(), dir, Seq("id"), files = 4,
        statCols = Seq("id"))
    }
    // sidecar covers every live file exactly once
    val side = StatsIndex.readSidecar(spark, dir).get.collect().map(_.file).toSeq
    val live = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(side.toSet == live && side.distinct.size == side.size,
      s"sidecar drifted: ${side.size} rows over ${live.size} files")
    // pruned read: correct and confined to one batch's files
    val pred = Seq(ColRange("id", Some(300L), Some(399L)))
    val pruned = StatsIndex.prunedRead(spark, dir, pred)
    assert(pruned.collect().map(_.getLong(0)).toSet == (300L to 399L).toSet)
    assert(scannedFiles(pruned) <= 4, "append batches must keep per-batch pruning")
    // compaction folds data + sidecar and preserves the contract
    Sinks.compact(spark, dir, targetFileBytes = 1L << 20, clusterCols = Seq("id"))
    val pruned2 = StatsIndex.prunedRead(spark, dir, pred)
    assert(pruned2.collect().map(_.getLong(0)).toSet == (300L to 399L).toSet)
    assert(spark.read.parquet(dir).count() == 900)
  }

  test("crash between data append and sidecar append: unindexed files are KEPT, not lost") {
    val dir = tmp("crashwin")
    val b0 = spark.range(0, 300).select(col("id"), (col("id") * 7).as("v"))
    Sinks.appendClustered(spark, b0.toDF(), dir, Seq("id"), files = 2, statCols = Seq("id"))
    // simulate the crash window: batch 1's DATA lands (plain append,
    // same layout) but its sidecar extension never runs
    spark.range(300, 600).select(col("id"), (col("id") * 7).as("v"))
      .repartitionByRange(2, col("id")).sortWithinPartitions(col("id"))
      .write.mode("append").parquet(dir)
    val side = StatsIndex.readSidecar(spark, dir).get.collect().toSeq
    val live = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(side.map(_.file).toSet != live, "test setup must leave unindexed files")
    assert(StatsIndex.unindexedFiles(spark, dir, side).toSet == live -- side.map(_.file).toSet)
    // file-level absence is conservative: rows in the unindexed files
    // still come back (the crash cannot silently shrink query results)
    val pruned = StatsIndex.prunedRead(spark, dir, Seq(ColRange("id", Some(250L), Some(449L))))
    assert(pruned.collect().map(_.getLong(0)).toSet == (250L to 449L).toSet,
      "rows in sidecar-unknown files must survive pruned reads")
    // and indexed-file pruning still works around the kept stragglers
    val prunedLow = StatsIndex.prunedRead(spark, dir, Seq(ColRange("id", Some(0L), Some(99L))))
    assert(prunedLow.collect().map(_.getLong(0)).toSet == (0L to 99L).toSet)
    // the next compact heals the index: sidecar covers every file again
    Sinks.compact(spark, dir, targetFileBytes = 1L << 20, clusterCols = Seq("id"))
    val side2 = StatsIndex.readSidecar(spark, dir).get.collect().map(_.file).toSet
    val live2 = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(side2 == live2, "compact must fold the unindexed files into the sidecar")
    assert(StatsIndex.prunedRead(spark, dir, Seq(ColRange("id", Some(250L), Some(449L))))
      .collect().map(_.getLong(0)).toSet == (250L to 449L).toSet)
  }
}
