package graft

import graft.operators.FileAccounting
import graft.sinks.Sinks
import graft.sources.Bronze
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Real file movement for the ingestion/sink layer: chunked writes,
  * ordered listing with sentinel skip, archive renames, upsert algebra,
  * parallel loads, input_file_name accounting. */
class IngestSinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_test_").toString

  private def writeFile(dir: String, name: String, content: String): Unit =
    Files.write(java.nio.file.Paths.get(dir, name), content.getBytes("UTF-8"))

  test("K4: maxRecordsPerFile chunks output into ceil(n/chunk) files per task") {
    val dir = tmpDir()
    val df = (1 to 250).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text").coalesce(1)
    Sinks.chunkedWrite(df, dir, maxRecordsPerFile = 100)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 3) // 100 + 100 + 50
  }

  test("S1/P3/O1: listing orders by mtime and skips sentinel + hidden files") {
    val dir = tmpDir()
    writeFile(dir, "b.json", """{"doc_id":2}""")
    writeFile(dir, "a.json", """{"doc_id":1}""")
    writeFile(dir, "x.emptyFolderPlaceholder", "")
    writeFile(dir, ".hidden", "")
    writeFile(dir, "_SUCCESS", "")
    new java.io.File(dir, "b.json").setLastModified(1000000L)
    new java.io.File(dir, "a.json").setLastModified(2000000L)
    val files = Bronze.listFiles(spark, dir)
    assert(files.map(_.split('/').last) == Seq("b.json", "a.json")) // mtime order, not name
  }

  test("S2/S3: declared-schema JSON read unions multiple files; schema is not inferred") {
    val dir = tmpDir()
    writeFile(dir, "f1.json", """{"doc_id":1,"text":"a","lang":"en","source":"s1","n_chars":1}""")
    writeFile(dir, "f2.json", """{"doc_id":2,"text":"b","lang":"fr","source":"s2","n_chars":1}""")
    val df = Bronze.readJson(spark, Bronze.documentSchema, Bronze.listFiles(spark, dir))
    assert(df.schema == Bronze.documentSchema)
    assert(df.count() == 2)
  }

  test("K5: archive moves consumed files and reports failures") {
    val src = tmpDir(); val dst = tmpDir() + "/arch"
    writeFile(src, "done.json", "{}")
    val (moved, failed) = Sinks.archive(spark,
      Seq(s"$src/done.json", s"$src/never_existed.json"), dst)
    assert(moved.map(_.split('/').last) == Seq("done.json"))
    assert(failed.map(_.split('/').last) == Seq("never_existed.json"))
    assert(new java.io.File(dst, "done.json").exists())
    assert(!new java.io.File(src, "done.json").exists())
  }

  test("K2: upsert replaces matched keys, keeps unmatched, inserts new") {
    val existing = Seq((1, "old1"), (2, "old2"), (3, "old3")).toDF("key", "value")
    val updates = Seq((2, "new2"), (9, "new9")).toDF("key", "value")
    val out = Sinks.upsertByKey(existing, updates, Seq("key"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "old1", 2 -> "new2", 3 -> "old3", 9 -> "new9"))
  }

  test("K3: parallel multi-table load writes every table") {
    val dir = tmpDir()
    Sinks.loadAll(Map(
      "user_kpis" -> Seq((1, 2.0)).toDF("id", "v"),
      "shop_kpis" -> Seq((2, 3.0)).toDF("id", "v"),
      "date_kpis" -> Seq((3, 4.0)).toDF("id", "v")), dir)
    Seq("user_kpis", "shop_kpis", "date_kpis").foreach { t =>
      assert(spark.read.parquet(s"$dir/$t").count() == 1)
    }
  }

  test("K1: gold snapshot writes exactly one JSON part file") {
    val dir = tmpDir()
    Sinks.goldSnapshot(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, "20240101_000000")
    val parts = new java.io.File(s"$dir/final_data_20240101_000000")
      .listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
  }

  test("A6: input_file_name accounting marks fully-processed files consumed") {
    val dir = tmpDir()
    writeFile(dir, "f1.json",
      """{"doc_id":1,"ok":true}
        |{"doc_id":2,"ok":true}""".stripMargin)
    writeFile(dir, "f2.json",
      """{"doc_id":3,"ok":true}
        |{"doc_id":4,"ok":false}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ok", org.apache.spark.sql.types.BooleanType)))
    val df = spark.read.schema(schema).json(dir)
    val acc = FileAccounting.consumption(df, input_file_name(), col("ok"))
    val byFile = acc.collect().map(r =>
      r.getString(0).split('/').last -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(byFile("f1.json") == ((2L, 2L, true)))
    assert(byFile("f2.json") == ((2L, 1L, false)))
    val consumed = FileAccounting.consumedFiles(acc).map(_.split('/').last)
    assert(consumed == Seq("f1.json"))
  }

  test("compact: many small files become few, data byte-identical, swap leaves no staging dirs") {
    val base = tmpDir()
    val dir = s"$base/table"
    val df = (1L to 5000L).map(i => (i, s"row_$i")).toDF("id", "v")
    df.repartition(40).write.parquet(dir)
    def parquetFiles() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles().length == 40)
    val (before, after) = Sinks.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(before == 40 && after == 1, s"($before, $after)")
    assert(parquetFiles().length == 1)
    assert(spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      (1L to 5000L).map(i => (i, s"row_$i")).toSet)
    // the swap cleaned up after itself
    assert(new java.io.File(base).listFiles().map(_.getName).toSet == Set("table"))
  }

  test("compact: a target size smaller than the data yields multiple even files") {
    val dir = s"${tmpDir()}/table"
    (1L to 20000L).map(i => (i, s"padpadpadpad_$i")).toDF("id", "v")
      .repartition(16).write.parquet(dir)
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (_, after) = Sinks.compact(spark, dir, targetFileBytes = bytes / 4)
    assert(after >= 4 && after <= 5, s"expected ~4 output files, got $after")
    assert(spark.read.parquet(dir).count() == 20000)
  }

  test("compact: aborts without touching the live table when a writer commits mid-compaction") {
    val base = tmpDir()
    val dir = s"$base/table"
    (1L to 1000L).map(i => (i, s"row_$i")).toDF("id", "v").repartition(8).write.parquet(dir)
    val e = intercept[IllegalStateException] {
      Sinks.compact(spark, dir, onBeforeSwap = () =>
        // a concurrent micro-batch lands one more file after the snapshot
        (1001L to 1100L).map(i => (i, s"row_$i")).toDF("id", "v")
          .coalesce(1).write.mode("append").parquet(dir))
    }
    assert(e.getMessage.contains("changed during compaction"))
    // live table intact INCLUDING the late commit; staged dir cleaned up
    assert(spark.read.parquet(dir).count() == 1100)
    assert(new java.io.File(base).listFiles().map(_.getName).toSet == Set("table"))
  }

  test("compact: refuses a partition-layout table instead of silently flattening it") {
    val dir = s"${tmpDir()}/partitioned"
    (1L to 100L).map(i => (i, i % 4)).toDF("id", "part")
      .write.partitionBy("part").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Sinks.compact(spark, dir)
    }
    assert(e.getMessage.contains("partition"))
    // the table is untouched
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("writeClustered: output files carry disjoint cluster-key ranges (data skipping layout)") {
    val dir = s"${tmpDir()}/clustered"
    val df = (1L to 10000L).map(i => ((i * 7919) % 10007, i)).toDF("k", "payload")
    Sinks.writeClustered(df, dir, Seq("k"), files = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"file ranges overlap: ${ranges.mkString(", ")}")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == 10000)
  }
}
