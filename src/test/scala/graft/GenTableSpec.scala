package graft

import graft.sinks.GenTable
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The object-store commit protocol, proved on a filesystem that
  * FORBIDS atomic rename: every rename is a file-by-file copy + delete
  * (the S3 shape), with injectable crashes mid-copy and around the
  * commit point. After a crash at ANY point, [[GenTable.resolve]] must
  * return a fully readable generation — never a half-copied one — and
  * a recovery publish must converge. */
class GenTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deliberate crash signal, distinct from real IO errors. */
  final class InjectedCrash extends RuntimeException("injected crash")

  /** Local FS whose rename is ALWAYS a non-atomic copy-then-delete.
    * `crashAfterFiles = Some(n)` aborts after n files have been copied,
    * leaving a partial destination and the intact source — exactly what
    * a killed S3 "rename" leaves behind. */
  final class NonAtomicRenameFs extends RawLocalFileSystem {
    var crashAfterFiles: Option[Int] = None
    var copied = 0
    // full initialize (not just setConf): statistics are wired there
    initialize(java.net.URI.create("file:///"), new Configuration())

    override def rename(src: Path, dst: Path): Boolean = {
      val files: Seq[Path] =
        if (getFileStatus(src).isDirectory)
          listStatus(src).toSeq.map(_.getPath) // flat staged dirs in these tests
        else Seq(src)
      mkdirs(dst)
      files.foreach { f =>
        crashAfterFiles.foreach(n => if (copied >= n) throw new InjectedCrash)
        val target = if (getFileStatus(src).isDirectory) new Path(dst, f.getName) else dst
        FileUtil.copy(this, f, this, target, false, true, getConf)
        copied += 1
      }
      delete(src, true)
      true
    }
  }

  private def newTable(): (NonAtomicRenameFs, Path) = {
    val fs = new NonAtomicRenameFs
    (fs, new Path(Files.createTempDirectory("graft_gentable_").toString, "table"))
  }

  /** Stage a 3-file parquet dir holding `values` and return its path. */
  private def stage(values: Seq[Int]): Path = {
    val dir = Files.createTempDirectory("graft_gentable_stage_").toString + "/staged"
    values.toDF("v").repartition(3).write.parquet(dir)
    new Path(dir)
  }

  private def liveValues(fs: FileSystem, root: Path): Option[Set[Int]] =
    GenTable.resolve(fs, root).map { gen =>
      spark.read.parquet(gen.toString).collect().map(_.getInt(0)).toSet
    }

  test("publish + resolve round-trip on a store with copy+delete rename") {
    val (fs, root) = newTable()
    assert(GenTable.resolve(fs, root).isEmpty)
    GenTable.publish(fs, root, stage(Seq(1, 2, 3)))
    assert(liveValues(fs, root).contains(Set(1, 2, 3)))
    GenTable.publish(fs, root, stage(Seq(4, 5)))
    assert(liveValues(fs, root).contains(Set(4, 5)))
    // keep=2: previous generation still present for in-flight readers
    val gens = fs.listStatus(root).map(_.getPath.getName).filter(_.startsWith("gen_"))
    assert(gens.length == 2, s"expected 2 retained generations, got ${gens.toSeq}")
    GenTable.publish(fs, root, stage(Seq(6)))
    assert(fs.listStatus(root).count(_.getPath.getName.startsWith("gen_")) == 2,
      "oldest generation must be pruned")
  }

  test("crash MID-COPY of the staging move: live table stays the old generation, intact") {
    val (fs, root) = newTable()
    GenTable.publish(fs, root, stage(Seq(1, 2, 3)))
    // crash after one file of the new generation has been copied
    fs.copied = 0
    fs.crashAfterFiles = Some(1)
    intercept[InjectedCrash](GenTable.publish(fs, root, stage(Seq(9, 9, 9))))
    fs.crashAfterFiles = None
    // the half-copied generation is invisible; the old one reads whole
    assert(liveValues(fs, root).contains(Set(1, 2, 3)),
      "a crashed non-atomic publish corrupted the live table")
    // recovery: the next publish clears the stranded partial dir and lands
    GenTable.publish(fs, root, stage(Seq(7, 8)))
    assert(liveValues(fs, root).contains(Set(7, 8)))
    val uncommitted = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("gen_"))
      .filterNot(p => fs.exists(new Path(p, "_COMMITTED")))
    assert(uncommitted.isEmpty, s"stranded partial generations: ${uncommitted.toSeq}")
  }

  test("crash BETWEEN move and marker: the moved-but-uncommitted generation stays invisible") {
    val (fs, root) = newTable()
    GenTable.publish(fs, root, stage(Seq(1, 2, 3)))
    // simulate by constructing the post-move pre-marker state directly:
    // a complete generation dir with no _COMMITTED
    val staged = stage(Seq(5, 5))
    assert(fs.rename(staged, new Path(root, "gen_000000007")))
    assert(liveValues(fs, root).contains(Set(1, 2, 3)),
      "an uncommitted generation must never be resolved")
    // recovery publish: partial is cleared, new data lands above it
    GenTable.publish(fs, root, stage(Seq(6)))
    assert(liveValues(fs, root).contains(Set(6)))
  }

  test("a generation carries its _stats sidecar: publish stages data + zone maps as one unit") {
    import graft.sources.StatsIndex
    import org.apache.spark.sql.functions.col
    // staged dir = clustered parquet + its stats sidecar, published
    // together; a resolved reader gets a (files, stats) pair that can
    // never be mutually stale (the StatsIndex staleness contract)
    val stagedDir = Files.createTempDirectory("graft_gentable_stats_").toString + "/staged"
    graft.sinks.Sinks.writeClustered(
      spark.range(0, 400).toDF("v"), stagedDir, Seq("v"), files = 4)
    StatsIndex.writeSidecar(StatsIndex.fromFooters(spark, stagedDir, Seq("v")), stagedDir)
    val fs = new Path(stagedDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new Path(Files.createTempDirectory("graft_gentable_").toString, "table")
    GenTable.publish(fs, root, new Path(stagedDir))
    val gen = GenTable.resolve(fs, root).get.toString
    // sidecar resolved from the LIVE generation path; reads prune there
    assert(StatsIndex.readSidecar(spark, gen).isDefined)
    val pruned = StatsIndex.prunedRead(spark, gen,
      Seq(StatsIndex.ColRange("v", Some(0L), Some(99L))))
    assert(pruned.collect().map(_.getLong(0)).toSet == (0L until 100L).toSet)
    // and the sidecar stays invisible to a plain read of the generation
    assert(spark.read.parquet(gen).count() == 400)
  }

  test("crash AFTER marker, before prune: newest committed generation wins; prune heals later") {
    val (fs, root) = newTable()
    GenTable.publish(fs, root, stage(Seq(1)), keep = 1)
    GenTable.publish(fs, root, stage(Seq(2)), keep = 1)
    // keep=1 still resolves the newest even if older dirs linger: plant a
    // leftover lower committed generation (prune crash leftovers)
    val old = new Path(root, "gen_000000000")
    if (!fs.exists(old)) {
      assert(fs.rename(stage(Seq(0)), old))
      fs.create(new Path(old, "_COMMITTED"), true).close()
    }
    assert(liveValues(fs, root).contains(Set(2)))
    GenTable.publish(fs, root, stage(Seq(3)), keep = 1)
    assert(fs.listStatus(root).count(_.getPath.getName.startsWith("gen_")) == 1,
      "prune must eventually drop all older generations")
    assert(liveValues(fs, root).contains(Set(3)))
  }

  test("time travel: resolveAt reads a retained prior generation; history is bounded") {
    val (fs, root) = newTable()
    GenTable.publish(fs, root, stage(Seq(1)), keep = 2)
    GenTable.publish(fs, root, stage(Seq(2)), keep = 2)
    assert(GenTable.committed(fs, root) == Seq(0L, 1L))
    def at(gen: Long): Option[Set[Int]] =
      GenTable.resolveAt(fs, root, gen).map(p =>
        spark.read.parquet(p.toString).collect().map(_.getInt(0)).toSet)
    assert(at(0L).contains(Set(1)) && at(1L).contains(Set(2)))
    assert(liveValues(fs, root).contains(Set(2)), "live read unaffected")
    // a third publish prunes generation 0 out of the retention window
    GenTable.publish(fs, root, stage(Seq(3)), keep = 2)
    assert(at(0L).isEmpty, "pruned generation must not time-travel")
    assert(at(1L).contains(Set(2)) && at(2L).contains(Set(3)))
    assert(GenTable.committed(fs, root) == Seq(1L, 2L))
  }
}
