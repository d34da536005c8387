package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

/** Object-store-safe table publication — the non-atomic-rename leg of
  * [[Sinks.swapIn]].
  *
  * `swapIn`'s two-rename swap is correct exactly where `rename` is
  * atomic (HDFS, POSIX local). Object stores break both assumptions a
  * real 100-TB deployment lands on: S3-class "rename" is a server-side
  * copy + delete per object — slow, and a crash mid-copy leaves a
  * half-copied directory AT THE LIVE PATH. This protocol never renames
  * the live table at all:
  *
  *   - the table root holds GENERATION subdirs `gen_<n>`;
  *   - a generation is live iff its `_COMMITTED` marker object exists,
  *     and readers resolve the HIGHEST committed generation ([[resolve]]);
  *   - [[publish]] moves the staged dir to the next `gen_<n>` (this may
  *     be a non-atomic copy+delete — the dir is unreferenced until its
  *     marker lands, so a crash strands an uncommitted dir, never a
  *     half-live table), then writes the marker, then prunes.
  *
  * The ONLY atomicity assumed is single-small-object visibility — an
  * object PUT either lands whole or not at all, which S3-class stores
  * guarantee and HDFS/local give via create+close of a file written in
  * one call. Marker content is irrelevant; existence is the commit.
  * Crash anywhere:
  *   - mid-stage-move: partial `gen_<n>` without marker — invisible to
  *     readers, deleted by the next publish;
  *   - after move, before marker: same;
  *   - after marker, before prune: both generations committed, readers
  *     take the newest; the next publish prunes.
  *
  * Single-writer contract (same as [[Sinks.compact]]): publishes are
  * serialized by the owning pipeline. `keep >= 2` retains the previous
  * generation so in-flight readers that resolved just before a publish
  * finish their scan against files that still exist (the CdcStream
  * retention discipline).
  *
  * Reference analogue: the move-after-processing contract
  * (`data_loader.py:38-51`) assumes a rename-capable store; this is
  * that contract re-based onto what object stores actually provide —
  * the same commit shape lakehouse formats use (a tiny commit object
  * flips visibility; data objects are immutable once written).
  */
object GenTable {

  private val Committed = "_COMMITTED"
  private val GenPrefix = "gen_"

  private def genId(p: Path): Option[Long] =
    if (p.getName.startsWith(GenPrefix))
      p.getName.stripPrefix(GenPrefix).toLongOption
    else None

  private def generations(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
      .flatMap(p => genId(p).map(_ -> p)).sortBy(_._1)

  private def isCommitted(fs: FileSystem, gen: Path): Boolean =
    fs.exists(new Path(gen, Committed))

  /** The live generation dir: the highest `gen_<n>` whose `_COMMITTED`
    * marker exists. None for a table nothing has published to yet. */
  def resolve(fs: FileSystem, root: Path): Option[Path] =
    generations(fs, root).reverseIterator
      .map(_._2).find(isCommitted(fs, _))

  /** All committed generation ids, ascending — the table's retained
    * history (bounded by `publish`'s `keep`). */
  def committed(fs: FileSystem, root: Path): Seq[Long] =
    generations(fs, root).collect { case (id, p) if isCommitted(fs, p) => id }

  /** TIME TRAVEL: the dir of committed generation `gen`, if still
    * retained. With `keep >= 2` the previous generation is always
    * readable, so a consumer can diff table versions (feed
    * [[graft.operators.SnapshotDiff]]) or re-run against the exact
    * input a job saw — the lakehouse `VERSION AS OF` contract, bounded
    * by the retention window. */
  def resolveAt(fs: FileSystem, root: Path, gen: Long): Option[Path] =
    generations(fs, root)
      .collectFirst { case (id, p) if id == gen && isCommitted(fs, p) => p }

  /** Publish the directory at `staged` as the next generation of the
    * table at `root`; returns the live generation path. `staged` is
    * consumed. Keeps the newest `keep` committed generations. */
  def publish(fs: FileSystem, root: Path, staged: Path, keep: Int = 2): Path = {
    require(keep >= 1, s"GenTable: keep must be >= 1, got $keep")
    fs.mkdirs(root)
    val gens = generations(fs, root)
    // crash leftovers: uncommitted generation dirs are unreferenced —
    // delete rather than reuse (a partial copy must never gain a marker)
    gens.filterNot { case (_, p) => isCommitted(fs, p) }
      .foreach { case (_, p) => fs.delete(p, true) }
    val next = gens.lastOption.map(_._1 + 1).getOrElse(0L)
    val gen = new Path(root, f"$GenPrefix$next%09d")
    // may be a non-atomic copy+delete on object stores: safe, because
    // nothing references `gen` until the marker below exists
    require(fs.rename(staged, gen), s"GenTable: staging $staged -> $gen failed")
    fs.create(new Path(gen, Committed), true).close() // the commit point
    val committed = generations(fs, root).filter { case (_, p) => isCommitted(fs, p) }
    committed.dropRight(keep).foreach { case (_, p) => fs.delete(p, true) }
    gen
  }
}
