package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps with a pruning read path — the data-skipping
  * half of the clustering story ([[graft.sinks.Sinks.writeClustered]] /
  * `writeZOrdered` are the layout half).
  *
  * Parquet's own footer statistics already skip ROW GROUPS, but only
  * after the scan has opened every file: at 100 TB / ~1M files the
  * dominant cost of a selective query is touching a million footers,
  * not decoding pages. Lakehouse formats fix this with a tiny
  * FILE-level stats table consulted before the scan plans its file
  * list; this object is that design on vanilla Spark:
  *
  *   - [[fromFooters]] builds per-(file, column) min/max/null stats by
  *     reading ONLY parquet footers — cost is #files metadata reads,
  *     zero data pages, distributed over executors;
  *   - [[writeSidecar]] persists them under `<dir>/_stats` (an
  *     underscore path, invisible to `spark.read.parquet(dir)`);
  *   - [[prunedRead]] drops every file whose stats PROVE a range
  *     predicate can't match, then applies the same predicate as a real
  *     filter — pruning is a performance fact, never a correctness
  *     input, and the residual filter still row-group-skips inside the
  *     kept files.
  *
  * Skipping is strictly conservative. A column whose footer stats are
  * missing or whose physical type we don't lane (`kind = opaque`) keeps
  * its file; a file missing the column entirely (schema evolution)
  * keeps it; only a proven-disjoint range skips. Three value lanes:
  *
  *   - `long`: INT32/INT64 incl. DATE (epoch days) and annotated
  *     TIMESTAMP (normalized to epoch micros; nanos floor/ceil to stay
  *     outward-conservative). INT96 timestamps have no trustworthy
  *     stats → opaque.
  *   - `double`: FLOAT/DOUBLE. Parquet writers exclude NaN from
  *     min/max, and Spark orders NaN ABOVE every double — so a file's
  *     `max < lo` only proves "no match" when the predicate also has a
  *     finite upper bound (a NaN row would fail `<= hi` but would pass
  *     a lone `>= lo`). [[keepFile]] encodes exactly that asymmetry.
  *   - `string`: BINARY/UTF8, compared as unsigned UTF-8 bytes — the
  *     order parquet stats and Spark's UTF8String both use (Java
  *     `String.compareTo` is UTF-16 order and disagrees above the BMP).
  *     Writer-truncated binary stats stay valid bounds by the parquet
  *     contract (min truncated downward, max upward).
  *
  * Scale shape: the index is #files × #columns rows — an index, not a
  * corpus. Pruning collects it to the driver (the same driver-resident
  * plan Delta's log replay makes); the read lists only surviving files,
  * so a selective query on a [[graft.sinks.Sinks.writeClustered]]
  * layout opens O(matching) files instead of O(all). Range predicates
  * are null-excluding by SQL semantics, which is what lets an all-null
  * file skip.
  *
  * Staleness contract: the sidecar describes the file set it was built
  * from. Any rewrite of the table ([[graft.sinks.Sinks.compact]],
  * re-clustering) must rebuild it — a stale sidecar names files that no
  * longer exist, so [[prunedRead]] fails LOUDLY on the missing paths
  * rather than silently mis-skipping (part-file names carry write-UUIDs
  * and are never reused). The clean deployment shape is a
  * [[graft.sinks.GenTable]] generation dir carrying its own `_stats`:
  * publish stages data + sidecar together, so readers always resolve a
  * (files, stats) pair that was written as one unit (GenTableSpec pins
  * the round trip).
  */
object StatsIndex {

  /** One zone-map row. `kind` ∈ long | double | string | opaque;
    * opaque rows (untyped or untrusted stats) always keep their file.
    * An all-null column has `nulls == rows` and empty min/max.
    * `file` is the BASENAME relative to the table dir (flat layout
    * contract) — the sidecar stays valid when the whole dir moves,
    * which is what lets a [[graft.sinks.GenTable]] publish relocate
    * data + stats as one unit. */
  final case class FileColStats(
      file: String, column: String, kind: String, rows: Long, nulls: Long,
      lmin: Option[Long], lmax: Option[Long],
      dmin: Option[Double], dmax: Option[Double],
      smin: Option[String], smax: Option[String])

  /** Closed range predicate; `None` = unbounded on that side. Bounds
    * are Scala/Java literals matching the column's lane: Int/Long,
    * Float/Double, String, java.time.LocalDate, java.time.Instant. */
  final case class ColRange(column: String, lower: Option[Any], upper: Option[Any])

  /** Hadoop Configuration is not Serializable; ship it by Writable
    * round-trip (what Spark's own SerializableConfiguration does). */
  private final class SerConf(@transient var conf: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject(); conf = new Configuration(false); conf.readFields(in)
    }
  }

  private def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }
  private def minU(a: String, b: String): String = if (cmpUtf8(a, b) <= 0) a else b
  private def maxU(a: String, b: String): String = if (cmpUtf8(a, b) >= 0) a else b

  /** Zone maps for `cols` from parquet footers only — no data pages.
    * Footer reads run on executors (#files tasks of metadata I/O).
    * Nested columns are out of contract (flat names only). */
  def fromFooters(spark: SparkSession, dir: String, cols: Seq[String]): Dataset[FileColStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    fromFootersOf(spark, dataFiles(conf, dir), cols)
  }

  /** [[fromFooters]] over an EXPLICIT file list (full paths) — the leg
    * for incremental sidecar maintenance, where only a batch's newly
    * appended files need footer reads. */
  def fromFootersOf(spark: SparkSession, files: Seq[String],
                    cols: Seq[String]): Dataset[FileColStats] = {
    require(cols.nonEmpty, "StatsIndex: no columns to index")
    require(cols.forall(!_.contains(".")), s"StatsIndex: flat column names only, got $cols")
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val ser = new SerConf(conf)
    val colList = cols.toList
    spark.createDataset(files)
      .repartition(math.min(files.size, spark.sparkContext.defaultParallelism).max(1))
      .mapPartitions { paths =>
        val c = ser.conf
        paths.flatMap(p => footerStats(c, p, colList))
      }
      .map(s => s.copy(file = s.file.substring(s.file.lastIndexOf('/') + 1)))
  }

  /** The same zone maps from one data scan — the leg for stores whose
    * footers are unavailable or untrusted, and the cross-check oracle
    * for [[fromFooters]] in the spec. One aggregate over
    * `input_file_name()`; output is #files × #cols rows. */
  def fromScan(spark: SparkSession, dir: String, cols: Seq[String]): Dataset[FileColStats] = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val df = spark.read.parquet(dir)
    val fields = df.schema.fields.filter(f => cols.contains(f.name))
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val (laned: Column, kind: String) = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => (c.cast("long"), "long")
        case DateType => (unix_date(c).cast("long"), "long")
        case TimestampType => (unix_micros(c), "long")
        case FloatType | DoubleType => (c.cast("double"), "double")
        case StringType => (c, "string")
        case _ => (lit(null), "opaque")
      }
      Seq(
        min(laned).as(s"min__${f.name}__$kind"),
        max(laned).as(s"max__${f.name}__$kind"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls__${f.name}__$kind"))
    }
    val allAggs = count(lit(1)).as("rows") +: aggs
    val agg = df.groupBy(input_file_name().as("file"))
      .agg(allAggs.head, allAggs.tail: _*)
    agg.collect().toSeq.flatMap { r =>
      val full = r.getAs[String]("file")
      val file = full.substring(full.lastIndexOf('/') + 1)
      val rows = r.getAs[Long]("rows")
      fields.map { f =>
        val kind = r.schema.fieldNames.find(_.startsWith(s"min__${f.name}__")).get.split("__").last
        def opt[T](pre: String): Option[T] = {
          val i = r.fieldIndex(s"${pre}__${f.name}__$kind")
          if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[T])
        }
        val nulls = r.getAs[Long](s"nulls__${f.name}__$kind")
        kind match {
          case "long" => FileColStats(file, f.name, kind, rows, nulls,
            opt[Long]("min"), opt[Long]("max"), None, None, None, None)
          case "double" => FileColStats(file, f.name, kind, rows, nulls,
            None, None, opt[Double]("min"), opt[Double]("max"), None, None)
          case "string" => FileColStats(file, f.name, kind, rows, nulls,
            None, None, None, None, opt[String]("min"), opt[String]("max"))
          case _ => FileColStats(file, f.name, "opaque", rows, nulls,
            None, None, None, None, None, None)
        }
      }
    }.toDS()
  }

  /** Persist under `<dir>/_stats`: underscore paths are hidden from
    * `spark.read.parquet(dir)`, so the sidecar never leaks into the
    * table it describes. One small file — it's an index. */
  def writeSidecar(stats: Dataset[FileColStats], dir: String): Unit =
    stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stats")

  /** EXTEND the sidecar with stats for newly appended files — the
    * streaming-ingestion leg: each micro-batch appends its files' zone
    * maps (one small parquet file per batch; [[readSidecar]] reads the
    * whole `_stats` dir, so per-batch files just union). Callers own
    * the files-appear-once contract: pass stats for the NEW files
    * only ([[fromFootersOf]]); periodic [[graft.sinks.Sinks.compact]]
    * folds both data and sidecar back to one file each. */
  def appendSidecar(stats: Dataset[FileColStats], dir: String): Unit =
    stats.coalesce(1).write.mode("append").parquet(s"$dir/_stats")

  def readSidecar(spark: SparkSession, dir: String): Option[Dataset[FileColStats]] = {
    import spark.implicits._
    val p = new Path(s"$dir/_stats")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString).as[FileColStats]) else None
  }

  /** Data files under `dir` that `stats` carries NO rows for. Unlike
    * column-level `opaque` (which [[pruneFiles]] keeps), whole-file
    * absence from a sidecar is not conservative by construction: a
    * crash between a data append and its sidecar append
    * ([[appendSidecar]]'s single-writer window, e.g. via
    * `Sinks.appendClustered`) leaves live files the index has never
    * heard of. Pruning callers must UNION these into the kept set —
    * pruning is an optimization, never a correctness input — and the
    * next `compact`/`writeSidecar` heals the index itself. */
  def unindexedFiles(spark: SparkSession, dir: String,
                     stats: Seq[FileColStats]): Seq[String] = {
    val known = stats.map(_.file).toSet
    dataFiles(spark.sparkContext.hadoopConfiguration, dir)
      .map(f => f.substring(f.lastIndexOf('/') + 1))
      .filterNot(known)
  }

  /** Read `dir` keeping only files whose zone maps admit every range,
    * then enforce the ranges as real filters (correctness never rests
    * on the pruning). Stats come from the caller, else the sidecar,
    * else a fresh footer pass. Files on disk but absent from the stats
    * are kept unconditionally ([[unindexedFiles]]). */
  def prunedRead(spark: SparkSession, dir: String, preds: Seq[ColRange],
      stats: Option[Dataset[FileColStats]] = None): DataFrame = {
    require(preds.nonEmpty, "StatsIndex.prunedRead: no predicates — use spark.read.parquet")
    val st = stats.orElse(readSidecar(spark, dir))
      .getOrElse(fromFooters(spark, dir, preds.map(_.column).distinct))
    val stList = st.collect().toSeq
    val kept = (pruneFiles(stList, preds) ++ unindexedFiles(spark, dir, stList))
      .distinct.sorted.map(f => s"$dir/$f")
    val base =
      if (kept.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(kept: _*)
    preds.foldLeft(base)((df, p) => df.where(predFilter(p)))
  }

  /** File basenames that survive pruning, sorted. Collecting `stats`
    * is bounded by index size (#files × #cols), never corpus rows. */
  def pruneFiles(stats: Seq[FileColStats], preds: Seq[ColRange]): Seq[String] =
    stats.groupBy(_.file).collect {
      case (file, cs) if preds.forall(p => keepFile(cs, p)) => file
    }.toSeq.sorted

  /** The residual filter for one range — also exactly the predicate
    * pruning promises can't match on skipped files. */
  def predFilter(p: ColRange): Column = {
    val c = col(p.column)
    val lo = p.lower.map(v => c >= lit(v)).getOrElse(lit(true))
    val hi = p.upper.map(v => c <= lit(v)).getOrElse(lit(true))
    lo && hi
  }

  private def keepFile(cs: Seq[FileColStats], p: ColRange): Boolean =
    cs.find(_.column == p.column) match {
      case None => true // column not indexed for this file — keep
      case Some(s) => s.kind match {
        case "opaque" => true
        case _ if s.nulls == s.rows => false // all null: a range can't match
        case "long" =>
          val lo = p.lower.map(longBound(_, roundUp = false))
          val hi = p.upper.map(longBound(_, roundUp = true))
          lo.forall(l => s.lmax.exists(_ >= l)) && hi.forall(h => s.lmin.exists(_ <= h))
        case "double" =>
          val lo = p.lower.map(doubleBound)
          val hi = p.upper.map(doubleBound)
          // max < lo proves no match only with a finite upper bound:
          // a NaN row (absent from stats, > max in Spark's order)
          // passes a lone `>= lo` but can never pass `<= hi`.
          val skipByMax = lo.exists(l => s.dmax.exists(_ < l)) && hi.isDefined
          val skipByMin = hi.exists(h => s.dmin.exists(_ > h))
          !skipByMax && !skipByMin
        case "string" =>
          val lo = p.lower.map(stringBound)
          val hi = p.upper.map(stringBound)
          lo.forall(l => s.smax.exists(cmpUtf8(_, l) >= 0)) &&
            hi.forall(h => s.smin.exists(cmpUtf8(_, h) <= 0))
      }
    }

  /** Bound → the long lane's unit (dates: epoch days; timestamps:
    * epoch micros). `roundUp` keeps sub-unit truncation outward. */
  private def longBound(v: Any, roundUp: Boolean): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case d: java.time.LocalDate => d.toEpochDay
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case t: java.time.Instant =>
      math.addExact(math.multiplyExact(t.getEpochSecond, 1000000L),
        (t.getNano / 1000).toLong + (if (roundUp && t.getNano % 1000 != 0) 1L else 0L))
    case t: java.sql.Timestamp => longBound(t.toInstant, roundUp)
    case other => sys.error(s"StatsIndex: unsupported long-lane bound $other (${other.getClass})")
  }

  private def doubleBound(v: Any): Double = v match {
    case f: Float => f.toDouble
    case d: Double =>
      require(!d.isNaN, "StatsIndex: NaN bound is not a range"); d
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case other => sys.error(s"StatsIndex: unsupported double-lane bound $other (${other.getClass})")
  }

  private def stringBound(v: Any): String = v match {
    case s: String => s
    case other => sys.error(s"StatsIndex: unsupported string-lane bound $other (${other.getClass})")
  }

  /** Visible data files under `dir` (recursing one partition level is
    * out of contract — partitioned tables prune by directory first,
    * PlanContractSpec's partition-pruning leg). */
  private def dataFiles(conf: Configuration, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).sorted
  }

  /** Footer → zone-map rows for one file. Any distrust (missing stats,
    * unset null counts, untyped lane) degrades that column to opaque —
    * the file is then never skipped on it. */
  private def footerStats(conf: Configuration, file: String, cols: List[String]): List[FileColStats] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toList
      val rows = blocks.map(_.getRowCount).sum
      cols.map { name =>
        val chunks = blocks.flatMap(_.getColumns.asScala.filter(_.getPath.toDotString == name))
        if (chunks.size != blocks.size || chunks.isEmpty)
          FileColStats(file, name, "opaque", rows, 0L, None, None, None, None, None, None)
        else laneFold(file, name, rows, chunks)
      }
    } finally reader.close()
  }

  private def laneFold(file: String, name: String, rows: Long,
      chunks: List[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]): FileColStats = {
    val opaque = FileColStats(file, name, "opaque", rows, 0L, None, None, None, None, None, None)
    val pt = chunks.head.getPrimitiveType
    val ann = pt.getLogicalTypeAnnotation
    // timestamp unit → micros normalization; None = plain integer lane
    val tsScale: Option[LogicalTypeAnnotation.TimeUnit] = ann match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => Some(t.getUnit)
      case _ => None
    }
    def toMicros(v: Long, roundUp: Boolean): Long = tsScale match {
      case None => v
      case Some(LogicalTypeAnnotation.TimeUnit.MICROS) => v
      case Some(LogicalTypeAnnotation.TimeUnit.MILLIS) => math.multiplyExact(v, 1000L)
      case Some(LogicalTypeAnnotation.TimeUnit.NANOS) =>
        if (roundUp) math.floorDiv(v + 999L, 1000L) else math.floorDiv(v, 1000L)
    }
    val isDecimal = ann.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
    val isString = ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] ||
      ann.isInstanceOf[LogicalTypeAnnotation.EnumLogicalTypeAnnotation]
    val kind = pt.getPrimitiveTypeName match {
      case _ if isDecimal => "opaque" // unscaled ints would need scale math; not laned
      case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 => "long"
      case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => "double"
      case PrimitiveTypeName.BINARY if isString => "string"
      case _ => "opaque" // BOOLEAN, INT96, FIXED_LEN_BYTE_ARRAY, raw BINARY
    }
    if (kind == "opaque") return opaque

    var nulls = 0L
    var lmin, lmax: Option[Long] = None
    var dmin, dmax: Option[Double] = None
    var smin, smax: Option[String] = None
    for (ch <- chunks) {
      val st = ch.getStatistics
      if (st == null || !st.isNumNullsSet) return opaque
      nulls = math.addExact(nulls, st.getNumNulls)
      if (st.hasNonNullValue) kind match {
        case "long" =>
          val (mn, mx) = (st.genericGetMin, st.genericGetMax) match {
            case (a: java.lang.Integer, b: java.lang.Integer) => (a.toLong, b.toLong)
            case (a: java.lang.Long, b: java.lang.Long) => (a.longValue, b.longValue)
            case other => sys.error(s"StatsIndex: unexpected INT stats $other")
          }
          lmin = Some(lmin.fold(toMicros(mn, roundUp = false))(_ min toMicros(mn, roundUp = false)))
          lmax = Some(lmax.fold(toMicros(mx, roundUp = true))(_ max toMicros(mx, roundUp = true)))
        case "double" =>
          // parquet-mr widens a zero bound to -0.0 / +0.0 for safety;
          // canonicalize so stats equal the scan-derived ones (boxed
          // Double equality distinguishes the zeros, ordering doesn't)
          def canon(d: Double): Double = if (d == 0.0d) 0.0d else d
          val (mn, mx) = (st.genericGetMin, st.genericGetMax) match {
            case (a: java.lang.Float, b: java.lang.Float) => (canon(a.toDouble), canon(b.toDouble))
            case (a: java.lang.Double, b: java.lang.Double) => (canon(a.doubleValue), canon(b.doubleValue))
            case other => sys.error(s"StatsIndex: unexpected FP stats $other")
          }
          dmin = Some(dmin.fold(mn)(_ min mn)); dmax = Some(dmax.fold(mx)(_ max mx))
        case "string" =>
          val (mn, mx) = (st.genericGetMin, st.genericGetMax) match {
            case (a: org.apache.parquet.io.api.Binary, b: org.apache.parquet.io.api.Binary) =>
              (a.toStringUsingUTF8, b.toStringUsingUTF8)
            case other => sys.error(s"StatsIndex: unexpected BINARY stats $other")
          }
          smin = Some(smin.fold(mn)(minU(_, mn))); smax = Some(smax.fold(mx)(maxU(_, mx)))
      }
    }
    val hasValues = lmin.isDefined || dmin.isDefined || smin.isDefined
    if (!hasValues && nulls != rows) opaque // stats claim no values but rows aren't all null
    else FileColStats(file, name, kind, rows, nulls, lmin, lmax, dmin, dmax, smin, smax)
  }
}
