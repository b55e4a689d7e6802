package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (min/max data skipping) for parquet tables — the
  * stats half of a transaction log, without the log. Delta/Iceberg keep
  * per-file min/max in their manifests so a range predicate never opens
  * files it can prove empty; plain parquet tables already HAVE those
  * stats (every row group footer carries typed min/max/null counts), they
  * are just re-read from scratch on every query. This module lifts them
  * once into a queryable manifest and serves pruned reads from it.
  *
  * At 100 TB the arithmetic is the whole point: a table is ~100k files of
  * ~1 GB, and a time-ranged query typically wants <1% of them. Footer
  * reads are metadata-only (~KBs per file, no data pages), collected in
  * parallel across the cluster — so building the manifest costs minutes,
  * not the hours a full scan would, and each pruned query thereafter
  * skips the scan entirely for excluded files: no task, no open, no
  * footer read.
  *
  * Correctness contract (same as delta data skipping): a file is skipped
  * ONLY when the manifest proves no row can satisfy `lo <= col <= hi` —
  * stats disjoint from the range, or the file provably all-null (a range
  * predicate is null-rejecting). Files with unreadable/unsupported stats
  * and files NOT in the manifest (written after stats collection) are
  * always read; pruning can therefore never change a query's result,
  * only its cost. The actual predicate is still applied after the read —
  * skipping is an optimization, never the filter.
  *
  * Types are normalized into three comparable families, delta-style:
  * integers/dates/timestamps → `long` (dates as epoch days, timestamps
  * as micros regardless of the file's physical unit), float/double →
  * `double`, UTF8 binary → `string`. Parquet binary stats may be
  * writer-truncated, but truncation preserves bound semantics (min stays
  * a lower bound, max an upper bound), which is all skipping needs.
  */
object DataSkipping {

  /** One (file, column) manifest row. `hasStats = false` means at least
    * one row group had no usable statistics for the column — the file is
    * then never skippable. A row with `hasStats = true` and null min/max
    * is a provably all-null column (skippable under any range predicate).
    * `nulls = -1` when any row group left the null count unset.
    */
  case class ColumnZone(
      file: String, column: String, rows: Long, nulls: Long,
      family: String,
      minLong: Option[Long], maxLong: Option[Long],
      minDouble: Option[Double], maxDouble: Option[Double],
      minString: Option[String], maxString: Option[String],
      hasStats: Boolean)

  case class PruneReport(filesTotal: Int, filesRead: Int,
                         filesSkipped: Int)

  case class PrunedRead(df: DataFrame, report: PruneReport)

  /** One conjunct of a multi-column range predicate (see
    * [[readPrunedMulti]]). The family tag picks which normalized stats
    * the bound compares against — the same three families
    * [[collectStats]] writes.
    */
  sealed trait ColRange { def column: String }
  final case class LongRange(column: String, lo: Long, hi: Long)
      extends ColRange
  final case class DoubleRange(column: String, lo: Double, hi: Double)
      extends ColRange
  final case class StringRange(column: String, lo: String, hi: String)
      extends ColRange

  /** Build the zone-map manifest for `columns` of the parquet table at
    * `root`: one footer read per file, fanned out across the cluster
    * (files are driver-listed — the same listing Spark's own FileIndex
    * does — but the footers are opened executor-side). The result is a
    * small Dataset (one row per file×column); persist it next to the
    * table and reuse it across queries — that reuse is the economics.
    */
  def collectStats(spark: SparkSession, root: String,
                   columns: Seq[String]): Dataset[ColumnZone] = {
    import spark.implicits._
    val files = listVisibleParquet(spark, root)
    val hadoopConf = spark.sparkContext.broadcast(
      new org.apache.spark.SerializableWritable(
        spark.sparkContext.hadoopConfiguration))
    val cols = columns.toIndexedSeq
    if (files.isEmpty) spark.emptyDataset[ColumnZone]
    else spark.createDataset(files)
      .repartition(math.max(1,
        math.min(files.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { paths =>
        val conf = hadoopConf.value.value
        paths.flatMap(p => fileZones(conf, p, cols))
      }
  }

  /** Read the table at `root` minus every file the manifest proves
    * disjoint from `lo <= column <= hi` (long family: integers, dates as
    * epoch days, timestamps as epoch micros).
    */
  def readPrunedLong(spark: SparkSession, root: String, stats: DataFrame,
                     column: String, lo: Long, hi: Long): PrunedRead =
    readPruned(spark, root, stats, column, "long",
      "minLong", "maxLong", lit(lo), lit(hi))

  def readPrunedDouble(spark: SparkSession, root: String, stats: DataFrame,
                       column: String, lo: Double, hi: Double): PrunedRead =
    readPruned(spark, root, stats, column, "double",
      "minDouble", "maxDouble", lit(lo), lit(hi))

  def readPrunedString(spark: SparkSession, root: String, stats: DataFrame,
                       column: String, lo: String, hi: String): PrunedRead =
    readPruned(spark, root, stats, column, "string",
      "minString", "maxString", lit(lo), lit(hi))

  def readPrunedDate(spark: SparkSession, root: String, stats: DataFrame,
                     column: String, lo: java.sql.Date,
                     hi: java.sql.Date): PrunedRead =
    readPrunedLong(spark, root, stats, column,
      lo.toLocalDate.toEpochDay, hi.toLocalDate.toEpochDay)

  /** Prune under a CONJUNCTION of range predicates: a file is skipped
    * when ANY conjunct proves it disjoint — the multi-column payoff of a
    * z-ordered layout (every z-ordered column's zones are tight, so each
    * conjunct skips independently). Same correctness contract as the
    * single-column paths: pruning can change cost, never results.
    */
  def readPrunedMulti(spark: SparkSession, root: String, stats: DataFrame,
                      ranges: Seq[ColRange]): PrunedRead = {
    require(ranges.nonEmpty, "readPrunedMulti needs at least one range")
    val skipCond = ranges.map {
      case LongRange(c, lo, hi) =>
        skipFor(c, "long", "minLong", "maxLong", lit(lo), lit(hi))
      case DoubleRange(c, lo, hi) =>
        skipFor(c, "double", "minDouble", "maxDouble", lit(lo), lit(hi))
      case StringRange(c, lo, hi) =>
        skipFor(c, "string", "minString", "maxString", lit(lo), lit(hi))
    }.reduce(_ || _)
    readKeeping(spark, root, stats, skipCond)
  }

  /** Skip condition for one manifest row under `lo <= column <= hi`. */
  private def skipFor(column: String, family: String,
                      minName: String, maxName: String,
                      lo: Column, hi: Column): Column = {
    val mn = col(minName)
    val mx = col(maxName)
    val disjoint = mn.isNull || mx < lo || mn > hi
    col("column") === column && col("hasStats") &&
      (col("family") === "unknown" || (col("family") === family && disjoint))
  }

  /** Decide skippability IN SPARK over the manifest (the manifest can be
    * millions of rows at warehouse scale; only the skipped paths come
    * back to the driver — bounded by the table's file count, the same
    * order Spark's FileIndex already holds driver-side). Files absent
    * from the manifest are read unconditionally.
    */
  private def readPruned(spark: SparkSession, root: String,
                         stats: DataFrame, column: String, family: String,
                         minName: String, maxName: String,
                         lo: Column, hi: Column): PrunedRead =
    readKeeping(spark, root, stats,
      skipFor(column, family, minName, maxName, lo, hi))

  private def readKeeping(spark: SparkSession, root: String,
                          stats: DataFrame, skipCond: Column): PrunedRead = {
    val skipped = stats
      .where(skipCond)
      .select(col("file"))
      .collect().map(_.getString(0)).toSet
    val all = listVisibleParquet(spark, root)
    val kept = all.filterNot(skipped.contains)
    val df =
      if (kept.isEmpty)
        spark.read.option("basePath", root).parquet(root).where(lit(false))
      else
        spark.read.option("basePath", root).parquet(kept: _*)
    PrunedRead(df,
      PruneReport(all.size, kept.size, all.size - kept.size))
  }

  /** Visible-file listing: same hidden-path rule the parquet reader
    * itself applies (and [[Compaction.vacuum]] relies on) — `_`/`.`
    * prefixed paths don't exist to readers, so they don't exist to the
    * manifest either.
    */
  private[graft] def listVisibleParquet(spark: SparkSession,
                                          root: String): Seq[String] = {
    val rootPath = new Path(root)
    val fs = FileSystem.get(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        // Spark's own visibility rule: '.'-prefixed and '_'-prefixed
        // names are hidden UNLESS partition-style (containing '='), so
        // epoch-partitioned layouts (`__epoch=0/`) stay visible to the
        // same files a read sees (C91's tombstones over stored codes)
        if (n.startsWith(".") ||
            (n.startsWith("_") && !n.contains("="))) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else if (n.endsWith(".parquet")) Seq(st.getPath.toString)
        else Seq.empty
      }
    if (fs.exists(rootPath)) walk(rootPath) else Seq.empty
  }

  /** Footer → manifest rows for one file. Metadata-only: opens the
    * footer, never a data page.
    */
  private def fileZones(conf: Configuration, file: String,
                        columns: Seq[String]): Seq[ColumnZone] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      columns.map { c =>
        var family: String = null
        var ok = true
        var nulls = 0L
        var nullsKnown = true
        var minL, maxL: Option[Long] = None
        var minD, maxD: Option[Double] = None
        var minS, maxS: Option[String] = None
        blocks.foreach { b =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == c).orNull
          if (cc == null) ok = false
          else familyOf(cc.getPrimitiveType) match {
            case None => ok = false
            case Some(fam) =>
              if (family == null) family = fam
              val st = cc.getStatistics
              if (st == null) ok = false
              else if (st.hasNonNullValue) {
                if (st.isNumNullsSet) nulls += st.getNumNulls
                else nullsKnown = false
                fam match {
                  case "long" =>
                    val (lo, hi) = longBounds(cc.getPrimitiveType, st)
                    minL = Some(minL.fold(lo)(math.min(_, lo)))
                    maxL = Some(maxL.fold(hi)(math.max(_, hi)))
                  case "double" =>
                    val lo = numAsDouble(st.genericGetMin)
                    val hi = numAsDouble(st.genericGetMax)
                    minD = Some(minD.fold(lo)(math.min(_, lo)))
                    maxD = Some(maxD.fold(hi)(math.max(_, hi)))
                  case "string" =>
                    val lo = st.genericGetMin.asInstanceOf[Binary]
                      .toStringUsingUTF8
                    val hi = st.genericGetMax.asInstanceOf[Binary]
                      .toStringUsingUTF8
                    minS = Some(minS.fold(lo)(o => if (o <= lo) o else lo))
                    maxS = Some(maxS.fold(hi)(o => if (o >= hi) o else hi))
                }
              } else if (st.isNumNullsSet &&
                  st.getNumNulls == b.getRowCount) {
                // all-null row group: no min/max to contribute, but the
                // absence is itself a proof, not a gap
                nulls += st.getNumNulls
              } else ok = false // stats absent for unknown reasons
          }
        }
        ColumnZone(file, c, rows,
          if (ok && nullsKnown) nulls else -1L,
          if (family == null) "unknown" else family,
          if (ok) minL else None, if (ok) maxL else None,
          if (ok) minD else None, if (ok) maxD else None,
          if (ok) minS else None, if (ok) maxS else None,
          hasStats = ok)
      }
    } finally reader.close()
  }

  /** Physical+logical type → comparable family. Types whose parquet
    * stats ordering doesn't match value ordering (INT96, unsigned ints,
    * non-UTF8 binary, decimals on binary) map to None → never skipped.
    */
  private def familyOf(t: PrimitiveType): Option[String] = {
    import PrimitiveType.PrimitiveTypeName._
    val ann = t.getLogicalTypeAnnotation
    t.getPrimitiveTypeName match {
      case INT32 | INT64 => ann match {
        case null => Some("long")
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
          Some("long")
        case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          Some("long")
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned => Some("long")
        case _ => None
      }
      case FLOAT | DOUBLE => Some("double")
      case BOOLEAN => Some("long")
      case BINARY => ann match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          Some("string")
        case _ => None
      }
      case _ => None
    }
  }

  /** Long-family bounds, normalized: dates stay epoch days (INT32),
    * timestamps normalize to MICROS whatever the file's unit — nanos
    * round outward (floor the min, ceil the max) so bounds stay bounds.
    */
  private def longBounds(t: PrimitiveType,
      st: org.apache.parquet.column.statistics.Statistics[_]):
      (Long, Long) = {
    val rawMin = numAsLong(st.genericGetMin)
    val rawMax = numAsLong(st.genericGetMax)
    t.getLogicalTypeAnnotation match {
      case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        ts.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS =>
            (rawMin * 1000L, rawMax * 1000L)
          case LogicalTypeAnnotation.TimeUnit.MICROS => (rawMin, rawMax)
          case LogicalTypeAnnotation.TimeUnit.NANOS =>
            (Math.floorDiv(rawMin, 1000L),
              Math.floorDiv(rawMax + 999L, 1000L))
        }
      case _ => (rawMin, rawMax)
    }
  }

  private def numAsLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
    case b: java.lang.Boolean => if (b) 1L else 0L
    case other => throw new IllegalStateException(
      s"unexpected long-family statistics value: $other")
  }

  private def numAsDouble(v: Any): Double = v match {
    case f: java.lang.Float => f.toDouble
    case d: java.lang.Double => d
    case other => throw new IllegalStateException(
      s"unexpected double-family statistics value: $other")
  }
}
