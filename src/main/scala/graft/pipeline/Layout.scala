package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) data layout: cluster a table on 2-3 columns at once so
 * parquet min/max statistics prune files AND row groups for predicates on
 * ANY clustered column — the standard layout optimization for large scan
 * workloads (Delta/Iceberg OPTIMIZE ZORDER BY). A plain sort clusters only
 * its leading column; the Morton curve keeps multi-dimensional locality,
 * so a 100 TB table filtered on either dimension skips most of its files.
 *
 * Everything is declarative and codegen-friendly: per-column min/max come
 * from a one-row aggregate consumed as scalar subqueries (no driver
 * action), values normalize linearly onto a 2^bits grid, and the bit
 * interleave is a fixed chain of shift/mask expressions (the classic
 * Morton spread constants). The write is
 * `repartitionByRange(z) + sortWithinPartitions(z)` — one range shuffle,
 * files tile the curve.
 */
object Layout {

  /** Spread the low 16 bits of x so consecutive bits land 2 apart
    * (Morton 2D magic constants). */
  private def spread2(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
    (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Spread the low 21 bits of x so consecutive bits land 3 apart
    * (Morton 3D magic constants). */
  private def spread3(x: Column): Column = {
    var v = x.bitwiseAND(lit(0x1FFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 32))).bitwiseAND(lit(0x1F00000000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x1F0000FF0000FFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x100F00F00F00F00FL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x10C30C30C30C30C3L))
    (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Interleave pre-normalized grid coordinates (longs in [0, 2^bits))
    * into one Morton value. Pure expression — usable anywhere a clustering
    * key is needed. Supports 1-3 dimensions (16 bits each for 2, 21 bits
    * each for 3). */
  def mortonValue(grid: Seq[Column]): Column = grid match {
    case Seq(a) => a
    case Seq(a, b) => spread2(a).bitwiseOR(shiftleft(spread2(b), 1))
    case Seq(a, b, c) =>
      spread3(a).bitwiseOR(shiftleft(spread3(b), 1)).bitwiseOR(shiftleft(spread3(c), 2))
    case _ => throw new IllegalArgumentException(
      s"mortonValue supports 1-3 dimensions, got ${grid.size}")
  }

  /**
   * The input with a `__z` Morton column over `cols` (numeric-castable):
   * each column normalizes linearly to the grid using its own min/max from
   * ONE stats row (scalar subqueries over a cached one-row aggregate —
   * self-tuning, no knobs), nulls land at grid 0. Exposed for tests and
   * for callers that want the key without the write.
   */
  def withZValue(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 3,
      s"z-order supports 1-3 columns, got ${cols.size}")
    val bits = if (cols.size == 3) 21 else 16
    val gridMax = (1L << bits) - 1
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("double")).as(s"mn$i"),
          max(col(c).cast("double")).as(s"mx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).cache()
    val grid = cols.zipWithIndex.map { case (c, i) =>
      val mn = graft.spatial.SpatialJoin.scalarOf(stats.select(col(s"mn$i")))
      val mx = graft.spatial.SpatialJoin.scalarOf(stats.select(col(s"mx$i")))
      val span = greatest(mx - mn, lit(Double.MinPositiveValue))
      val scaled = floor((col(c).cast("double") - mn) / span * gridMax)
      least(greatest(coalesce(scaled, lit(0.0)), lit(0.0)), lit(gridMax.toDouble))
        .cast("long")
    }
    df.withColumn("__z", mortonValue(grid))
  }

  /**
   * Write `df` as parquet clustered on the Morton curve over `cols`:
   * one range shuffle into `numFiles` curve tiles, rows sorted by z within
   * each, so every file (and row group) covers a small rectangle of the
   * clustered space — parquet stats then prune on any clustered column.
   */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    withZValue(df, cols)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Footer-only pruning estimate: of the parquet row groups under `dir`,
   * how many survive ALL of the `[lo, hi]` bands on integer-typed columns
   * (by row-group min/max statistics), over the total. This is exactly the
   * keep/skip decision a scan's row-group filter makes, exposed as a
   * metric so layout quality is certifiable from the outside — no data
   * pages are read, only footers (driver-side metadata, like a listing).
   */
  def rowGroupPruneStats(spark: org.apache.spark.sql.SparkSession, dir: String,
                         bands: Seq[(String, Long, Long)]): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val files = p.getFileSystem(conf).listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    var kept = 0L
    var total = 0L
    files.foreach { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try r.getFooter.getBlocks.asScala.foreach { b =>
        val byName = b.getColumns.asScala
          .map(c => c.getPath.toDotString -> c).toMap
        total += 1
        val keep = bands.forall { case (c, lo, hi) =>
          val st = byName(c).getStatistics
          val mn = st.genericGetMin.asInstanceOf[Number].longValue
          val mx = st.genericGetMax.asInstanceOf[Number].longValue
          mn <= hi && lo <= mx
        }
        if (keep) kept += 1
      } finally r.close()
    }
    (kept, total)
  }

  /**
   * Interval-bucketed layout: rows land in hive partition directories by
   * the fixed-width bucket of their interval START (`__ibucket =
   * floor(start / bucketWidth)`) — the write side of the 100 TB range-
   * join access path. A band query then prunes at the DIRECTORY level
   * (Spark `PartitionFilters`, no footer or data IO outside the band)
   * before any join runs; see [[readIntervalBand]] for the exactness
   * condition.
   */
  def intervalBucketedWrite(df: DataFrame, startCol: String, path: String,
                            bucketWidth: Long): Unit = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    val s = col(startCol).cast("long")
    df.withColumn("__ibucket", ((s - pmod(s, w)) / w).cast("long"))
      .write.mode("overwrite").partitionBy("__ibucket").parquet(path)
  }

  /**
   * GRID-bucketed spatial layout: rows land in hive partition
   * directories by the fixed-size 2D grid cell of their (x, y)
   * coordinate (`__gx = floor(x / cellW)`, `__gy = floor(y / cellH)`) —
   * the write side of the 100 TB SPATIAL access path (the planar twin
   * of [[intervalBucketedWrite]]). A window query then prunes at the
   * DIRECTORY level in BOTH axes before any spatial predicate runs; see
   * [[readGridWindow]] for the exactness condition. For geometries with
   * extent, key by the bbox MIN corner and pass the max extents as the
   * read margins.
   */
  def gridBucketedWrite(df: DataFrame, xCol: String, yCol: String,
                        path: String, cellW: Double, cellH: Double): Unit = {
    require(cellW > 0 && cellH > 0, s"cell sizes must be positive: $cellW, $cellH")
    df.withColumn("__gx", floor(col(xCol).cast("double") / cellW).cast("long"))
      .withColumn("__gy", floor(col(yCol).cast("double") / cellH).cast("long"))
      .write.mode("overwrite").partitionBy("__gx", "__gy").parquet(path)
  }

  /**
   * Read back the slice of a [[gridBucketedWrite]] layout that can
   * possibly intersect the closed window `[xLo, xHi] × [yLo, yHi]`: a
   * geometry keyed by its bbox min corner intersects only if
   * `minx ∈ [xLo − maxExtentX, xHi]` (same in y), so the partition
   * filter `__gx ∈ [floor((xLo−maxExtentX)/cellW), floor(xHi/cellW)]`
   * (and the y twin) loses NOTHING — points pass extent 0. Filters are
   * on the partition columns only, resolved against the directory
   * listing (`PartitionFilters` — plan-asserted); callers then apply
   * the exact spatial predicate on the slice.
   */
  def readGridWindow(spark: org.apache.spark.sql.SparkSession, path: String,
                     cellW: Double, cellH: Double,
                     xLo: Double, xHi: Double, yLo: Double, yHi: Double,
                     maxExtentX: Double = 0.0,
                     maxExtentY: Double = 0.0): DataFrame = {
    require(cellW > 0 && cellH > 0 && xHi >= xLo && yHi >= yLo &&
      maxExtentX >= 0 && maxExtentY >= 0)
    val gxLo = math.floor((xLo - maxExtentX) / cellW).toLong
    val gxHi = math.floor(xHi / cellW).toLong
    val gyLo = math.floor((yLo - maxExtentY) / cellH).toLong
    val gyHi = math.floor(yHi / cellH).toLong
    spark.read.parquet(path)
      .where(col("__gx") >= gxLo && col("__gx") <= gxHi &&
        col("__gy") >= gyLo && col("__gy") <= gyHi)
      .drop("__gx", "__gy")
  }

  /**
   * Read back the slice of an [[intervalBucketedWrite]] layout that can
   * possibly overlap the closed band `[bandLo, bandHi]`: an interval
   * overlaps iff `start <= bandHi && end >= bandLo`, and with interval
   * length bounded by `maxIntervalLen` that implies
   * `start >= bandLo - maxIntervalLen` — so the partition filter
   * `__ibucket ∈ [floor((bandLo-maxIntervalLen)/w), floor(bandHi/w)]`
   * loses NOTHING (certified by q200's oracle, which computes the same
   * join from the unpartitioned table). The filter is on the partition
   * column only: Spark resolves it against the directory listing —
   * the scan's `PartitionFilters` — so a 30-day corpus queried for a
   * 3-day band reads ~4 directories, which is the density-comparable
   * slice the q90 100× analysis assumes. Callers then apply the exact
   * overlap predicate (e.g. [[RangeJoin.overlapJoin]]) on the slice.
   */
  def readIntervalBand(spark: org.apache.spark.sql.SparkSession, path: String,
                       bucketWidth: Long, bandLo: Long, bandHi: Long,
                       maxIntervalLen: Long): DataFrame = {
    require(bucketWidth > 0 && maxIntervalLen >= 0 && bandHi >= bandLo)
    val lo = Math.floorDiv(bandLo - maxIntervalLen, bucketWidth)
    val hi = Math.floorDiv(bandHi, bucketWidth)
    spark.read.parquet(path)
      .where(col("__ibucket") >= lo && col("__ibucket") <= hi)
      .drop("__ibucket")
  }

  /**
   * Write `df` as a BUCKETED (and per-bucket sorted) table on `keyCol` —
   * the co-location layout for joins that repeat across a pipeline: when
   * both sides of a key-equi-join carry the same bucket spec, Spark's
   * SortMergeJoin reads them pre-partitioned and the plan has ZERO
   * shuffle exchanges below the join. At 100 TB that converts every
   * recurring fact-fact join on the bucketed key (lineitem⋈orders,
   * events⋈events) from a full two-sided network shuffle into a local
   * per-bucket merge — the batch analogue of co-partitioned stream-stream
   * state stores, and the layout investment that pays back on every
   * subsequent query, not just one.
   *
   * The pre-write `repartition(numBuckets, key)` uses the same Murmur3
   * hash as the bucket spec, so each task holds exactly one bucket and
   * every bucket lands in ONE file — which lets the `sortBy` metadata
   * also elide the join's per-bucket Sort. Registered as an EXTERNAL
   * table at `path` (session catalog holds only metadata).
   */
  def bucketWrite(df: DataFrame, table: String, keyCol: String,
                  numBuckets: Int, path: String): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.repartition(numBuckets, col(keyCol))
      .write.mode("overwrite")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .option("path", path)
      .saveAsTable(table)
  }

  /**
   * Compact a small-file parquet layout into ~`targetBytes` outputs — the
   * standing-corpus maintenance op: streaming ingest and incremental
   * appends ([[Dedup.appendMinhashIndex]], [[Similarity.appendIvfPqIndex]],
   * `curateStream`) each add a few small files per batch, and at 100 TB
   * scan cost degrades with file COUNT (footer reads, task scheduling,
   * non-contiguous IO) long before it degrades with bytes. The output
   * file count derives from the directory's actual byte size (a
   * driver-side metadata listing — no data is read to size the job), rows
   * move through ONE round-robin repartition (no key shuffle, no sort),
   * and `partitionCols` layouts compact within each partition directory.
   * Writes to `outPath`; swapping it over the source is the caller's
   * atomic-rename concern. Returns the target file count.
   */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, inPath: String,
                   outPath: String, targetBytes: Long = 128L << 20,
                   partitionCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val w =
      if (partitionCols.isEmpty) df.repartition(n)
      else df.repartition(n, partitionCols.map(col): _*)
    val writer = w.write.mode("overwrite")
    (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
      .parquet(outPath)
    n
  }
}
