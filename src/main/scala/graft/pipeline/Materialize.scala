package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Incrementally-maintained aggregate state for a STANDING corpus — the
 * materialized-view move for algebraic aggregates (count/sum/min/max, and
 * everything derivable from them: avg, range, rate). The state store is
 * LOG-STRUCTURED: each batch APPENDS one partial-aggregate row per
 * touched key (no update-in-place, no read-modify-write race with the
 * standing files), and reads re-combine partials per key — exactly
 * Spark's own partial/final aggregation split, persisted across batches.
 * Periodic [[compactAggState]] folds the log back to one row per key,
 * bounding read amplification the way small-file compaction bounds scan
 * cost ([[Layout.compactFiles]]).
 *
 * Why this shape at 100 TB: the daily batch aggregates ONCE (shuffled by
 * key, partial-combined map-side) and appends rows proportional to its
 * own distinct keys — the standing corpus is never re-read, never
 * rewritten, and a crashed append leaves at worst a missing batch (the
 * writer's atomicity), never a corrupted state. Algebraic-only is the
 * contract that makes merging exact: count/sum/min/max partials combine
 * associatively and commutatively, so the log order never matters.
 * (Sums over FLOATING-POINT values combine with ~1e-15 relative
 * order-dependence like any distributed sum; integer/decimal values
 * combine exactly.)
 */
object Materialize {

  /** One partial-aggregate row per key in `df`: (keys..., __cnt, __sum,
    * __min, __max) over `valCol` (nulls ignored, like SQL aggregates;
    * all-null keys keep __cnt 0 with null min/max/sum). */
  def aggPartials(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(col(valCol)).as("__cnt"), sum(col(valCol)).as("__sum"),
        min(col(valCol)).as("__min"), max(col(valCol)).as("__max"))
  }

  /** Append `batch`'s partials to the state log (creates it on first use). */
  def appendAggState(spark: SparkSession, path: String, batch: DataFrame,
                     keyCols: Seq[String], valCol: String): Unit =
    aggPartials(batch, keyCols, valCol).write.mode("append").parquet(path)

  /** Current state: partials re-combined per key; adds derived `avg`.
    * The combine is the same algebra Spark's final-aggregation step runs,
    * so state after N appends ≡ one aggregation over the N batches'
    * union. Generation-aware: a log compacted under a live stream
    * ([[compactAggStateLive]]) reads through its current marker, so the
    * view never double-counts or misses a fold window. */
  def readAggState(spark: SparkSession, path: String,
                   keyCols: Seq[String]): DataFrame =
    graft.streaming.LogStructuredSink.readLogOrRaw(spark, path)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("n"), sum(col("__sum")).as("total"),
        min(col("__min")).as("min_val"), max(col("__max")).as("max_val"))
      .withColumn("avg", col("total") / col("n"))

  /**
   * Apply a change batch to a standing SCD-type-2 dimension (the
   * lakehouse MERGE-for-history move). `current` holds the dimension as
   * (`keyCol`, attrs..., `validFrom`, `validTo`) with `validTo` NULL on
   * each key's open row; `updates` is the batch as (`keyCol`, attrs...,
   * `tsCol`) with (key, ts) unique. Semantics, per key:
   *
   *  - an update whose attributes EQUAL the version in effect at its
   *    timestamp is a no-op (change suppression — re-stating the same
   *    value never splits a version);
   *  - each real change closes the version in effect (`validTo` ← change
   *    ts) and opens a new one; several changes in one batch chain;
   *  - a key absent from `current` starts its history at its first
   *    update; a key absent from `updates` passes through UNTOUCHED.
   *
   * Scale shape: closed history never enters a shuffle (pure union
   * pass-through), open rows split by ONE semi/anti join against the
   * batch's distinct keys, and the two Windows (lag for suppression,
   * lead for interval chaining) run over batch-sized frames only —
   * per-key work is proportional to that key's updates, never to the
   * standing history. At 100 TB the dimension is key-partitioned
   * parquet; this produces the replacement OPEN partition plus appended
   * closed rows, and the untouched branch prunes to file-level
   * pass-through.
   *
   * Ties: an update at exactly the open row's `validFrom` orders AFTER
   * it (the base row is the state "just before" the batch). Attribute
   * comparison is null-safe struct equality.
   */
  def scd2Apply(current: DataFrame, updates: DataFrame, keyCol: String,
                attrCols: Seq[String], tsCol: String,
                validFrom: String = "valid_from",
                validTo: String = "valid_to"): DataFrame = {
    require(attrCols.nonEmpty, "at least one attribute column")
    val outCols: Seq[Column] =
      (keyCol +: attrCols :+ validFrom :+ validTo).map(col)
    val open = current.filter(col(validTo).isNull)
    val closed = current.filter(col(validTo).isNotNull).select(outCols: _*)
    val touched = updates.select(col(keyCol)).distinct()
    val openUntouched = open.join(touched, Seq(keyCol), "left_anti")
      .select(outCols: _*)
    val seqCols = col(keyCol) +: attrCols.map(col)
    val seq = open.join(touched, Seq(keyCol), "left_semi")
      .select(seqCols :+ col(validFrom).as("__ts") :+ lit(0).as("__src"): _*)
      .unionByName(updates
        .select(seqCols :+ col(tsCol).as("__ts") :+ lit(1).as("__src"): _*))
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__src"))
    val attrs = struct(attrCols.map(col): _*)
    val kept = seq.withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
    val chained = kept
      .withColumn(validFrom, col("__ts"))
      .withColumn(validTo, lead(col("__ts"), 1).over(w))
      .select(outCols: _*)
    closed.unionByName(openUntouched).unionByName(chained)
  }

  /** Fold the log to one partial per key into `outPath` (swap is the
    * caller's atomic-rename concern, the [[Layout.compactFiles]]
    * convention). Returns the compacted key count. */
  /**
   * Log-structured DISTINCT-COUNT state — the cardinality sibling of
   * [[appendAggState]]: exact per-key distinct counting at 100 TB needs
   * a (key, value)-sized shuffle per refresh, but HLL sketches are
   * algebraic (union-mergeable), so each batch appends one
   * `hll_sketch_agg` partial per key and the reader unions the log —
   * cost scales with the batch, never the history. Estimates carry the
   * standard HLL error (~1.6% at lgK 12, deterministic for identical
   * input sets — union-of-sketches ≡ sketch-of-union EXACTLY, which the
   * suite pins).
   */
  def appendDistinctState(spark: SparkSession, path: String, batch: DataFrame,
                          keyCols: Seq[String], valCol: String): Unit = {
    require(keyCols.nonEmpty, "at least one key column")
    batch.groupBy(keyCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valCol)").as("__hll"))
      .write.mode("append").parquet(path)
  }

  /** Current per-key distinct estimate from the sketch log. */
  def readDistinctState(spark: SparkSession, path: String,
                        keyCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(keyCols.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(__hll))").as("approx_distinct"))

  /**
   * Log-structured QUANTILE state — the distribution sibling of
   * [[appendDistinctState]]: each batch appends its
   * [[Stats.histogramState]] cells (one row per touched (key, bin);
   * cells ADD, so the log's bin-sums equal the state of the batches'
   * union exactly — pinned by the suite). The bin domain is recorded as
   * column metadata at creation and re-read on append, so every batch
   * bins identically. Reads answer any percentile to within one bin
   * width via [[Stats.histogramQuantiles]] — monitoring p99s over a
   * standing corpus without ever re-scanning it.
   */
  def createHistogramState(spark: SparkSession, path: String, batch: DataFrame,
                           keyCols: Seq[String], valCol: String,
                           lo: Double, hi: Double, nBins: Int): Unit = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putDouble("lo", lo).putDouble("hi", hi).putLong("nBins", nBins.toLong)
      .build()
    Stats.histogramState(batch, keyCols, valCol, lo, hi, nBins)
      .select(col("__bin").as("__bin", meta) +: keyCols.map(col) :+ col("__c"): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Append a batch's cells under the state's recorded bin domain —
    * zero reads of standing cells; cost scales with the batch. */
  def appendHistogramState(spark: SparkSession, path: String, batch: DataFrame,
                           keyCols: Seq[String], valCol: String): Unit = {
    val meta = spark.read.parquet(path).schema("__bin").metadata
    Stats.histogramState(batch, keyCols, valCol, meta.getDouble("lo"),
        meta.getDouble("hi"), meta.getLong("nBins").toInt)
      // re-stamp: a metadata-less appended file would win the read-time
      // schema merge and blank the domain for every reader
      .select(col("__bin").as("__bin", meta) +: keyCols.map(col) :+ col("__c"): _*)
      .write.mode("append").parquet(path)
  }

  /** Percentile read over the whole log (see [[Stats.histogramQuantiles]]
    * for the one-bin-width error contract). */
  def readHistogramQuantiles(spark: SparkSession, path: String,
                             keyCols: Seq[String], pcts: Seq[Double]): DataFrame = {
    val state = spark.read.parquet(path)
    val meta = state.schema("__bin").metadata
    Stats.histogramQuantiles(state, keyCols, meta.getDouble("lo"),
      meta.getDouble("hi"), meta.getLong("nBins").toInt, pcts)
  }

  /**
   * Snapshot diff — keyed change detection between two corpus snapshots
   * (two crawls, two table versions): emits one row per CHANGED key with
   * `change_type` ∈ insert | delete | update and `changed_cols` (the
   * comma-joined sorted names of columns whose values differ, null-safe;
   * empty for insert/delete). Unchanged keys emit nothing, so output is
   * delta-sized. The complement of [[scd2Apply]]: scd2 APPLIES a known
   * change stream to history, snapshotDiff RECOVERS the change stream
   * when upstream only hands you full snapshots.
   *
   * Scale shape: ONE full outer equi-join on the key — both sides
   * shuffle once, the per-column null-safe comparisons are codegen'd
   * expressions, no Window, output only deltas. Requires both snapshots
   * to share the key columns and compares the non-key columns common to
   * both (schema drift: a column present on one side only is ignored —
   * diff data, not schema).
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val valueCols = oldDf.columns.filterNot(keys.contains)
      .intersect(newDf.columns.filterNot(keys.contains)).sorted
    val o = oldDf.select((keys ++ valueCols).map(col): _*)
      .withColumn("__o", lit(1))
      .select(keys.map(col) :+ col("__o") :+
        struct(valueCols.map(col): _*).as("__ov"): _*)
    val n = newDf.select((keys ++ valueCols).map(col): _*)
      .withColumn("__n", lit(1))
      .select(keys.map(col) :+ col("__n") :+
        struct(valueCols.map(col): _*).as("__nv"): _*)
    val joined = o.join(n, keys, "full_outer")
    val changed = array_compact(array(valueCols.map(c =>
      when(not(col(s"__ov.$c") <=> col(s"__nv.$c")), lit(c))): _*))
    joined
      .withColumn("change_type",
        when(col("__o").isNull, "insert")
          .when(col("__n").isNull, "delete")
          .otherwise("update"))
      .withColumn("changed_cols",
        when(col("change_type") === "update", array_join(changed, ","))
          .otherwise(lit("")))
      .filter(col("change_type") =!= "update" || col("changed_cols") =!= "")
      .select(keys.map(col) :+ col("change_type") :+ col("changed_cols"): _*)
  }

  /** The shared partial fold behind [[compactAggState]] and
    * [[compactAggStateLive]], including the decimal-width discipline:
    * sum() over DECIMAL partials widens the type (p+10 capped at 38) —
    * left as-is, the compacted file's parquet decimal (wider
    * FIXED_LEN_BYTE_ARRAY) and later appendAggState partials (original
    * width) would MIX in one log — a read-time type mismatch whose
    * direction depends on which footer schema inference happens to
    * pick. Cast back to the log's own __sum type so every file in a
    * compact-then-append lifecycle shares one physical type; an
    * overflow (a fold too large for the partial type) must fail the
    * compaction loudly, never null out silently. */
  private def foldAggPartials(log: DataFrame,
                              keyCols: Seq[String]): DataFrame = {
    val folded0 = log
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("__cnt"), sum(col("__sum")).as("__sum"),
        min(col("__min")).as("__min"), max(col("__max")).as("__max"))
    val sumT = log.schema("__sum").dataType
    val overflowed = folded0
      .filter(col("__sum").isNotNull && col("__sum").cast(sumT).isNull)
      .limit(1).count()
    require(overflowed == 0L,
      s"compactAggState: folded __sum overflows the log's $sumT — widen " +
        "the value column before appending (cast the input to a wider " +
        "decimal) instead of compacting into a lossy type")
    folded0.withColumn("__sum", col("__sum").cast(sumT))
  }

  def compactAggState(spark: SparkSession, path: String, outPath: String,
                      keyCols: Seq[String]): Long = {
    val log = spark.read.parquet(path)
    writeCompacted(foldAggPartials(log, keyCols), log, outPath,
      coalesceTo = 0)
  }

  /** [[compactAggState]] while the
    * [[graft.streaming.StreamOps.aggStateStream]] that owns the log is
    * LIVE — the flagship SUM-merged family the round-14 in-place fold
    * excluded by contract (a fold window would double-count partials
    * under a racing [[readAggState]]). The generation layout
    * ([[graft.streaming.LogStructuredSink.compactLive]]) closes that:
    * the fold publishes with one atomic marker flip and readers resolve
    * exactly one generation, so the view is never a double-counted mix;
    * superseded files outlive in-flight scans by `retainMs`. The
    * decimal-width cast discipline is [[compactAggState]]'s, verbatim
    * (shared fold). Returns the folded key count, or None when nothing
    * new is foldable. */
  def compactAggStateLive(spark: SparkSession, path: String,
                          keyCols: Seq[String],
                          retainMs: Long = 600000L): Option[Long] = {
    if (!graft.streaming.LogStructuredSink.exists(spark, path)) return None
    graft.streaming.LogStructuredSink.compactLive(spark, path,
      df => foldAggPartials(df, keyCols), retainMs = retainMs,
      coalesceTo = 0) // key-proportional state keeps its partitioning
  }

  /** Shared compaction writer for the log-structured state families
    * ([[compactAggState]], [[Stats.compactHllIndex]],
    * [[Stats.compactCmsIndex]], [[GroupedTopK.compactTopKLog]]): writes
    * the folded frame to `outPath`, PRESERVING a streaming sink's
    * batch-partitioned layout — if the source log carries `__batch`, the
    * compacted rows land as one partition stamped with the NEWEST batch
    * id they cover, so the exactly-once probe/append discipline
    * (`__batch < bid`, dynamic overwrite of later ids) keeps holding
    * across a swapped-in compaction. Callers must compact only COMMITTED
    * prefixes: a compaction that swallowed an uncommitted batch's
    * partition would survive that batch's replay-overwrite and
    * double-count it. `coalesceTo` 0 keeps the fold's own partitioning
    * (key-proportional states); n > 0 forces O(1) files (sketch-sized
    * states). Returns the folded row count. */
  private[pipeline] def writeCompacted(folded: DataFrame, srcLog: DataFrame,
                                       outPath: String,
                                       coalesceTo: Int = 1,
                                       subPartitionCols: Seq[String] = Nil): Long = {
    val sized =
      if (subPartitionCols.nonEmpty)
        folded.repartition(subPartitionCols.map(col): _*) // O(1) files/dir
      else if (coalesceTo > 0) folded.coalesce(coalesceTo)
      else folded
    val pinned = sized.persist()
    val n = pinned.count()
    if (srcLog.columns.contains("__batch")) {
      val mx = srcLog.agg(max(col("__batch"))).collect()(0).get(0)
      // a zero-row source still carries the column but max() is null —
      // lit(null) would land the compacted rows under
      // __HIVE_DEFAULT_PARTITION__, invisible to every `__batch < bid`
      // probe. Nothing to compact is a caller error, not a silent write.
      require(mx != null,
        s"cannot compact an empty log into $outPath: no __batch partition" +
          " holds rows")
      pinned.withColumn("__batch", lit(mx))
        .write.partitionBy("__batch" +: subPartitionCols: _*)
        .mode("overwrite").parquet(outPath)
    } else if (subPartitionCols.nonEmpty)
      pinned.write.partitionBy(subPartitionCols: _*)
        .mode("overwrite").parquet(outPath)
    else pinned.write.mode("overwrite").parquet(outPath)
    pinned.unpersist()
    n
  }
}
