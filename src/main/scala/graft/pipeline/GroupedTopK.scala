package graft.pipeline

import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.functions._

/**
 * Skew-safe grouped top-k.
 *
 * A `row_number() OVER (PARTITION BY g ORDER BY ...)` re-rank shuffles the
 * ENTIRE input into one partition per distinct `g` — a scale-killer when
 * `g` has few distinct values (e.g. 3 return flags over a 100 TB fact
 * table). [[topK]] instead aggregates with [[BoundedTopK]]: each map
 * partition reduces to at most k rows per group BEFORE the exchange
 * (partial aggregation), the exchange carries ≤ k·numPartitions rows per
 * group, and the final merge emits the exact top-k with ranks. No window,
 * no Row-codec `mapPartitions` (the round-1 formulation) — the surrounding
 * stages stay inside whole-stage codegen.
 *
 * Exact: a group's global top-k is contained in the union of its per-
 * partition top-k sets. Ties beyond the order columns resolve by encounter
 * order (same caveat as `row_number()`) — include a unique key in `order`
 * for deterministic output.
 */
object GroupedTopK {

  /** Exact grouped top-k with a 1-based `rankCol`, ordered per `order`
    * (column name → ascending?). */
  def topK(df: DataFrame, groupCols: Seq[String],
           order: Seq[(String, Boolean)], k: Int,
           rankCol: String = "rank"): DataFrame = {
    val ordFields = order.zipWithIndex.map { case ((n, _), i) => col(n).as(s"__o$i") }
    val payload = struct(df.columns.map(col).toIndexedSeq: _*).as("__row")
    val packed = struct(ordFields :+ payload: _*)
    val agg = GraftShim.column(
      BoundedTopK(GraftShim.expression(packed), k, order.map(_._2)).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("__topk"))
      .select(posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col("__e.__row.*") +:
        Seq((col("__pos") + lit(1)).cast("int").as(rankCol)): _*)
  }

  /** Fold a [[graft.streaming.StreamOps.groupedTopKStream]] partial log
    * back to ≤ k rows per group — order statistics are mergeable, so one
    * more bounded top-k over the log IS the compaction, and
    * [[graft.streaming.StreamOps.readGroupedTopK]] over the compacted
    * log re-ranks to the identical leaderboard (suite-pinned). Same
    * layout/committed-prefix contract as
    * [[Materialize.writeCompacted]]; output is O(1) files. Returns the
    * kept partial count. */
  def compactTopKLog(spark: org.apache.spark.sql.SparkSession,
                     path: String, outPath: String, groupCols: Seq[String],
                     order: Seq[(String, Boolean)], k: Int): Long = {
    val log = spark.read.parquet(path)
    val folded = topK(log.drop("__batch"), groupCols, order, k).drop("rank")
    Materialize.writeCompacted(folded, log, outPath)
  }

  /** [[compactTopKLog]] while the
    * [[graft.streaming.StreamOps.groupedTopKStream]] that owns the
    * partial log is LIVE — a rank-merged family the round-14 in-place
    * fold excluded (a fold window racing a reader's re-rank could seat
    * dropped partials beside their replacement fold). The generation
    * layout ([[graft.streaming.LogStructuredSink.compactLive]])
    * publishes the re-rank with one atomic marker flip, so
    * [[graft.streaming.StreamOps.readGroupedTopK]] always re-ranks
    * exactly one consistent log view. Top-k sets are mergeable (a
    * group's global top-k lives in the union of partial top-k sets), so
    * fold-then-merge ≡ merge. Returns the folded row count (≤
    * k·|groups|), or None when nothing new is foldable. */
  def compactTopKLogLive(spark: org.apache.spark.sql.SparkSession,
                         path: String, groupCols: Seq[String],
                         order: Seq[(String, Boolean)], k: Int,
                         retainMs: Long = 600000L): Option[Long] = {
    if (!graft.streaming.LogStructuredSink.exists(spark, path)) return None
    graft.streaming.LogStructuredSink.compactLive(spark, path,
      df => topK(df, groupCols, order, k).drop("rank"),
      retainMs = retainMs)
  }
}
