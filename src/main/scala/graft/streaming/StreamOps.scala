package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import graft.spatial.{functions => G}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/**
 * Structured Streaming operators over the `events` schema
 * (event_id, ts, user_id, event_type, value, props).
 *
 * The reference is batch-only (SURVEY §2.10); this is harness-mandated
 * extension scope. Designed for the standard production shape:
 * `readStream` → watermark → windowed agg / stateful sessions →
 * `writeStream` with checkpointing. State is partitioned by user_id —
 * scales horizontally with executors; watermark bounds state size.
 */
object StreamOps {

  /** Tumbling-window event counts + value sums per event_type.
    * Late data beyond `watermarkDelay` is dropped (state is bounded). */
  def windowedEventStats(events: DataFrame,
                         windowLen: String = "5 minutes",
                         watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Streaming exact dedup: drop re-deliveries of the same event id within
    * the watermark horizon (bounded state — the streaming face of
    * [[graft.pipeline.Dedup]]). */
  def dedupEvents(events: DataFrame, idCols: Seq[String],
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicates(idCols :+ "ts")

  /** Windowed spatial extent of a geometry stream: per time window, the
    * bounding box of all geometries seen (streaming face of ST_Extent —
    * min/max aggregate state is constant-size per window). */
  def windowedExtent(events: DataFrame, geomCol: String,
                     windowLen: String = "5 minutes",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        min(G.st_xmin(col(geomCol))).as("xmin"),
        min(G.st_ymin(col(geomCol))).as("ymin"),
        max(G.st_xmax(col(geomCol))).as("xmax"),
        max(G.st_ymax(col(geomCol))).as("ymax"),
        count(lit(1)).as("n"))

  /** Stream-static enrichment join: attach dimension attributes to a
    * stream. The static side is re-planned per micro-batch (broadcast when
    * small) — the standard pattern for slowly-changing dimensions. */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(dim, keys, "left")

  /**
   * Streaming spatial enrichment: join a geometry stream against a static
   * geo table on a spatial predicate, grid-bucketed — the streaming face
   * of [[graft.spatial.SpatialJoin.join]]. A predicate theta join against
   * a streaming side would need a per-batch nested loop; instead both
   * sides explode over their covering cells and the join is a plain
   * stream-static EQUI-join on the cell id (broadcast/hash per
   * micro-batch), with canonical-cell pair dedup and the exact predicate
   * as a filter. Static geometries whose envelope exceeds the covering
   * cap at this pitch are dropped (choose `cellSize` ≳ the largest static
   * envelope, or pre-split such geometries) — streaming cannot union an
   * exact fallback branch without a second scan of every micro-batch.
   */
  def spatialEnrich(stream: DataFrame, static: DataFrame,
                    streamGeom: Column, staticGeom: Column,
                    predicate: (Column, Column) => Column,
                    cellSize: Double): DataFrame = {
    import graft.spatial.SpatialJoin.{st_covering_cells, st_ref_cell}
    val s = stream.withColumn("__cell", explode(st_covering_cells(streamGeom, cellSize)))
    val d = static.withColumn("__cell", explode(st_covering_cells(staticGeom, cellSize)))
    s.join(d, Seq("__cell"))
      .filter(col("__cell") === st_ref_cell(streamGeom, staticGeom, cellSize))
      .filter(predicate(streamGeom, staticGeom))
      .drop("__cell")
  }

  /**
   * In-flight near-duplicate detection of a document stream against a
   * PERSISTED corpus sketch index ([[graft.pipeline.Dedup.writeMinhashIndex]])
   * — the streaming face of the incremental dedup path: incoming documents
   * are MinHash-sketched per micro-batch, banded, and equi-joined (stream ×
   * static, broadcast/hash per batch) against the exploded index buckets;
   * candidates verify by signature agreement. The corpus text is never
   * read — only the slim sketch table — so the per-batch cost is
   * O(batch · bands) plus the bucket probes, independent of corpus size.
   *
   * @return (id = streamed doc id, corpus_id, est_jaccard ≥ minEstJaccard)
   *         — flag or drop the streamed rows by joining on `id`.
   */
  def nearDupFlags(spark: org.apache.spark.sql.SparkSession, stream: DataFrame,
                   textCol: String, idCol: String, indexPath: String,
                   minEstJaccard: Double, shingle: Int = 3): DataFrame = {
    val flagged = graft.pipeline.Dedup.minhashCandidatePairsAgainstIndex(
      spark, indexPath, stream, textCol, idCol, shingle)
      .filter(col("est_jaccard") >= minEstJaccard)
    flagged.select(col("id_b").as("id"), col("id_a").as("corpus_id"),
      col("est_jaccard"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, total_value: Double)

  /**
   * Gap-based streaming sessionization via flatMapGroupsWithState:
   * a session closes when no event arrives for `gapMinutes` (event-time via
   * watermark + processing-time timeout). Emits one row per closed session.
   */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId,
              new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= ClosedSession(userId,
                    new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
