package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Event sessionization — gap-based session assignment over the `events`
 * table using only window functions (one shuffle on user_id, sort within
 * partition; no stateful custom operator needed for batch).
 *
 * For the streaming variant see [[graft.streaming.StreamSessions]].
 */
object Sessions {

  /**
   * Assign session ids: a new session starts when the gap to the previous
   * event of the same user exceeds `gapMinutes`.
   * Adds: session_seq (per-user session ordinal), session_id (user_id#seq).
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull, 1)
          .when(unix_micros(col(tsCol)) - unix_micros(col("__prev_ts")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("session_id", concat_ws("#", col(userCol), col("session_seq")))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session aggregates: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
}
