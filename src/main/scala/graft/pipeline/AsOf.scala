package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of (temporal) join: for each left row, the latest right row with
 * `right.ts <= left.ts` in the same key group — the standard operator for
 * "state at event time" lookups (features-as-of, price-as-of).
 *
 * Spark has no built-in as-of join; the scalable formulation is
 * union → single window sort per key → last-observation-carried-forward,
 * which costs ONE shuffle on the key (vs. a range join's quadratic blowup
 * or per-row subqueries). State per key is one running "last right row" —
 * constant memory in the window operator.
 */
object AsOf {

  /**
   * @param left      probe side; all columns kept
   * @param right     reference side; its non-key/ts columns are appended
   *                  (null when no right row is at-or-before the left ts)
   * @param keyCols   equality keys
   * @param tsCol     timestamp column name (present in both sides)
   * @param direction "backward" (default): latest right row with
   *                  `right.ts <= left.ts`; "forward": earliest right row
   *                  with `right.ts >= left.ts` (next-state lookup).
   *                  Both are the same one-shuffle union + window LOCF —
   *                  forward just carries against the reversed time order.
   * @return left rows + right's other columns as-of the left timestamp
   */
  def join(left: DataFrame, right: DataFrame,
           keyCols: Seq[String], tsCol: String,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rightPayload = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    // tag and union; right rows sort before left rows at equal ts so a
    // same-instant right row is visible to the left row (ts >= semantics)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__r", struct(rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)).toIndexedSeq: _*))
    val r = right.select(
      (keyCols.map(col) :+ col(tsCol) :+ struct(rightPayload.map(col).toIndexedSeq: _*).as("__r")): _*)
      .withColumn("__side", lit(0))
    val lAligned = l.select(
      (keyCols.map(col) :+ col(tsCol) :+ col("__r") :+ col("__side")) ++
        left.columns.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    val rAligned = r.select(
      (keyCols.map(col) :+ col(tsCol) :+ col("__r") :+ col("__side")) ++
        left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = lAligned.unionByName(rAligned)
    // backward: ascending time, carry the last right row seen at-or-before;
    // forward: descending time, so "last right seen" is the earliest right
    // row at-or-after. Right rows (__side 0) sort before left rows at equal
    // ts in both directions, keeping the ts-inclusive semantics.
    val tsOrder = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__asof",
      last(when(col("__side") === 0, col("__r")), ignoreNulls = true).over(w))
    val result = carried.filter(col("__side") === 1)
      .drop("__side", "__r")
    rightPayload.foldLeft(result)((df, c) => df.withColumn(c, col(s"__asof.$c")))
      .drop("__asof")
  }
}
