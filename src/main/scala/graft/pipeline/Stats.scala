package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Grouped distribution monitoring (token-length / quality-score profiles
 * over corpus slices).
 *
 * Two variants with the same output shape:
 *
 *  - [[groupedPercentiles]]: EXACT type-7 percentiles (Spark `percentile` ≡
 *    DuckDB `quantile_cont`). The aggregate buffers every value of a group
 *    on the reducer — the right default while group cardinality bounds the
 *    buffer (the q51 monitoring shape).
 *  - [[groupedPercentilesApprox]]: `approx_percentile` over the same
 *    grouping — a bounded-memory quantile sketch with map-side partial
 *    aggregation, for the 100 TB regime with FEW groups where an exact
 *    per-group buffer of billions of doubles is a memory hazard. Rank error
 *    ≤ 1/accuracy of the distribution, not a value-space bound.
 */
object Stats {

  /** (groupCols*, p, value) — one row per requested percentile per group. */
  def groupedPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                         pcts: Seq[Double]): DataFrame =
    exploded(df, groupCols, valueCol, pcts, exact = true, accuracy = 0)

  /** [[groupedPercentiles]] with a bounded-memory sketch; identical shape. */
  def groupedPercentilesApprox(df: DataFrame, groupCols: Seq[String], valueCol: String,
                               pcts: Seq[Double], accuracy: Int = 10000): DataFrame =
    exploded(df, groupCols, valueCol, pcts, exact = false, accuracy = accuracy)

  /**
   * Robust per-group outlier detection: the median/MAD z-score
   * z = (x − median) / (1.4826 · MAD), MAD = median(|x − median|) —
   * the monitoring rule that survives the outliers it is hunting
   * (mean/stddev get dragged by the very tail being flagged; the 1.4826
   * constant rescales MAD to σ under normality). Appends `z` and
   * `is_outlier` (|z| > `threshold`) to every input row.
   *
   * Plan shape: two grouped EXACT medians (each a shuffle of the fact
   * frame on the group key — medians are holistic), the group-level
   * stats frames join among themselves and back to the rows as
   * dimension-sized broadcasts. At 100 TB with few groups swap the
   * exact percentile for `approx_percentile` (the
   * [[groupedPercentilesApprox]] trade) — the flag then carries the
   * sketch's rank error. Degenerate groups (MAD = 0, over half the
   * values identical) yield NULL z / false flag rather than an
   * engine-dependent ±Inf division.
   */
  def robustOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     threshold: Double = 3.5): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.5D)").as("__med"))
    val mad = df.join(med, groupCols)
      .select(groupCols.map(col) :+
        abs(col(valueCol) - col("__med")).as("__absdev"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(expr("percentile(__absdev, 0.5D)").as("__mad"))
    val z = when(col("__mad") =!= 0.0,
      (col(valueCol) - col("__med")) / (lit(1.4826) * col("__mad")))
    df.join(med.join(mad, groupCols), groupCols)
      .withColumn("z", z)
      .withColumn("is_outlier", coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__med", "__mad")
  }

  private def exploded(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       pcts: Seq[Double], exact: Boolean, accuracy: Int): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 0.0 && p <= 1.0))
    val arr = pcts.map(p => s"${p}D").mkString("array(", ", ", ")")
    val agg =
      if (exact) expr(s"percentile($valueCol, $arr)")
      else expr(s"approx_percentile($valueCol, $arr, $accuracy)")
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("__qs"))
      .select(groupCols.map(col) :+ posexplode(col("__qs")).as(Seq("__i", "value")): _*)
      .select(groupCols.map(col) :+
        element_at(typedLit(pcts), col("__i").cast("int") + 1).as("p") :+
        col("value"): _*)
  }
}
