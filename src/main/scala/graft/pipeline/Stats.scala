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
