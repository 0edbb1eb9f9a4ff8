package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Bounded top-k state: parallel arrays sorted by (sim desc, id asc),
 * length ≤ k. Kept as primitive arrays so the per-row reduce path is
 * allocation-light and the shuffle representation is compact
 * (2·k·8 bytes per group, independent of corpus size).
 */
case class TopKState(sims: Array[Double], ids: Array[Long])

/**
 * Typed top-k aggregate: the scale-safe replacement for a
 * `row_number() OVER (PARTITION BY query_id)` re-rank.
 *
 * As a Spark `Aggregator` it participates in partial aggregation: each map
 * partition reduces its scored rows to at most k (sim, id) pairs per query
 * BEFORE the exchange, so the shuffle carries ≤ k·numPartitions rows per
 * query instead of the entire scored relation landing in one partition per
 * query. Total order (sim desc, id asc) makes the result deterministic and
 * identical to the window formulation.
 */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKState, TopKState] {
  require(k > 0, s"k must be positive, got $k")

  // total order: higher sim wins, ties broken by smaller id. Plain `>`/`==`
  // is NOT total for NaN (NaN beats nothing, nothing beats NaN — the result
  // would depend on partition merge order); compare with Spark's sort
  // semantics instead: NaN greater than everything, -0.0 == 0.0.
  private def cmpSim(a: Double, b: Double): Int =
    if (a < b) -1 else if (a > b) 1
    else if (a == b) 0 // covers -0.0 == 0.0
    else java.lang.Double.compare(a, b) // NaN cases only
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = cmpSim(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  override def zero: TopKState = TopKState(Array.empty, Array.empty)

  override def reduce(b: TopKState, in: (Double, Long)): TopKState = {
    val s = in._1
    val id = in._2
    val n = b.sims.length
    if (n >= k && !better(s, id, b.sims(n - 1), b.ids(n - 1))) b
    else {
      // binary search for the insert position in the sorted state
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(s, id, b.sims(mid), b.ids(mid))) hi = mid else lo = mid + 1
      }
      val m = math.min(n + 1, k)
      val sims = new Array[Double](m)
      val ids = new Array[Long](m)
      System.arraycopy(b.sims, 0, sims, 0, lo)
      System.arraycopy(b.ids, 0, ids, 0, lo)
      sims(lo) = s
      ids(lo) = id
      val tail = m - lo - 1
      if (tail > 0) {
        System.arraycopy(b.sims, lo, sims, lo + 1, tail)
        System.arraycopy(b.ids, lo, ids, lo + 1, tail)
      }
      TopKState(sims, ids)
    }
  }

  override def merge(a: TopKState, b: TopKState): TopKState = {
    if (a.sims.isEmpty) return b
    if (b.sims.isEmpty) return a
    val m = math.min(a.sims.length + b.sims.length, k)
    val sims = new Array[Double](m)
    val ids = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA = j >= b.sims.length ||
        (i < a.sims.length && better(a.sims(i), a.ids(i), b.sims(j), b.ids(j)))
      if (takeA) { sims(o) = a.sims(i); ids(o) = a.ids(i); i += 1 }
      else { sims(o) = b.sims(j); ids(o) = b.ids(j); j += 1 }
      o += 1
    }
    TopKState(sims, ids)
  }

  override def finish(b: TopKState): TopKState = b

  override def bufferEncoder: Encoder[TopKState] = Encoders.product[TopKState]
  override def outputEncoder: Encoder[TopKState] = Encoders.product[TopKState]
}

object TopK {

  /**
   * Two-stage top-k over a scored relation with columns
   * (query_id, neighbor_id, sim): per-partition bounded top-k (partial
   * aggregation, map-side), one exchange of ≤ k·partitions rows per query,
   * final merge, explode back to (query_id, neighbor_id, sim, rank).
   *
   * Null sims (e.g. cosine against a zero vector) are dropped — the window
   * formulation ordered them last (desc = nulls last), so they could only
   * ever rank when fewer than k real candidates existed.
   */
  def perQuery(scored: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    scored
      .filter(col("sim").isNotNull)
      .groupBy(col("query_id"))
      .agg(agg(col("sim"), col("neighbor_id")).as("__nn"))
      .select(col("query_id"),
        posexplode(arrays_zip(col("__nn.ids").as("nid"), col("__nn.sims").as("nsim"))))
      .select(col("query_id"),
        col("col.nid").as("neighbor_id"),
        col("col.nsim").as("sim"),
        (col("pos") + lit(1)).as("rank"))
  }
}
