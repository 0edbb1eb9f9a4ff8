package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval-overlap (range) join: all pairs (l, r) where
 * `[l.start, l.end] ∩ [r.start, r.end] ≠ ∅` (closed intervals), with
 * optional extra equality keys — the batch operator behind
 * "which readings fall inside which maintenance windows", reservation
 * conflicts, temporal foreign keys. Spark has no built-in range join; the
 * naive plan is a BroadcastNestedLoop/cartesian scan — quadratic, a
 * non-starter at scale.
 *
 * The scalable formulation here is the classic binning rewrite: each
 * interval explodes to the fixed-width bins it touches, candidates meet in
 * an EQUI-join on (bin, keys) — one ordinary shuffle, no cartesian — and a
 * pair that shares several bins is attributed to exactly one (the bin of
 * `max(l.start, r.start)`, which both sides necessarily cover), so no
 * dedup pass is needed. Output equals the naive join's exactly.
 *
 * Two self-tuning pieces, same patterns as the rest of the engine:
 *  - the bin width defaults to the p90 interval length across both sides
 *    (one-row aggregate consumed as an uncorrelated scalar subquery — the
 *    [[graft.spatial.SpatialJoin.adaptivePitch]] shape): bins match the
 *    data's own interval scale, so typical intervals touch O(1) bins.
 *    Width only affects the PLAN; the result is width-invariant.
 *  - rare intervals spanning more than `longIntervalBins` bins would
 *    explode into long bin chains (the skew trap of the binning rewrite),
 *    so they take a broadcast fallback instead: long-left × all-right and
 *    short-left × long-right pairs join via broadcast of the long slice
 *    (few by construction — longer than `longIntervalBins`× the p90
 *    length). The three branches partition the pair space exactly.
 */
object RangeJoin {

  /** floor(x / w) in exact long arithmetic (`pmod` is non-negative, so
    * this is true floor division — correct for negative x too, unlike
    * `div`'s truncation). */
  private def floorDiv(x: Column, w: Column): Column =
    ((x - pmod(x, w)) / w).cast("long")

  /**
   * @param left/right   inputs; ALL columns of both are kept, so the two
   *                     schemas must not share names
   * @param lStart,lEnd  left interval bounds (integral-castable: long,
   *                     int, day number, epoch seconds …; convert dates
   *                     with datediff first). Rows with null bounds or
   *                     end < start match nothing and are dropped.
   * @param rStart,rEnd  right interval bounds
   * @param keys         extra equality keys as (leftCol, rightCol) pairs
   * @param binWidth     fixed bin width; None (default) self-tunes to the
   *                     p90 interval length over both sides
   * @param longIntervalBins intervals touching more bins than this take
   *                     the broadcast fallback branch
   */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  keys: Seq[(String, String)] = Nil,
                  binWidth: Option[Long] = None,
                  longIntervalBins: Int = 64): DataFrame = {
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"left/right column names must be disjoint, both have: $dup")
    binWidth.foreach(w => require(w > 0, s"binWidth must be positive, got $w"))

    val l0 = left
      .filter(col(lStart).isNotNull && col(lEnd).isNotNull && col(lEnd) >= col(lStart))
      .withColumn("__ls", col(lStart).cast("long"))
      .withColumn("__le", col(lEnd).cast("long"))
    val r0 = right
      .filter(col(rStart).isNotNull && col(rEnd).isNotNull && col(rEnd) >= col(rStart))
      .withColumn("__rs", col(rStart).cast("long"))
      .withColumn("__re", col(rEnd).cast("long"))

    val width: () => Column = binWidth match {
      case Some(w) => () => lit(w)
      case None =>
        // p90 interval length over BOTH sides, one row, map-side partials;
        // cached so the two scalar-subquery consumers re-read one row
        // (fresh subquery expression per consumer, shared cached stats)
        val lens = l0.select((col("__le") - col("__ls")).as("__len"))
          .unionByName(r0.select((col("__re") - col("__rs")).as("__len")))
        val stats = lens.agg(greatest(
          percentile_approx(col("__len"), lit(0.9), lit(100)) + lit(1L),
          lit(1L)).as("__w")).cache()
        () => graft.spatial.SpatialJoin.scalarOf(stats)
    }

    // every internal column is side-unique, so join conditions and the
    // final projection resolve by plain name — dataset-qualified refs
    // would trip Spark's self-join ambiguity detection once the width
    // subquery carries both lineages
    val l1 = l0.withColumn("__lw", width())
      .withColumn("__lb0", floorDiv(col("__ls"), col("__lw")))
      .withColumn("__lb1", floorDiv(col("__le"), col("__lw")))
    val r1 = r0.withColumn("__rw", width())
      .withColumn("__rb0", floorDiv(col("__rs"), col("__rw")))
      .withColumn("__rb1", floorDiv(col("__re"), col("__rw")))

    val maxBins = lit(longIntervalBins.toLong)
    val lShort = l1.filter(col("__lb1") - col("__lb0") < maxBins)
    val lLong  = l1.filter(col("__lb1") - col("__lb0") >= maxBins)
    val rShort = r1.filter(col("__rb1") - col("__rb0") < maxBins)
    val rLong  = r1.filter(col("__rb1") - col("__rb0") >= maxBins)

    val outCols = (left.columns.toSeq ++ right.columns.toSeq).map(col)
    val keyCond: Column =
      keys.map { case (a, b) => col(a) === col(b) }.foldLeft(lit(true))(_ && _)
    val overlapCond: Column =
      col("__ls") <= col("__re") && col("__rs") <= col("__le")

    // short×short: equi-join on the exploded bin; a pair sharing several
    // bins is kept only at the bin of max(start, start) — exactly-once.
    // scaleOut first: the bin explode + equi-join + aggregate otherwise
    // ride the SCAN's partitioning (a few file splits at bench scale —
    // measured 2.6 s of q90's 3.5 s in one 3-task stage), and when the
    // planner broadcasts the other side nothing downstream ever widens.
    // The guard no-ops once the input is already wider than the session
    // parallelism, so no shuffle is added at real scale.
    def scaleOut(df: DataFrame): DataFrame = {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
    val lb = scaleOut(lShort).withColumn("__lbin",
      explode(sequence(col("__lb0"), col("__lb1"))))
    val rb = scaleOut(rShort).withColumn("__rbin",
      explode(sequence(col("__rb0"), col("__rb1"))))
    val binned = lb.join(rb,
        col("__lbin") === col("__rbin") && keyCond && overlapCond &&
          col("__lbin") === floorDiv(greatest(col("__ls"), col("__rs")), col("__lw")))
      .select(outCols: _*)

    // long intervals are few (docs above) — broadcast them into plain
    // non-equi joins. long-left sees ALL right rows; short-left sees only
    // long-right, so the three branches tile the pair space exactly once.
    val viaLongLeft = r1.join(broadcast(lLong), keyCond && overlapCond)
      .select(outCols: _*)
    val viaLongRight = lShort.join(broadcast(rLong), keyCond && overlapCond)
      .select(outCols: _*)

    binned.unionByName(viaLongLeft).unionByName(viaLongRight)
  }
}
