package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShim.{column => toCol, expression => toExpr}

import graft.pipeline.Graph

/**
 * Density-based spatial clustering (DBSCAN, Ester et al. 1996) composed
 * from the engine's own primitives: the dilated-grid dwithin self-join
 * supplies the eps-neighbor graph, [[graft.pipeline.Graph.connectedComponents]]
 * supplies the core-graph components. No new execution machinery — the
 * operator is a composition, which is exactly how it stays scalable.
 *
 * This is the DETERMINISTIC variant: classic DBSCAN's border-point
 * assignment depends on visit order (a border point in reach of two
 * clusters joins whichever was expanded first); here a border point joins
 * the core neighbor with the MINIMUM cluster label, and cluster labels
 * are the minimum member id of the core component — order-free, so the
 * result is a pure function of the input and any engine can replay it.
 */
object SpatialCluster {

  /**
   * Unordered eps-neighbor pairs (`id_a` < `id_b`) among `points` via the
   * dilated grid: the left side covers its own cell, the right side
   * dilates by ceil(eps/cellSize) rings so every pair within `eps` shares
   * at least one (cell, dilated-cell) bucket; the canonical-cell equality
   * (StRefCell with the same dilation) deduplicates multi-cell candidates
   * WITHOUT a distinct, and the exact ST_DWithin predicate certifies.
   * One equi-join shuffle on the cell id — the large×large shape of
   * [[SpatialJoin.join]], specialized to the self-join where `id_a <
   * id_b` also halves the candidate stream.
   */
  def dwithinPairs(points: DataFrame, idCol: String, geomCol: String,
                   eps: Double, cellSize: Double): DataFrame = {
    require(eps > 0 && cellSize > 0, "eps and cellSize must be positive")
    val dilate = math.ceil(eps / cellSize).toInt
    // (2·dilate+1)² dilated cells must stay under the covering-cells cap
    // (4096) or cells would silently null out and DROP pairs — size the
    // pitch near eps (dilate 1-2) for the intended fan-out anyway
    require(dilate <= 16,
      s"cellSize $cellSize is too small for eps $eps (dilate $dilate > 16)")
    val a = points.select(col(idCol).as("id_a"), col(geomCol).as("__ga"))
      .withColumn("__cell",
        explode(SpatialJoin.st_covering_cells(col("__ga"), cellSize)))
    val b = points.select(col(idCol).as("id_b"), col(geomCol).as("__gb"))
      .withColumn("__cell", explode(toCol(
        SpatialJoin.StCoveringCells(toExpr(col("__gb")),
          org.apache.spark.sql.catalyst.expressions.Literal(cellSize),
          dilate = dilate))))
    a.join(b, Seq("__cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("__cell") === toCol(SpatialJoin.StRefCell(
        toExpr(col("__ga")), toExpr(col("__gb")),
        org.apache.spark.sql.catalyst.expressions.Literal(cellSize),
        dilateRight = dilate)))
      .filter(functions.st_dwithin(col("__ga"), col("__gb"), lit(eps)))
      .select(col("id_a"), col("id_b"))
  }

  /**
   * DBSCAN over a point set: (idCol, cluster_id nullable, role).
   *
   *  - core:   ≥ minPts points (counting itself) within eps;
   *    cluster_id = min id of its core component (labels propagate over
   *    core–core edges only, the textbook definition).
   *  - border: non-core with ≥ 1 core eps-neighbor; joins the MINIMUM
   *    core neighbor label (deterministic tie rule).
   *  - noise:  everything else; cluster_id NULL.
   *
   * Scale shape: one grid equi-join for the neighbor graph (shuffle keyed
   * on cells), one partial-aggregated degree count, O(log diameter)
   * pointer-jumping label rounds over the CORE edge sliver only (never
   * the point set — run to exact convergence, see
   * [[Graph.connectedComponentsConverged]]), and two id-keyed joins to
   * attach labels back. Points with NULL geometry classify as noise.
   */
  def dbscan(points: DataFrame, idCol: String, geomCol: String,
             eps: Double, minPts: Int, cellSize: Double,
             maxRounds: Int = 50): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val pairs = dwithinPairs(points, idCol, geomCol, eps, cellSize).persist()
    val sym = pairs.unionByName(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val deg = sym.groupBy(col("id_a").as("id")).agg(count(lit(1)).as("__deg"))
    val cores = deg.filter(col("__deg") + 1 >= minPts).select(col("id"))
    val coreEdges = pairs
      .join(cores.select(col("id").as("id_a")), Seq("id_a"))
      .join(cores.select(col("id").as("id_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"))
    // EXACT components: density-connected cores form filaments whose
    // hop-diameter scales with extent/eps, so fixed-round propagation
    // would silently mislabel them. The size-gated strategy collects the
    // core-edge SLIVER for driver union-find when it's broadcast-small
    // (the common case — cores are a sliver of the corpus) and falls
    // back to the converged pointer-jumping loop beyond the gate.
    val comps = Graph.connectedComponentsExact(coreEdges, maxRounds = maxRounds)
    // cores with no core neighbor are singleton clusters (own id)
    val coreLabels = cores.join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    // border: non-core adjacent to ≥1 core — min core label
    val borderLabels = sym
      .join(coreLabels.select(col("id").as("id_b"), col("label")), Seq("id_b"))
      .groupBy(col("id_a").as("id")).agg(min(col("label")).as("__blabel"))
      .join(cores.select(col("id"), lit(1).as("__isc")), Seq("id"), "left_anti")
      .select(col("id"), col("__blabel"))
    points.select(col(idCol).as("id"))
      .join(coreLabels.select(col("id"), col("label").as("__clabel")), Seq("id"), "left")
      .join(borderLabels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__clabel"), col("__blabel")).as("cluster_id"),
        when(col("__clabel").isNotNull, lit("core"))
          .when(col("__blabel").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"))
  }
}
