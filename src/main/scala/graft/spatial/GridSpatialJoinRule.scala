package graft.spatial

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/**
 * Catalyst optimizer rule: rewrite an inner join whose condition is a bare
 * `ST_Intersects(a, b)` theta predicate into the grid-partitioned
 * equi-join (explode covering cells → join on cell id → reference-cell
 * dedup filter → exact predicate). Without this, Catalyst can only plan a
 * (broadcast) nested-loop join for the theta condition — quadratic and
 * broadcast-bound; with it, users keep writing the natural
 * `a JOIN b ON ST_Intersects(...)` and get the scale plan.
 *
 * Opt-in by configuration (the cell pitch is data-dependent):
 *
 *   spark.graft.spatialJoin.cellSize=<coordinate units>
 *
 * Register via `spark.sql.extensions=graft.GraftExtensions` (injected as an
 * optimizer rule) or per-session with
 * `spark.experimental.extraOptimizations = Seq(GridSpatialJoinRule(spark))`.
 *
 * Only bare ST_Intersects inner-join conditions are rewritten; compound
 * conditions and outer joins keep Catalyst's plan. Geometries whose
 * envelope covers more than `maxCells` cells are dropped by the rewrite
 * (documented [[SpatialJoin.StCoveringCells]] cap) — pick a pitch near the
 * median envelope size.
 */
case class GridSpatialJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def cellSize: Option[Double] =
    session.conf.getOption("spark.graft.spatialJoin.cellSize").map(_.toDouble)

  override def apply(plan: LogicalPlan): LogicalPlan = cellSize match {
    case None => plan
    case Some(cs) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(StIntersects(lg, rg)), _)
            if lg.references.subsetOf(left.outputSet) &&
              rg.references.subsetOf(right.outputSet) =>
          rewrite(j, left, right, lg, rg, cs)
        case j @ Join(left, right, Inner, Some(StIntersects(lg, rg)), _)
            if lg.references.subsetOf(right.outputSet) &&
              rg.references.subsetOf(left.outputSet) =>
          rewrite(j, left, right, rg, lg, cs)
      }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      lg: Expression, rg: Expression, cs: Double): LogicalPlan = {
    val cellL = AttributeReference("__cell_l", LongType, nullable = false)()
    val cellR = AttributeReference("__cell_r", LongType, nullable = false)()
    val genL = Generate(Explode(SpatialJoin.StCoveringCells(lg, cs)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellL), child = left)
    val genR = Generate(Explode(SpatialJoin.StCoveringCells(rg, cs)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellR), child = right)
    val joined = Join(genL, genR, Inner, Some(EqualTo(cellL, cellR)), j.hint)
    val filtered = Filter(
      And(EqualTo(cellL, SpatialJoin.StRefCell(lg, rg, cs)), StIntersects(lg, rg)),
      joined)
    Project(j.output, filtered)
  }
}
