package graft.spatial

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/**
 * Catalyst optimizer rule: rewrite an inner join whose condition is a bare
 * spatial theta predicate into the grid-partitioned equi-join (explode
 * covering cells → join on cell id → canonical-cell dedup filter → exact
 * predicate). Covered predicates: every envelope-implied relationship
 * (ST_Intersects, ST_EnvIntersects, ST_Contains, ST_Within, ST_Equals,
 * ST_Touches, ST_Overlaps) and ST_DWithin with a foldable distance (the
 * right side's cells dilate by enough rings to cover it). Without this,
 * Catalyst can only plan a (broadcast) nested-loop join for the theta
 * condition — quadratic and broadcast-bound; with it, users keep writing
 * the natural `a JOIN b ON ST_Contains(...)` and get the scale plan.
 *
 * Opt-in by configuration (the cell pitch is data-dependent):
 *
 *   spark.graft.spatialJoin.cellSize=<coordinate units> | auto
 *
 * `auto` estimates the pitch from BOTH sides' statistics
 * ([[SpatialJoin.predicatePitchStats]]: count-density of the denser side,
 * floored by mean envelope span) injected as an uncorrelated scalar
 * subquery — executed once at runtime, no driver-side data action, pitch
 * tracks the data. ST_DWithin keeps requiring an explicit cellSize: its
 * right-side cell dilation ring count ⌈d/cs⌉ must be known at plan time.
 *
 * Register via `spark.sql.extensions=graft.GraftExtensions` (injected as an
 * optimizer rule) or per-session with
 * `spark.experimental.extraOptimizations = Seq(GridSpatialJoinRule(spark))`.
 *
 * Only bare single-predicate inner-join conditions are rewritten; compound
 * conditions and outer joins keep Catalyst's plan. The rewrite is
 * RESULT-PRESERVING: geometries whose envelope covers more than `maxCells`
 * cells (where [[SpatialJoin.StCoveringCells]] returns null rather than
 * exploding) are routed through exact theta-join fallback branches and
 * unioned back in, so enabling the rule never drops matches — over-cap
 * rows just don't get the grid speedup. Pick a pitch near the median
 * envelope size to keep those branches empty.
 */
case class GridSpatialJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  /** None = rule off; Some(None) = auto pitch; Some(Some(cs)) = literal. */
  private def cellSize: Option[Option[Double]] =
    session.conf.getOption("spark.graft.spatialJoin.cellSize").map {
      case "auto" => None
      case s => Some(s.toDouble)
    }

  /** The over-cap fallback joins this rule itself emits are recognizable by
    * their StCoveringCells null-check filters; without this guard the
    * fixed-point batch would rewrite them again, forever. The scan covers
    * the WHOLE subtree, not just the immediate child: when the rule runs
    * inside the main operator-optimization batch (the injectOptimizerRule
    * path), PushDownPredicates interleaves and pushes the marker filter
    * below projections between iterations — an immediate-child check then
    * misses it and the rule re-rewrites its own fallbacks every iteration,
    * growing the plan exponentially. Side effect: a join whose input
    * already contains a covering-cells filter (e.g. the output of a prior
    * grid join) is not rewritten again — acceptable, documented. */
  private def isOwnFallback(p: LogicalPlan): Boolean = p.exists {
    case Filter(cond, _) => cond.exists(_.isInstanceOf[SpatialJoin.StCoveringCells])
    case Project(list, _) =>
      list.exists(_.exists(_.isInstanceOf[SpatialJoin.StCoveringCells]))
    case _ => false
  }

  /** Geometry args + right-side cell dilation for a rewritable predicate:
    * every envelope-implied predicate rides the grid at dilation 0;
    * ST_DWithin(d) dilates the right side by enough rings to cover d
    * (|Δcoord| ≤ d ⇒ |Δindex| ≤ ⌊d/cs⌋+1 per axis) — literal pitch only,
    * the ring count needs cs at plan time. */
  private def rewritable(cond: Expression,
                         cs: Option[Double]): Option[(Expression, Expression, Int)] =
    cond match {
      case StIntersects(a, b)    => Some((a, b, 0))
      case StEnvIntersects(a, b) => Some((a, b, 0))
      case StContains(a, b)      => Some((a, b, 0))
      case StWithin(a, b)        => Some((a, b, 0))
      case StEquals(a, b)        => Some((a, b, 0))
      case StTouches(a, b)       => Some((a, b, 0))
      case StOverlaps(a, b)      => Some((a, b, 0))
      case StDWithin(a, b, d) if d.foldable && cs.isDefined =>
        val dist = d.eval() match {
          case n: Number => n.doubleValue()
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble // SQL `750.0` literal
          case _ => -1.0
        }
        if (dist >= 0) Some((a, b, math.floor(dist / cs.get).toInt + 1)) else None
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = cellSize match {
    case None => plan
    case Some(cs) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), _)
            if rewritable(cond, cs).isDefined &&
              !isOwnFallback(left) && !isOwnFallback(right) => {
          val (a, b, dilate) = rewritable(cond, cs).get
          // the predicate's args may reference the join sides in either order
          if (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet))
            rewrite(j, left, right, a, b, cs, dilate)
          else if (a.references.subsetOf(right.outputSet) &&
                   b.references.subsetOf(left.outputSet))
            rewrite(j, left, right, b, a, cs, dilate)
          else j
        }
      }
  }

  /** The pitch expression of a rewrite: the configured literal, or (auto)
    * an uncorrelated scalar subquery over both sides' combined statistics —
    * the child plans are re-wrapped as DataFrames only to BUILD the
    * subquery's logical plan; nothing executes at rewrite time. */
  private def pitchExpr(cs: Option[Double], left: LogicalPlan, right: LogicalPlan,
                        lg: Expression, rg: Expression): Expression = cs match {
    case Some(v) => Literal(v)
    case None =>
      import org.apache.spark.sql.GraftShim
      val stats = SpatialJoin.predicatePitchStats(
        GraftShim.ofRows(session, left), GraftShim.column(lg),
        GraftShim.ofRows(session, right), GraftShim.column(rg))
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        stats.queryExecution.analyzed)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      lg: Expression, rg: Expression, cs: Option[Double],
                      dilate: Int = 0): LogicalPlan = {
    // The cell array is computed ONCE per row in a Project below the
    // branches; the ok/big filters and the Generate all reference the
    // attribute instead of re-evaluating the WKB-parsing expression.
    val csE = pitchExpr(cs, left, right, lg, rg)
    val cellsL = Alias(new SpatialJoin.StCoveringCells(lg, csE), "__cells_l")()
    val cellsR = Alias(new SpatialJoin.StCoveringCells(rg, csE, dilate = dilate), "__cells_r")()
    val leftC = Project(left.output :+ cellsL, left)
    val rightC = Project(right.output :+ cellsR, right)

    // Rows whose envelope exceeds the StCoveringCells cap yield a null cell
    // array: they can't ride the grid path, but the rewrite must stay
    // result-preserving, so they take exact theta fallback branches below.
    val okLeft = Filter(IsNotNull(cellsL.toAttribute), leftC)
    val okRight = Filter(IsNotNull(cellsR.toAttribute), rightC)
    val bigLeft = Filter(IsNull(cellsL.toAttribute), leftC)
    val bigRight = Filter(IsNull(cellsR.toAttribute), rightC)

    val cellL = AttributeReference("__cell_l", LongType, nullable = false)()
    val cellR = AttributeReference("__cell_r", LongType, nullable = false)()
    val genL = Generate(Explode(cellsL.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellL), child = okLeft)
    val genR = Generate(Explode(cellsR.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellR), child = okRight)
    val joined = Join(genL, genR, Inner, Some(EqualTo(cellL, cellR)), j.hint)
    // pair dedup via the canonical shared cell (dilation-aware), then the
    // ORIGINAL predicate verbatim — correct for asymmetric predicates
    // (contains/within) whichever side their args reference
    val grid = Project(j.output, Filter(
      And(EqualTo(cellL, new SpatialJoin.StRefCell(lg, rg, csE, dilateRight = dilate)),
        j.condition.get),
      joined))

    // exact fallbacks, disjoint by construction:
    //   (big left) × (all right)  ∪  (ok left) × (big right)
    val cond = j.condition
    val bigL = Project(j.output, Join(bigLeft, right, Inner, cond, j.hint))
    val bigR = Project(j.output, Join(okLeft, bigRight, Inner, cond, j.hint))
    Union(Seq(grid, bigL, bigR))
  }
}
