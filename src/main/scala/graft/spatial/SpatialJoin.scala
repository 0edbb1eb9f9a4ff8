package graft.spatial

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShim.{column => toCol, expression => toExpr}
import org.apache.spark.sql.functions._

/**
 * Grid-partitioned spatial join — the scale path for spatial predicates.
 *
 * A broadcast nested-loop join (what Catalyst picks for an ST_* theta join)
 * is right when one side fits in memory; at 100 TB neither side does. The
 * standard fix is a uniform grid: each geometry is exploded to the cells
 * its envelope covers, the join becomes an EQUI-join on cell id (hash
 * shuffle, both sides partitioned by the same key — no broadcast, no NL),
 * and the exact predicate filters within cells. Duplicate candidate pairs
 * (envelopes spanning several shared cells) are removed by a distinct on
 * the caller's row keys.
 *
 * Cell size is the tuning knob: ≈ the median geometry envelope size keeps
 * the per-cell fan-out near 1. Skewed cells (a hot spot of geometries)
 * are handled by AQE skew-join splitting since the join is a plain
 * shuffled hash join.
 */
object SpatialJoin {

  /** Numeric scalar → Double (the pitch child is a DOUBLE literal from the
    * scalar API, or the broadcast one-row estimate column). */
  private def asD(v: Any): Double = v match {
    case d: java.lang.Double => d.doubleValue()
    case n: java.lang.Number => n.doubleValue()
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case other => throw new IllegalArgumentException(s"not a numeric cell size: $other")
  }

  /** st_covering_cells(geom, cellSize): packed (ix,iy) cell ids covering the
    * envelope, optionally dilated by `dilate` rings of neighboring cells
    * (used by the grid KNN join to pull in every geometry within one cell
    * pitch). `cellSize` is an expression child so the pitch can be a plain
    * literal OR a data-derived scalar carried on the row (the adaptive-pitch
    * path — see [[adaptivePitch]]). */
  case class StCoveringCells(child: Expression, cellSize: Expression, maxCells: Int = 4096,
                             dilate: Int = 0)
      extends BinaryExpression with CodegenFallback {
    require(dilate >= 0)
    override def left: Expression = child
    override def right: Expression = cellSize
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "st_covering_cells"
    override protected def nullSafeEval(v: Any, cs: Any): Any = {
      val cell = asD(cs)
      if (!(cell > 0)) return null
      val env = new Envelope
      try WKB.foldEnvelope(v.asInstanceOf[Array[Byte]], env)
      catch { case _: Exception => return null }
      if (env.isEmpty) return new GenericArrayData(Array.empty[Long])
      val ix0 = math.floor(env.xmin / cell).toLong - dilate
      val ix1 = math.floor(env.xmax / cell).toLong + dilate
      val iy0 = math.floor(env.ymin / cell).toLong - dilate
      val iy1 = math.floor(env.ymax / cell).toLong + dilate
      val nx = ix1 - ix0 + 1
      val ny = iy1 - iy0 + 1
      if (nx * ny > maxCells) return null // degenerate envelope vs cell size
      val out = new Array[Long]((nx * ny).toInt)
      var k = 0
      var ix = ix0
      while (ix <= ix1) {
        var iy = iy0
        while (iy <= iy1) {
          out(k) = (ix << 32) | (iy & 0xffffffffL)
          k += 1
          iy += 1
        }
        ix += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(child = l, cellSize = r)
  }

  object StCoveringCells {
    def apply(child: Expression, cellSize: Double): StCoveringCells =
      new StCoveringCells(child, Literal(cellSize))
    def apply(child: Expression, cellSize: Double, dilate: Int): StCoveringCells =
      new StCoveringCells(child, Literal(cellSize), dilate = dilate)
  }

  def st_covering_cells(g: Column, cellSize: Double): Column =
    toCol(StCoveringCells(toExpr(g), cellSize))

  def st_covering_cells(g: Column, cellSize: Double, dilate: Int): Column =
    toCol(StCoveringCells(toExpr(g), cellSize, dilate = dilate))

  def st_covering_cells(g: Column, cellSize: Column): Column =
    toCol(new StCoveringCells(toExpr(g), toExpr(cellSize)))

  def st_covering_cells(g: Column, cellSize: Column, dilate: Int): Column =
    toCol(new StCoveringCells(toExpr(g), toExpr(cellSize), dilate = dilate))

  /**
   * Canonical joint cell of two geometries: the cell containing the
   * min-corner of their envelope intersection. Every qualifying pair meets
   * in exactly one grid cell that equals this value — emitting a pair only
   * from its reference cell deduplicates candidates WITHOUT a distinct
   * (no extra shuffle), the standard trick for grid spatial joins.
   */
  case class StRefCell(left: Expression, right: Expression, cellSize: Expression,
                       dilateRight: Int = 0)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = left
    override def second: Expression = right
    override def third: Expression = cellSize
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "st_ref_cell"
    override protected def nullSafeEval(l: Any, r: Any, cs: Any): Any = {
      val cell = asD(cs)
      if (!(cell > 0)) return null
      val ea = new Envelope
      val eb = new Envelope
      try {
        WKB.foldEnvelope(l.asInstanceOf[Array[Byte]], ea)
        WKB.foldEnvelope(r.asInstanceOf[Array[Byte]], eb)
      } catch { case _: Exception => return null }
      if (ea.isEmpty || eb.isEmpty) return null
      // min shared cell of covering(env_l) ∩ dilated covering(env_r): max of
      // the per-axis lower index bounds (floor is monotonic, so max-then-floor
      // == max-of-floors when dilateRight == 0 — identical to the original
      // min-corner-of-envelope-intersection formulation)
      val ix = math.max(math.floor(ea.xmin / cell).toLong,
                        math.floor(eb.xmin / cell).toLong - dilateRight)
      val iy = math.max(math.floor(ea.ymin / cell).toLong,
                        math.floor(eb.ymin / cell).toLong - dilateRight)
      (ix << 32) | (iy & 0xffffffffL)
    }
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                   t: Expression): Expression =
      copy(left = f, right = s, cellSize = t)
  }

  object StRefCell {
    def apply(left: Expression, right: Expression, cellSize: Double): StRefCell =
      new StRefCell(left, right, Literal(cellSize))
    def apply(left: Expression, right: Expression, cellSize: Double,
              dilateRight: Int): StRefCell =
      new StRefCell(left, right, Literal(cellSize), dilateRight = dilateRight)
  }

  def st_ref_cell(a: Column, b: Column, cellSize: Double): Column =
    toCol(StRefCell(toExpr(a), toExpr(b), cellSize))

  def st_ref_cell(a: Column, b: Column, cellSize: Column): Column =
    toCol(new StRefCell(toExpr(a), toExpr(b), toExpr(cellSize)))

  /**
   * K-nearest-neighbor join: for each left row, the k nearest right rows by
   * planar ST_Distance. The right side is broadcast — use only when it is
   * dimension-sized; [[knnJoinGrid]] is the large×large path. Ties broken
   * by `rightKeys` for determinism.
   */
  def knnJoin(left: DataFrame, right: DataFrame,
              leftGeom: Column, rightGeom: Column,
              leftKeys: Seq[String], rightKeys: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = left.crossJoin(broadcast(right))
      .withColumn("__dist", graft.spatial.functions.st_distance(leftGeom, rightGeom))
      .filter(col("__dist").isNotNull)
    val w = Window.partitionBy(leftKeys.map(col): _*)
      .orderBy(col("__dist").asc +: rightKeys.map(col(_).asc): _*)
    joined.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .withColumnRenamed("__dist", "knn_dist")
  }

  /**
   * Large×large KNN join — the 100 TB path. EXACT for any pitch and any
   * left geometry class; the full right relation is NEVER force-broadcast:
   *
   *  Round r (pitch p = cellSize·4^r, r < escalateRounds), over the left
   *  rows still unresolved:
   *  1. left rows explode over ALL covering cells of their envelope; right
   *     rows explode over their covering cells dilated by one ring
   *     ([[StCoveringCells]] `dilate = 1`). Completeness within radius p:
   *     if dist(L,R) ≤ p there are points a∈L, b∈R with |a−b| ≤ p; a's cell
   *     is covered by env(L), and per axis |Δcoord| ≤ p ⇒ |Δindex| ≤ 1, so
   *     a's cell lies in the one-ring dilation of b's cell ⊆ R's emission.
   *     (Round 1 of this operator mapped left rows to their envelope
   *     min-corner cell only — complete for POINT lefts, silently lossy for
   *     extended geometries whose far extent left the min-corner cell.)
   *  2. candidates come from a plain shuffled EQUI-join on the cell id;
   *     each pair is emitted once from its canonical shared cell
   *     ([[StRefCell]] with `dilateRight = 1` — the min shared cell), so no
   *     dedup shuffle is needed; kept only while `dist ≤ p`, where the set
   *     is provably complete;
   *  3. ranking AND certification happen in one bounded aggregate pass per
   *     left key ([[graft.pipeline.BoundedTopK]] + count): partial
   *     aggregation keeps ≤ k candidates per key per map partition before
   *     the exchange, and a row is certified done iff ≥ k candidates exist
   *     within radius p (within that radius the candidate set is complete,
   *     so those are its true k nearest);
   *  4. the rest escalate to the next round at 4× the pitch. The
   *     unresolved set only shrinks; under AQE the (small) left side of the
   *     later cell joins broadcasts automatically, so right is re-scanned
   *     but never re-shuffled.
   *
   *  Terminal residual (rows uncertified after 4^(rounds−1)× pitch growth —
   *  empty in practice): exact brute force scoring right against the SMALL
   *  unresolved set, re-ranked by the map-side-bounded [[graft.pipeline.GroupedTopK]]
   *  (≤ k rows per left row per partition reach the exchange). The cross
   *  joins here and on the over-cap branch (right geometries spanning >
   *  maxCells cells) carry NO broadcast hint — the planner/AQE broadcasts
   *  the small side only when it actually fits, the explicit size gate.
   *
   *  `cellSize` tunes performance, never correctness. Degenerate-k guard:
   *  with |right| < k no row ever certifies (count < k), so every grid
   *  round would re-join for nothing before the residual answers anyway.
   *  Callers that know an UPPER bound on |right| (a catalog row count, a
   *  dimension-table cardinality — NOT computed here, that would be a
   *  driver action) pass it as `rightCountUpperBound`; when that bound is
   *  ≤ k the k nearest of every left row are ALL right rows, so the grid
   *  rounds are skipped and the exact brute-force residual (which ranks
   *  right against the full left set, planner-gated broadcast) IS the
   *  whole answer.
   */
  def knnJoinGrid(left: DataFrame, right: DataFrame,
                  leftGeom: Column, rightGeom: Column,
                  leftKeys: Seq[String], rightKeys: Seq[String],
                  k: Int, cellSize: Double, escalateRounds: Int = 2,
                  rightCountUpperBound: Option[Long] = None): DataFrame =
    knnJoinGridImpl(left, right, leftGeom, rightGeom, leftKeys, rightKeys, k,
      Some(cellSize), 0.0, escalateRounds, rightCountUpperBound)

  /**
   * [[knnJoinGrid]] with NO caller-supplied pitch: the cell size is estimated
   * from right-side statistics (envelope extent + count) as a one-row
   * aggregate consumed as a broadcast scalar — the bm25/ivfAssign shape, NO
   * driver-side data action — so the whole join remains one lazy plan.
   *
   * The default per-cell occupancy target is CERTIFICATION-driven:
   * max(8·k, 24). A row certifies in round 1 when ≥ k candidates sit within
   * one pitch, and the expected in-radius count at occupancy τ is a small
   * multiple of τ, so ~8·k rides out local density dips while keeping the
   * per-left candidate fan-out (≈ 9·τ, the one-ring dilation) proportional
   * to k — measured within ~1.2× of the best hand-tuned pitch at BOTH
   * sf0.1 and 10× density, where the carried-over hand tune was 7× off
   * (BENCH_SF1.md). Pitch never affects correctness (see [[knnJoinGrid]]),
   * only candidate fan-out; pass `targetPerCell > 0` to override.
   */
  def knnJoinGridAuto(left: DataFrame, right: DataFrame,
                      leftGeom: Column, rightGeom: Column,
                      leftKeys: Seq[String], rightKeys: Seq[String],
                      k: Int, targetPerCell: Double = 0.0, escalateRounds: Int = 2,
                      rightCountUpperBound: Option[Long] = None): DataFrame =
    knnJoinGridImpl(left, right, leftGeom, rightGeom, leftKeys, rightKeys, k,
      None, targetPerCell, escalateRounds, rightCountUpperBound)

  /**
   * One-row grid-pitch estimate from data statistics: `__pitch` such that
   * the expected number of rows per grid cell ≈ `targetPerCell` under a
   * uniform-density model over the data's bounding box W×H with N rows.
   * Solves p²·N/(W·H) = target, with the flat-extent branches (pitch taller
   * than H, or wider than W — cells then span the short axis entirely, so
   * density is effectively one-dimensional and p·N/W = target) and
   * degenerate clamps (few rows → one macro-cell; empty/null input → 1.0).
   * A plain aggregate: partial map-side combine to ONE row, no data action —
   * callers crossJoin(broadcast(...)) it as a scalar.
   */
  /** A one-row/one-column frame as an uncorrelated scalar-subquery Column. */
  private[graft] def scalarOf(oneRow: DataFrame): Column =
    toCol(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      oneRow.queryExecution.analyzed))

  def adaptivePitch(df: DataFrame, geom: Column, targetPerCell: Double): DataFrame = {
    import graft.spatial.{functions => G}
    val agg = df.agg(
      min(G.st_xmin(geom)).as("__x0"), max(G.st_xmax(geom)).as("__x1"),
      min(G.st_ymin(geom)).as("__y0"), max(G.st_ymax(geom)).as("__y1"),
      count(geom).as("__cnt"))
    val w = greatest(col("__x1") - col("__x0"), lit(1e-12))
    val h = greatest(col("__y1") - col("__y0"), lit(1e-12))
    val n = greatest(col("__cnt").cast("double"), lit(1.0))
    val tau = lit(targetPerCell)
    val p0 = sqrt(tau * w * h / n)
    // at most one flat branch can trigger when n > tau (both p0 > h and
    // p0 > w imply n < tau, caught by the first branch)
    val pitch =
      when(n <= tau, greatest(w, h))
        .when(p0 > h, least(tau * w / n, w))
        .when(p0 > w, least(tau * h / n, h))
        .otherwise(p0)
    agg.select(when(col("__cnt") === 0, lit(1.0))
      .otherwise(coalesce(greatest(pitch, lit(1e-9)), lit(1.0))).as("__pitch"))
  }

  private def knnJoinGridImpl(left: DataFrame, right: DataFrame,
                              leftGeom: Column, rightGeom: Column,
                              leftKeys: Seq[String], rightKeys: Seq[String],
                              k: Int, fixedPitch: Option[Double], targetPerCell: Double,
                              escalateRounds: Int,
                              rightCountUpperBound: Option[Long]): DataFrame = {
    require(escalateRounds >= 1)
    val skipRounds = rightCountUpperBound.exists(_ <= k)
    val dist = graft.spatial.functions.st_distance(leftGeom, rightGeom)
    // packed (ix,iy) arithmetic on cell ids — codegen'd longs, no WKB parse
    def ixOf(c: Column) = shiftright(c, 32)
    def iyOf(c: Column) = shiftright(shiftleft(c, 32), 32)
    def pack(ix: Column, iy: Column) =
      shiftleft(ix, 32).bitwiseOR(iy.bitwiseAND(lit(0xffffffffL)))

    // the round-1 pitch as a per-row scalar column on each side: a literal
    // when caller-supplied; else an UNCORRELATED SCALAR SUBQUERY over the
    // one-row estimate — Spark executes it once (ReuseSubquery dedupes the
    // occurrences across the union branches) and substitutes the value as a
    // plan literal, far cheaper than a broadcast-join stage per branch; the
    // stats frame is additionally marked cached so even un-reused subquery
    // instances re-read one cached row instead of re-scanning right
    val (left0, right0) =
      if (skipRounds) (left, right)
      else fixedPitch match {
        case Some(cs) => (left.withColumn("__pitch", lit(cs)),
                          right.withColumn("__rpitch", lit(cs)))
        case None =>
          val tau = if (targetPerCell > 0) targetPerCell else math.max(8.0 * k, 24.0)
          val stats = adaptivePitch(right, rightGeom, tau).cache()
          (left.withColumn("__pitch", scalarOf(stats)),
           right.withColumn("__rpitch", scalarOf(stats)))
      }

    // one grid round at pitch·mult: (certified top-k rows, still-unresolved left rows)
    def gridRound(unresolved: DataFrame, mult: Double): (DataFrame, DataFrame) = {
      val lp = col("__pitch") * lit(mult)
      val rp = col("__rpitch") * lit(mult)
      // each side's envelope min-corner cell, computed ONCE per row and
      // carried as a long: the canonical-shared-cell dedup filter below is
      // then pure integer arithmetic per candidate instead of re-parsing
      // both WKB values per candidate row
      val l = unresolved
        .withColumn("__lc0", st_ref_cell(leftGeom, leftGeom, lp))
        .withColumn("__cell", explode(st_covering_cells(leftGeom, lp)))
      val rCells = right0
        .withColumn("__rc0", st_ref_cell(rightGeom, rightGeom, rp))
        .withColumn("__cells", st_covering_cells(rightGeom, rp, dilate = 1))
      val rOk = rCells.filter(col("__cells").isNotNull)
        .withColumn("__cell", explode(col("__cells"))).drop("__cells", "__rpitch")
      val rBig = rCells.filter(col("__cells").isNull)
        .drop("__cells", "__rc0", "__rpitch") // over-cap: rare, exact path

      // canonical shared cell = per-axis max of left's min index and right's
      // min index dilated by one ring — exactly StRefCell(dilateRight = 1)
      val canonical = pack(
        greatest(ixOf(col("__lc0")), ixOf(col("__rc0")) - 1),
        greatest(iyOf(col("__lc0")), iyOf(col("__rc0")) - 1))
      val gridCand = l.join(rOk, Seq("__cell"))
        .filter(col("__cell") === canonical)
        .drop("__cell", "__lc0", "__rc0")
        .withColumn("__dist", dist)
      val bigCand = unresolved.crossJoin(rBig) // no hint: planner size-gates the broadcast
        .withColumn("__dist", dist)
      val cand = gridCand.unionByName(bigCand)
        .filter(col("__dist").isNotNull && col("__dist") <= lp)
        .drop("__pitch")

      // rank AND certify in ONE aggregate pass per left key: bounded top-k
      // (map-side partial, ≤ k rows per key per partition before the
      // exchange) plus the candidate count — a row is done iff ≥ k
      // candidates exist inside the radius. Replaces the round-2 shape
      // (window rank + groupBy count + semi join: three more exchanges of
      // the same key).
      val ordNames = "__dist" +: rightKeys
      val ordFields = ordNames.zipWithIndex.map { case (n, i) => col(n).as(s"__o$i") }
      val payload = struct(cand.columns.map(col).toIndexedSeq: _*).as("__row")
      val packed = struct(ordFields :+ payload: _*)
      val aggCol = toCol(graft.pipeline.BoundedTopK(toExpr(packed), k,
        ordNames.map(_ => true)).toAggregateExpression())
      val agged = cand.groupBy(leftKeys.map(col): _*)
        .agg(aggCol.as("__topk"), count(lit(1)).as("__n"))

      val certified = agged.filter(col("__n") >= k)
        .select(posexplode(col("__topk")).as(Seq("__pos", "__e")))
        .select(col("__e.__row.*") +:
          Seq((col("__pos") + lit(1)).cast("int").as("knn_rank")): _*)
        .withColumnRenamed("__dist", "knn_dist")
      val resolved = agged.filter(col("__n") >= k).select(leftKeys.map(col): _*)
      (certified, unresolved.join(resolved, leftKeys, "left_anti"))
    }

    var unresolved = left0
    var mult = 1.0
    val certifiedParts = Seq.newBuilder[DataFrame]
    var r = 0
    while (r < escalateRounds && !skipRounds) {
      val (certified, next) = gridRound(unresolved, mult)
      certifiedParts += certified
      unresolved = next
      mult *= 4
      r += 1
    }

    // terminal exact residual: right is the streamed side, the shrunken
    // unresolved set the (planner-gated) broadcast side; GroupedTopK keeps
    // ≤ k rows per left row per map partition before the only exchange
    val residLeft = if (skipRounds) unresolved else unresolved.drop("__pitch")
    val residCand = right.crossJoin(residLeft)
      .withColumn("__dist", dist)
      .filter(col("__dist").isNotNull)
    val residual = graft.pipeline.GroupedTopK.topK(residCand, leftKeys,
        ("__dist", true) +: rightKeys.map(n => (n, true)), k, rankCol = "knn_rank")
      .withColumnRenamed("__dist", "knn_dist")

    (certifiedParts.result() :+ residual).reduce(_ unionByName _)
  }

  /**
   * Inner spatial join on `predicate` (e.g. st_intersects/st_contains)
   * using grid partitioning.
   *
   * @param left/right   inputs; all their columns survive
   * @param leftGeom/rightGeom  WKB geometry columns
   * @param leftKeys/rightKeys  unique row keys (for candidate dedup)
   * @param cellSize     grid pitch in coordinate units
   */
  def join(left: DataFrame, right: DataFrame,
           leftGeom: Column, rightGeom: Column,
           leftKeys: Seq[String], rightKeys: Seq[String],
           predicate: (Column, Column) => Column,
           cellSize: Double): DataFrame =
    joinWithPitch(left, right, leftGeom, rightGeom, predicate, lit(cellSize))

  /** The grid predicate join at a pitch COLUMN, result-preserving like the
    * rewrite rule: geometries whose envelope overflows the covering-cells
    * cap yield a null cell array and would silently VANISH from a bare
    * explode — they are routed through exact theta fallback branches
    * ((big left × all right) ∪ (ok left × big right), disjoint by
    * construction, no broadcast hint: the planner size-gates) and unioned
    * back in, so a mis-sized pitch can cost time but never matches. */
  private def joinWithPitch(left: DataFrame, right: DataFrame,
                            leftGeom: Column, rightGeom: Column,
                            predicate: (Column, Column) => Column,
                            pitch: Column): DataFrame = {
    val lc = left.withColumn("__cells", st_covering_cells(leftGeom, pitch))
    val rc = right.withColumn("__cells", st_covering_cells(rightGeom, pitch))
    val lOk = lc.filter(col("__cells").isNotNull)
    val l = lOk.withColumn("__cell", explode(col("__cells"))).drop("__cells")
    val r = rc.filter(col("__cells").isNotNull)
      .withColumn("__cell", explode(col("__cells"))).drop("__cells")
    val grid = l.join(r, Seq("__cell"))
      .filter(col("__cell") === st_ref_cell(leftGeom, rightGeom, pitch))
      .filter(predicate(leftGeom, rightGeom))
      .drop("__cell")
    val bigL = lc.filter(col("__cells").isNull).drop("__cells")
      .crossJoin(right)
      .filter(predicate(leftGeom, rightGeom))
    val bigR = lOk.drop("__cells")
      .crossJoin(rc.filter(col("__cells").isNull).drop("__cells"))
      .filter(predicate(leftGeom, rightGeom))
    grid.unionByName(bigL).unionByName(bigR)
  }

  /**
   * [[join]] with NO caller-supplied pitch. Two signals, both one-row
   * broadcast aggregates (no driver action): the count-density pitch of the
   * DENSER side (the smaller of the two [[adaptivePitch]] estimates bounds
   * per-cell occupancy of both), floored by the mean envelope span of either
   * side — a pitch far below typical geometry size would explode every row
   * over many cells (or overflow the maxCells cap). Pitch tunes
   * candidate fan-out only; the canonical-cell dedup + exact predicate keep
   * any choice correct.
   */
  /** The combined one-row pitch estimate behind [[joinAuto]] and the
    * GridSpatialJoinRule's `cellSize=auto` mode (see [[joinAuto]] doc). */
  def predicatePitchStats(left: DataFrame, leftGeom: Column,
                          right: DataFrame, rightGeom: Column,
                          targetPerCell: Double = 32.0): DataFrame = {
    import graft.spatial.{functions => G}
    def meanSpan(df: DataFrame, g: Column) = df.agg(
      avg(G.st_xmax(g) - G.st_xmin(g)).as("__sx"),
      avg(G.st_ymax(g) - G.st_ymin(g)).as("__sy"))
    adaptivePitch(left, leftGeom, targetPerCell)
      .select(col("__pitch").as("__pl"))
      .crossJoin(adaptivePitch(right, rightGeom, targetPerCell)
        .select(col("__pitch").as("__pr")))
      .crossJoin(meanSpan(left, leftGeom)
        .select(col("__sx").as("__lsx"), col("__sy").as("__lsy")))
      .crossJoin(meanSpan(right, rightGeom)
        .select(col("__sx").as("__rsx"), col("__sy").as("__rsy")))
      .select(greatest(
        least(col("__pl"), col("__pr")),
        coalesce(col("__lsx"), lit(0.0)), coalesce(col("__lsy"), lit(0.0)),
        coalesce(col("__rsx"), lit(0.0)), coalesce(col("__rsy"), lit(0.0))).as("__pitch"))
      .cache() // one row; every subquery instance reads it, computed once
  }

  def joinAuto(left: DataFrame, right: DataFrame,
               leftGeom: Column, rightGeom: Column,
               leftKeys: Seq[String], rightKeys: Seq[String],
               predicate: (Column, Column) => Column,
               targetPerCell: Double = 32.0): DataFrame = {
    val stats = predicatePitchStats(left, leftGeom, right, rightGeom, targetPerCell)
    joinWithPitch(left, right, leftGeom, rightGeom, predicate, scalarOf(stats))
  }
}
