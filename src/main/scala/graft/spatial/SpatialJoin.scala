package graft.spatial

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** st_covering_cells(geom): packed (ix,iy) cell ids covering the envelope,
    * optionally dilated by `dilate` rings of neighboring cells (used by the
    * grid KNN join to pull in every geometry within one cell pitch). */
  case class StCoveringCells(child: Expression, cellSize: Double, maxCells: Int = 4096,
                             dilate: Int = 0)
      extends UnaryExpression with CodegenFallback {
    require(cellSize > 0)
    require(dilate >= 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "st_covering_cells"
    override protected def nullSafeEval(v: Any): Any = {
      val env = new Envelope
      try WKB.foldEnvelope(v.asInstanceOf[Array[Byte]], env)
      catch { case _: Exception => return null }
      if (env.isEmpty) return new GenericArrayData(Array.empty[Long])
      val ix0 = math.floor(env.xmin / cellSize).toLong - dilate
      val ix1 = math.floor(env.xmax / cellSize).toLong + dilate
      val iy0 = math.floor(env.ymin / cellSize).toLong - dilate
      val iy1 = math.floor(env.ymax / cellSize).toLong + dilate
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def st_covering_cells(g: Column, cellSize: Double): Column =
    toCol(StCoveringCells(toExpr(g), cellSize))

  def st_covering_cells(g: Column, cellSize: Double, dilate: Int): Column =
    toCol(StCoveringCells(toExpr(g), cellSize, dilate = dilate))

  /**
   * Canonical joint cell of two geometries: the cell containing the
   * min-corner of their envelope intersection. Every qualifying pair meets
   * in exactly one grid cell that equals this value — emitting a pair only
   * from its reference cell deduplicates candidates WITHOUT a distinct
   * (no extra shuffle), the standard trick for grid spatial joins.
   */
  case class StRefCell(left: Expression, right: Expression, cellSize: Double,
                       dilateRight: Int = 0)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "st_ref_cell"
    override protected def nullSafeEval(l: Any, r: Any): Any = {
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
      val ix = math.max(math.floor(ea.xmin / cellSize).toLong,
                        math.floor(eb.xmin / cellSize).toLong - dilateRight)
      val iy = math.max(math.floor(ea.ymin / cellSize).toLong,
                        math.floor(eb.ymin / cellSize).toLong - dilateRight)
      (ix << 32) | (iy & 0xffffffffL)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def st_ref_cell(a: Column, b: Column, cellSize: Double): Column =
    toCol(StRefCell(toExpr(a), toExpr(b), cellSize))

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
                  rightCountUpperBound: Option[Long] = None): DataFrame = {
    require(escalateRounds >= 1)
    val skipRounds = rightCountUpperBound.exists(_ <= k)
    val dist = graft.spatial.functions.st_distance(leftGeom, rightGeom)
    // packed (ix,iy) arithmetic on cell ids — codegen'd longs, no WKB parse
    def ixOf(c: Column) = shiftright(c, 32)
    def iyOf(c: Column) = shiftright(shiftleft(c, 32), 32)
    def pack(ix: Column, iy: Column) =
      shiftleft(ix, 32).bitwiseOR(iy.bitwiseAND(lit(0xffffffffL)))

    // one grid round at `pitch`: (certified top-k rows, still-unresolved left rows)
    def gridRound(unresolved: DataFrame, pitch: Double): (DataFrame, DataFrame) = {
      // each side's envelope min-corner cell, computed ONCE per row and
      // carried as a long: the canonical-shared-cell dedup filter below is
      // then pure integer arithmetic per candidate instead of re-parsing
      // both WKB values per candidate row
      val l = unresolved
        .withColumn("__lc0", st_ref_cell(leftGeom, leftGeom, pitch))
        .withColumn("__cell", explode(st_covering_cells(leftGeom, pitch)))
      val rCells = right
        .withColumn("__rc0", st_ref_cell(rightGeom, rightGeom, pitch))
        .withColumn("__cells", st_covering_cells(rightGeom, pitch, dilate = 1))
      val rOk = rCells.filter(col("__cells").isNotNull)
        .withColumn("__cell", explode(col("__cells"))).drop("__cells")
      val rBig = rCells.filter(col("__cells").isNull).drop("__cells", "__rc0") // over-cap: rare, exact path

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
        .filter(col("__dist").isNotNull && col("__dist") <= lit(pitch))

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

    var unresolved = left
    var pitch = cellSize
    val certifiedParts = Seq.newBuilder[DataFrame]
    var r = 0
    while (r < escalateRounds && !skipRounds) {
      val (certified, next) = gridRound(unresolved, pitch)
      certifiedParts += certified
      unresolved = next
      pitch *= 4
      r += 1
    }

    // terminal exact residual: right is the streamed side, the shrunken
    // unresolved set the (planner-gated) broadcast side; GroupedTopK keeps
    // ≤ k rows per left row per map partition before the only exchange
    val residCand = right.crossJoin(unresolved)
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
           cellSize: Double): DataFrame = {
    val l = left.withColumn("__cell", explode(st_covering_cells(leftGeom, cellSize)))
    val r = right.withColumn("__cell", explode(st_covering_cells(rightGeom, cellSize)))
    l.join(r, Seq("__cell"))
      .filter(col("__cell") === st_ref_cell(leftGeom, rightGeom, cellSize))
      .filter(predicate(leftGeom, rightGeom))
      .drop("__cell")
  }
}
