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
  case class StRefCell(left: Expression, right: Expression, cellSize: Double)
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
      val xlo = math.max(ea.xmin, eb.xmin)
      val ylo = math.max(ea.ymin, eb.ymin)
      val ix = math.floor(xlo / cellSize).toLong
      val iy = math.floor(ylo / cellSize).toLong
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
   * Large×large KNN join — the 100 TB path. No broadcast of the full right
   * side, no quadratic stage on the grid path:
   *
   *  1. each left row maps to the single grid cell of its envelope
   *     min-corner; each right row explodes to its covering cells dilated
   *     by one ring ([[StCoveringCells]] with `dilate = 1`), so every right
   *     geometry within `cellSize` of a left row shares a cell with it;
   *  2. candidates come from a plain shuffled EQUI-join on the cell id,
   *     kept only while `dist ≤ cellSize` — within that radius the
   *     candidate set is provably complete, so a left row that finds k
   *     candidates there has its true k nearest;
   *  3. per-left-row ranking is a window over the left keys — scale-safe
   *     here (unlike a per-query re-rank over a whole corpus) because the
   *     candidate fan-in per left row is bounded by local density in a
   *     3×3-cell neighborhood, not by |right|;
   *  4. left rows with fewer than k certified neighbors (sparse
   *     neighborhoods — rare when `cellSize` ≥ the expected kth-neighbor
   *     distance) fall back to the exact broadcast [[knnJoin]]; right rows
   *     whose envelope exceeds the cell cap join every left row exactly.
   *     Both residual branches are unioned in, so the result is EXACT for
   *     any pitch — `cellSize` tunes performance, never correctness.
   */
  def knnJoinGrid(left: DataFrame, right: DataFrame,
                  leftGeom: Column, rightGeom: Column,
                  leftKeys: Seq[String], rightKeys: Seq[String],
                  k: Int, cellSize: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = graft.spatial.functions.st_distance(leftGeom, rightGeom)

    // envelope min-corner cell of the left geometry (exact for points)
    val l = left.withColumn("__cell", st_ref_cell(leftGeom, leftGeom, cellSize))
    val rCells = right.withColumn("__cells", st_covering_cells(rightGeom, cellSize, dilate = 1))
    val rOk = rCells.filter(col("__cells").isNotNull)
      .withColumn("__cell", explode(col("__cells"))).drop("__cells")
    val rBig = rCells.filter(col("__cells").isNull).drop("__cells") // over-cap: rare, exact path

    val gridCand = l.join(rOk, Seq("__cell")).drop("__cell")
      .withColumn("__dist", dist)
    val bigCand = l.drop("__cell").crossJoin(broadcast(rBig))
      .withColumn("__dist", dist)
    val cand = gridCand.unionByName(bigCand)
      .filter(col("__dist").isNotNull && col("__dist") <= lit(cellSize))

    val w = Window.partitionBy(leftKeys.map(col): _*)
      .orderBy(col("__dist").asc +: rightKeys.map(col(_).asc): _*)
    val ranked = cand.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)

    // certification: only left rows with a full k inside the radius are done
    val resolved = ranked.groupBy(leftKeys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") === k)
      .select(leftKeys.map(col): _*)
    val certified = ranked.join(resolved, leftKeys, "left_semi")
      .withColumnRenamed("__dist", "knn_dist")
    val unresolvedLeft = left.join(resolved, leftKeys, "left_anti")
    val residual = knnJoin(unresolvedLeft, right, leftGeom, rightGeom, leftKeys, rightKeys, k)
    certified.unionByName(residual)
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
