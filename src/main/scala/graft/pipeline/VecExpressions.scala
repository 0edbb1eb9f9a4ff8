package graft.pipeline

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Vector kernels as Catalyst expressions over `array<float>` /
 * `array<double>` columns.
 *
 * The built-in higher-order functions (`zip_with` + `aggregate`) evaluate
 * one lambda call per element per row — interpreted, boxing every value.
 * These expressions read the ArrayData buffers in a tight primitive loop
 * (~10× on 64-dim embeddings), which is the difference between an ANN scan
 * being compute-bound vs. overhead-bound at 100 TB.
 *
 * Accumulation is strictly left-to-right in double, matching DuckDB's
 * `list_dot_product(CAST(v AS DOUBLE[]), …)` for oracle parity.
 */
object VecUtil {
  /** Sequential dot product; any NaN propagates. Returns NaN on length mismatch. */
  def dot(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var acc = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }
}

abstract class VecBinary extends BinaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  protected lazy val isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** vec_dot(a, b) → double. */
case class VecDot(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecUtil.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], isFloat)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.spatial.Kernels.vecDot($a, $b, $isFloat)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_norm(a) → double L2 norm. */
case class VecNorm(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    math.sqrt(VecUtil.dot(a, a, isFloat))
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.spatial.Kernels.vecNorm($a, $isFloat)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** vec_cosine(a, b) → double in [-1, 1]; null on zero vectors. */
case class VecCosine(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val d = VecUtil.dot(a, b, isFloat)
    val na = math.sqrt(VecUtil.dot(a, a, isFloat))
    val nb = math.sqrt(VecUtil.dot(b, b, isFloat))
    if (na == 0.0 || nb == 0.0) null else d / (na * nb)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.spatial.Kernels.vecCosine($a, $b, $isFloat);
      if (Double.isNaN(${ev.value})) ${ev.isNull} = true;
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * vec_hyperplane_sig(vec) → long LSH bucket: bit j = sign of <v, h_j>,
 * plane components derived deterministically from splitmix64(seed, j, i) —
 * identical across executors/runs, no stored model.
 */
case class HyperplaneSig(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 63)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_hyperplane_sig"
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @inline private def plane(j: Int, i: Int): Double = {
    val h = TextUtil.splitmix64(seed ^ (j.toLong * 0x9e3779b97f4a7c15L) ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
    h.toDouble / Long.MaxValue.toDouble // ~uniform [-1, 1]
  }
  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      var i = 0
      if (isFloat) while (i < n) { acc += a.getFloat(i).toDouble * plane(j, i); i += 1 }
      else while (i < n) { acc += a.getDouble(i) * plane(j, i); i += 1 }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * pq_encode(vec, codebook, m) → array<int>: the PQ code of `vec` in each of
 * `m` subspaces against `codebook` (array of codevectors ORDERED BY CODE).
 * Same arithmetic contract as the HOF formulation it replaces — per
 * subspace a strictly-left-to-right double sum of squared diffs, strict
 * `<` so ties keep the smallest code — but as one tight primitive loop
 * per row instead of ~m·k interpreted lambda closures (~10× on 64-dim
 * embeddings; the difference between the encode scan being compute-bound
 * and overhead-bound at corpus scale).
 */
case class PqEncodeExpr(left: Expression, right: Expression, m: Int)
    extends BinaryExpression with CodegenFallback {
  require(m > 0, s"m must be positive, got $m")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"
  private lazy val vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val cbIsFloat: Boolean = right.dataType match {
    case ArrayType(ArrayType(FloatType, _), _) => true
    case _ => false
  }
  @inline private def at(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  override protected def nullSafeEval(v: Any, cbv: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cb = cbv.asInstanceOf[ArrayData]
    val d = vec.numElements()
    val k = cb.numElements()
    val dsub = d / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var best = Double.MaxValue
      var bestCode = -1
      var c = 0
      while (c < k) {
        val cvec = cb.getArray(c)
        if (cvec == null || cvec.numElements() < off + dsub) { c += 1 }
        else {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val diff = at(vec, off + i, vecIsFloat) - at(cvec, off + i, cbIsFloat)
          acc += diff * diff
          i += 1
        }
        if (acc < best) { best = acc; bestCode = c }
        c += 1
        }
      }
      codes(s) = bestCode
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
