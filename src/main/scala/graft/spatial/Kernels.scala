package graft.spatial

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static kernels invoked from generated (whole-stage codegen) Java.
 *
 * A top-level Scala object emits static forwarders, so generated code calls
 * `graft.spatial.Kernels.xmin(bytes)` directly — no boxing, no
 * `references[i].eval(row)` indirection like CodegenFallback. Null results
 * are signalled by sentinel values (NaN for doubles, null for references,
 * (byte) -1 for tri-state booleans) and translated to SQL NULL by the
 * generated wrapper in each expression's doGenCode.
 */
object Kernels {

  def pointWkb(x: Double, y: Double): Array[Byte] = WKB.write(Point.xy(x, y))

  // bbox ordinates: NaN = empty/invalid → NULL
  def xmin(b: Array[Byte]): Double = bound(b, 0)
  def ymin(b: Array[Byte]): Double = bound(b, 1)
  def xmax(b: Array[Byte]): Double = bound(b, 2)
  def ymax(b: Array[Byte]): Double = bound(b, 3)

  private def bound(b: Array[Byte], which: Int): Double = {
    val e = new Envelope
    try WKB.foldEnvelope(b, e) catch { case _: Exception => return Double.NaN }
    if (e.isEmpty) Double.NaN
    else which match {
      case 0 => e.xmin
      case 1 => e.ymin
      case 2 => e.xmax
      case _ => e.ymax
    }
  }

  def geomFromText(s: UTF8String): Array[Byte] = {
    val g = WKT.readOrNull(s.toString)
    if (g == null) null else WKB.write(g)
  }

  def asText(b: Array[Byte]): UTF8String = {
    val g = WKB.readOrNull(b)
    if (g == null) null else UTF8String.fromString(WKT.write(g))
  }

  def geometryType(b: Array[Byte]): UTF8String =
    try UTF8String.fromString(WKB.geometryTypeTag(b))
    catch { case _: Exception => null }

  def envelope(b: Array[Byte]): Array[Byte] =
    try {
      val e = new Envelope
      WKB.foldEnvelope(b, e)
      WKB.write(e.toPolygon)
    } catch { case _: Exception => null }

  /** If `bytes` is a WKB point, write (x, y) into `out(off)`, `out(off+1)`
    * and return true — a header-only decode, no Geometry allocation. */
  @inline private def pointXY(bytes: Array[Byte], out: Array[Double], off: Int): Boolean = {
    if (bytes == null || bytes.length < 21) return false
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val order = if (buf.get() == 1) java.nio.ByteOrder.LITTLE_ENDIAN
                else java.nio.ByteOrder.BIG_ENDIAN
    buf.order(order)
    val code = buf.getInt()
    if ((code & 0x20000000) != 0) { if (buf.remaining() < 4) return false; buf.getInt() }
    val flat = code & 0x0FFFFFFF
    if (flat % 1000 != 1) return false
    // require the FULL payload for the declared dimension (ISO code/1000:
    // 0=XY, 1=XYZ, 2=XYM, 3=XYZM) — a truncated higher-dim blob must fall
    // through to the object path so it stays NULL like every other ST_ fn
    val dims = (flat / 1000) match {
      case 0 => 2
      case 1 | 2 => 3
      case 3 => 4
      case _ => return false
    }
    if (buf.remaining() < dims * 8) return false
    out(off) = buf.getDouble(); out(off + 1) = buf.getDouble()
    true
  }

  /** NaN = parse failure or empty operand → NULL. */
  def distance(a: Array[Byte], b: Array[Byte]): Double = {
    // fast path: point-point (the dominant case) straight off the buffers —
    // bit-identical to GeomOps.distance's empty/equal/vertex-vertex result
    val s = new Array[Double](4)
    if (pointXY(a, s, 0) && pointXY(b, s, 2)) {
      val ax = s(0); val ay = s(1); val bx = s(2); val by = s(3)
      // WKB.read's empty-point convention is "x is NaN"
      if (ax != ax || bx != bx) return Double.NaN
      if (ay == ay && by == by) {
        if (ax == bx && ay == by) return 0.0
        val dx = ax - bx; val dy = ay - by
        return math.sqrt(dx * dx + dy * dy)
      } // pathological y-only-NaN: defer to the object path below
    }
    val ga = WKB.readOrNull(a)
    val gb = WKB.readOrNull(b)
    if (ga == null || gb == null) Double.NaN
    else GeomOps.distance(ga, gb)
  }

  /** -1 = NULL, 0 = false, 1 = true. */
  def intersects(a: Array[Byte], b: Array[Byte]): Byte = {
    val ga = WKB.readOrNull(a)
    val gb = WKB.readOrNull(b)
    if (ga == null || gb == null) -1
    else if (GeomOps.intersects(ga, gb)) 1
    else 0
  }

  def contains(a: Array[Byte], b: Array[Byte]): Byte = {
    val ga = WKB.readOrNull(a)
    val gb = WKB.readOrNull(b)
    if (ga == null || gb == null) -1
    else if (GeomOps.contains(ga, gb)) 1
    else 0
  }

  // vector kernels (NaN → NULL)
  def vecDot(a: ArrayData, b: ArrayData, isFloat: Boolean): Double =
    graft.pipeline.VecUtil.dot(a, b, isFloat)

  def vecNorm(a: ArrayData, isFloat: Boolean): Double =
    math.sqrt(graft.pipeline.VecUtil.dot(a, a, isFloat))

  def vecCosine(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val d = graft.pipeline.VecUtil.dot(a, b, isFloat)
    val na = math.sqrt(graft.pipeline.VecUtil.dot(a, a, isFloat))
    val nb = math.sqrt(graft.pipeline.VecUtil.dot(b, b, isFloat))
    if (na == 0.0 || nb == 0.0) Double.NaN else d / (na * nb)
  }

  // text kernels
  def simhash64(s: UTF8String): Long = graft.pipeline.TextUtil.simhash64(s.toString)
  def fingerprint64(s: UTF8String): Long = graft.pipeline.TextUtil.fingerprint64(s.toString)
  def langId(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.pipeline.TextUtil.langId(s.toString))
  def nfcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** One-pass text statistics row — see TextUtil.textStats. */
  def textStats(s: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val a = graft.pipeline.TextUtil.textStats(s.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](a(0), a(1), a(2), a(3), a(4), a(5), a(6)))
  }

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** Whitespace-token n-gram shingles, one split per call. Mirrors Spark
    * `split(trim(s), "\\s+")` semantics exactly: trim strips ' ' only, and
    * the limit -1 split keeps leading AND trailing empty fields when the
    * trimmed string starts/ends with non-space whitespace (empty trim →
    * [""] → no shingles when tokens < n). */
  def wordShingles(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    val toks = wsPattern.split(str.substring(lo, hi), -1)
    val count = toks.length - n + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
