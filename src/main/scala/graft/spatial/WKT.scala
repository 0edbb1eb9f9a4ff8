package graft.spatial

import scala.collection.mutable.ArrayBuffer

/**
 * WKT (Well-Known Text) writer and reader.
 *
 * Writer semantics follow the reference's WKT serializer
 * (reference: src/wkt/scalar.rs:6-278): `EMPTY` for empty geometries,
 * dimension tags `Z`/`M`/`ZM`, nested recursion for multi-geometries, and
 * float formatting that always keeps a decimal point (`30.0`, not `30` —
 * reference: src/wkt/scalar.rs:241-244, Rust `{:?}`). Scala's
 * `Double.toString` matches that behavior (shortest round-trip decimal with
 * a mandatory fractional part).
 *
 * The reader implements the surface the reference declared but left
 * unimplemented (reference: src/wkt/array.rs:110-111 `todo!()`), so WKT CSV
 * fixtures become usable inputs.
 */
object WKT {

  // ---------------------------------------------------------------- writer

  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    writeTo(g, sb)
    sb.toString
  }

  private def dimTag(g: Geometry): String = g.dim match {
    case 3 => if (g.measured) "M " else "Z "
    case 4 => "ZM "
    case _ => ""
  }

  private def num(sb: java.lang.StringBuilder, d: Double): Unit = {
    // Integral doubles print as "30.0" (reference: src/wkt/scalar.rs:241-244)
    if (d == d.toLong && math.abs(d) < 1e15) {
      // -0.0 == 0L numerically, but Rust {:?} prints "-0.0" — keep the IEEE
      // sign bit so WKT -> WKB stays byte-stable
      if (d == 0.0 && java.lang.Double.doubleToRawLongBits(d) != 0L) sb.append('-')
      sb.append(d.toLong).append(".0"); ()
    }
    else { sb.append(d); () }
  }

  private def coord(sb: java.lang.StringBuilder, cs: Array[Double], off: Int, dim: Int): Unit = {
    num(sb, cs(off)); sb.append(' '); num(sb, cs(off + 1))
    var k = 2
    while (k < dim) { sb.append(' '); num(sb, cs(off + k)); k += 1 }
  }

  /** `(x1 y1,x2 y2,…)` — no space after comma, matching scalar.rs:316. */
  private def seq(sb: java.lang.StringBuilder, cs: Array[Double], dim: Int): Unit = {
    sb.append('(')
    var i = 0
    var first = true
    while (i + dim <= cs.length) {
      if (!first) sb.append(',')
      coord(sb, cs, i, dim)
      first = false
      i += dim
    }
    sb.append(')')
  }

  private def writeTo(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("POINT ").append(dimTag(p))
      if (p.isEmpty) sb.append("EMPTY")
      else { sb.append('('); coord(sb, p.coords, 0, p.dim); sb.append(')') }
    case l: LineString =>
      sb.append("LINESTRING ").append(dimTag(l))
      if (l.isEmpty) sb.append("EMPTY") else seq(sb, l.coords, l.dim)
    case pg: Polygon =>
      sb.append("POLYGON ").append(dimTag(pg))
      if (pg.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < pg.rings.length) {
          if (i > 0) sb.append(',')
          seq(sb, pg.rings(i), pg.dim)
          i += 1
        }
        sb.append(')')
      }
    case mp: MultiPoint =>
      sb.append("MULTIPOINT ").append(dimTag(mp))
      if (mp.isEmpty) sb.append("EMPTY")
      else {
        // Each member parenthesized: MULTIPOINT ((0.0 0.0),(4.0 0.0)) —
        // reference: src/wkt/scalar.rs:347
        sb.append('(')
        var i = 0
        while (i < mp.points.length) {
          if (i > 0) sb.append(',')
          val p = mp.points(i)
          if (p.isEmpty) sb.append("EMPTY")
          else { sb.append('('); coord(sb, p.coords, 0, p.dim); sb.append(')') }
          i += 1
        }
        sb.append(')')
      }
    case ml: MultiLineString =>
      sb.append("MULTILINESTRING ").append(dimTag(ml))
      if (ml.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < ml.lines.length) {
          if (i > 0) sb.append(',')
          seq(sb, ml.lines(i).coords, ml.dim)
          i += 1
        }
        sb.append(')')
      }
    case mpg: MultiPolygon =>
      sb.append("MULTIPOLYGON ").append(dimTag(mpg))
      if (mpg.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < mpg.polygons.length) {
          if (i > 0) sb.append(',')
          val pg = mpg.polygons(i)
          sb.append('(')
          var j = 0
          while (j < pg.rings.length) {
            if (j > 0) sb.append(',')
            seq(sb, pg.rings(j), pg.dim)
            j += 1
          }
          sb.append(')')
          i += 1
        }
        sb.append(')')
      }
    case gc: GeometryCollection =>
      sb.append("GEOMETRYCOLLECTION ").append(dimTag(gc))
      if (gc.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < gc.geoms.length) {
          if (i > 0) sb.append(',')
          writeTo(gc.geoms(i), sb)
          i += 1
        }
        sb.append(')')
      }
  }

  // ---------------------------------------------------------------- reader

  /** Parse WKT; throws IllegalArgumentException on malformed input. */
  def read(wkt: String): Geometry = new Parser(wkt).parse()

  /** Parse WKT; null on malformed input (for SQL null-on-error semantics). */
  def readOrNull(wkt: String): Geometry =
    try read(wkt) catch { case _: Exception => null }

  /** Recursion bound for nested GEOMETRYCOLLECTIONs: adversarial input
    * ("GEOMETRYCOLLECTION (" × 100k) would otherwise StackOverflowError —
    * an Error, invisible to readOrNull's `catch Exception`, killing the
    * executor task. */
  private val MaxDepth = 512

  private final class Parser(s: String) {
    private var pos = 0
    private var depth = 0

    def parse(): Geometry = {
      val g = parseGeometry()
      skipWs()
      if (pos < s.length) fail(s"trailing characters at $pos")
      g
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Invalid WKT '$s': $msg")

    private def skipWs(): Unit =
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def word(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && s.charAt(pos).isLetter) pos += 1
      if (pos == start) fail(s"expected word at $start")
      s.substring(start, pos).toUpperCase
    }

    private def peekWord(): Option[String] = {
      skipWs()
      val save = pos
      if (pos < s.length && s.charAt(pos).isLetter) {
        val w = word(); pos = save; Some(w)
      } else None
    }

    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c' at $pos")
      pos += 1
    }

    private def tryChar(c: Char): Boolean = {
      skipWs()
      if (pos < s.length && s.charAt(pos) == c) { pos += 1; true } else false
    }

    private def number(): Double = {
      skipWs()
      val start = pos
      while (pos < s.length && { val c = s.charAt(pos)
        c.isDigit || c == '-' || c == '+' || c == '.' || c == 'e' || c == 'E' }) pos += 1
      if (pos == start) fail(s"expected number at $start")
      java.lang.Double.parseDouble(s.substring(start, pos))
    }

    /** Optional Z / M / ZM tag → coordinate dim (M folded into stride);
      * records in [[mWasTag]] whether the tag was a bare `M` (XYM). */
    private var mWasTag = false
    private def dimOf(): Int = peekWord() match {
      case Some("ZM") => word(); mWasTag = false; 4
      case Some("Z")  => word(); mWasTag = false; 3
      case Some("M")  => word(); mWasTag = true; 3 // XYM: stride 3, M third
      case _          => mWasTag = false; 2
    }

    private def isEmptyTag(): Boolean = peekWord() match {
      case Some("EMPTY") => word(); true
      case _             => false
    }

    private def coordSeq(dim: Int): Array[Double] = {
      expect('(')
      val buf = new ArrayBuffer[Double](16)
      var done = false
      while (!done) {
        var k = 0
        // accept 2..4 numbers per position, padded/truncated to dim
        val c = new ArrayBuffer[Double](4)
        c += number()
        c += number()
        skipWs()
        while (pos < s.length && { val ch = s.charAt(pos)
          ch != ',' && ch != ')' } && c.length < 4) { c += number(); skipWs() }
        k = 0
        while (k < dim) { buf += (if (k < c.length) c(k) else Double.NaN); k += 1 }
        if (tryChar(',')) () else { expect(')'); done = true }
      }
      buf.toArray
    }

    /** Recursively flag a parsed geometry (and members) as XYM. */
    private def markMeasured(g: Geometry): Unit = {
      g.measured = true
      g match {
        case mp: MultiPoint         => mp.points.foreach(_.measured = true)
        case ml: MultiLineString    => ml.lines.foreach(_.measured = true)
        case mpg: MultiPolygon      => mpg.polygons.foreach(_.measured = true)
        case gc: GeometryCollection => gc.geoms.foreach(markMeasured)
        case _                      => ()
      }
    }

    private def parseGeometry(): Geometry = {
      depth += 1
      if (depth > MaxDepth) fail("nesting too deep")
      val tag = word()
      // the dim tag follows the keyword for every class — hoisted so the
      // XYM flag can be captured before nested members overwrite it
      val dim = dimOf()
      val m = mWasTag
      val g = tag match {
        case "POINT" =>
          if (isEmptyTag()) Point(Array.empty[Double], dim)
          else {
            val cs = coordSeq(dim)
            if (cs.length != dim) fail("POINT must have exactly one position")
            Point(cs, dim)
          }
        case "LINESTRING" =>
          if (isEmptyTag()) LineString(Array.empty[Double], dim)
          else LineString(coordSeq(dim), dim)
        case "POLYGON" =>
          if (isEmptyTag()) Polygon(Array.empty, dim)
          else Polygon(rings(dim), dim)
        case "MULTIPOINT" =>
          if (isEmptyTag()) MultiPoint(Array.empty, dim)
          else {
            expect('(')
            val pts = new ArrayBuffer[Point]
            var done = false
            while (!done) {
              if (peekWord().contains("EMPTY")) { word(); pts += Point(Array.empty[Double], dim) }
              else if (tryChar('(')) {
                // parenthesized member: (x y)
                val c = new ArrayBuffer[Double](4)
                c += number(); c += number()
                skipWs()
                while (pos < s.length && s.charAt(pos) != ')' && c.length < 4) { c += number(); skipWs() }
                expect(')')
                pts += Point(padTo(c.toArray, dim), dim)
              } else {
                // bare member: x y
                val c = new ArrayBuffer[Double](4)
                c += number(); c += number()
                skipWs()
                while (pos < s.length && { val ch = s.charAt(pos); ch != ',' && ch != ')' } && c.length < 4) { c += number(); skipWs() }
                pts += Point(padTo(c.toArray, dim), dim)
              }
              if (tryChar(',')) () else { expect(')'); done = true }
            }
            MultiPoint(pts.toArray, dim)
          }
        case "MULTILINESTRING" =>
          if (isEmptyTag()) MultiLineString(Array.empty, dim)
          else {
            expect('(')
            val ls = new ArrayBuffer[LineString]
            var done = false
            while (!done) {
              ls += LineString(coordSeq(dim), dim)
              if (tryChar(',')) () else { expect(')'); done = true }
            }
            MultiLineString(ls.toArray, dim)
          }
        case "MULTIPOLYGON" =>
          if (isEmptyTag()) MultiPolygon(Array.empty, dim)
          else {
            expect('(')
            val ps = new ArrayBuffer[Polygon]
            var done = false
            while (!done) {
              expect('(')
              pos -= 1 // rings() expects to consume '('
              ps += Polygon(rings(dim), dim)
              if (tryChar(',')) () else { expect(')'); done = true }
            }
            MultiPolygon(ps.toArray, dim)
          }
        case "GEOMETRYCOLLECTION" =>
          if (isEmptyTag()) GeometryCollection(Array.empty, dim)
          else {
            expect('(')
            val gs = new ArrayBuffer[Geometry]
            var done = false
            while (!done) {
              gs += parseGeometry()
              if (tryChar(',')) () else { expect(')'); done = true }
            }
            GeometryCollection(gs.toArray, dim)
          }
        case other => fail(s"unknown geometry type $other")
      }
      depth -= 1
      if (m && dim == 3) markMeasured(g)
      g
    }

    private def padTo(c: Array[Double], dim: Int): Array[Double] =
      if (c.length == dim) c
      else { val out = Array.fill(dim)(Double.NaN); System.arraycopy(c, 0, out, 0, math.min(c.length, dim)); out }

    private def rings(dim: Int): Array[Array[Double]] = {
      expect('(')
      val rs = new ArrayBuffer[Array[Double]]
      var done = false
      while (!done) {
        rs += coordSeq(dim)
        if (tryChar(',')) () else { expect(')'); done = true }
      }
      rs.toArray
    }
  }
}
