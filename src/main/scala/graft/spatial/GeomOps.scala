package graft.spatial

import scala.collection.mutable.ArrayBuffer

/**
 * Planar computational-geometry kernels backing the ST_* function surface.
 *
 * The reference implements only envelope/extent kernels (reference:
 * src/compute.rs:11-76, src/udfs/envelope.rs:230-351); the predicates and
 * measures here cover its declared-but-unimplemented roadmap
 * (reference: README.md:8-39 — ST_Intersects, ST_Contains, ST_Distance,
 * ST_Area, ST_Length, ST_Centroid, ST_ConvexHull, …). All math is planar
 * (Cartesian), 2D; Z/M ordinates are ignored.
 */
object GeomOps {

  // ---------------------------------------------------------------- measures

  /** Signed shoelace area of a flat closed ring. */
  private def ringSignedArea(cs: Array[Double], dim: Int): Double = {
    val n = cs.length / dim
    if (n < 3) return 0.0
    var sum = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      sum += cs(i * dim) * cs(j * dim + 1) - cs(j * dim) * cs(i * dim + 1)
      i += 1
    }
    sum / 2.0
  }

  /** Polygon area: |outer| − Σ|holes|. 0 for points/lines. */
  def area(g: Geometry): Double = g match {
    case pg: Polygon =>
      var a = 0.0
      var i = 0
      while (i < pg.rings.length) {
        val r = math.abs(ringSignedArea(pg.rings(i), pg.dim))
        a += (if (i == 0) r else -r)
        i += 1
      }
      math.max(a, 0.0)
    case mpg: MultiPolygon => mpg.polygons.map(area).sum
    case gc: GeometryCollection => gc.geoms.map(area).sum
    case _ => 0.0
  }

  private def seqLength(cs: Array[Double], dim: Int): Double = {
    val n = cs.length / dim
    var len = 0.0
    var i = 1
    while (i < n) {
      val dx = cs(i * dim) - cs((i - 1) * dim)
      val dy = cs(i * dim + 1) - cs((i - 1) * dim + 1)
      len += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    len
  }

  /** Curve length; 0 for points and surfaces (PostGIS ST_Length semantics). */
  def length(g: Geometry): Double = g match {
    case l: LineString          => seqLength(l.coords, l.dim)
    case ml: MultiLineString    => ml.lines.map(length).sum
    case gc: GeometryCollection => gc.geoms.map(length).sum
    case _                      => 0.0
  }

  /** Ring-boundary length of surfaces; 0 otherwise. */
  def perimeter(g: Geometry): Double = g match {
    case pg: Polygon            => pg.rings.map(seqLength(_, pg.dim)).sum
    case mpg: MultiPolygon      => mpg.polygons.map(perimeter).sum
    case gc: GeometryCollection => gc.geoms.map(perimeter).sum
    case _                      => 0.0
  }

  /** Centroid; highest topological dimension wins for collections. */
  def centroid(g: Geometry): Point = {
    if (g.isEmpty) return Point.empty
    g match {
      case p: Point => p
      case mp: MultiPoint =>
        var sx = 0.0; var sy = 0.0; var n = 0
        mp.points.foreach { p => if (!p.isEmpty) { sx += p.x; sy += p.y; n += 1 } }
        if (n == 0) Point.empty else Point.xy(sx / n, sy / n)
      case l: LineString => lineCentroid(Array(l))
      case ml: MultiLineString => lineCentroid(ml.lines)
      case pg: Polygon => polyCentroid(Array(pg))
      case mpg: MultiPolygon => polyCentroid(mpg.polygons)
      case gc: GeometryCollection =>
        val top = gc.topoDim
        val parts = gc.geoms.filter(x => !x.isEmpty && x.topoDim == top)
        if (parts.isEmpty) Point.empty
        else {
          // merge by weight class
          var sx = 0.0; var sy = 0.0; var w = 0.0
          parts.foreach { part =>
            val c = centroid(part)
            val pw = top match {
              case 2 => area(part)
              case 1 => length(part)
              case _ => part.numPoints.toDouble
            }
            if (!c.isEmpty && pw > 0) { sx += c.x * pw; sy += c.y * pw; w += pw }
          }
          if (w == 0) centroid(parts.head)
          else Point.xy(sx / w, sy / w)
        }
    }
  }

  private def lineCentroid(lines: Array[LineString]): Point = {
    var sx = 0.0; var sy = 0.0; var w = 0.0
    lines.foreach { l =>
      val dim = l.dim; val cs = l.coords; val n = cs.length / dim
      var i = 1
      while (i < n) {
        val x0 = cs((i - 1) * dim); val y0 = cs((i - 1) * dim + 1)
        val x1 = cs(i * dim); val y1 = cs(i * dim + 1)
        val seg = math.hypot(x1 - x0, y1 - y0)
        sx += (x0 + x1) / 2 * seg; sy += (y0 + y1) / 2 * seg; w += seg
        i += 1
      }
    }
    if (w == 0) {
      // degenerate (all zero-length): average vertices
      var sx2 = 0.0; var sy2 = 0.0; var n = 0
      lines.foreach { l =>
        val dim = l.dim
        var i = 0
        while (i + 1 < l.coords.length) { sx2 += l.coords(i); sy2 += l.coords(i + 1); n += 1; i += dim }
      }
      if (n == 0) Point.empty else Point.xy(sx2 / n, sy2 / n)
    } else Point.xy(sx / w, sy / w)
  }

  private def polyCentroid(polys: Array[Polygon]): Point = {
    var sx = 0.0; var sy = 0.0; var w = 0.0
    polys.foreach { pg =>
      var r = 0
      while (r < pg.rings.length) {
        val cs = pg.rings(r); val dim = pg.dim; val n = cs.length / dim
        var cx = 0.0; var cy = 0.0; var a = 0.0
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          val cross = cs(i * dim) * cs(j * dim + 1) - cs(j * dim) * cs(i * dim + 1)
          cx += (cs(i * dim) + cs(j * dim)) * cross
          cy += (cs(i * dim + 1) + cs(j * dim + 1)) * cross
          a += cross
          i += 1
        }
        if (a != 0.0) {
          val ringArea = a / 2.0
          val sign = if (r == 0) 1.0 else -1.0
          val weight = sign * math.abs(ringArea)
          // centroid of ring = (cx, cy) / (6 * signedArea)
          sx += cx / (6.0 * ringArea) * weight
          sy += cy / (6.0 * ringArea) * weight
          w += weight
        }
        r += 1
      }
    }
    if (w == 0) {
      var sx2 = 0.0; var sy2 = 0.0; var n = 0
      polys.foreach(_.foreachSeq { (cs, dim) =>
        var i = 0
        while (i + 1 < cs.length) { sx2 += cs(i); sy2 += cs(i + 1); n += 1; i += dim }
      })
      if (n == 0) Point.empty else Point.xy(sx2 / n, sy2 / n)
    } else Point.xy(sx / w, sy / w)
  }

  // -------------------------------------------------------------- distance

  private def segPointDist2(x1: Double, y1: Double, x2: Double, y2: Double,
                            px: Double, py: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    val l2 = dx * dx + dy * dy
    val t =
      if (l2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / l2))
    val cx = x1 + t * dx; val cy = y1 + t * dy
    val ddx = px - cx; val ddy = py - cy
    ddx * ddx + ddy * ddy
  }

  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
                     cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  private def onSegment(ax: Double, ay: Double, bx: Double, by: Double,
                        px: Double, py: Double): Boolean =
    math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  /** Proper or touching segment intersection. */
  private[spatial] def segIntersects(ax: Double, ay: Double, bx: Double, by: Double,
                                     cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val d1 = orient(cx, cy, dx, dy, ax, ay)
    val d2 = orient(cx, cy, dx, dy, bx, by)
    val d3 = orient(ax, ay, bx, by, cx, cy)
    val d4 = orient(ax, ay, bx, by, dx, dy)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else if (d1 == 0 && onSegment(cx, cy, dx, dy, ax, ay)) true
    else if (d2 == 0 && onSegment(cx, cy, dx, dy, bx, by)) true
    else if (d3 == 0 && onSegment(ax, ay, bx, by, cx, cy)) true
    else if (d4 == 0 && onSegment(ax, ay, bx, by, dx, dy)) true
    else false
  }

  private def segSegDist2(ax: Double, ay: Double, bx: Double, by: Double,
                          cx: Double, cy: Double, dx: Double, dy: Double): Double = {
    if (segIntersects(ax, ay, bx, by, cx, cy, dx, dy)) 0.0
    else math.min(
      math.min(segPointDist2(ax, ay, bx, by, cx, cy), segPointDist2(ax, ay, bx, by, dx, dy)),
      math.min(segPointDist2(cx, cy, dx, dy, ax, ay), segPointDist2(cx, cy, dx, dy, bx, by)))
  }

  /** Ray-cast point-in-ring (boundary counts as inside). */
  private def pointInRing(cs: Array[Double], dim: Int, px: Double, py: Double): Boolean = {
    val n = cs.length / dim
    if (n < 3) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = cs(i * dim); val yi = cs(i * dim + 1)
      val xj = cs(j * dim); val yj = cs(j * dim + 1)
      // boundary check
      if (orient(xi, yi, xj, yj, px, py) == 0 && onSegment(xi, yi, xj, yj, px, py))
        return true
      if (((yi > py) != (yj > py)) &&
          (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Point-in-polygon, holes honored; boundary counts as inside. */
  def polygonContainsPoint(pg: Polygon, px: Double, py: Double): Boolean = {
    if (pg.isEmpty) return false
    if (!pointInRing(pg.rings(0), pg.dim, px, py)) return false
    var r = 1
    while (r < pg.rings.length) {
      val ring = pg.rings(r)
      // strictly inside a hole → outside (boundary of hole still counts in)
      if (pointInRing(ring, pg.dim, px, py) && !pointOnRingBoundary(ring, pg.dim, px, py))
        return false
      r += 1
    }
    true
  }

  private def pointOnRingBoundary(cs: Array[Double], dim: Int, px: Double, py: Double): Boolean = {
    val n = cs.length / dim
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = cs(i * dim); val yi = cs(i * dim + 1)
      val xj = cs(j * dim); val yj = cs(j * dim + 1)
      if (orient(xi, yi, xj, yj, px, py) == 0 && onSegment(xi, yi, xj, yj, px, py)) return true
      j = i; i += 1
    }
    false
  }

  private def containsAnyPoint(g: Geometry, px: Double, py: Double): Boolean = g match {
    case pg: Polygon       => polygonContainsPoint(pg, px, py)
    case mpg: MultiPolygon => mpg.polygons.exists(polygonContainsPoint(_, px, py))
    case gc: GeometryCollection => gc.geoms.exists(containsAnyPoint(_, px, py))
    case _ => false
  }

  /** First vertex of a geometry, if any. */
  private def firstVertex(g: Geometry): Option[(Double, Double)] = {
    var res: Option[(Double, Double)] = None
    g.foreachSeq { (cs, dim) =>
      if (res.isEmpty && cs.length >= 2 && !cs(0).isNaN) res = Some((cs(0), cs(1)))
    }
    res
  }

  /** All segments of a geometry as (x1,y1,x2,y2); points yield none. */
  private def foreachSegment(g: Geometry)(f: (Double, Double, Double, Double) => Unit): Unit =
    g match {
      case _: Point | _: MultiPoint => ()
      case gc: GeometryCollection => gc.geoms.foreach(foreachSegment(_)(f))
      case other =>
        other.foreachSeq { (cs, dim) =>
          val n = cs.length / dim
          var i = 1
          while (i < n) {
            f(cs((i - 1) * dim), cs((i - 1) * dim + 1), cs(i * dim), cs(i * dim + 1))
            i += 1
          }
        }
    }

  private def foreachVertex(g: Geometry)(f: (Double, Double) => Unit): Unit =
    g.foreachSeq { (cs, dim) =>
      var i = 0
      while (i + 1 < cs.length) {
        if (!cs(i).isNaN) f(cs(i), cs(i + 1))
        i += dim
      }
    }

  /**
   * Geometry intersection predicate (DE-9IM "intersects", i.e. NOT disjoint).
   * Strategy: bbox pre-filter → any segment crossing → containment probes.
   */
  def intersects(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.intersects(b.envelope)) return false

    // point vs anything
    (a, b) match {
      case (p: Point, _) => return pointIntersects(p.x, p.y, b)
      case (_, p: Point) => return pointIntersects(p.x, p.y, a)
      case (mp: MultiPoint, _) => return mp.points.exists(p => !p.isEmpty && pointIntersects(p.x, p.y, b))
      case (_, mp: MultiPoint) => return mp.points.exists(p => !p.isEmpty && pointIntersects(p.x, p.y, a))
      case _ => ()
    }

    // any segment pair crossing?
    var hit = false
    foreachSegment(a) { (ax, ay, bx, by) =>
      if (!hit) foreachSegment(b) { (cx, cy, dx, dy) =>
        if (!hit && segIntersects(ax, ay, bx, by, cx, cy, dx, dy)) hit = true
      }
    }
    if (hit) return true

    // containment: a inside b, or b inside a (areal cases)
    firstVertex(a).exists { case (x, y) => containsAnyPoint(b, x, y) } ||
      firstVertex(b).exists { case (x, y) => containsAnyPoint(a, x, y) }
  }

  private def pointIntersects(px: Double, py: Double, g: Geometry): Boolean = g match {
    case p: Point => !p.isEmpty && p.x == px && p.y == py
    case mp: MultiPoint => mp.points.exists(p => !p.isEmpty && p.x == px && p.y == py)
    case _: LineString | _: MultiLineString =>
      var hit = false
      foreachSegment(g) { (ax, ay, bx, by) =>
        if (!hit && orient(ax, ay, bx, by, px, py) == 0 && onSegment(ax, ay, bx, by, px, py)) hit = true
      }
      hit
    case _ => containsAnyPoint(g, px, py)
  }

  /**
   * `a` contains `b`: every point of `b` lies in `a` (boundary inclusive —
   * covers-style semantics, adequate for simple/convex inputs).
   * Implemented as: all vertices of `b` inside `a` AND no segment of `b`
   * properly crosses a boundary segment of `a`.
   */
  def contains(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    val ea = a.envelope; val eb = b.envelope
    if (eb.xmin < ea.xmin || eb.xmax > ea.xmax || eb.ymin < ea.ymin || eb.ymax > ea.ymax)
      return false
    a match {
      case _: Polygon | _: MultiPolygon =>
        var all = true
        foreachVertex(b)((x, y) => if (all && !containsAnyPoint(a, x, y)) all = false)
        if (!all) return false
        // proper-crossing check between b's segments and a's boundary
        var crossing = false
        foreachSegment(b) { (ax0, ay0, bx0, by0) =>
          if (!crossing) foreachSegment(a) { (cx, cy, dx, dy) =>
            if (!crossing) {
              val d1 = orient(cx, cy, dx, dy, ax0, ay0)
              val d2 = orient(cx, cy, dx, dy, bx0, by0)
              val d3 = orient(ax0, ay0, bx0, by0, cx, cy)
              val d4 = orient(ax0, ay0, bx0, by0, dx, dy)
              if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
                  ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) crossing = true
            }
          }
        }
        !crossing
      case l @ (_: LineString | _: MultiLineString) =>
        b match {
          case p: Point => pointIntersects(p.x, p.y, l)
          case mp: MultiPoint => mp.points.forall(p => p.isEmpty || pointIntersects(p.x, p.y, l))
          case _ => false // line containing line: unsupported precision-wise
        }
      case p: Point =>
        b match {
          case q: Point => p.x == q.x && p.y == q.y
          case mp: MultiPoint => mp.points.forall(q => q.isEmpty || (q.x == p.x && q.y == p.y))
          case _ => false
        }
      case mp: MultiPoint =>
        b match {
          case q: Point => mp.points.exists(p => !p.isEmpty && p.x == q.x && p.y == q.y)
          case bmp: MultiPoint =>
            bmp.points.forall(q => q.isEmpty ||
              mp.points.exists(p => !p.isEmpty && p.x == q.x && p.y == q.y))
          case _ => false
        }
      case gc: GeometryCollection => gc.geoms.exists(contains(_, b))
    }
  }

  def within(a: Geometry, b: Geometry): Boolean = contains(b, a)

  /** Minimum planar distance between two geometries; NaN if either empty. */
  def distance(a: Geometry, b: Geometry): Double = {
    if (a.isEmpty || b.isEmpty) return Double.NaN
    if (intersects(a, b)) return 0.0
    var best = Double.PositiveInfinity
    // vertex-vs-segment in both directions + vertex-vs-vertex fallback
    val aSegs = collectSegments(a)
    val bSegs = collectSegments(b)
    if (aSegs.isEmpty && bSegs.isEmpty) {
      foreachVertex(a)((ax, ay) => foreachVertex(b) { (bx, by) =>
        val dx = ax - bx; val dy = ay - by
        val d2 = dx * dx + dy * dy
        if (d2 < best) best = d2
      })
    } else if (aSegs.isEmpty) {
      foreachVertex(a)((px, py) => {
        var i = 0
        while (i < bSegs.length) {
          val s = bSegs(i)
          val d2 = segPointDist2(s(0), s(1), s(2), s(3), px, py)
          if (d2 < best) best = d2
          i += 1
        }
      })
    } else if (bSegs.isEmpty) {
      foreachVertex(b)((px, py) => {
        var i = 0
        while (i < aSegs.length) {
          val s = aSegs(i)
          val d2 = segPointDist2(s(0), s(1), s(2), s(3), px, py)
          if (d2 < best) best = d2
          i += 1
        }
      })
    } else {
      var i = 0
      while (i < aSegs.length) {
        val s = aSegs(i)
        var j = 0
        while (j < bSegs.length) {
          val t = bSegs(j)
          val d2 = segSegDist2(s(0), s(1), s(2), s(3), t(0), t(1), t(2), t(3))
          if (d2 < best) best = d2
          j += 1
        }
        i += 1
      }
    }
    math.sqrt(best)
  }

  private def collectSegments(g: Geometry): Array[Array[Double]] = {
    val buf = new ArrayBuffer[Array[Double]]
    foreachSegment(g)((a, b, c, d) => buf += Array(a, b, c, d))
    buf.toArray
  }

  /**
   * Closest pair of points (pa on `a`, pb on `b`) realizing the minimum
   * distance; None if either geometry is empty. When the geometries
   * intersect, returns a shared point (via an intersection probe on
   * vertices/crossings, falling back to the distance argmin).
   */
  def closestPoints(a: Geometry, b: Geometry): Option[((Double, Double), (Double, Double))] = {
    if (a.isEmpty || b.isEmpty) return None
    var best = Double.PositiveInfinity
    var bestA = (0.0, 0.0)
    var bestB = (0.0, 0.0)
    def consider(ax: Double, ay: Double, bx: Double, by: Double): Unit = {
      val dx = ax - bx; val dy = ay - by
      val d2 = dx * dx + dy * dy
      if (d2 < best) { best = d2; bestA = (ax, ay); bestB = (bx, by) }
    }
    // vertex of a vs segments of b (projected point), and vice versa
    def vertexVsSegments(src: Geometry, dst: Geometry, srcIsA: Boolean): Unit =
      src.foreachSeq { (cs, dim) =>
        var i = 0
        while (i + 1 < cs.length) {
          val px = cs(i); val py = cs(i + 1)
          if (!px.isNaN) {
            var any = false
            dst.foreachSeq { (ds, ddim) =>
              val n = ds.length / ddim
              var j = 1
              while (j < n) {
                any = true
                val x1 = ds((j - 1) * ddim); val y1 = ds((j - 1) * ddim + 1)
                val x2 = ds(j * ddim); val y2 = ds(j * ddim + 1)
                val (cx, cy) = projectOnSegment(x1, y1, x2, y2, px, py)
                if (srcIsA) consider(px, py, cx, cy) else consider(cx, cy, px, py)
                j += 1
              }
              if (n == 1 && ds.length >= 2 && !ds(0).isNaN) {
                any = true
                if (srcIsA) consider(px, py, ds(0), ds(1)) else consider(ds(0), ds(1), px, py)
              }
            }
            if (!any) () // dst had no coords
          }
          i += dim
        }
      }
    vertexVsSegments(a, b, srcIsA = true)
    vertexVsSegments(b, a, srcIsA = false)
    if (best.isInfinity) None else Some((bestA, bestB))
  }

  private def projectOnSegment(x1: Double, y1: Double, x2: Double, y2: Double,
                               px: Double, py: Double): (Double, Double) = {
    val dx = x2 - x1; val dy = y2 - y1
    val l2 = dx * dx + dy * dy
    val t = if (l2 == 0) 0.0
            else math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / l2))
    (x1 + t * dx, y1 + t * dy)
  }

  def dwithin(a: Geometry, b: Geometry, d: Double): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    val ea = a.envelope; val eb = b.envelope
    // cheap bbox-expansion rejection before exact distance
    if (ea.xmin - d > eb.xmax || eb.xmin - d > ea.xmax ||
        ea.ymin - d > eb.ymax || eb.ymin - d > ea.ymax) return false
    val dist = distance(a, b)
    !dist.isNaN && dist <= d
  }

  // ----------------------------------------------------------- constructive

  /** Convex hull (Andrew's monotone chain). Degenerate inputs pass through. */
  def convexHull(g: Geometry): Geometry = {
    if (g.isEmpty) return g
    val pts = new ArrayBuffer[(Double, Double)]
    foreachVertex(g)((x, y) => pts += ((x, y)))
    val uniq = pts.distinct.sortBy(p => (p._1, p._2)).toArray
    if (uniq.length == 1) return Point.xy(uniq(0)._1, uniq(0)._2)
    if (uniq.length == 2)
      return LineString(Array(uniq(0)._1, uniq(0)._2, uniq(1)._1, uniq(1)._2), 2)
    val hull = new ArrayBuffer[(Double, Double)]
    // lower
    uniq.foreach { p =>
      while (hull.length >= 2 && orient(hull(hull.length - 2)._1, hull(hull.length - 2)._2,
        hull(hull.length - 1)._1, hull(hull.length - 1)._2, p._1, p._2) <= 0)
        hull.remove(hull.length - 1)
      hull += p
    }
    // upper
    val lowerLen = hull.length + 1
    var i = uniq.length - 2
    while (i >= 0) {
      val p = uniq(i)
      while (hull.length >= lowerLen && orient(hull(hull.length - 2)._1, hull(hull.length - 2)._2,
        hull(hull.length - 1)._1, hull(hull.length - 1)._2, p._1, p._2) <= 0)
        hull.remove(hull.length - 1)
      hull += p
      i -= 1
    }
    hull.remove(hull.length - 1)
    if (hull.length < 3) {
      if (hull.length == 2)
        LineString(Array(hull(0)._1, hull(0)._2, hull(1)._1, hull(1)._2), 2)
      else Point.xy(hull(0)._1, hull(0)._2)
    } else {
      val ring = new Array[Double]((hull.length + 1) * 2)
      var j = 0
      while (j < hull.length) { ring(j * 2) = hull(j)._1; ring(j * 2 + 1) = hull(j)._2; j += 1 }
      ring(hull.length * 2) = hull(0)._1; ring(hull.length * 2 + 1) = hull(0)._2
      Polygon(Array(ring), 2)
    }
  }

  /** Douglas–Peucker simplification of curves/ring boundaries. */
  def simplify(g: Geometry, tolerance: Double): Geometry = g match {
    case l: LineString => LineString(dp(l.coords, l.dim, tolerance), l.dim)
    case ml: MultiLineString =>
      MultiLineString(ml.lines.map(l => LineString(dp(l.coords, l.dim, tolerance), l.dim)), ml.dim)
    case pg: Polygon => Polygon(pg.rings.map(r => dpRing(r, pg.dim, tolerance)), pg.dim)
    case mpg: MultiPolygon =>
      MultiPolygon(mpg.polygons.map(p => Polygon(p.rings.map(r => dpRing(r, p.dim, tolerance)), p.dim)), mpg.dim)
    case gc: GeometryCollection => GeometryCollection(gc.geoms.map(simplify(_, tolerance)), gc.dim)
    case other => other
  }

  private def dpRing(cs: Array[Double], dim: Int, tol: Double): Array[Double] = {
    val out = dp(cs, dim, tol)
    if (out.length / dim >= 4) out else cs // keep valid rings
  }

  private def dp(cs: Array[Double], dim: Int, tol: Double): Array[Double] = {
    val n = cs.length / dim
    if (n <= 2) return cs
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val stack = scala.collection.mutable.Stack[(Int, Int)]((0, n - 1))
    val tol2 = tol * tol
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi > lo + 1) {
        var maxD = -1.0; var maxI = -1
        val ax = cs(lo * dim); val ay = cs(lo * dim + 1)
        val bx = cs(hi * dim); val by = cs(hi * dim + 1)
        var i = lo + 1
        while (i < hi) {
          val d = segPointDist2(ax, ay, bx, by, cs(i * dim), cs(i * dim + 1))
          if (d > maxD) { maxD = d; maxI = i }
          i += 1
        }
        if (maxD > tol2) {
          keep(maxI) = true
          stack.push((lo, maxI)); stack.push((maxI, hi))
        }
      }
    }
    val kept = (0 until n).filter(keep)
    val out = new Array[Double](kept.length * dim)
    var j = 0
    kept.foreach { i =>
      var k = 0
      while (k < dim) { out(j * dim + k) = cs(i * dim + k); k += 1 }
      j += 1
    }
    out
  }
}
