package graft.spatial

/**
 * Geometry object model for the spatial function surface.
 *
 * Mirrors the geometry classes of the reference's GeoArrow/geo-traits model
 * (reference: src/helpers.rs:109-133 — Point/LineString/Polygon/MultiPoint/
 * MultiLineString/MultiPolygon × XY/XYZ), re-expressed as a plain Scala ADT.
 * Coordinates are stored as a flat `Array[Double]` per coordinate sequence
 * with a `dim` stride (2 = XY, 3 = XYZ, 4 = XYZM) to keep allocation low and
 * scans cache-friendly.
 *
 * Empty-geometry conventions (reference: data/generate_test_data.py:79 — an
 * empty point is `(NaN, NaN)` in native layout; src/compute.rs:52-65 filters
 * NaN):
 *   - `Point` with all-NaN ordinates, or a zero-length coord array, is EMPTY
 *   - every other class is EMPTY when its component list is empty
 */
sealed trait Geometry extends Serializable {
  /** OGC class name, e.g. "Point", "MultiPolygon". */
  def typeName: String
  /** Coordinate dimension: 2, 3 or 4. */
  def dim: Int
  def isEmpty: Boolean
  /** Topological dimension: 0 points, 1 curves, 2 surfaces. */
  def topoDim: Int
  /** Total number of coordinates (vertices). */
  def numPoints: Int
  /** Fold (xmin, ymin, xmax, ymax) over all non-NaN coordinates into `env`. */
  def foldEnvelope(env: Envelope): Unit
  /** Visit every coordinate sequence: (flatCoords, dim). */
  def foreachSeq(f: (Array[Double], Int) => Unit): Unit

  final def envelope: Envelope = { val e = new Envelope; foldEnvelope(e); e }

  /**
   * XYM marker: a dim-3 coordinate layout whose third ordinate is a measure,
   * not elevation (WKB type codes +2000, WKT tag `M`). Kept OUTSIDE the case
   * class constructors so the ADT's pattern matches stay binary/ternary; the
   * flag is an I/O-fidelity concern (parse → serialize round trips), and
   * geometry OPERATIONS neither read it nor promise to preserve it — like
   * most engines, computed outputs drop the measure.
   */
  var measured: Boolean = false

  final def hasZ: Boolean = dim == 4 || (dim == 3 && !measured)
  final def hasM: Boolean = dim == 4 || (dim == 3 && measured)
}

/** Mutable 2D bounding box accumulator (reference: src/compute.rs:11-76). */
final class Envelope extends Serializable {
  var xmin: Double = Double.PositiveInfinity
  var ymin: Double = Double.PositiveInfinity
  var xmax: Double = Double.NegativeInfinity
  var ymax: Double = Double.NegativeInfinity

  def isEmpty: Boolean = xmin > xmax
  def add(x: Double, y: Double): Unit =
    if (!x.isNaN && !y.isNaN) {
      if (x < xmin) xmin = x
      if (y < ymin) ymin = y
      if (x > xmax) xmax = x
      if (y > ymax) ymax = y
    }
  def merge(o: Envelope): Unit = {
    if (o.xmin < xmin) xmin = o.xmin
    if (o.ymin < ymin) ymin = o.ymin
    if (o.xmax > xmax) xmax = o.xmax
    if (o.ymax > ymax) ymax = o.ymax
  }
  def intersects(o: Envelope): Boolean =
    !isEmpty && !o.isEmpty &&
      xmin <= o.xmax && o.xmin <= xmax && ymin <= o.ymax && o.ymin <= ymax
  def containsPoint(x: Double, y: Double): Boolean =
    !isEmpty && x >= xmin && x <= xmax && y >= ymin && y <= ymax

  /**
   * Envelope as a geometry, matching the reference's always-Polygon return
   * with a CCW ring x=[xmin,xmax,xmax,xmin,xmin], y=[ymin,ymin,ymax,ymax,ymin]
   * (reference: src/udfs/envelope.rs:66-80,328-351). An empty input yields
   * POLYGON EMPTY.
   */
  def toPolygon: Polygon =
    if (isEmpty) Polygon(Array.empty, 2)
    else Polygon(Array(Array(
      xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin)), 2)
}

object Geometry {
  /** Shared fold of a flat coord sequence into an envelope. */
  private[spatial] def foldSeq(cs: Array[Double], dim: Int, env: Envelope): Unit = {
    var i = 0
    while (i + 1 < cs.length) {
      env.add(cs(i), cs(i + 1))
      i += dim
    }
  }
  private[spatial] def seqNumPoints(cs: Array[Double], dim: Int): Int = cs.length / dim
}

/** A single position; `coords` is length 0 (EMPTY) or `dim`. */
final case class Point(coords: Array[Double], dim: Int) extends Geometry {
  def typeName = "Point"
  def isEmpty: Boolean = coords.length == 0 || coords(0).isNaN
  def topoDim = 0
  def numPoints: Int = if (isEmpty) 0 else 1
  def foldEnvelope(env: Envelope): Unit =
    if (coords.length >= 2) env.add(coords(0), coords(1))
  def foreachSeq(f: (Array[Double], Int) => Unit): Unit = f(coords, dim)
  def x: Double = if (coords.length > 0) coords(0) else Double.NaN
  def y: Double = if (coords.length > 1) coords(1) else Double.NaN
  def z: Double = if (coords.length > 2 && dim >= 3) coords(2) else Double.NaN
}
object Point {
  def xy(x: Double, y: Double): Point = Point(Array(x, y), 2)
  val empty: Point = Point(Array.empty[Double], 2)
}

/** Flat interleaved coord sequence, stride = dim. */
final case class LineString(coords: Array[Double], dim: Int) extends Geometry {
  def typeName = "LineString"
  def isEmpty: Boolean = coords.length == 0
  def topoDim = 1
  def numPoints: Int = coords.length / dim
  def foldEnvelope(env: Envelope): Unit = Geometry.foldSeq(coords, dim, env)
  def foreachSeq(f: (Array[Double], Int) => Unit): Unit = f(coords, dim)
}

/** Rings: outer first, then holes; each a flat closed coord sequence. */
final case class Polygon(rings: Array[Array[Double]], dim: Int) extends Geometry {
  def typeName = "Polygon"
  def isEmpty: Boolean = rings.length == 0
  def topoDim = 2
  def numPoints: Int = { var n = 0; var i = 0; while (i < rings.length) { n += rings(i).length / dim; i += 1 }; n }
  def foldEnvelope(env: Envelope): Unit = {
    var i = 0; while (i < rings.length) { Geometry.foldSeq(rings(i), dim, env); i += 1 }
  }
  def foreachSeq(f: (Array[Double], Int) => Unit): Unit = rings.foreach(r => f(r, dim))
}

final case class MultiPoint(points: Array[Point], dim: Int) extends Geometry {
  def typeName = "MultiPoint"
  def isEmpty: Boolean = points.length == 0
  def topoDim = 0
  def numPoints: Int = points.map(_.numPoints).sum
  def foldEnvelope(env: Envelope): Unit = points.foreach(_.foldEnvelope(env))
  def foreachSeq(f: (Array[Double], Int) => Unit): Unit = points.foreach(_.foreachSeq(f))
}

final case class MultiLineString(lines: Array[LineString], dim: Int) extends Geometry {
  def typeName = "MultiLineString"
  def isEmpty: Boolean = lines.length == 0
  def topoDim = 1
  def numPoints: Int = lines.map(_.numPoints).sum
  def foldEnvelope(env: Envelope): Unit = lines.foreach(_.foldEnvelope(env))
  def foreachSeq(f: (Array[Double], Int) => Unit): Unit = lines.foreach(_.foreachSeq(f))
}

final case class MultiPolygon(polygons: Array[Polygon], dim: Int) extends Geometry {
  def typeName = "MultiPolygon"
  def isEmpty: Boolean = polygons.length == 0
  def topoDim = 2
  def numPoints: Int = polygons.map(_.numPoints).sum
  def foldEnvelope(env: Envelope): Unit = polygons.foreach(_.foldEnvelope(env))
  def foreachSeq(f: (Array[Double], Int) => Unit): Unit = polygons.foreach(_.foreachSeq(f))
}

final case class GeometryCollection(geoms: Array[Geometry], dim: Int) extends Geometry {
  def typeName = "GeometryCollection"
  def isEmpty: Boolean = geoms.length == 0
  def topoDim: Int = if (geoms.isEmpty) 0 else geoms.map(_.topoDim).max
  def numPoints: Int = geoms.map(_.numPoints).sum
  def foldEnvelope(env: Envelope): Unit = geoms.foreach(_.foldEnvelope(env))
  def foreachSeq(f: (Array[Double], Int) => Unit): Unit = geoms.foreach(_.foreachSeq(f))
}
