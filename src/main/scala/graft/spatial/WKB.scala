package graft.spatial

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/**
 * ISO WKB reader/writer.
 *
 * The reference consumes ISO WKB blobs in Arrow Binary columns and reads
 * the per-value header byte-order byte + uint32 type code
 * (reference: src/udfs/geometry_type.rs:119-146; src/udfs/as_text.rs:84-107).
 * Geometry type codes: base 1..7 for Point..GeometryCollection, +1000 Z,
 * +2000 M, +3000 ZM. Both little- and big-endian inputs are accepted; output
 * is little-endian (NDR).
 *
 * POINT EMPTY is encoded as a point with all-NaN ordinates (the same
 * convention the reference fixtures use for native layout —
 * reference: data/generate_test_data.py:79).
 */
object WKB {

  final val PointT = 1
  final val LineStringT = 2
  final val PolygonT = 3
  final val MultiPointT = 4
  final val MultiLineStringT = 5
  final val MultiPolygonT = 6
  final val GeometryCollectionT = 7

  // ---------------------------------------------------------------- reader

  /** Recursion bound for nested collections: a crafted blob of nested
    * GEOMETRYCOLLECTION headers (9 bytes each) would otherwise recurse
    * ~len/9 deep and StackOverflowError — an Error, invisible to
    * readOrNull's `catch Exception`, killing the executor task. */
  private val MaxDepth = 512

  def read(bytes: Array[Byte]): Geometry = {
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf, 0)
  }

  def readOrNull(bytes: Array[Byte]): Geometry =
    try read(bytes) catch { case _: Exception => null }

  /** Decode only the header → (baseType 1..7, dim 2..4). Cheap: 5 bytes. */
  def readTypeInfo(bytes: Array[Byte]): (Int, Int) = {
    val buf = ByteBuffer.wrap(bytes)
    val order = if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    buf.order(order)
    val (base, dim, _) = decodeType(buf.getInt())
    (base, dim)
  }

  /** (baseType, dim, measured) from a raw WKB type code, incl. EWKB
    * dimension flags. `measured` = stride-3 layout whose third ordinate is
    * M, not Z (ISO +2000 range, or EWKB M without Z). */
  private def decodeType(code: Int): (Int, Int, Boolean) = {
    // EWKB flags (PostGIS): 0x80000000 = Z, 0x40000000 = M
    val ewkbZ = (code & 0x80000000) != 0
    val ewkbM = (code & 0x40000000) != 0
    val c = code & 0x0FFFFFFF
    val base = c % 1000
    val isoDim = c / 1000 match {
      case 1 => 3 // Z
      case 2 => 3 // M (stride 3)
      case 3 => 4 // ZM
      case _ => 2
    }
    val dim = if (ewkbZ && ewkbM) 4 else if (ewkbZ || ewkbM) 3 else isoDim
    val measured = (ewkbM && !ewkbZ) || (!ewkbZ && !ewkbM && c / 1000 == 2)
    (base, dim, measured)
  }

  /** Reject counts that cannot fit in the remaining bytes — corrupt inputs
    * must fail fast with an exception (→ SQL NULL), not allocate GBs. */
  @inline private def checkCount(n: Int, buf: ByteBuffer, minBytesPer: Int): Int = {
    if (n < 0 || n.toLong * minBytesPer > buf.remaining())
      throw new IllegalArgumentException(s"implausible WKB element count $n")
    n
  }

  private def readGeom(buf: ByteBuffer, depth: Int): Geometry = {
    if (depth > MaxDepth) throw new IllegalArgumentException("WKB nesting too deep")
    val order = if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    buf.order(order)
    val rawCode = buf.getInt()
    if ((rawCode & 0x20000000) != 0) buf.getInt() // skip EWKB SRID
    val (base, dim, m) = decodeType(rawCode)
    val g: Geometry = base match {
      case PointT =>
        val cs = new Array[Double](dim)
        var i = 0; while (i < dim) { cs(i) = buf.getDouble(); i += 1 }
        if (cs(0).isNaN) Point(Array.empty[Double], dim) else Point(cs, dim)
      case LineStringT => LineString(readSeq(buf, dim), dim)
      case PolygonT    => Polygon(readRings(buf, dim), dim)
      case MultiPointT =>
        val n = checkCount(buf.getInt(), buf, 21)
        val pts = new Array[Point](n)
        var i = 0
        while (i < n) {
          pts(i) = readGeom(buf, depth + 1) match {
            case p: Point => p
            case g        => throw new IllegalArgumentException(s"MULTIPOINT member is ${g.typeName}")
          }
          i += 1
        }
        MultiPoint(pts, dim)
      case MultiLineStringT =>
        val n = checkCount(buf.getInt(), buf, 9)
        val ls = new Array[LineString](n)
        var i = 0
        while (i < n) {
          ls(i) = readGeom(buf, depth + 1) match {
            case l: LineString => l
            case g             => throw new IllegalArgumentException(s"MULTILINESTRING member is ${g.typeName}")
          }
          i += 1
        }
        MultiLineString(ls, dim)
      case MultiPolygonT =>
        val n = checkCount(buf.getInt(), buf, 9)
        val ps = new Array[Polygon](n)
        var i = 0
        while (i < n) {
          ps(i) = readGeom(buf, depth + 1) match {
            case p: Polygon => p
            case g          => throw new IllegalArgumentException(s"MULTIPOLYGON member is ${g.typeName}")
          }
          i += 1
        }
        MultiPolygon(ps, dim)
      case GeometryCollectionT =>
        val n = checkCount(buf.getInt(), buf, 5)
        val gs = new Array[Geometry](n)
        var i = 0; while (i < n) { gs(i) = readGeom(buf, depth + 1); i += 1 }
        GeometryCollection(gs, dim)
      case other => throw new IllegalArgumentException(s"unknown WKB type $other")
    }
    if (m && dim == 3) g.measured = true
    g
  }

  private def readSeq(buf: ByteBuffer, dim: Int): Array[Double] = {
    val n = checkCount(buf.getInt(), buf, dim * 8)
    val cs = new Array[Double](n * dim)
    var i = 0; while (i < cs.length) { cs(i) = buf.getDouble(); i += 1 }
    cs
  }

  private def readRings(buf: ByteBuffer, dim: Int): Array[Array[Double]] = {
    val n = checkCount(buf.getInt(), buf, 4)
    val rs = new Array[Array[Double]](n)
    var i = 0; while (i < n) { rs(i) = readSeq(buf, dim); i += 1 }
    rs
  }

  // ------------------------------------------------------- streaming scans
  // Single-pass kernels over raw WKB, no object materialization — the hot
  // path for envelope/extent at scale (analogue of the reference's zero-copy
  // coordinate slicing, src/udfs/envelope.rs:230-326).

  /** Fold this WKB value's coords into `env` without building a Geometry. */
  def foldEnvelope(bytes: Array[Byte], env: Envelope): Unit = {
    val buf = ByteBuffer.wrap(bytes)
    scanGeom(buf, env, 0)
  }

  private def scanGeom(buf: ByteBuffer, env: Envelope, depth: Int): Unit = {
    if (depth > MaxDepth) throw new IllegalArgumentException("WKB nesting too deep")
    val order = if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    buf.order(order)
    val rawCode = buf.getInt()
    if ((rawCode & 0x20000000) != 0) buf.getInt()
    val (base, dim, _) = decodeType(rawCode)
    base match {
      case PointT =>
        val x = buf.getDouble(); val y = buf.getDouble()
        var k = 2; while (k < dim) { buf.getDouble(); k += 1 }
        env.add(x, y)
      case LineStringT => scanSeq(buf, dim, env)
      case PolygonT =>
        val n = checkCount(buf.getInt(), buf, 4)
        var i = 0; while (i < n) { scanSeq(buf, dim, env); i += 1 }
      case MultiPointT | MultiLineStringT | MultiPolygonT | GeometryCollectionT =>
        val n = checkCount(buf.getInt(), buf, 5)
        var i = 0; while (i < n) { scanGeom(buf, env, depth + 1); i += 1 }
      case other => throw new IllegalArgumentException(s"unknown WKB type $other")
    }
  }

  private def scanSeq(buf: ByteBuffer, dim: Int, env: Envelope): Unit = {
    val n = checkCount(buf.getInt(), buf, dim * 8)
    var i = 0
    while (i < n) {
      val x = buf.getDouble(); val y = buf.getDouble()
      var k = 2; while (k < dim) { buf.getDouble(); k += 1 }
      env.add(x, y)
      i += 1
    }
  }

  /** Geometry type tag straight off the header: "ST_Point", "ST_MultiPolygonZ", …
    * (reference: src/udfs/geometry_type.rs:119-146). */
  def geometryTypeTag(bytes: Array[Byte]): String = {
    val buf = ByteBuffer.wrap(bytes)
    val order = if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    buf.order(order)
    val raw = buf.getInt()
    val (base, _, _) = decodeType(raw)
    val ewkbZ = (raw & 0x80000000) != 0
    val ewkbM = (raw & 0x40000000) != 0
    val c = raw & 0x0FFFFFFF
    val suffix =
      if ((c / 1000 == 3) || (ewkbZ && ewkbM)) "ZM"
      else if (c / 1000 == 1 || ewkbZ) "Z"
      else if (c / 1000 == 2 || ewkbM) "M"
      else ""
    val name = base match {
      case PointT              => "Point"
      case LineStringT         => "LineString"
      case PolygonT            => "Polygon"
      case MultiPointT         => "MultiPoint"
      case MultiLineStringT    => "MultiLineString"
      case MultiPolygonT       => "MultiPolygon"
      case GeometryCollectionT => "GeometryCollection"
      case other => throw new IllegalArgumentException(s"unknown WKB type $other")
    }
    "ST_" + name + suffix
  }

  // ---------------------------------------------------------------- writer

  def write(g: Geometry): Array[Byte] = {
    val size = byteSize(g)
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    writeGeom(g, buf)
    buf.array()
  }

  private def typeCode(g: Geometry): Int = {
    val base = g match {
      case _: Point              => PointT
      case _: LineString         => LineStringT
      case _: Polygon            => PolygonT
      case _: MultiPoint         => MultiPointT
      case _: MultiLineString    => MultiLineStringT
      case _: MultiPolygon       => MultiPolygonT
      case _: GeometryCollection => GeometryCollectionT
    }
    base + (g.dim match {
      case 3 => if (g.measured) 2000 else 1000 // XYM vs XYZ
      case 4 => 3000
      case _ => 0
    })
  }

  private def byteSize(g: Geometry): Int = g match {
    case p: Point           => 5 + 8 * p.dim
    case l: LineString      => 9 + 8 * l.coords.length
    case pg: Polygon        => 9 + pg.rings.map(r => 4 + 8 * r.length).sum
    case mp: MultiPoint     => 9 + mp.points.map(byteSize).sum
    case ml: MultiLineString => 9 + ml.lines.map(byteSize).sum
    case mpg: MultiPolygon  => 9 + mpg.polygons.map(byteSize).sum
    case gc: GeometryCollection => 9 + gc.geoms.map(byteSize).sum
  }

  private def writeGeom(g: Geometry, buf: ByteBuffer): Unit = {
    buf.put(1.toByte) // NDR
    buf.putInt(typeCode(g))
    g match {
      case p: Point =>
        if (p.isEmpty) { var k = 0; while (k < p.dim) { buf.putDouble(Double.NaN); k += 1 } }
        else { var k = 0; while (k < p.dim) { buf.putDouble(p.coords(k)); k += 1 } }
      case l: LineString => writeSeq(l.coords, l.dim, buf)
      case pg: Polygon =>
        buf.putInt(pg.rings.length)
        pg.rings.foreach(r => writeSeq(r, pg.dim, buf))
      case mp: MultiPoint =>
        buf.putInt(mp.points.length)
        mp.points.foreach(writeGeom(_, buf))
      case ml: MultiLineString =>
        buf.putInt(ml.lines.length)
        ml.lines.foreach(writeGeom(_, buf))
      case mpg: MultiPolygon =>
        buf.putInt(mpg.polygons.length)
        mpg.polygons.foreach(writeGeom(_, buf))
      case gc: GeometryCollection =>
        buf.putInt(gc.geoms.length)
        gc.geoms.foreach(writeGeom(_, buf))
    }
  }

  private def writeSeq(cs: Array[Double], dim: Int, buf: ByteBuffer): Unit = {
    buf.putInt(cs.length / dim)
    var i = 0; while (i < cs.length) { buf.putDouble(cs(i)); i += 1 }
  }
}
