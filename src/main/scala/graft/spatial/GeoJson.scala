package graft.spatial

/** GeoJSON (RFC 7946) geometry writer — output surface beyond the
  * reference's WKT (reference has no JSON output; extension scope). */
object GeoJson {

  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    writeTo(g, sb)
    sb.toString
  }

  private def num(sb: java.lang.StringBuilder, d: Double): Unit = {
    if (d == d.toLong && math.abs(d) < 1e15) {
      // preserve the sign of negative zero (matches the WKT writer) so
      // GeoJSON -> geometry -> WKB stays byte-stable
      if (d == 0.0 && java.lang.Double.doubleToRawLongBits(d) != 0L) sb.append('-')
      sb.append(d.toLong); ()
    }
    else { sb.append(d); () }
  }

  private def pos(sb: java.lang.StringBuilder, cs: Array[Double], off: Int, dim: Int): Unit = {
    sb.append('[')
    num(sb, cs(off)); sb.append(','); num(sb, cs(off + 1))
    var k = 2
    while (k < dim) { sb.append(','); num(sb, cs(off + k)); k += 1 }
    sb.append(']')
  }

  private def seq(sb: java.lang.StringBuilder, cs: Array[Double], dim: Int): Unit = {
    sb.append('[')
    var i = 0
    var first = true
    while (i + dim <= cs.length) {
      if (!first) sb.append(',')
      pos(sb, cs, i, dim)
      first = false
      i += dim
    }
    sb.append(']')
  }

  private def writeTo(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("{\"type\":\"Point\",\"coordinates\":")
      if (p.isEmpty) sb.append("[]") else pos(sb, p.coords, 0, p.dim)
      sb.append('}')
    case l: LineString =>
      sb.append("{\"type\":\"LineString\",\"coordinates\":")
      seq(sb, l.coords, l.dim)
      sb.append('}')
    case pg: Polygon =>
      sb.append("{\"type\":\"Polygon\",\"coordinates\":[")
      var i = 0
      while (i < pg.rings.length) {
        if (i > 0) sb.append(',')
        seq(sb, pg.rings(i), pg.dim)
        i += 1
      }
      sb.append("]}")
    case mp: MultiPoint =>
      sb.append("{\"type\":\"MultiPoint\",\"coordinates\":[")
      var i = 0
      while (i < mp.points.length) {
        if (i > 0) sb.append(',')
        val p = mp.points(i)
        if (p.isEmpty) sb.append("[]") else pos(sb, p.coords, 0, p.dim)
        i += 1
      }
      sb.append("]}")
    case ml: MultiLineString =>
      sb.append("{\"type\":\"MultiLineString\",\"coordinates\":[")
      var i = 0
      while (i < ml.lines.length) {
        if (i > 0) sb.append(',')
        seq(sb, ml.lines(i).coords, ml.dim)
        i += 1
      }
      sb.append("]}")
    case mpg: MultiPolygon =>
      sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":[")
      var i = 0
      while (i < mpg.polygons.length) {
        if (i > 0) sb.append(',')
        sb.append('[')
        var j = 0
        while (j < mpg.polygons(i).rings.length) {
          if (j > 0) sb.append(',')
          seq(sb, mpg.polygons(i).rings(j), mpg.dim)
          j += 1
        }
        sb.append(']')
        i += 1
      }
      sb.append("]}")
    case gc: GeometryCollection =>
      sb.append("{\"type\":\"GeometryCollection\",\"geometries\":[")
      var i = 0
      while (i < gc.geoms.length) {
        if (i > 0) sb.append(',')
        writeTo(gc.geoms(i), sb)
        i += 1
      }
      sb.append("]}")
  }

  // ---------------------------------------------------------------- reader

  /** Parse RFC 7946 GeoJSON geometry; null on malformed input (SQL
    * null-on-error semantics). Positions may be XY or XYZ; dim is taken
    * from the first position of each coordinate sequence. */
  def readOrNull(json: String): Geometry = {
    import MiniJson._
    parse(json) match {
      case Some(o: JObj) => try geomOf(o) catch { case _: Exception => null }
      case _ => null
    }
  }

  private def numsOf(v: MiniJson.Value): Array[Double] = {
    import MiniJson._
    v match {
      case JArr(items) => items.map {
        case JNum(d) => d
        case _ => throw new IllegalArgumentException("position must be numeric")
      }.toArray
      case _ => throw new IllegalArgumentException("not an array")
    }
  }

  private def flatSeq(v: MiniJson.Value): (Array[Double], Int) = {
    import MiniJson._
    val JArr(items) = v: @unchecked
    if (items.isEmpty) return (Array.empty[Double], 2)
    val first = numsOf(items.head)
    val dim = math.max(2, math.min(first.length, 4))
    val out = new Array[Double](items.length * dim)
    var i = 0
    while (i < items.length) {
      val c = numsOf(items(i))
      var k = 0
      while (k < dim) { out(i * dim + k) = if (k < c.length) c(k) else Double.NaN; k += 1 }
      i += 1
    }
    (out, dim)
  }

  private def ringsOf(v: MiniJson.Value): (Array[Array[Double]], Int) = {
    import MiniJson._
    val JArr(items) = v: @unchecked
    var dim = 2
    val rs = items.map { r => val (cs, d) = flatSeq(r); if (cs.nonEmpty) dim = d; cs }.toArray
    (rs, dim)
  }

  private def geomOf(o: MiniJson.JObj): Geometry = {
    import MiniJson._
    val tpe = o.get("type") match {
      case Some(JStr(t)) => t
      case _ => throw new IllegalArgumentException("missing type")
    }
    if (tpe == "GeometryCollection") {
      val JArr(gs) = o.get("geometries").getOrElse(throw new IllegalArgumentException("missing geometries")): @unchecked
      val members = gs.map { case g: JObj => geomOf(g); case _ => throw new IllegalArgumentException("bad member") }.toArray
      val dim = if (members.isEmpty) 2 else members.map(_.dim).max
      return GeometryCollection(members, dim)
    }
    val coords = o.get("coordinates").getOrElse(throw new IllegalArgumentException("missing coordinates"))
    tpe match {
      case "Point" =>
        val c = numsOf(coords)
        if (c.isEmpty) Point(Array.empty[Double], 2)
        else Point(c.take(4), math.max(2, math.min(c.length, 4)))
      case "LineString" =>
        val (cs, dim) = flatSeq(coords); LineString(cs, dim)
      case "Polygon" =>
        val (rs, dim) = ringsOf(coords); Polygon(rs, dim)
      case "MultiPoint" =>
        val JArr(items) = coords: @unchecked
        var dim = 2
        val pts = items.map { pv =>
          val c = numsOf(pv)
          if (c.isEmpty) Point(Array.empty[Double], 2)
          else { dim = math.max(dim, math.min(c.length, 4)); Point(c.take(4), math.max(2, math.min(c.length, 4))) }
        }.toArray
        MultiPoint(pts, dim)
      case "MultiLineString" =>
        val (ls, dim) = ringsOf(coords)
        MultiLineString(ls.map(cs => LineString(cs, dim)), dim)
      case "MultiPolygon" =>
        val JArr(polys) = coords: @unchecked
        var dim = 2
        val ps = polys.map { pv => val (rs, d) = ringsOf(pv); if (rs.nonEmpty) dim = d; Polygon(rs, d) }.toArray
        MultiPolygon(ps, dim)
      case other => throw new IllegalArgumentException(s"unknown GeoJSON type $other")
    }
  }
}
