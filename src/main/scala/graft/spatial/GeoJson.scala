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
    if (d == d.toLong && math.abs(d) < 1e15) { sb.append(d.toLong); () }
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
}
