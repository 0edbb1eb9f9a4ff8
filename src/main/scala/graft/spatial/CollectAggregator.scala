package graft.spatial

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import scala.collection.mutable.ArrayBuffer

/** Buffer for [[CollectAggregator]]: the raw WKB list (prepend-only). */
case class CollectBuf(items: List[Array[Byte]])

/**
 * ST_Collect aggregate: gathers input geometries into one multi-geometry
 * (MultiPoint if all points, MultiLineString if all lines, MultiPolygon if
 * all polygons, GeometryCollection otherwise). Null/invalid inputs are
 * skipped; an empty group yields GEOMETRYCOLLECTION EMPTY.
 *
 * The buffer holds raw WKB — concatenation-only merge, no geometry
 * decoding until `finish`. Output size grows with group size (a holistic
 * aggregate, like collect_list) — group by keys that bound cardinality.
 */
class CollectAggregator extends Aggregator[Array[Byte], CollectBuf, Array[Byte]] {
  def zero: CollectBuf = CollectBuf(Nil)
  def reduce(b: CollectBuf, wkb: Array[Byte]): CollectBuf =
    if (wkb == null) b else CollectBuf(wkb :: b.items)
  def merge(a: CollectBuf, b: CollectBuf): CollectBuf = CollectBuf(a.items ::: b.items)
  def finish(buf: CollectBuf): Array[Byte] = {
    val geoms = new ArrayBuffer[Geometry](buf.items.length)
    buf.items.reverseIterator.foreach { w =>
      val g = WKB.readOrNull(w)
      if (g != null && !g.isEmpty) geoms += g
    }
    val out: Geometry =
      if (geoms.isEmpty) GeometryCollection(Array.empty, 2)
      else if (geoms.forall(_.isInstanceOf[Point]))
        MultiPoint(geoms.map(_.asInstanceOf[Point]).toArray, geoms.head.dim)
      else if (geoms.forall(_.isInstanceOf[LineString]))
        MultiLineString(geoms.map(_.asInstanceOf[LineString]).toArray, geoms.head.dim)
      else if (geoms.forall(_.isInstanceOf[Polygon]))
        MultiPolygon(geoms.map(_.asInstanceOf[Polygon]).toArray, geoms.head.dim)
      else GeometryCollection(geoms.toArray, 2)
    WKB.write(out)
  }
  def bufferEncoder: Encoder[CollectBuf] = Encoders.product[CollectBuf]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
