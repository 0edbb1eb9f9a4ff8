package graft.spatial

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Buffer for [[UnionAggregator]]: accumulated WKB inputs. */
case class UnionBuf(items: List[Array[Byte]])

/**
 * ST_Union aggregate: area-dissolved union of all input polygons in a
 * group, built on the piece-overlay engine — each new polygon contributes
 * only its part outside the running union (A ∪ B = A ⊎ (B − A)), so the
 * result is a piecewise-disjoint MultiPolygon whose area equals the true
 * union area.
 *
 * Holistic like collect_list: inputs buffer until `finish` (union is not
 * decomposable into constant-size partial states without a full overlay
 * per merge). Use with GROUP BY keys that bound group cardinality; for
 * global unions over huge inputs prefer pre-aggregating per grid cell
 * ([[SpatialJoin.st_covering_cells]]) and unioning per cell.
 */
class UnionAggregator extends Aggregator[Array[Byte], UnionBuf, Array[Byte]] {
  def zero: UnionBuf = UnionBuf(Nil)
  def reduce(b: UnionBuf, wkb: Array[Byte]): UnionBuf =
    if (wkb == null) b else UnionBuf(wkb :: b.items)
  def merge(a: UnionBuf, b: UnionBuf): UnionBuf = UnionBuf(a.items ::: b.items)
  def finish(buf: UnionBuf): Array[Byte] = {
    var pieces = List.empty[Polygon]
    buf.items.reverseIterator.foreach { w =>
      WKB.readOrNull(w) match {
        case p: Polygon if !p.isEmpty =>
          pieces = addPolygon(pieces, p)
        case mp: MultiPolygon =>
          mp.polygons.foreach(p => if (!p.isEmpty) pieces = addPolygon(pieces, p))
        case _ => () // non-areal inputs ignored
      }
    }
    WKB.write(MultiPolygon(pieces.toArray, 2))
  }

  /** Fold one polygon in: its parts outside every existing piece join the set. */
  private def addPolygon(pieces: List[Polygon], p: Polygon): List[Polygon] = {
    var remainder: List[Polygon] = List(p)
    pieces.foreach { existing =>
      remainder = remainder.flatMap { r =>
        GeomSetOps.difference(r, existing) match {
          case Some(mp: MultiPolygon) => mp.polygons.toList
          case Some(pp: Polygon) if !pp.isEmpty => List(pp)
          case _ => Nil
        }
      }
    }
    pieces ++ remainder
  }

  def bufferEncoder: Encoder[UnionBuf] = Encoders.product[UnionBuf]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
