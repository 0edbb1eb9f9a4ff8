package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.spatial._
import graft.pipeline.{Fingerprint64, LangId, MinHash, SimHash64, VecCosine, VecDot, VecNorm}

/**
 * SparkSessionExtensions provider: makes every graft function available in
 * SQL cluster-wide via configuration —
 *
 *   spark.sql.extensions=graft.GraftExtensions
 *
 * — the Spark analogue of the reference's per-session registration
 * (reference: examples/main.rs:16-27: register_udf × 3, register_udaf,
 * add_analyzer_rule). The reference's analyzer rule threads GeoParquet
 * metadata into UDF calls (reference: src/rules.rs:20-170); this engine
 * replaces the encoding half with load-time conversion to canonical WKB
 * ([[graft.spatial.GeoIO]]) and keeps the geometry-type half as
 * [[graft.spatial.GeometryTypeFoldRule]], a resolution rule that folds
 * ST_GeometryType to a plan-time constant from recorded or re-derived
 * column metadata.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  private def inject(e: SparkSessionExtensions, name: String,
                     builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name), builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer: ST_Intersects theta joins → grid equi-joins (opt-in via
    // spark.graft.spatialJoin.cellSize)
    e.injectOptimizerRule(session => graft.spatial.GridSpatialJoinRule(session))
    // resolution: ST_GeometryType → plan-time constant when the geometry
    // class is recorded in (or re-derivable from) column metadata
    e.injectResolutionRule(session => graft.spatial.GeometryTypeFoldRule(session))
    // constructors
    inject(e, "st_point", es => StPoint(es(0), es(1)))
    inject(e, "st_makepointz", es => StPointZ(es(0), es(1), es(2)))
    inject(e, "st_geomfromtext", es => StGeomFromText(es.head))
    inject(e, "st_geometryfromtext", es => StGeomFromText(es.head))
    inject(e, "st_geomfromwkb", es => StGeomFromWkb(es.head))
    inject(e, "st_makeenvelope", es => StMakeEnvelope(es))
    // accessors
    inject(e, "st_astext", es => StAsText(es.head))
    inject(e, "st_asbinary", es => StAsBinary(es.head))
    inject(e, "st_asgeojson", es => StAsGeoJson(es.head))
    inject(e, "st_geomfromgeojson", es => StGeomFromGeoJson(es.head))
    inject(e, "st_geometrytype", es => StGeometryType(es.head))
    inject(e, "st_envelope", es => StEnvelope(es.head))
    inject(e, "st_x", es => StX(es.head))
    inject(e, "st_y", es => StY(es.head))
    inject(e, "st_z", es => StZ(es.head))
    inject(e, "st_xmin", es => StXMin(es.head))
    inject(e, "st_ymin", es => StYMin(es.head))
    inject(e, "st_xmax", es => StXMax(es.head))
    inject(e, "st_ymax", es => StYMax(es.head))
    inject(e, "st_isempty", es => StIsEmpty(es.head))
    inject(e, "st_dimension", es => StDimension(es.head))
    inject(e, "st_npoints", es => StNPoints(es.head))
    inject(e, "st_numpoints", es => StNPoints(es.head))
    inject(e, "st_numgeometries", es => StNumGeometries(es.head))
    inject(e, "st_srid", es => StSrid(es.head))
    inject(e, "st_pointn", es => StPointN(es(0), es(1)))
    inject(e, "st_startpoint", es => StStartPoint(es.head))
    inject(e, "st_endpoint", es => StEndPoint(es.head))
    inject(e, "st_exteriorring", es => StExteriorRing(es.head))
    inject(e, "st_interiorringn", es => StInteriorRingN(es(0), es(1)))
    inject(e, "st_geometryn", es => StGeometryN(es(0), es(1)))
    inject(e, "st_reverse", es => StReverse(es.head))
    inject(e, "st_rotate", es => StRotate(es(0), es(1)))
    inject(e, "st_numinteriorrings", es => StNumInteriorRings(es.head))
    inject(e, "st_translate", es => StTranslate(es(0), es(1), es(2)))
    inject(e, "st_scale", es => StScale(es(0), es(1), es(2)))
    inject(e, "st_geohash", es => StGeoHash(es(0), es(1)))
    inject(e, "st_azimuth", es => StAzimuth(es(0), es(1)))
    inject(e, "st_makeline", es => StMakeLine(es.head))
    inject(e, "st_dumppoints", es => StDumpPoints(es.head))
    inject(e, "st_lineinterpolatepoint", es => StLineInterpolatePoint(es(0), es(1)))
    // measures
    inject(e, "st_area", es => StArea(es.head))
    inject(e, "st_length", es => StLength(es.head))
    inject(e, "st_perimeter", es => StPerimeter(es.head))
    inject(e, "st_centroid", es => StCentroid(es.head))
    inject(e, "st_convexhull", es => StConvexHull(es.head))
    inject(e, "st_minimumboundingcircle", es => StMinimumBoundingCircle(es.head))
    inject(e, "st_simplify", es => StSimplify(es(0), es(1)))
    inject(e, "st_distance", es => StDistance(es(0), es(1)))
    inject(e, "st_closestpoint", es => StClosestPoint(es(0), es(1)))
    inject(e, "st_shortestline", es => StShortestLine(es(0), es(1)))
    // predicates
    inject(e, "st_intersects", es => StIntersects(es(0), es(1)))
    inject(e, "st_disjoint", es => StDisjoint(es(0), es(1)))
    inject(e, "st_contains", es => StContains(es(0), es(1)))
    inject(e, "st_within", es => StWithin(es(0), es(1)))
    inject(e, "st_env_intersects", es => StEnvIntersects(es(0), es(1)))
    inject(e, "st_dwithin", es => StDWithin(es(0), es(1), es(2)))
    inject(e, "st_equals", es => StEquals(es(0), es(1)))
    inject(e, "st_touches", es => StTouches(es(0), es(1)))
    inject(e, "st_crosses", es => StCrosses(es(0), es(1)))
    inject(e, "st_overlaps", es => StOverlaps(es(0), es(1)))
    inject(e, "st_relate", es => StRelate(es(0), es(1)))
    inject(e, "st_issimple", es => StIsSimple(es.head))
    inject(e, "st_boundary", es => StBoundary(es.head))
    // set-theoretic / constructive
    inject(e, "st_intersection", es => StIntersection(es(0), es(1)))
    inject(e, "st_difference", es => StDifference(es(0), es(1)))
    inject(e, "st_union", es => StUnion(es(0), es(1)))
    inject(e, "st_symdifference", es => StSymDifference(es(0), es(1)))
    inject(e, "st_buffer", es => StBuffer(es(0), es(1)))
    // text pipeline
    inject(e, "lang_id", es => LangId(es.head))
    inject(e, "fingerprint64", es => Fingerprint64(es.head))
    inject(e, "simhash64", es => SimHash64(es.head))
    inject(e, "vec_dot", es => VecDot(es(0), es(1)))
    inject(e, "vec_norm", es => VecNorm(es.head))
    inject(e, "vec_cosine", es => VecCosine(es(0), es(1)))
    inject(e, "ts_micros", es => graft.pipeline.TsMicros(es.head))
    inject(e, "ntz_to_utc", es => graft.pipeline.NtzToUtc(es.head))
    inject(e, "minhash", {
      case Seq(x) => MinHash(x, 64, 3)
      case Seq(x, n, k) => MinHash(x,
        n.eval().asInstanceOf[Number].intValue(),
        k.eval().asInstanceOf[Number].intValue())
      case es => MinHash(es.head, 64, 3)
    })
  }
}
