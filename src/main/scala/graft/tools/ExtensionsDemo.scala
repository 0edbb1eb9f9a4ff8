package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-check of the `spark.sql.extensions=graft.GraftExtensions` path:
  * a fresh session built with the extensions class must resolve every
  * function family without per-session registration calls. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-demo")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql("""
      SELECT ST_AsText(ST_Point(1.0D, 2.0D)) AS wkt,
             ST_Area(ST_GeomFromText('POLYGON ((0 0,4 0,4 4,0 4,0 0))')) AS area,
             ST_Intersects(ST_Point(1.0D, 1.0D),
                           ST_GeomFromText('POLYGON ((0 0,4 0,4 4,0 4,0 0))')) AS hit,
             ST_AsGeoJSON(ST_Point(3.0D, 4.0D)) AS gj,
             lang_id('the quick brown fox jumps over the lazy dog again and again') AS lang,
             simhash64('hello world hello world') AS sh,
             vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos
      """).head()
    assert(r.getString(0) == "POINT (1.0 2.0)", r)
    assert(r.getDouble(1) == 16.0, r)
    assert(r.getBoolean(2), r)
    assert(r.getString(3) == """{"type":"Point","coordinates":[3,4]}""", r)
    assert(r.getString(4) == "en", r)
    assert(r.getDouble(6) == 1.0, r)
    println("EXTENSIONS_OK " + r)
    spark.stop()
  }
}
