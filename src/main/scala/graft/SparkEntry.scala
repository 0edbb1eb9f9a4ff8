package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A spatial predicate join (segment bboxes ⋈ supplier points) with
    * ST_AsText output — exercises constructors, predicates, join, agg. */
  def entry(spark: SparkSession): DataFrame = {
    graft.spatial.functions.register(spark)
    val d = "/root/testdata/sf0.001"
    Seq("customer", "supplier").foreach(n =>
      spark.read.parquet(s"$d/$n.parquet").createOrReplaceTempView(n))
    spark.sql("""
      SELECT b.c_mktsegment, count(*) AS n_supp,
             ST_AsText(ST_Centroid(any_value(b.bbox))) AS bbox_centroid
      FROM (
        SELECT c_mktsegment,
               ST_MakeEnvelope(min(c_acctbal), CAST(min(c_nationkey) AS DOUBLE),
                               max(c_acctbal), CAST(max(c_nationkey) AS DOUBLE)) AS bbox
        FROM customer GROUP BY c_mktsegment) b
      JOIN supplier sp
        ON ST_Contains(b.bbox, ST_Point(sp.s_acctbal, CAST(sp.s_nationkey AS DOUBLE)))
      GROUP BY b.c_mktsegment ORDER BY b.c_mktsegment""")
  }

  /** One entry per implemented operator from SURVEY.md §2 / §7.6. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (computational geometry, LSH sketches, heuristic lang-id) →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracle
}
