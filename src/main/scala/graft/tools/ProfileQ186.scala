package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase profile for the q186 bfsHops face (builder-side). */
object ProfileQ186 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val pairs = graft.pipeline.Similarity.itemCooccurrence(
        graft.Queries.t(spark, d, "lineitem"), "l_orderkey", "l_partkey",
        minTogether = 2L)
      t("cooc-count")(pairs.count())
      val e = pairs.select(col("item_a").as("u"), col("item_b").as("v"))
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .distinct().persist()
      t("sym-count")(sym.count())
      val seeds = graft.Queries.t(spark, d, "part")
        .where(col("p_partkey") <= 10).select(col("p_partkey").as("node")).distinct()
      t("seeds-collect")(seeds.collect())
      t("sym-collect")(sym.select(col("u").cast("long"), col("v").cast("long")).collect())
      t("full-q186")(graft.Queries.all("q186_bfs_hops")(spark, d).queryExecution.toRdd.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
