package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spatial.{functions => G, SpatialCluster}

/** Stage-by-stage DBSCAN diagnostics (builder-side only). */
object DbscanDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"),
        G.st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("pt"))
    val t0 = System.nanoTime()
    def lap(tag: String): Unit =
      println(f"$tag at ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val pairs = SpatialCluster.dwithinPairs(pts, "c_custkey", "pt", 10.0, 10.0)
      .persist()
    println(s"pairs = ${pairs.count()}"); lap("pairs")
    val sym = pairs.unionByName(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val deg = sym.groupBy(col("id_a").as("id")).agg(count(lit(1)).as("__deg"))
    val cores = deg.filter(col("__deg") + 1 >= 5).select(col("id")).persist()
    println(s"cores = ${cores.count()}"); lap("cores")
    val coreEdges = pairs
      .join(cores.select(col("id").as("id_a")), Seq("id_a"))
      .join(cores.select(col("id").as("id_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b")).persist()
    println(s"coreEdges = ${coreEdges.count()}"); lap("coreEdges")
    val comps = graft.pipeline.Graph.connectedComponentsConverged(coreEdges, 50)
    println(s"comps = ${comps.count()}"); lap("comps")
    println(s"distinct labels = ${comps.select("label").distinct().count()}")
    lap("done")
    spark.stop()
  }
}
