package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the q107 float-drift safety margin: for every Lloyd round the
  * oracle replays (assign-1, assign-2, final assignment), the minimum gap
  * between each vector's best and second-best centroid cosine. Cross-engine
  * centroid drift is ~1e-13 (mean summation order only); the query's
  * integer output is hash-stable iff these margins dwarf that.
  * `runMain graft.tools.KmeansMargin <sfDir>` */
object KmeansMargin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{Clustering, Similarity}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def margin(centroids: DataFrame): Double = {
      val centArr = centroids
        .agg(collect_list(struct(col("centroid_id"), col("cvec"))).as("__cents"))
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .crossJoin(broadcast(centArr))
        .select(col("vec_id"),
          slice(array_sort(transform(col("__cents"), c =>
            -graft.pipeline.Similarity.cosine(col("v"), c.getField("cvec")))), 1, 2)
            .as("top2"))
        .select((-element_at(col("top2"), 1) + element_at(col("top2"), 2)).as("gap"))
        .agg(min(col("gap"))).head().getDouble(0)
    }

    // replay the q107 trajectory: init c0, rounds c1, c2
    val c0 = Clustering.kmeansFit(emb, "vec_id", "embedding", 8, 0)
    val c1 = Clustering.kmeansFit(emb, "vec_id", "embedding", 8, 1)
    val c2 = Clustering.kmeansFit(emb, "vec_id", "embedding", 8, 2)
    println(f"margin round1 (vs c0): ${margin(c0)}%.3e")
    println(f"margin round2 (vs c1): ${margin(c1)}%.3e")
    println(f"margin final  (vs c2): ${margin(c2)}%.3e")
    spark.stop()
  }
}
