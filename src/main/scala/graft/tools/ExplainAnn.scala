package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Plan evidence for the ANN path (PLANS_r5.md): ivfAssign / ivfRoute
  * physical shapes. Usage: sbt "runMain graft.tools.ExplainAnn [sfDir]" */
object ExplainAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val (assigned, centroids) = Similarity.ivfAssign(emb, "vec_id", "embedding", nLists = 8)
    println("================ ivfAssign ================")
    assigned.explain("formatted")
    println("================ ivfRoute ================")
    Similarity.ivfRoute(queries, centroids, "vec_id", "embedding", nProbe = 3)
      .explain("formatted")
    spark.stop()
  }
}
