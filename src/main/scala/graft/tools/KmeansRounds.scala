package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Measured bound on the per-Lloyd-round driver synchronization in
 * [[graft.pipeline.Clustering.kmeansFit]] (builder-side adjudication
 * harness): Lloyd's algorithm is inherently iterative — round t+1's
 * assignment literal depends on round t's means, so ONE job boundary per
 * round is irreducible in Spark's execution model (MLlib KMeans runs the
 * same collectAsMap-per-iteration shape). What must be bounded is the
 * barrier's cost relative to the round's distributed work, and that the
 * synchronized payload stays k-sized (k × dim doubles), never
 * corpus-sized.
 *
 * Prints wall for (k, iters) grids over the embeddings table; the
 * per-round marginal cost is the iters-delta divided by the extra
 * rounds, and the barrier share is that marginal minus the same-k
 * single-round compute. Usage:
 *   sbt "runMain graft.tools.KmeansRounds <sfDir>"
 */
object KmeansRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def fit(k: Int, iters: Int): Double = {
      val t0 = System.nanoTime()
      graft.pipeline.Clustering.kmeansFit(emb, "vec_id", "embedding", k, iters)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    fit(8, 1) // warmup (JIT + parquet footers)
    for (k <- Seq(8, 32, 256); (i1, i2) <- Seq((1, 6))) {
      val t1 = fit(k, i1); val t2 = fit(k, i2)
      println(f"KMEANS_ROUNDS k=$k%4d iters=$i1: $t1%6.2f s  iters=$i2: $t2%6.2f s" +
        f"  marginal/round: ${(t2 - t1) / (i2 - i1)}%6.3f s")
    }
    spark.stop()
  }
}
