package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: LSH band-bucket occupancy distribution of the
  * documents minhash pipeline and the embeddings sign-sketch pipeline —
  * calibrates the self-tuning hot-bucket bound. */
object OccStats {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sig = docs.select(col("doc_id").as("id"),
      graft.pipeline.Text.minhash(col("text"), 64, 3).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(expr("transform(sequence(0, 15), b -> xxhash64(slice(sig, b*4+1, 4)))"))
        .as(Seq("band", "bucket")))
    val occ = banded.groupBy("band", "bucket").agg(count(lit(1)).as("occ"))
    occ.agg(count(lit(1)).as("n_buckets"), max("occ").as("max_occ"),
      avg("occ").as("avg_occ"),
      expr("approx_percentile(occ, array(0.9, 0.99, 0.999, 0.9999))").as("pcts"))
      .show(false)
    occ.filter(col("occ") > 8).groupBy("occ").count().orderBy(desc("occ")).show(30, false)

    // embedding sign-sketch path (q27 parameters: nBits=12, 4 bands)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val sigArr = array((0 until 4).map(j =>
      graft.pipeline.Similarity.hyperplaneSignature(col("embedding"), 12,
        seed = 42L + 1001L * j)): _*)
    val ebanded = emb.select(col("vec_id").as("id"), sigArr.as("sigs"))
      .select(col("id"), posexplode(col("sigs")).as(Seq("band", "bucket")))
    val eocc = ebanded.groupBy("band", "bucket").agg(count(lit(1)).as("occ"))
    eocc.agg(count(lit(1)).as("e_n_buckets"), max("occ").as("e_max_occ"),
      avg("occ").as("e_avg_occ"),
      expr("approx_percentile(occ, array(0.9, 0.99, 0.999))").as("e_pcts"))
      .show(false)
    spark.stop()
  }
}
