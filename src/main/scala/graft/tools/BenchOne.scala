package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries in one warm JVM:
  * `runMain graft.tools.BenchOne <sfDir> <query> [<query> ...]`
  * (repeat a name to separate warm-up from steady-state). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // same parallelism source as Bench/Verify, so single-query timings are
    // taken under the same configuration as the benchmark they explain
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
      println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
