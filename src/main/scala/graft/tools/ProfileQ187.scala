package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase + stage profiler for the q187 itemRecommendations face
  * (builder-side). Round-9 provenance: this harness found, in order, the
  * duplicated basket-distinct (fixed by the ubi reuse), AQE coalescing
  * the compute-dense scoring stage to 3 tasks (fixed by the explicit
  * keyed repartition), the driver-side 500k-row broadcast build of the
  * owned anti side (fixed by the SHUFFLE_HASH hint), and the
  * per-serialize UnsafeProjection.create in BoundedTopK (~0.5 ms × one
  * serialize per GROUP — 75 s CPU at sf0.1; fixed by hoisting). Steady-
  * state q187: 7.9 s → 2.2 s. */
object ProfileQ187 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val s = spark
    def mkIr() = {
      val ui = graft.Queries.t(s, d, "orders")
        .join(graft.Queries.t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_orderkey"), col("l_partkey"))
      graft.pipeline.Similarity.itemRecommendations(ui, "cust", "l_orderkey", "l_partkey", k = 3)
    }
    t("ir-cold")(mkIr().queryExecution.toRdd.count())
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId,
          s"cpu=${tm.executorRunTime}ms gc=${tm.jvmGCTime}ms " +
            s"sr=${tm.shuffleReadMetrics.recordsRead} sw=${tm.shuffleWriteMetrics.recordsWritten}",
          dur, si.numTasks))
      }
    })
    t("ir-warm")(mkIr().queryExecution.toRdd.count())
    Thread.sleep(500)
    stages.sortBy(-_._3).take(10).foreach { case (id, nm, dur, nt) =>
      println(f"STAGE $id%5d ${dur}%6d ms $nt%4d tasks  $nm")
    }
    spark.stop()
  }
}
