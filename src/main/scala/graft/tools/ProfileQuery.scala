package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic stage-metrics profiler for any declared query (builder-side):
  * runs a cold pass, then a warm pass with a SparkListener recording
  * per-stage wall/CPU/GC/records — the harness that found q187's
  * 3-task AQE coalesce and the BoundedTopK per-group projection.
  *
  * Usage: runMain graft.tools.ProfileQuery <queryName> [sfDir]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q187_item_recs")
    val d = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t(s"$name-cold")(graft.Queries.all(name)(spark, d).queryExecution.toRdd.count())
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId,
          s"cpu=${tm.executorRunTime}ms gc=${tm.jvmGCTime}ms " +
            s"in=${tm.inputMetrics.recordsRead} sr=${tm.shuffleReadMetrics.recordsRead} " +
            s"sw=${tm.shuffleWriteMetrics.recordsWritten} spill=${tm.diskBytesSpilled}",
          dur, si.numTasks))
      }
    })
    t(s"$name-warm")(graft.Queries.all(name)(spark, d).queryExecution.toRdd.count())
    Thread.sleep(500)
    stages.sortBy(-_._3).take(12).foreach { case (id, nm, dur, nt) =>
      println(f"STAGE $id%5d ${dur}%6d ms $nt%4d tasks  $nm")
    }
    spark.stop()
  }
}
