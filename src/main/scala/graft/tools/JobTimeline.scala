package graft.tools


import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Wall-clock job timeline for one declared query (builder-side profiling):
 * records every Spark job's [start, end] plus its job group/description,
 * then prints the jobs in submission order with the DRIVER GAP before each
 * one — the time the driver spent between the previous job's end and this
 * job's start (planning, checkpoint commits, FS metadata work, listings).
 * For the streaming certification faces the gaps are where the
 * non-compute per-trigger machinery lives, which per-stage profilers
 * (ProfileQuery) cannot see at all.
 *
 * Usage: runMain graft.tools.JobTimeline <queryName> [sfDir]
 */
object JobTimeline {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q221_stream_curate")
    val d = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup pass (JIT, footer caches) so the recorded pass matches the
    // bench's steady state
    graft.Queries.all(name)(spark, d).queryExecution.toRdd.count()

    final case class J(id: Int, desc: String, var start: Long = 0L,
                       var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val j = J(e.jobId, desc.take(100), e.time)
        jobs.put(e.jobId, j); order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    })

    val t0 = System.currentTimeMillis()
    graft.Queries.all(name)(spark, d).queryExecution.toRdd.count()
    val t1 = System.currentTimeMillis()
    Thread.sleep(300) // listener bus drain

    import scala.jdk.CollectionConverters._
    var prevEnd = t0
    var jobMs = 0L
    var gapMs = 0L
    println(f"TOTAL wall ${(t1 - t0) / 1000.0}%.2f s  (${order.size} jobs)")
    order.asScala.foreach { id =>
      val j = jobs.get(id)
      val gap = j.start - prevEnd
      val dur = j.end - j.start
      if (gap >= 0) gapMs += gap
      jobMs += dur
      println(f"job ${j.id}%4d  gap=${gap}%5d ms  dur=${dur}%5d ms  ${j.desc}")
      prevEnd = math.max(prevEnd, j.end)
    }
    println(f"SUM job=${jobMs} ms  gap=${gapMs} ms  tail=${t1 - prevEnd} ms")
    spark.stop()
  }
}
