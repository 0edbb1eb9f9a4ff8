package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * State-store telemetry for the streaming certification faces (builder-
 * side): runs each named face end-to-end (the faces drive their streams
 * at construction) with a session-global [[StreamingQueryListener]] that
 * records, per stateful operator, the MAXIMUM `numRowsTotal` and
 * `memoryUsedBytes` across every micro-batch progress event — the two
 * numbers that bound a stateful operator at 100 TB (wall clock, which
 * BENCH_SF1 already tables, does not).
 *
 *   SPARK_GRAFT_STATE_PROVIDER=rocksdb \
 *   sbt "runMain graft.tools.StreamStateProbe <sfDir> q224 q226 ..."
 *
 * With the RocksDB provider the state lives OFF-heap (native memtables +
 * SST files) — `memoryUsedBytes` then reports the RocksDB total and the
 * JVM heap holds only block-cache references, which is the provider
 * production deployments pick precisely so state size is independent of
 * executor heap. Default is the HDFS-backed (on-heap) provider.
 */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("SPARK_GRAFT_STATE_PROVIDER").contains("rocksdb"))
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val provider =
      if (sys.env.get("SPARK_GRAFT_STATE_PROVIDER").contains("rocksdb"))
        "rocksdb" else "hdfs-onheap"

    args.drop(1).foreach { q =>
      // a FRESH listener (and stats map) per face, registered before the
      // run and removed after the drain sleep: a progress event arriving
      // late on the async bus can at worst be dropped — it can never be
      // attributed to the NEXT face, which a shared cleared map allowed
      val stats = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          e.progress.stateOperators.foreach { so =>
            stats.merge(so.operatorName,
              (so.numRowsTotal, so.memoryUsedBytes),
              (a, b) => (math.max(a._1, b._1), math.max(a._2, b._2)))
          }
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // drain the async listener bus before reading the map
        Thread.sleep(5000)
        import scala.jdk.CollectionConverters._
        val ops = stats.asScala.toSeq.sortBy(_._1).map { case (op, (rows, bytes)) =>
          s""""$op":{"max_state_rows":$rows,"max_state_bytes":$bytes}"""
        }.mkString("{", ",", "}")
        println(f"""{"query":"$q","provider":"$provider","wall_sec":$wall%.1f,"state_operators":$ops}""")
      } finally spark.streams.removeListener(listener)
    }
    spark.stop()
  }
}
