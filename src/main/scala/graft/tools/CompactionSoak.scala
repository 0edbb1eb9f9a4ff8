package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Soak the auto-compaction hook at bench scale: drive
 * `duplicateSpansStream` (the heaviest log-structured sink — per-trigger
 * standing-index probe + two partitioned writes) over 120 single-file
 * triggers of sf-dir documents with `compactEvery = 10`, and print
 *
 *  - per-trigger wall for the first vs last quartile of triggers (the
 *    flatness claim: without compaction the per-trigger listing and the
 *    probe's uncompacted tail grow with trigger count; with the cadence
 *    on, late triggers must not cost more than early ones beyond batch
 *    noise),
 *  - root partition dir / parquet file counts of the digest log at end
 *    (the boundedness claim),
 *
 * one line per config (off vs on) for BENCH_SF1.md.
 *
 * Usage: runMain graft.tools.CompactionSoak [sfDir] [triggers]
 */
object CompactionSoak {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nTrig = args.drop(1).headOption.map(_.toInt).getOrElse(120)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))

    for (compactEvery <- Seq(0, 10)) {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_csoak$compactEvery").toString
      for (k <- 0 until nTrig) {
        val stage = s"$base/stage"
        docs.filter(pmod(col("doc_id"), lit(nTrig)) === k).repartition(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val tgt = new java.io.File(s"$base/feed", f"slice-$k%04d.parquet")
        tgt.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, tgt.toPath)
        require(tgt.setLastModified(1700000000000L + k * 60000L))
      }
      val walls = new java.util.concurrent.ConcurrentLinkedQueue[Long]
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0)
            walls.add(e.progress.batchDuration)
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      val q = graft.streaming.StreamOps.duplicateSpansStream(spark, stream,
        "text", "doc_id", 8, s"$base/index", s"$base/out", s"$base/ckpt",
        compactEvery = compactEvery, compactRetainMs = 5000L)
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.streams.removeListener(listener)
      val ws = walls.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      val quart = math.max(ws.length / 4, 1)
      val first = ws.take(quart).sum / 1000.0 / quart
      val last = ws.takeRight(quart).sum / 1000.0 / quart
      val dirs = graft.streaming.LogStructuredSink
        .listBatches(spark, s"$base/index").get.size
      val files = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(s"$base/index"),
          Array("parquet"), true).size
      val spans = spark.read.parquet(s"$base/out")
        .count() // output invariant across configs
      println(f"CSOAK compactEvery=$compactEvery%2d triggers=${ws.length}%3d " +
        f"wall=${wall}%7.1f s first-quartile=${first}%6.2f s/trig " +
        f"last-quartile=${last}%6.2f s/trig rootDirs=$dirs%4d " +
        f"files=$files%5d spans=$spans%7d")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
    spark.stop()
  }
}
