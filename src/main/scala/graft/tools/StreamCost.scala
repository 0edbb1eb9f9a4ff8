package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measures whether the round-13 exactly-once machinery's per-trigger
 * cost AMORTIZES with batch size — the claim PLANS_r13 makes: the
 * extra ~1.3 s/trigger (pinned key frames, prefix collect, partitioned
 * writes) is fixed latency, so a 10× batch should cost far less than
 * 10× the wall.
 *
 * Runs dedupLinesStream end to end (empty seed index, 3 ordered file
 * slices) over the sf0.1 documents corpus at 1× and at 10× (per-copy
 * token suffixes so line keys truly grow 10×) and prints total and
 * per-trigger walls.
 *
 * Usage: runMain graft.tools.StreamCost [sfDir]
 */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(col("text"), "([.!?]) ", "$1\n").as("text"))

    for (scale <- Seq(1, 10)) {
      val docs =
        if (scale == 1) docs0
        else (0 until scale).map(i => docs0
            .select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
              array_join(transform(split(col("text"), " "),
                t => concat(t, lit(s"c$i"))), " ").as("text")))
          .reduce(_ unionByName _)
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_scost$scale").toString
      graft.pipeline.Dedup.writeLineIndex(docs.limit(0), "text", "doc_id",
        s"$base/idx", "\n", minChars = 12)
      // 3 id-ordered single-file slices with pinned mtimes
      val n = docs.count()
      for (k <- 0 to 2) {
        val stage = s"$base/stage$k"
        docs.filter(pmod(col("doc_id"), lit(3)) === k).repartition(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val tgt = new java.io.File(s"$base/feed", f"slice-$k%03d.parquet")
        tgt.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, tgt.toPath)
        assert(tgt.setLastModified(1700000000000L + k * 60000L))
      }
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val counter = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(counter)
      val t0 = System.nanoTime()
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      val q = graft.streaming.StreamOps.dedupLinesStream(spark, stream,
        "text", "doc_id", s"$base/idx", s"$base/out", s"$base/ckpt")
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(counter)
      val out = spark.read.parquet(s"$base/out/data").count()
      println(f"SCOST scale=${scale}%2d docs=$n%8d out=$out%8d " +
        f"wall=${wall}%7.2f s  per-trigger=${wall / 3}%6.2f s  " +
        f"jobs/trigger=${jobs.get / 3.0}%5.1f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }

    // curateStream: the sink whose per-trigger driver-synced probes the
    // round-14 fold targets (the totals max-batch agg+collect became a
    // dir listing) — jobs/trigger is the crisp metric, wall the effect
    {
      val base = java.nio.file.Files
        .createTempDirectory("graft_scost_curate").toString
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
      graft.pipeline.Dedup.writeMinhashIndex(docs.limit(0), "text",
        "doc_id", s"$base/idx")
      val n = docs.count()
      for (k <- 0 to 2) {
        val stage = s"$base/stage$k"
        docs.filter(pmod(col("doc_id"), lit(3)) === k).repartition(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val tgt = new java.io.File(s"$base/feed", f"slice-$k%03d.parquet")
        tgt.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, tgt.toPath)
        assert(tgt.setLastModified(1700000000000L + k * 60000L))
      }
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val counter = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(counter)
      val t0 = System.nanoTime()
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      val q = graft.streaming.StreamOps.curateStream(spark, stream,
        "text", "doc_id", s"$base/idx", s"$base/out", s"$base/ckpt",
        graft.pipeline.Curate.Config(minQuality = 0.5, langs = Seq("en"),
          nearDupJaccard = 0.8, packTokens = 512, shards = 8))
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(counter)
      val out = spark.read.parquet(s"$base/out/data").count()
      println(f"SCOST curate docs=$n%8d out=$out%8d " +
        f"wall=${wall}%7.2f s  per-trigger=${wall / 3}%6.2f s  " +
        f"jobs/trigger=${jobs.get / 3.0}%5.1f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
    spark.stop()
  }
}
