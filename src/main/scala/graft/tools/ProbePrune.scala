package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measures the duplicateSpansStream standing-probe read bytes under the
 * round-13 prefix layouts — the "per-trigger read cost vs standing-index
 * size" datapoint the round-12 verdict asked for.
 *
 * Builds the gram-digest index at 1× and 10× corpus size (sf0.1
 * documents, 10× via per-copy marker tokens like make_sf1.py --perturb),
 * in both the per-batch 1-hex layout and the compacted 3-hex layout,
 * then times/measures the probe for two trigger shapes (a 1-doc
 * truncated live-gate trigger and a 3-doc micro-batch) against a full
 * unpruned scan.
 *
 * Usage: runMain graft.tools.ProbePrune [sfDir]
 */
object ProbePrune {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
    })
    def measured[A](tag: String)(f: => A): Unit = {
      bytes.set(0L); val t0 = System.nanoTime(); f
      Thread.sleep(300) // listener drain
      println(f"PROBE $tag%-42s read=${bytes.get() / 1e6}%9.2f MB  " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    // every copy's tokens get a per-copy suffix, so every l-gram is
    // distinct per copy and the standing digest set truly grows 10×
    val big = (0 until 10).map(i => docs
        .select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), "\\s+"),
            t => concat(t, lit(s"c$i"))), " ").as("text")))
      .reduce(_ unionByName _)
    val base = java.nio.file.Files.createTempDirectory("graft_probeprune").toString
    val l = 8

    def writeIdx(src: DataFrame, path: String): Unit =
      graft.streaming.LogStructuredSink.write(
        graft.pipeline.Dedup.gramHashes(src, "text", "doc_id", l)
          .select("__h").distinct()
          .withColumn("__pfx", substring(col("__h"), 1, 1)), // sink layout
        path, 0L, Seq("__pfx"))

    writeIdx(docs, s"$base/idx1")
    writeIdx(big, s"$base/idx10")
    graft.pipeline.Dedup.compactSpanIndex(spark, s"$base/idx10", s"$base/idx10c")

    // trigger shapes
    val live = docs.limit(1) // one document, truncated to ~30 tokens
      .select(col("doc_id"),
        array_join(slice(split(col("text"), "\\s+"), 1, 30), " ").as("text"))
      .localCheckpoint(true)
    val micro = docs.limit(3).localCheckpoint(true)

    def probe(idxPath: String, batch: DataFrame, prune: Boolean): Long = {
      val grams = graft.pipeline.Dedup.gramHashes(batch, "text", "doc_id", l)
        .localCheckpoint(true)
      val bh = grams.select("__h").distinct()
      val standing0 = spark.read.parquet(idxPath)
        .filter(col("__batch") < lit(99L))
      val standing = if (prune) {
        val pr = bh.select(substring(col("__h"), 1, 1).as("p1"),
          substring(col("__h"), 1, 3).as("p3")).distinct().collect()
        val pfxs = (pr.map(_.getString(0)) ++ pr.map(_.getString(1))).distinct.toSeq
        standing0.filter(col("__pfx").isin(pfxs: _*))
      } else standing0
      standing.select("__h").join(broadcast(bh), Seq("__h"), "left_semi").count()
    }

    for ((idx, tag) <- Seq("idx1" -> "1x/pfx1", "idx10" -> "10x/pfx1",
        "idx10c" -> "10x/pfx3-compacted");
        (b, bt) <- Seq(live -> "live-1doc-30tok", micro -> "micro-3docs");
        prune <- Seq(false, true))
      measured(s"$tag $bt prune=$prune")(probe(s"$base/$idx", b, prune))

    println("sizes: " + Seq("idx1", "idx10", "idx10c").map { i =>
      val sz = org.apache.commons.io.FileUtils
        .sizeOfDirectory(new java.io.File(s"$base/$i"))
      f"$i=${sz / 1e6}%.1f MB"
    }.mkString("  "))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
