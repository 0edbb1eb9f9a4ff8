package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The auto-compaction listing-growth contract: a log-structured sink
 * with `compactEvery` on must keep its root partition count BOUNDED
 * over a 100+-trigger run — a 1-trigger/min stream must not leave ~43k
 * dirs/month for an operator to clean up — across a restart, with the
 * read view exact throughout. Per-trigger WALL flatness at real batch
 * sizes is the bench tool's job ([[graft.tools.CompactionSoak]],
 * numbers in BENCH_SF1.md); this pins the layout invariants.
 */
class AutoCompactionSoakSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-autocompact-soak-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("104-trigger distinctCountStream with compactEvery=8: root " +
       "partitions stay bounded across a mid-run restart and the " +
       "estimate stays exact") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_autocompact_soak").toString
    try {
      val nSlices = 104
      def publish(k: Int): Unit = {
        val stage = s"$base/stage"
        (k * 10 until k * 10 + 25).map(i => s"v-$i").toDF("k")
          .repartition(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val tgt = new java.io.File(s"$base/feed", f"slice-$k%03d.parquet")
        tgt.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, tgt.toPath)
        assert(tgt.setLastModified(1700000000000L + k * 60000L))
      }
      def start() = {
        val stream = spark.readStream.schema("k STRING")
          .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
        StreamOps.distinctCountStream(spark, stream, "k",
          s"$base/idx", s"$base/ckpt",
          compactEvery = 8, compactRetainMs = 1000L)
      }
      // cadence 8 + a 1 s retention lagging ~4 fast triggers behind:
      // the standing bound is cadence + retention backlog + the
      // uncompacted tail — far under the unbounded 104
      val bound = 32
      (0 until nSlices / 2).foreach(publish)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      val afterFirst = LogStructuredSink
        .listBatches(spark, s"$base/idx").get.size
      assert(afterFirst <= bound,
        s"first half left $afterFirst root partitions (bound $bound)")
      assert(LogStructuredSink.currentGen(spark, s"$base/idx").isDefined,
        "auto-compaction never published a generation")
      // restart from the same checkpoint over the second half
      (nSlices / 2 until nSlices).foreach(publish)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val parts = LogStructuredSink.listBatches(spark, s"$base/idx").get
      assert(parts.size <= bound,
        s"soak left ${parts.size} root partitions (bound $bound)")
      // batch ids CONTINUED across the restart (one log, one lineage)
      assert(parts.max >= (nSlices - 1).toLong)
      // total data files bounded too — the small-file tax is the point
      val files = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(s"$base/idx"),
          Array("parquet"), true).size
      assert(files <= bound + 8,
        s"soak left $files parquet files under the log")
      // the read view is EXACT vs the one-shot sketch over the union
      val all = (0 until nSlices)
        .flatMap(k => k * 10 until k * 10 + 25).map(i => s"v-$i").toDF("k")
      val expected = graft.pipeline.Stats.hllDistinct(all, "k")
        .select("distinct_est").as[Double].collect().head
      val got = graft.pipeline.Stats.readHllDistinct(spark, s"$base/idx")
        .select("distinct_est").as[Double].collect().head
      assert(got == expected,
        s"soaked log estimate $got != one-shot $expected")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base))
  }
}
