package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-14 log-structured contracts: multi-log committed-prefix
  * reads, the trigger/compaction lease, and IN-PLACE compaction under a
  * LIVE stream. */
class LogStructuredSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-logstructured-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def rm(base: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))

  test("readCommitted gates every log of a multi-log sink to the common " +
       "fully-committed batch") {
    import spark.implicits._
    val base = tmp("graft_readcomm")
    try {
      val rows = Seq(1L -> "a").toDF("k", "v")
      // batch 0 and 1 committed in both logs; batch 2 is MID-FLIGHT —
      // its data partition landed, its index partition has not
      for (b <- 0L to 1L) {
        LogStructuredSink.write(rows, s"$base/data", b)
        LogStructuredSink.write(rows, s"$base/idx", b)
      }
      LogStructuredSink.write(rows, s"$base/data", 2L)
      val Some(Seq(data, idx)) =
        LogStructuredSink.readCommitted(spark, Seq(s"$base/data", s"$base/idx"))
          : @unchecked
      assert(data.select("__batch").distinct().as[Long].collect().toSet ==
        Set(0L, 1L), "data not gated to the committed prefix")
      assert(idx.select("__batch").distinct().as[Long].collect().toSet ==
        Set(0L, 1L))
      // a log that does not exist yet → nothing is fully committed
      assert(LogStructuredSink.readCommitted(spark,
        Seq(s"$base/data", s"$base/missing")).isEmpty)
      // driver-side listings agree with the layout
      assert(LogStructuredSink.maxBatch(spark, s"$base/data").contains(2L))
      assert(LogStructuredSink.maxBatchBefore(spark, s"$base/data", 2L)
        .contains(1L))
      assert(LogStructuredSink.maxBatchBefore(spark, s"$base/data", 0L).isEmpty)
      assert(LogStructuredSink.maxBatch(spark, s"$base/missing").isEmpty)
    } finally rm(base)
  }

  test("readHeavyHitters: a data partition racing ahead of its cms cells " +
       "is invisible — both logs read the identical committed snapshot") {
    import spark.implicits._
    val base = tmp("graft_hhgate")
    try {
      val mk = (n: Int, tag: String) =>
        (Seq.fill(n)("hot") ++ (0 until 8).map(i => s"$tag$i")).toDF("k")
      for (b <- 0 to 1) {
        LogStructuredSink.write(mk(20, s"b$b"), s"$base/state/data", b.toLong)
        LogStructuredSink.write(
          graft.pipeline.Stats.cmsCellFrame(mk(20, s"b$b"), "k", 4, 512),
          s"$base/state/cms", b.toLong)
      }
      def hh() = StreamOps.readHeavyHitters(spark, s"$base/state", "k", 0.3)
        .as[(String, Long)].collect().toSet
      val committed = hh()
      assert(committed == Set("hot" -> 40L))
      // simulate an in-flight trigger: batch 2's data landed (300 rows of
      // a NEW hitter), its cells have not — the read must not move: the
      // new rows would inflate totals while pass 1 cannot see their cells
      LogStructuredSink.write(mk(300, "b2"), s"$base/state/data", 2L)
      assert(hh() == committed,
        "in-flight data partition leaked into the read view")
      // cells land → the batch is committed → the view advances
      LogStructuredSink.write(
        graft.pipeline.Stats.cmsCellFrame(mk(300, "b2"), "k", 4, 512),
        s"$base/state/cms", 2L)
      assert(hh() == Set("hot" -> 340L))
    } finally rm(base)
  }

  test("withLease: contenders serialize; a crashed holder's stale lease " +
       "is broken after its ttl") {
    val base = tmp("graft_lease")
    try {
      val log = s"$base/idx"
      @volatile var inside = 0
      @volatile var maxInside = 0
      val threads = (0 until 4).map(_ => new Thread(() =>
        LogStructuredSink.withLease(spark, log) {
          inside += 1
          maxInside = math.max(maxInside, inside)
          Thread.sleep(120)
          inside -= 1
        }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(maxInside == 1, s"lease admitted $maxInside holders at once")
      // lease file is a SIBLING (the log dir itself must not be created
      // by lease traffic — an empty dir would flip existence probes)
      assert(!new java.io.File(log).exists())
      // stale lease: a dead holder's file older than staleMs is broken
      val lease = new java.io.File(s"$base/idx.__lease")
      assert(lease.getParentFile.exists())
      java.nio.file.Files.writeString(lease.toPath, "dead-holder")
      assert(lease.setLastModified(System.currentTimeMillis() - 10000))
      var ran = false
      LogStructuredSink.withLease(spark, log, staleMs = 1000L) { ran = true }
      assert(ran && !lease.exists())
    } finally rm(base)
  }

  test("compactLive: folds only the committed prefix, stamps the newest " +
       "folded id, sweeps stale coarser prefix dirs") {
    import spark.implicits._
    val base = tmp("graft_compactlive")
    try {
      val path = s"$base/idx"
      def slice(tag: String, n: Int) =
        (0 until n).map(i => f"$tag$i%02d").toDF("__h")
      for (b <- 0L to 2L)
        LogStructuredSink.write(
          slice(s"${"abc".charAt(b.toInt)}", 4)
            .withColumn("__pfx", substring(col("__h"), 1, 1)),
          path, b, Seq("__pfx"))
      val n = graft.streaming.LogStructuredSink.compactLive(spark, path,
        df => df.select("__h").distinct()
          .withColumn("__pfx", substring(col("__h"), 1, 3)),
        subPartitionCols = Seq("__pfx"),
        staleSubDir = nm => nm.length != "__pfx=".length + 3)
      // batches 0 and 1 folded (8 digests); batch 2 — the only partition
      // that could belong to an uncommitted attempt — is untouched
      assert(n.contains(8L))
      val ids = LogStructuredSink.listBatches(spark, path).get.sorted
      assert(ids == Seq(1L, 2L), s"unexpected partitions $ids")
      // the stamp partition holds ONLY the 3-hex re-lay (1-hex swept)
      val sub = new java.io.File(s"$path/__batch=1").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(sub.nonEmpty && sub.forall(_.length == "__pfx=".length + 3), sub)
      // read view preserved exactly: distinct digests unchanged
      assert(spark.read.parquet(path).select("__h").distinct().count() == 12L)
      // fewer than two partitions → nothing safely foldable
      assert(LogStructuredSink.compactLive(spark, s"$base/one",
        df => df).isEmpty)
      LogStructuredSink.write(slice("z", 2)
        .withColumn("__pfx", substring(col("__h"), 1, 1)),
        s"$base/one", 0L, Seq("__pfx"))
      assert(LogStructuredSink.compactLive(spark, s"$base/one",
        df => df.select("__h").distinct()
          .withColumn("__pfx", substring(col("__h"), 1, 3)),
        Seq("__pfx")).isEmpty)
    } finally rm(base)
  }

  test("compactSpanIndexLive DURING a running duplicateSpansStream: " +
       "span output and digest view are bit-identical to the " +
       "uncompacted run") {
    import spark.implicits._
    val run = "w1 w2 w3 w4 w5 w6 w7 w8" // the recurring 8-token run
    def publish(base: String): Unit = {
      // six slices: the run recurs in slices 0, 2 and 5 (cross-batch
      // duplicate spans), each slice also carries unique filler docs
      val slices = (0 until 6).map { k =>
        val extra = (0 until 3).map(j =>
          (100L * k + j) -> s"u${k}_${j}a u${k}_${j}b u${k}_${j}c u${k}_${j}d u${k}_${j}e u${k}_${j}f u${k}_${j}g u${k}_${j}h")
        val dup = if (Set(0, 2, 5)(k))
          Seq((1000L + k) -> s"pre$k $run post$k") else Seq.empty
        k -> (extra ++ dup)
      }
      for ((k, rows) <- slices) {
        val stage = s"$base/stage$k"
        rows.toDF("doc_id", "text").repartition(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val tgt = new java.io.File(s"$base/feed", f"slice-$k%03d.parquet")
        tgt.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, tgt.toPath)
        assert(tgt.setLastModified(1700000000000L + k * 60000L))
      }
    }
    def drain(base: String, compactWhileLive: Boolean): Int = {
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      val q = StreamOps.duplicateSpansStream(spark, stream, "text",
        "doc_id", 8, s"$base/index", s"$base/out", s"$base/ckpt")
      @volatile var folds = 0
      val ticker =
        if (!compactWhileLive) None
        else Some(new Thread(() =>
          while (q.isActive) {
            try {
              if (graft.pipeline.Dedup.compactSpanIndexLive(spark,
                  s"$base/index").isDefined && q.isActive) folds += 1
            } catch { case _: Throwable => () } // racing shutdown only
            Thread.sleep(40)
          }))
      ticker.foreach(_.start())
      try q.processAllAvailable()
      finally { q.stop(); ticker.foreach(_.join()) }
      folds
    }
    def spans(base: String) = spark.read.parquet(s"$base/out")
      .select("doc_id", "span_start", "span_end", "span_len")
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    def digests(base: String) = spark.read.parquet(s"$base/index")
      .select("__h").distinct().as[String].collect().toSet
    val plain = tmp("graft_spanlive_ref")
    val live = tmp("graft_spanlive")
    try {
      publish(plain); publish(live)
      drain(plain, compactWhileLive = false)
      val folds = drain(live, compactWhileLive = true)
      assert(folds >= 1, "no compaction actually ran while the stream " +
        "was live — the race was not exercised")
      assert(spans(live) == spans(plain),
        "live compaction changed the span output")
      assert(digests(live) == digests(plain),
        "live compaction lost or invented digests")
      // the run recurred: slices 2 and 5 flag their 8-token copy
      assert(spans(plain).filter(_._1 >= 1000L) ==
        Seq((1002L, 2L, 9L, 8L), (1005L, 2L, 9L, 8L)))
      // one more compaction after shutdown, then the probe still prunes:
      // a final fold leaves ≤ 2 partitions and the view is unchanged
      graft.pipeline.Dedup.compactSpanIndexLive(spark, s"$live/index")
      assert(digests(live) == digests(plain))
    } finally { rm(plain); rm(live) }
  }

  test("compactLineIndexLive under a live dedupLinesStream keeps the " +
       "surviving-document view identical") {
    import spark.implicits._
    def publish(base: String): Unit = {
      val slices = (0 until 5).map { k =>
        // "shared line" recurs in every slice; each slice adds unique lines
        k -> Seq((10L * k) ->
          s"shared line never survives twice\nunique $k alpha beta gamma\nunique $k delta")
      }
      for ((k, rows) <- slices) {
        val stage = s"$base/stage$k"
        rows.toDF("doc_id", "text").repartition(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val tgt = new java.io.File(s"$base/feed", f"slice-$k%03d.parquet")
        tgt.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, tgt.toPath)
        assert(tgt.setLastModified(1700000000000L + k * 60000L))
      }
    }
    def drain(base: String, compactWhileLive: Boolean): Int = {
      graft.pipeline.Dedup.writeLineIndex(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "text", "doc_id", s"$base/seed", minChars = 4)
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      val q = StreamOps.dedupLinesStream(spark, stream, "text", "doc_id",
        s"$base/seed", s"$base/out", s"$base/ckpt")
      @volatile var folds = 0
      val ticker =
        if (!compactWhileLive) None
        else Some(new Thread(() =>
          while (q.isActive) {
            try {
              if (graft.pipeline.Dedup.compactLineIndexLive(spark,
                  s"$base/out/_lineindex").isDefined && q.isActive) folds += 1
            } catch { case _: Throwable => () } // racing shutdown only
            Thread.sleep(40)
          }))
      ticker.foreach(_.start())
      try q.processAllAvailable()
      finally { q.stop(); ticker.foreach(_.join()) }
      folds
    }
    def survivors(base: String) =
      StreamOps.readDedupedLines(spark, s"$base/out").get
        .select("doc_id", "text").orderBy("doc_id")
        .as[(Long, String)].collect().toSeq
    val plain = tmp("graft_linelive_ref")
    val live = tmp("graft_linelive")
    try {
      publish(plain); publish(live)
      drain(plain, compactWhileLive = false)
      val folds = drain(live, compactWhileLive = true)
      assert(folds >= 1, "no live fold ran — the race was not exercised")
      assert(survivors(live) == survivors(plain),
        "live line-index compaction changed the deduped corpus")
      // the shared line survived exactly once — in slice 0's document
      val texts = survivors(plain).map(_._2)
      assert(texts.count(_.contains("shared line")) == 1)
      assert(texts.head.contains("shared line"))
    } finally { rm(plain); rm(live) }
  }

  test("compactHllIndexLive DURING a running distinctCountStream: the " +
       "register read view stays bit-identical") {
    import spark.implicits._
    def publish(base: String): Unit = {
      val slices = (0 until 5).map(k =>
        k -> (k * 800 until k * 800 + 1600).map(i => s"u-$i")) // overlaps
      for ((k, rows) <- slices) {
        val stage = s"$base/stage$k"
        rows.toDF("k").repartition(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val tgt = new java.io.File(s"$base/feed", f"slice-$k%03d.parquet")
        tgt.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, tgt.toPath)
        assert(tgt.setLastModified(1700000000000L + k * 60000L))
      }
    }
    def drain(base: String, compactWhileLive: Boolean): Int = {
      val stream = spark.readStream.schema("k STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      val q = StreamOps.distinctCountStream(spark, stream, "k",
        s"$base/idx", s"$base/ckpt")
      @volatile var folds = 0
      val ticker =
        if (!compactWhileLive) None
        else Some(new Thread(() =>
          while (q.isActive) {
            try {
              if (graft.pipeline.Stats.compactHllIndexLive(spark,
                  s"$base/idx").isDefined && q.isActive) folds += 1
            } catch { case _: Throwable => () } // racing shutdown only
            Thread.sleep(40)
          }))
      ticker.foreach(_.start())
      try q.processAllAvailable()
      finally { q.stop(); ticker.foreach(_.join()) }
      folds
    }
    def view(base: String) = graft.pipeline.Stats
      .readHllDistinct(spark, s"$base/idx").collect().toSeq
    val plain = tmp("graft_hlllive_ref")
    val live = tmp("graft_hlllive")
    try {
      publish(plain); publish(live)
      drain(plain, compactWhileLive = false)
      val folds = drain(live, compactWhileLive = true)
      assert(folds >= 1, "no live fold ran — the race was not exercised")
      assert(view(live) == view(plain),
        "live register compaction changed the estimate frame")
      // p metadata survived the re-lays
      assert(spark.read.parquet(s"$live/idx").schema("__b").metadata
        .getLong("p") == 12L)
    } finally { rm(plain); rm(live) }
  }

  test("latestPerKey ttl: a LATE straggler after expiry is dropped, " +
       "never re-seeded as the key's best") {
    import spark.implicits._
    import scala.concurrent.duration._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamOps.Change]
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val q = StreamOps.latestPerKey(input.toDS(), ttl = Some(30.minutes),
        watermarkDelay = "1 minute")
      .writeStream.outputMode("update")
      .format("memory").queryName("latest_ttl_late").start()
    def emitted() = spark.sql("SELECT key, value FROM latest_ttl_late")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    def stateRows() = q.lastProgress.stateOperators(0).numRowsTotal
    try {
      input.addData(
        StreamOps.Change(1L, ts("2024-01-01 10:00:00"), "v1"),
        StreamOps.Change(2L, ts("2024-01-01 10:00:00"), "v2"))
      q.processAllAvailable()
      // advance the watermark far past key 1's ttl horizon via key 2,
      // plus one more trigger so the timeout actually fires
      input.addData(StreamOps.Change(2L, ts("2024-01-01 12:00:00"), "v2b"))
      q.processAllAvailable()
      input.addData(StreamOps.Change(2L, ts("2024-01-01 12:00:30"), "v2c"))
      q.processAllAvailable()
      assert(stateRows() == 1L, "expired key still in store")
      val before = emitted()
      // the straggler: key 1 at 10:05, far below the ~11:59 watermark.
      // Unfiltered, it would re-seed key 1's empty state and be EMITTED
      // as the best — where one trigger earlier it would have lost to
      // the standing v1 (arrival-window-dependent output). It must be
      // dropped: nothing new emitted, no state row re-created.
      input.addData(StreamOps.Change(1L, ts("2024-01-01 10:05:00"), "ghost"))
      q.processAllAvailable()
      assert(emitted() == before, "late straggler was emitted")
      assert(stateRows() == 1L, "late straggler re-seeded expired state")
      // a NON-late re-arrival still restarts the key cleanly
      input.addData(StreamOps.Change(1L, ts("2024-01-01 12:30:00"), "fresh"))
      q.processAllAvailable()
      assert(emitted().last == ((1L, "fresh")))
      assert(stateRows() == 2L)
    } finally q.stop()
  }
}
