package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The log-structured contracts: multi-log committed-prefix reads, the
  * trigger/compaction lease, and GENERATION-based compaction under a
  * LIVE stream — atomic marker publication, retention-deferred deletes,
  * external readers racing the compactor with no lease. */
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

  /** Publish single-file parquet feed slices with pinned mtimes. */
  private def publishSlices(base: String,
                            dfs: Seq[org.apache.spark.sql.DataFrame]): Unit =
    dfs.zipWithIndex.foreach { case (df, k) =>
      val stage = s"$base/stage$k"
      df.repartition(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val tgt = new java.io.File(s"$base/feed", f"slice-$k%03d.parquet")
      tgt.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, tgt.toPath)
      assert(tgt.setLastModified(1700000000000L + k * 60000L))
    }

  /** Drive a ticker + reader race around a draining stream: the ticker
    * fires `tick` every 40 ms; the reader calls `read` in a tight loop;
    * both keep running until the stream has drained AND the reader has
    * at least `minReads` successful reads. Returns (folds, reads,
    * reader failure). */
  private def raceDrain[R](q: org.apache.spark.sql.streaming.StreamingQuery,
                           tick: () => Boolean, read: () => Option[R],
                           minReads: Int)
      : (Int, Vector[R], Option[Throwable]) = {
    @volatile var stopTicker = false
    @volatile var folds = 0
    @volatile var failure: Option[Throwable] = None
    val results = new java.util.concurrent.ConcurrentLinkedQueue[R]
    val ticker = new Thread(() =>
      while (!stopTicker) {
        try { if (tick()) folds += 1 }
        catch { case t: Throwable => if (q.isActive) failure = Some(t) }
        Thread.sleep(40)
      })
    @volatile var stopReader = false
    val reader = new Thread(() =>
      while (!stopReader && failure.isEmpty) {
        try read().foreach(results.add)
        catch { case t: Throwable => failure = Some(t) }
      })
    ticker.start(); reader.start()
    try q.processAllAvailable()
    finally q.stop()
    // keep racing reader vs ticker until the read quota is met, and
    // require ≥ 1 read AFTER the drain so the last result reflects the
    // fully-committed log
    val atDrain = results.size
    val quota = math.max(minReads, atDrain + 1)
    val deadline = System.currentTimeMillis() + 60000L
    while (results.size < quota && failure.isEmpty &&
           System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    stopReader = true; reader.join()
    stopTicker = true; ticker.join()
    (folds, results.toArray.toVector.asInstanceOf[Vector[R]], failure)
  }

  test("readCommitted gates every log of a multi-log sink to the common " +
       "fully-committed batch — and an EMPTY batch still commits") {
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
      // an EMPTY batch 2 write on the idx log still commits its
      // partition (a zero-row marker file), so the gate advances to 2
      // instead of trailing forever behind nonempty writes
      LogStructuredSink.write(rows.limit(0), s"$base/idx", 2L)
      assert(LogStructuredSink.maxBatch(spark, s"$base/idx").contains(2L))
      val Some(Seq(data2, idx2)) =
        LogStructuredSink.readCommitted(spark, Seq(s"$base/data", s"$base/idx"))
          : @unchecked
      assert(data2.select("__batch").distinct().as[Long].collect().toSet ==
        Set(0L, 1L, 2L), "empty-batch commit did not advance the gate")
      assert(idx2.filter(col("__batch") === 2L).count() == 0L)
      // empty commit with SUB-partition columns keeps one directory
      // depth (a dummy __empty level), so partition discovery still works
      LogStructuredSink.write(
        rows.withColumn("__pfx", lit("z")).limit(0),
        s"$base/sub", 0L, Seq("__pfx"))
      LogStructuredSink.write(
        rows.withColumn("__pfx", lit("z")),
        s"$base/sub", 1L, Seq("__pfx"))
      assert(spark.read.parquet(s"$base/sub").count() == 1L)
      assert(LogStructuredSink.maxBatch(spark, s"$base/sub").contains(1L))
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
       "is broken after its ttl; breaker corpses are swept") {
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
      // stale lease: a dead holder's file older than staleMs is broken;
      // a stranded breaker corpse is swept by the next acquisition
      val lease = new java.io.File(s"$base/idx.__lease")
      assert(lease.getParentFile.exists())
      java.nio.file.Files.writeString(lease.toPath, "dead-holder")
      assert(lease.setLastModified(System.currentTimeMillis() - 10000))
      val corpse = new java.io.File(s"$base/idx.__lease.stale-deadbeef")
      java.nio.file.Files.writeString(corpse.toPath, "stranded")
      var ran = false
      LogStructuredSink.withLease(spark, log, staleMs = 1000L) { ran = true }
      assert(ran && !lease.exists())
      assert(!corpse.exists(), "stranded breaker corpse not swept")
    } finally rm(base)
  }

  test("withLease: a LIVE holder outlasting staleMs is never broken (the " +
       "heartbeat), and release is token-verified — a usurped holder " +
       "cannot delete its successor's lease") {
    val base = tmp("graft_lease_live")
    try {
      val log = s"$base/idx"
      // live holder runs 3× the stale ttl: the mtime heartbeat
      // (staleMs / 3) must keep contenders out for the WHOLE body
      @volatile var overlap = false
      @volatile var inside = false
      val holder = new Thread(() =>
        LogStructuredSink.withLease(spark, log, staleMs = 300L) {
          inside = true; Thread.sleep(1000); inside = false
        })
      val contender = new Thread(() =>
        LogStructuredSink.withLease(spark, log, staleMs = 300L) {
          if (inside) overlap = true
        })
      holder.start(); Thread.sleep(100); contender.start()
      holder.join(); contender.join()
      assert(!overlap,
        "contender broke a LIVE long-running holder's lease")
      // token-verified release: after a (forced) usurpation, the old
      // holder's release must leave the new holder's lease file alone
      val lease = new java.io.File(s"$base/idx.__lease")
      val t = new Thread(() =>
        LogStructuredSink.withLease(spark, log, staleMs = 60000L) {
          // simulate the usurpation: replace the lease content with a
          // different token mid-body (as a breaker + new holder would)
          java.nio.file.Files.writeString(lease.toPath, "successor-token")
        })
      t.start(); t.join()
      assert(lease.exists(),
        "release deleted a lease it no longer owned")
      assert(java.nio.file.Files.readString(lease.toPath) == "successor-token")
    } finally rm(base)
  }

  test("compactLive: generation fold covers only the committed prefix, " +
       "publishes with an atomic marker, and defers deletes by retention") {
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
      def distinctView() = LogStructuredSink.readLog(spark, path).get
        .select("__h").distinct().count()
      // fold with retention = ∞: batches 0 and 1 fold (8 digests); batch
      // 2 — the only partition that could belong to an uncommitted
      // attempt — is untouched; NOTHING is deleted yet
      val n = LogStructuredSink.compactLive(spark, path,
        df => df.select("__h").distinct()
          .withColumn("__pfx", substring(col("__h"), 1, 3)),
        subPartitionCols = Seq("__pfx"), retainMs = Long.MaxValue)
      assert(n.contains(8L))
      val g1 = LogStructuredSink.currentGen(spark, path).get
      assert(g1.gen == 1L && g1.stamp == 1L, s"unexpected marker $g1")
      assert(LogStructuredSink.listBatches(spark, path).get.sorted ==
        Seq(0L, 1L, 2L), "retention did not defer the root deletes")
      // the generation dir holds ONLY the 3-hex re-lay
      val sub = new java.io.File(LogStructuredSink.genDir(path, 1L))
        .listFiles().filter(_.isDirectory).map(_.getName).toSeq
      assert(sub.nonEmpty && sub.forall(_.length == "__pfx=".length + 3), sub)
      // the read view is exact: gen ∪ root>stamp, no double-read of the
      // fold window even though the raw partitions still exist
      assert(distinctView() == 12L)
      assert(LogStructuredSink.maxBatch(spark, path).contains(2L))
      // readBefore(2) = the folded prefix exactly
      assert(LogStructuredSink.readBefore(spark, path, 2L).get
        .select("__h").distinct().count() == 8L)
      // a second pass with retainMs = 0: nothing new to fold (only the
      // newest remains beyond the stamp) but the sweep now runs — root
      // partitions ≤ stamp go, the generation stays, view unchanged
      assert(LogStructuredSink.compactLive(spark, path,
        df => df.select("__h").distinct()
          .withColumn("__pfx", substring(col("__h"), 1, 3)),
        subPartitionCols = Seq("__pfx"), retainMs = 0L).isEmpty)
      assert(LogStructuredSink.listBatches(spark, path).get.sorted ==
        Seq(2L), "expired root partitions not swept")
      assert(distinctView() == 12L)
      // batch 3 arrives; a third fold chains gen-2 from gen-1 ∪ batch 2,
      // stamps 2, and the immediate sweep drops gen-1 + its marker
      LogStructuredSink.write(
        slice("d", 4).withColumn("__pfx", substring(col("__h"), 1, 1)),
        path, 3L, Seq("__pfx"))
      val n2 = LogStructuredSink.compactLive(spark, path,
        df => df.select("__h").distinct()
          .withColumn("__pfx", substring(col("__h"), 1, 3)),
        subPartitionCols = Seq("__pfx"), retainMs = 0L)
      assert(n2.contains(12L))
      val g2 = LogStructuredSink.currentGen(spark, path).get
      assert(g2.gen == 2L && g2.stamp == 2L)
      assert(!new java.io.File(LogStructuredSink.genDir(path, 1L)).exists(),
        "superseded generation not swept")
      assert(LogStructuredSink.listBatches(spark, path).get.sorted ==
        Seq(3L))
      assert(distinctView() == 16L)
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
       "span output and digest view bit-identical to the uncompacted " +
       "run, and an UNLEASED external reader racing the 40 ms compactor " +
       "never fails and never under-reads") {
    import spark.implicits._
    val run = "w1 w2 w3 w4 w5 w6 w7 w8" // the recurring 8-token run
    def publish(base: String): Unit =
      publishSlices(base, (0 until 6).map { k =>
        val extra = (0 until 3).map(j =>
          (100L * k + j) -> s"u${k}_${j}a u${k}_${j}b u${k}_${j}c u${k}_${j}d u${k}_${j}e u${k}_${j}f u${k}_${j}g u${k}_${j}h")
        val dup = if (Set(0, 2, 5)(k))
          Seq((1000L + k) -> s"pre$k $run post$k") else Seq.empty
        (extra ++ dup).toDF("doc_id", "text")
      })
    def start(base: String) = {
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      StreamOps.duplicateSpansStream(spark, stream, "text",
        "doc_id", 8, s"$base/index", s"$base/out", s"$base/ckpt")
    }
    def spans(base: String) = spark.read.parquet(s"$base/out")
      .select("doc_id", "span_start", "span_end", "span_len")
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    def digests(base: String) = LogStructuredSink
      .readLog(spark, s"$base/index").get
      .select("__h").distinct().as[String].collect().toSet
    val plain = tmp("graft_spanlive_ref")
    val live = tmp("graft_spanlive")
    try {
      publish(plain); publish(live)
      val qp = start(plain)
      try qp.processAllAvailable() finally qp.stop()
      val q = start(live)
      val (folds, reads, failure) = raceDrain[Set[(Long, Long, Long, Long)]](
        q,
        () => graft.pipeline.Dedup
          .compactSpanIndexLive(spark, s"$live/index").isDefined,
        () => StreamOps.readDuplicateSpans(spark, s"$live/out",
            s"$live/index")
          .map(_.select("doc_id", "span_start", "span_end", "span_len")
            .as[(Long, Long, Long, Long)].collect().toSet),
        minReads = 50)
      assert(failure.isEmpty, s"racing reader failed: $failure")
      assert(folds >= 1, "no compaction actually ran while the stream " +
        "was live — the race was not exercised")
      assert(reads.size >= 50, s"only ${reads.size} interleaved reads")
      // no under-read: the committed view only ever GROWS — every read
      // is a superset of every earlier read
      reads.sliding(2).foreach {
        case Vector(a, b) => assert(a.subsetOf(b),
          s"committed span view shrank between reads: ${a -- b} vanished")
        case _ => ()
      }
      assert(reads.last == spans(plain).toSet,
        "final committed view missed spans")
      assert(spans(live) == spans(plain),
        "live compaction changed the span output")
      assert(digests(live) == digests(plain),
        "live compaction lost or invented digests")
      // the run recurred: slices 2 and 5 flag their 8-token copy
      assert(spans(plain).filter(_._1 >= 1000L) ==
        Seq((1002L, 2L, 9L, 8L), (1005L, 2L, 9L, 8L)))
      // one more compaction after shutdown with IMMEDIATE sweep: the
      // superseded raw partitions go, the view is unchanged
      graft.pipeline.Dedup.compactSpanIndexLive(spark, s"$live/index",
        retainMs = 0L)
      assert(digests(live) == digests(plain))
    } finally { rm(plain); rm(live) }
  }

  test("compactLineIndexLive under a live dedupLinesStream keeps the " +
       "surviving-document view identical; racing external reads of the " +
       "committed view never fail or shrink") {
    import spark.implicits._
    def publish(base: String): Unit =
      publishSlices(base, (0 until 5).map { k =>
        Seq((10L * k) ->
          s"shared line never survives twice\nunique $k alpha beta gamma\nunique $k delta")
          .toDF("doc_id", "text")
      })
    def start(base: String) = {
      graft.pipeline.Dedup.writeLineIndex(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "text", "doc_id", s"$base/seed", minChars = 4)
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      StreamOps.dedupLinesStream(spark, stream, "text", "doc_id",
        s"$base/seed", s"$base/out", s"$base/ckpt")
    }
    def survivors(base: String) =
      StreamOps.readDedupedLines(spark, s"$base/out").get
        .select("doc_id", "text").orderBy("doc_id")
        .as[(Long, String)].collect().toSeq
    val plain = tmp("graft_linelive_ref")
    val live = tmp("graft_linelive")
    try {
      publish(plain); publish(live)
      val qp = start(plain)
      try qp.processAllAvailable() finally qp.stop()
      val q = start(live)
      val (folds, reads, failure) = raceDrain[Set[(Long, String)]](
        q,
        () => graft.pipeline.Dedup
          .compactLineIndexLive(spark, s"$live/out/_lineindex").isDefined,
        () => StreamOps.readDedupedLines(spark, s"$live/out")
          .map(_.select("doc_id", "text")
            .as[(Long, String)].collect().toSet),
        minReads = 50)
      assert(failure.isEmpty, s"racing reader failed: $failure")
      assert(folds >= 1, "no live fold ran — the race was not exercised")
      assert(reads.size >= 50, s"only ${reads.size} interleaved reads")
      reads.sliding(2).foreach {
        case Vector(a, b) => assert(a.subsetOf(b),
          s"committed survivor view shrank between reads")
        case _ => ()
      }
      assert(survivors(live) == survivors(plain),
        "live line-index compaction changed the deduped corpus")
      // the shared line survived exactly once — in slice 0's document
      val texts = survivors(plain).map(_._2)
      assert(texts.count(_.contains("shared line")) == 1)
      assert(texts.head.contains("shared line"))
    } finally { rm(plain); rm(live) }
  }

  test("compactHllIndexLive DURING a running distinctCountStream: the " +
       "register read view stays bit-identical; racing estimate reads " +
       "never fail and registers_set never shrinks") {
    import spark.implicits._
    def publish(base: String): Unit =
      publishSlices(base, (0 until 5).map(k =>
        (k * 800 until k * 800 + 1600).map(i => s"u-$i").toDF("k")))
    def start(base: String) = {
      val stream = spark.readStream.schema("k STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      StreamOps.distinctCountStream(spark, stream, "k",
        s"$base/idx", s"$base/ckpt")
    }
    def view(base: String) = graft.pipeline.Stats
      .readHllDistinct(spark, s"$base/idx").collect().toSeq
    val plain = tmp("graft_hlllive_ref")
    val live = tmp("graft_hlllive")
    try {
      publish(plain); publish(live)
      val qp = start(plain)
      try qp.processAllAvailable() finally qp.stop()
      val q = start(live)
      val (folds, reads, failure) = raceDrain[Long](
        q,
        () => graft.pipeline.Stats
          .compactHllIndexLive(spark, s"$live/idx").isDefined,
        () => {
          // gate on the committed frontier, not bare existence: the dir
          // appears at the first write job's START, files at its commit
          if (LogStructuredSink.maxBatch(spark, s"$live/idx").isDefined)
            Some(graft.pipeline.Stats.readHllDistinct(spark, s"$live/idx")
              .select("registers_set").as[Long].collect().head)
          else None
        },
        minReads = 50)
      assert(failure.isEmpty, s"racing reader failed: $failure")
      assert(folds >= 1, "no live fold ran — the race was not exercised")
      assert(reads.size >= 50, s"only ${reads.size} interleaved reads")
      // registers max-merge: the occupied-register count can only grow
      reads.sliding(2).foreach {
        case Vector(a, b) =>
          assert(a <= b, s"register view shrank: $a -> $b")
        case _ => ()
      }
      assert(view(live) == view(plain),
        "live register compaction changed the estimate frame")
      // p metadata survived the re-lays (via the generation-aware read)
      assert(LogStructuredSink.readLog(spark, s"$live/idx").get
        .schema("__b").metadata.getLong("p") == 12L)
    } finally { rm(plain); rm(live) }
  }

  test("compactAggStateLive: SUM-merged partials compact under a live " +
       "aggStateStream — the atomic generation flip means a racing " +
       "reader never sees a double-counted or half-folded view") {
    import spark.implicits._
    def mkSlices = (0 until 5).map(k =>
      (0 until 40).map(i => (s"k${i % 4}", (k * 40 + i).toLong))
        .toDF("k", "v"))
    def start(base: String) = {
      val stream = spark.readStream.schema("k STRING, v LONG")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      StreamOps.aggStateStream(spark, stream, Seq("k"), "v",
        s"$base/state", s"$base/ckpt")
    }
    val base = tmp("graft_agglive")
    try {
      publishSlices(base, mkSlices)
      val q = start(base)
      val truth = mkSlices.reduce(_ unionByName _)
        .groupBy("k")
        .agg(count(col("v")).as("n"), sum(col("v")).as("total"))
        .orderBy("k").as[(String, Long, Long)].collect().toSeq
      val (folds, reads, failure) = raceDrain[Int](
        q,
        () => graft.pipeline.Materialize
          .compactAggStateLive(spark, s"$base/state", Seq("k")).isDefined,
        () => {
          // the view combines partials exactly; mid-trigger the newest
          // partition may be half-committed (parquet's per-file commit),
          // so the assertion here is NO FAILURE — exactness is pinned on
          // the final drained view below
          if (LogStructuredSink.maxBatch(spark, s"$base/state").isDefined)
            Some(graft.pipeline.Materialize
              .readAggState(spark, s"$base/state", Seq("k")).count().toInt)
          else None
        },
        minReads = 50)
      assert(failure.isEmpty, s"racing reader failed: $failure")
      assert(folds >= 1, "no live fold ran — the race was not exercised")
      assert(reads.size >= 50, s"only ${reads.size} interleaved reads")
      val got = graft.pipeline.Materialize
        .readAggState(spark, s"$base/state", Seq("k"))
        .select(col("k"), col("n"), col("total"))
        .orderBy("k").as[(String, Long, Long)].collect().toSeq
      assert(got == truth, "live-compacted agg state diverged from the " +
        "one-shot aggregate over the union")
      // the fold really landed: a current generation exists and, after
      // an immediate-sweep pass, superseded partitions are gone while
      // the view is unchanged
      assert(LogStructuredSink.currentGen(spark, s"$base/state").isDefined)
      graft.pipeline.Materialize.compactAggStateLive(spark, s"$base/state",
        Seq("k"), retainMs = 0L)
      val afterSweep = graft.pipeline.Materialize
        .readAggState(spark, s"$base/state", Seq("k"))
        .select(col("k"), col("n"), col("total"))
        .orderBy("k").as[(String, Long, Long)].collect().toSeq
      assert(afterSweep == truth)
      val stamp = LogStructuredSink.currentGen(spark, s"$base/state").get.stamp
      assert(LogStructuredSink.listBatches(spark, s"$base/state").get
        .forall(_ > stamp), "swept root partitions linger below the stamp")
    } finally rm(base)
  }

  test("compactCmsIndexLive under a live heavyHittersStream: every racing " +
       "committed read is EXACT for some batch prefix (the multi-log " +
       "gate only admits fully-committed batches)") {
    import spark.implicits._
    def mkSlices = (0 until 5).map(k =>
      (Seq.fill(30)("hot") ++ Seq.fill(10)(s"warm") ++
        (0 until 8).map(i => s"b$k-$i")).toDF("pk"))
    val base = tmp("graft_cmslive")
    try {
      publishSlices(base, mkSlices)
      val stream = spark.readStream.schema("pk STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      val q = StreamOps.heavyHittersStream(spark, stream, "pk",
        s"$base/state", s"$base/ckpt", depth = 4, width = 512)
      // expected exact answers for every committed prefix length 1..5
      val prefixTruths = (1 to 5).map { j =>
        val n = j * 48.0
        Set("hot" -> (j * 30L), "warm" -> (j * 10L))
          .filter(_._2 >= n * 0.15)
      }.toSet
      val (folds, reads, failure) = raceDrain[Set[(String, Long)]](
        q,
        () => graft.pipeline.Stats
          .compactCmsIndexLive(spark, s"$base/state/cms").isDefined,
        () => {
          try Some(StreamOps.readHeavyHitters(spark, s"$base/state", "pk",
              support = 0.15).as[(String, Long)].collect().toSet)
          catch { case _: IllegalStateException => None } // pre-commit
        },
        minReads = 50)
      assert(failure.isEmpty, s"racing reader failed: $failure")
      assert(folds >= 1, "no live CMS fold ran — the race was not exercised")
      assert(reads.size >= 50, s"only ${reads.size} interleaved reads")
      reads.foreach(r => assert(prefixTruths.contains(r),
        s"racing read $r matches NO committed prefix — the fold window " +
          "leaked (double-count or partial fold)"))
      assert(reads.last == prefixTruths.maxBy(_.map(_._2).sum))
    } finally rm(base)
  }

  test("compactTopKLogLive under a live groupedTopKStream: the re-ranked " +
       "view equals the uncompacted leaderboard") {
    import spark.implicits._
    def mkSlices = (0 until 5).map(k =>
      (0 until 30).map { i =>
        val id = (k * 30 + i).toLong
        (s"t${i % 3}", id, (id * 37 % 101).toDouble)
      }.toDF("cat", "eid", "value"))
    val ord = Seq(("value", false), ("eid", true))
    val base = tmp("graft_topklive")
    try {
      publishSlices(base, mkSlices)
      val stream = spark.readStream.schema(
        "cat STRING, eid LONG, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed")
      val q = StreamOps.groupedTopKStream(spark, stream, Seq("cat"), ord,
        k = 4, s"$base/log", s"$base/ckpt")
      val (folds, reads, failure) = raceDrain[Int](
        q,
        () => graft.pipeline.GroupedTopK.compactTopKLogLive(spark,
          s"$base/log", Seq("cat"), ord, 4).isDefined,
        () => {
          if (LogStructuredSink.maxBatch(spark, s"$base/log").isDefined)
            Some(StreamOps.readGroupedTopK(spark, s"$base/log",
              Seq("cat"), ord, 4).count().toInt)
          else None
        },
        minReads = 50)
      assert(failure.isEmpty, s"racing reader failed: $failure")
      assert(folds >= 1, "no live top-k fold ran")
      assert(reads.size >= 50, s"only ${reads.size} interleaved reads")
      val truth = graft.pipeline.GroupedTopK.topK(
          mkSlices.reduce(_ unionByName _), Seq("cat"), ord, 4)
        .select("cat", "rank", "eid", "value")
        .orderBy("cat", "rank")
        .as[(String, Int, Long, Double)].collect().toSeq
      val got = StreamOps.readGroupedTopK(spark, s"$base/log",
          Seq("cat"), ord, 4)
        .select("cat", "rank", "eid", "value")
        .orderBy("cat", "rank")
        .as[(String, Int, Long, Double)].collect().toSeq
      assert(got == truth,
        "live-compacted top-k log diverged from the batch leaderboard")
    } finally rm(base)
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
