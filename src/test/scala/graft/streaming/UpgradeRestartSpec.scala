package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.UpgradeFixture

/**
 * Restart ACROSS A CODE UPGRADE: pinned fixture zips
 * (`src/test/resources/upgrade_fixture_v{1,2}.zip`, written by
 * [[graft.tools.MakeUpgradeFixture]] / [[graft.tools.MakeUpgradeFixtureV2]]
 * at their respective state-schema versions) hold checkpoints + standing
 * logs after two of three slices. This suite extracts each into a
 * PER-RUN unique directory (two concurrent runs on a shared host must
 * not clobber each other), relocates the baked absolute paths
 * ([[UpgradeFixture.relocate]] — file-source offsets and sink metadata
 * embed the generation root), restarts every stream under the CURRENT
 * binary, drains the third slice, and pins the continuation against a
 * fresh uninterrupted run — the contract that operator internals may
 * change between rounds but state schemas, log layouts, and checkpoint
 * semantics must stay readable. A failure here means the change BROKE
 * live-upgrade compatibility; fixing it by regenerating a fixture is a
 * deliberate state break needing a migration story (see UpgradeFixture's
 * scaladoc).
 *
 * v1 covers sessionize (flatMapGroupsWithState encoders) and
 * duplicateSpansStream (log-structured sink layout + probe). v2 covers
 * the remaining families: latestPerKey TTL (timer state travels in the
 * fixture and fires after the restart), ewmaStream (running folds),
 * intervalJoin left-outer (two-sided join state — the outer NULL row
 * for a fixture-era left event must be emitted by the restarted
 * binary), and the distinctCount p = 16 + aggState DECIMAL(18,6) log
 * pair (layout + parquet decimal width across the upgrade).
 */
class UpgradeRestartSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-upgrade-restart-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def uniqueRoot(tag: String) = java.nio.file.Files
    .createTempDirectory(tag).toString + "/fx"

  private def extract(resource: String, root: String): Unit = {
    val zip = getClass.getResourceAsStream(resource)
    assert(zip != null, s"fixture $resource missing from test resources")
    UpgradeFixture.unzipTree(zip, root)
    UpgradeFixture.relocate(root) // rewrite the baked generation root
  }

  private def moveStaged(from: String, to: String): Unit = {
    val src = new java.io.File(from)
    assert(src.exists(), s"fixture is missing $src")
    val mtime = src.lastModified
    val tgt = new java.io.File(to)
    tgt.getParentFile.mkdirs()
    java.nio.file.Files.move(src.toPath, tgt.toPath)
    assert(tgt.setLastModified(mtime)) // pinned later than slices 0–1
  }

  test("v1: a round-14 checkpoint + logs restart under the current " +
       "binary (at a RELOCATED per-run root) and continue " +
       "hash-identically to an uninterrupted run") {
    import spark.implicits._
    val root = uniqueRoot("graft_upgrade_v1")
    extract("/upgrade_fixture_v1.zip", root)

    // the fixture really is mid-stream: both data slices committed (the
    // sessionize checkpoint may also hold a no-data watermark-advance
    // batch after them), slice 2 not yet published
    assert(new java.io.File(s"$root/sess/ckpt/commits/1").exists())
    assert(new java.io.File(s"$root/spans/ckpt/commits/1").exists())
    assert(!new java.io.File(s"$root/spans/ckpt/commits/2").exists())

    // publish the restart slices and resume both queries under THIS code
    moveStaged(s"$root/sess/stage2/slice-002.parquet",
      s"$root/sess/feed/slice-002.parquet")
    moveStaged(s"$root/spans/stage2/slice-002.parquet",
      s"$root/spans/feed/slice-002.parquet")
    val q1 = UpgradeFixture.startSessionize(spark, root)
    try q1.processAllAvailable() finally q1.stop()
    val q2 = UpgradeFixture.startSpans(spark, root)
    try q2.processAllAvailable() finally q2.stop()

    // fresh uninterrupted run over the same three slices, current binary
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_upgrade_fresh").toString
    try {
      val ev = UpgradeFixture.eventSlices(spark)
      for (k <- 0 to 2)
        UpgradeFixture.publishSlice(ev(k).toDF(), s"$fresh/sess/feed", k)
      val docs = UpgradeFixture.docSlices
      for (k <- 0 to 2)
        UpgradeFixture.publishSlice(docs(k).toDF("doc_id", "text"),
          s"$fresh/spans/feed", k)
      val f1 = UpgradeFixture.startSessionize(spark, fresh)
      try f1.processAllAvailable() finally f1.stop()
      val f2 = UpgradeFixture.startSpans(spark, fresh)
      try f2.processAllAvailable() finally f2.stop()

      def sessions(r: String) = spark.read.parquet(s"$r/sess/out")
        .select("user_id", "session_start", "session_end", "n_events",
          "total_value")
        .orderBy("user_id", "session_start")
        .collect().toSeq
      def spans(r: String) = spark.read.parquet(s"$r/spans/out")
        .select("doc_id", "span_start", "span_end", "span_len")
        .orderBy("doc_id", "span_start")
        .as[(Long, Long, Long, Long)].collect().toSeq
      def digests(r: String) = LogStructuredSink
        .readLog(spark, s"$r/spans/index").get
        .select("__h").distinct().as[String].collect().toSet

      val resumed = sessions(root)
      assert(resumed == sessions(fresh),
        "restarted sessionize diverged from the uninterrupted run")
      // the restart really CONTINUED: slice 2 closed both standing
      // sessions, so the resumed output has them (2 sessions per user
      // would close only with slice 2's watermark advance)
      assert(resumed.size == 3,
        s"expected 3 closed sessions after the restart slice, got " +
          s"${resumed.size}")
      assert(spans(root) == spans(fresh),
        "restarted duplicateSpansStream diverged")
      // doc 20's copy of the run flagged against the OLD binary's index
      assert(spans(root).exists(_._1 == 20L),
        "restart slice did not flag against the fixture-written index")
      assert(digests(root) == digests(fresh),
        "digest index diverged across the upgrade restart")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fresh))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root).getParentFile)
    }
  }

  test("v2: latestPerKey TTL timers, ewma folds, interval-join state, " +
       "and the distinctCount/aggState log pair restart under the " +
       "current binary and continue identically to a fresh run") {
    import spark.implicits._
    val root = uniqueRoot("graft_upgrade_v2")
    extract("/upgrade_fixture_v2.zip", root)

    for (b <- Seq("latest", "ewma", "ij", "dc", "agg"))
      assert(new java.io.File(s"$root/$b/ckpt/commits/1").exists(),
        s"fixture branch $b is not mid-stream")

    moveStaged(s"$root/latest/feed_stage2/slice-002.parquet",
      s"$root/latest/feed/slice-002.parquet")
    moveStaged(s"$root/ewma/feed_stage2/slice-002.parquet",
      s"$root/ewma/feed/slice-002.parquet")
    moveStaged(s"$root/ij/left_stage2/slice-002.parquet",
      s"$root/ij/left/slice-002.parquet")
    moveStaged(s"$root/ij/right_stage2/slice-002.parquet",
      s"$root/ij/right/slice-002.parquet")
    moveStaged(s"$root/dc/feed_stage2/slice-002.parquet",
      s"$root/dc/feed/slice-002.parquet")
    moveStaged(s"$root/agg/feed_stage2/slice-002.parquet",
      s"$root/agg/feed/slice-002.parquet")

    for (start <- Seq(
        UpgradeFixture.startLatest(_: SparkSession, root),
        UpgradeFixture.startEwma(_: SparkSession, root),
        UpgradeFixture.startIntervalJoin(_: SparkSession, root),
        UpgradeFixture.startDistinctCount(_: SparkSession, root),
        UpgradeFixture.startAggState(_: SparkSession, root))) {
      val q = start(spark)
      try q.processAllAvailable() finally q.stop()
    }

    val fresh = java.nio.file.Files
      .createTempDirectory("graft_upgrade_v2_fresh").toString
    try {
      def publish3(dfs: Seq[org.apache.spark.sql.DataFrame],
                   feed: String): Unit =
        dfs.zipWithIndex.foreach { case (df, k) =>
          UpgradeFixture.publishSlice(df, s"$fresh/$feed", k) }
      publish3(UpgradeFixture.changeSlices
        .map(_.toDF("key", "ts", "value")), "latest/feed")
      publish3(UpgradeFixture.obsSlices
        .map(_.toDF("key", "ts", "tie", "value")), "ewma/feed")
      publish3(UpgradeFixture.ijLeftSlices
        .map(_.toDF("k", "ts", "lv")), "ij/left")
      publish3(UpgradeFixture.ijRightSlices
        .map(_.toDF("k", "ts", "rv")), "ij/right")
      publish3(UpgradeFixture.dcSlices.map(_.toDF("k")), "dc/feed")
      publish3(UpgradeFixture.aggSlices.map(_.toDF("g", "v")
        .select($"g", $"v".cast("decimal(18,6)").as("v"))), "agg/feed")
      for (start <- Seq(
          UpgradeFixture.startLatest(_: SparkSession, fresh),
          UpgradeFixture.startEwma(_: SparkSession, fresh),
          UpgradeFixture.startIntervalJoin(_: SparkSession, fresh),
          UpgradeFixture.startDistinctCount(_: SparkSession, fresh),
          UpgradeFixture.startAggState(_: SparkSession, fresh))) {
        val q = start(spark)
        try q.processAllAvailable() finally q.stop()
      }

      // latestPerKey: the emitted-update multiset (batch ids aside —
      // no-data watermark batches may land at different ids)
      def latest(r: String) = spark.read.parquet(s"$r/latest/out")
        .select("key", "value").collect()
        .map(x => (x.getLong(0), x.getString(1))).toSeq.sorted
      assert(latest(root) == latest(fresh),
        "restarted latestPerKey diverged")
      // the TTL semantics really crossed the upgrade: the ghost (late
      // after the fixture-era expiry) was dropped, the fresh re-arrival
      // restarted the key
      assert(!latest(root).contains((1L, "ghost")),
        "late straggler survived the resumed watermark")
      assert(latest(root).contains((1L, "fresh")))

      def ewma(r: String) = spark.read.parquet(s"$r/ewma/out")
        .select("key", "n_events", "ewma").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
        .toSeq.sorted
      assert(ewma(root) == ewma(fresh), "restarted ewmaStream diverged")
      // the fold CONTINUED from fixture state (key 1 saw all 5 obs)
      assert(ewma(root).exists(r => r._1 == 1L && r._2 == 5L))

      def ij(r: String) = spark.read.parquet(s"$r/ij/out")
        .select("k", "ts", "lv", "ts_r", "rv_r")
        .collect().map(_.toString).toSeq.sorted
      assert(ij(root) == ij(fresh), "restarted intervalJoin diverged")
      // the outer NULL row for the FIXTURE-era left event (key 2 at
      // 10:00 — no right match within 30 min) was emitted by the
      // RESTARTED binary from resumed two-sided join state
      assert(ij(root).exists(s => s.contains("2,2024-01-01 10:00") &&
        s.endsWith("null,null]")),
        s"missing the cross-upgrade outer emission: ${ij(root)}")

      def dc(r: String) = graft.pipeline.Stats
        .readHllDistinct(spark, s"$r/dc/idx")
        .select("registers_set", "distinct_est")
        .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
      assert(dc(root) == dc(fresh), "restarted distinctCount diverged")
      // p = 16 metadata survived the upgrade + appends
      assert(LogStructuredSink.readLog(spark, s"$root/dc/idx").get
        .schema("__b").metadata.getLong("p") == 16L)

      def agg(r: String) = graft.pipeline.Materialize
        .readAggState(spark, s"$r/agg/state", Seq("g"))
        .select(col("g"), col("n"), col("total").cast("string"),
          col("min_val").cast("string"), col("max_val").cast("string"))
        .collect().map(_.toString).toSeq.sorted
      assert(agg(root) == agg(fresh), "restarted aggState diverged")
      // the parquet DECIMAL width of the partial log stayed uniform
      // across the upgrade + continued appends (the q253 discipline)
      val sumT = LogStructuredSink.readLog(spark, s"$root/agg/state").get
        .schema("__sum").dataType.simpleString
      assert(sumT == "decimal(28,6)", s"__sum width drifted: $sumT")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fresh))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root).getParentFile)
    }
  }
}
