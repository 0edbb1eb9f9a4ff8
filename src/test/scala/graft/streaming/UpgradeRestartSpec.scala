package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.UpgradeFixture

/**
 * Restart ACROSS A CODE UPGRADE: the pinned fixture zip
 * (`src/test/resources/upgrade_fixture_v1.zip`, written by
 * [[graft.tools.MakeUpgradeFixture]] at the round-14 state-schema
 * version) holds a checkpoint + standing logs after two of three slices
 * for (a) a flatMapGroupsWithState stream (sessionize — state-store
 * encoder compatibility) and (b) a foreachBatch log-structured stream
 * (duplicateSpansStream — sink layout + probe compatibility). This suite
 * restarts both under the CURRENT binary, drains the third slice, and
 * pins the continuation against a fresh uninterrupted run — the contract
 * that operator internals may change between rounds but state schemas,
 * log layouts, and checkpoint semantics must stay readable. A failure
 * here means the change BROKE live-upgrade compatibility; fixing it by
 * regenerating the fixture is a deliberate state break needing a
 * migration story (see UpgradeFixture's scaladoc).
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

  private def moveStaged(root: String, branch: String): Unit = {
    val src = new java.io.File(s"$root/$branch/stage2/slice-002.parquet")
    assert(src.exists(), s"fixture is missing $src")
    val mtime = src.lastModified
    val tgt = new java.io.File(s"$root/$branch/feed/slice-002.parquet")
    java.nio.file.Files.move(src.toPath, tgt.toPath)
    assert(tgt.setLastModified(mtime)) // pinned later than slices 0–1
  }

  test("a round-14 checkpoint + logs restart under the current binary " +
       "and continue hash-identically to an uninterrupted run") {
    import spark.implicits._
    val root = UpgradeFixture.root
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    val zip = getClass.getResourceAsStream("/upgrade_fixture_v1.zip")
    assert(zip != null, "fixture zip missing from test resources")
    UpgradeFixture.unzipTree(zip, root)

    // the fixture really is mid-stream: both data slices committed (the
    // sessionize checkpoint may also hold a no-data watermark-advance
    // batch after them), slice 2 not yet published
    assert(new java.io.File(s"$root/sess/ckpt/commits/1").exists())
    assert(new java.io.File(s"$root/spans/ckpt/commits/1").exists())
    assert(!new java.io.File(s"$root/spans/ckpt/commits/2").exists())

    // publish the restart slices and resume both queries under THIS code
    moveStaged(root, "sess")
    moveStaged(root, "spans")
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
      def digests(r: String) = spark.read.parquet(s"$r/spans/index")
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
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}
