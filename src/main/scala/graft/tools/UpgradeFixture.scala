package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/**
 * The STATE-COMPATIBILITY fixture: a checkpoint + standing logs written
 * by one binary, restarted by a LATER binary (the production upgrade
 * path q232's single-binary restart face cannot cover). The fixture zip
 * under `src/test/resources` was produced by [[MakeUpgradeFixture]] at a
 * pinned code version; `UpgradeRestartSpec` extracts it, publishes the
 * third slice, restarts both streams under the CURRENT binary, and pins
 * the continuation against a fresh uninterrupted run.
 *
 * The data definition lives HERE — shared by the generator and the suite
 * — so the fresh-run comparison is by construction over the same corpus.
 *
 * CONTRACT (enforced by the suite failing): operator INTERNALS may
 * change freely between rounds; what must stay readable is
 *  - stateful-operator state schemas (the case classes
 *    [[graft.streaming.StreamOps.Event]]/SessionState/... that the state
 *    store encodes),
 *  - the log-structured sink layouts (`__batch=` partitioning, column
 *    names, field metadata keys),
 *  - checkpoint source/offset semantics (same source paths resume).
 * Regenerating the fixture zip is a deliberate STATE BREAK and needs a
 * migration story, not a silent refresh.
 */
object UpgradeFixture {

  val root = "/tmp/graft_upgrade_fixture" // absolute: file-source offsets
                                          // in the checkpoint embed it

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Three event slices for the sessionize (flatMapGroupsWithState)
    * stream: slices 0–1 are drained by the fixture binary, slice 2 by
    * the restarting binary. Gap 30 min, watermark 1 min. */
  def eventSlices(spark: SparkSession)
      : Seq[Seq[graft.streaming.StreamOps.Event]] = {
    import graft.streaming.StreamOps.Event
    Seq(
      Seq(Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-01 10:05:00"), 1L, "view", 2.0),
        Event(3L, ts("2024-01-01 10:00:30"), 2L, "click", 5.0)),
      // user 1's 10:00–10:05 session closes (45 min gap); user 2 extends
      Seq(Event(4L, ts("2024-01-01 10:50:00"), 1L, "click", 3.0),
        Event(5L, ts("2024-01-01 10:20:00"), 2L, "view", 7.0)),
      // restart slice: closes user 1's 10:50 session and user 2's
      // 10:00:30–10:20 session; the 12:xx sessions stay open
      Seq(Event(6L, ts("2024-01-01 12:00:00"), 1L, "view", 4.0),
        Event(7L, ts("2024-01-01 12:30:00"), 2L, "click", 6.0)))
  }

  /** Three document slices for the duplicateSpansStream (foreachBatch +
    * parquet log) stream: the 8-token run recurs in every slice, so the
    * RESTART slice must flag against the index the FIXTURE binary
    * wrote — the cross-upgrade probe of an old-layout log. */
  def docSlices: Seq[Seq[(Long, String)]] = {
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    Seq(
      Seq(1L -> s"a1 a2 $run a3",
        2L -> "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
      Seq(10L -> s"$run tail1 tail2"),
      Seq(20L -> s"pre1 pre2 $run post1",
        21L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
  }

  /** Publish `df` as the k-th single-file feed slice with a pinned mtime
    * (ordering across triggers). */
  def publishSlice(df: DataFrame, feedDir: String, k: Int): Unit = {
    val stage = s"$feedDir.stage$k"
    df.repartition(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val tgt = new java.io.File(feedDir, f"slice-$k%03d.parquet")
    tgt.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, tgt.toPath)
    require(tgt.setLastModified(1700000000000L + k * 60000L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
  }

  /** Start the sessionize stream over the feed (same shape in the
    * generator and the restarting suite — the QUERY is re-specified at
    * restart, only state/offsets come from the checkpoint). */
  def startSessionize(spark: SparkSession, root: String = root)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val events = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/sess/feed")
      .as[graft.streaming.StreamOps.Event]
    graft.streaming.StreamOps
      .sessionize(events, gapMinutes = 30, watermarkDelay = "1 minute")
      .writeStream
      .option("checkpointLocation", s"$root/sess/ckpt")
      .outputMode("append")
      .format("parquet").option("path", s"$root/sess/out")
      .start()
  }

  def startSpans(spark: SparkSession, root: String = root)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/spans/feed")
    graft.streaming.StreamOps.duplicateSpansStream(spark, stream, "text",
      "doc_id", 8, s"$root/spans/index", s"$root/spans/out",
      s"$root/spans/ckpt")
  }

  // -------------------------------------------------------------------
  // Fixture v2 — the remaining state-schema families
  // (`upgrade_fixture_v2.zip`, generated by [[MakeUpgradeFixtureV2]]):
  // latestPerKey with TTL (timer state), ewmaStream (running-fold
  // state), intervalJoin left-outer (two-sided join state + watermark
  // expiry mid-fixture), and the distinctCount p = 16 + aggState
  // DECIMAL(18,6) log pair (layout + decimal width across the upgrade).
  // Same contract as v1: slices 0–1 drained by the FIXTURE binary,
  // slice 2 by the restarting binary; the continuation must match a
  // fresh uninterrupted run.
  // -------------------------------------------------------------------

  /** latestPerKey (ttl = 30 min, watermark 1 min): slice 1 advances the
    * watermark far past key 1's ttl horizon (its TIMER travels in the
    * fixture checkpoint and fires after the RESTART); slice 2 carries a
    * late ghost (must drop against the resumed watermark) and a fresh
    * re-arrival (must restart the key cleanly). */
  def changeSlices: Seq[Seq[(Long, Timestamp, String)]] = Seq(
    Seq((1L, ts("2024-01-01 10:00:00"), "v1"),
      (2L, ts("2024-01-01 10:00:00"), "v2")),
    Seq((2L, ts("2024-01-01 12:00:00"), "v2b")),
    Seq((2L, ts("2024-01-01 12:00:30"), "v2c"),
      (1L, ts("2024-01-01 10:05:00"), "ghost"),
      (1L, ts("2024-01-01 12:30:00"), "fresh")))

  /** ewmaStream (α = 0.25): per-key running folds established by the
    * fixture binary, continued by the restarting one — same-ms ties in
    * slice 2 exercise the (ts, tie) order the state encodes. */
  def obsSlices: Seq[Seq[(Long, Timestamp, Long, Double)]] = Seq(
    Seq((1L, ts("2024-01-01 10:00:00"), 0L, 4.0),
      (1L, ts("2024-01-01 10:01:00"), 0L, 8.0),
      (2L, ts("2024-01-01 10:00:00"), 0L, 1.0)),
    Seq((1L, ts("2024-01-01 10:02:00"), 0L, 16.0),
      (2L, ts("2024-01-01 10:03:00"), 0L, 3.0)),
    Seq((1L, ts("2024-01-01 10:04:00"), 1L, 32.0),
      (1L, ts("2024-01-01 10:04:00"), 2L, 64.0),
      (2L, ts("2024-01-01 10:05:00"), 0L, 5.0)))

  /** intervalJoin left-outer (within 30 min, watermark 1 min): the
    * fixture leaves left key 2 awaiting its outer emission — the right
    * watermark passes its horizon only via slice 2, so the NULL-extended
    * row must be produced by the restarted binary from fixture join
    * state. */
  def ijLeftSlices: Seq[Seq[(Long, Timestamp, Double)]] = Seq(
    Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:00:00"), 2.0)),
    Seq((1L, ts("2024-01-01 11:00:00"), 3.0)),
    Seq((2L, ts("2024-01-01 13:00:00"), 4.0)))

  def ijRightSlices: Seq[Seq[(Long, Timestamp, Double)]] = Seq(
    Seq((1L, ts("2024-01-01 10:10:00"), 9.0)),
    Seq((1L, ts("2024-01-01 11:05:00"), 7.0)),
    Seq((2L, ts("2024-01-01 13:05:00"), 8.0)))

  /** distinctCount p = 16 register-log slices (overlapping ranges). */
  def dcSlices: Seq[Seq[String]] = Seq(
    (0 until 800).map(i => s"u-$i"),
    (400 until 1200).map(i => s"u-$i"),
    (800 until 1600).map(i => s"u-$i"))

  /** aggState DECIMAL(18,6) partial-log slices — the decimal parquet
    * width must survive the upgrade and continued appends. */
  def aggSlices: Seq[Seq[(String, java.math.BigDecimal)]] = {
    def d(s: String) = new java.math.BigDecimal(s).setScale(6)
    Seq(
      Seq(("g0", d("10.5")), ("g1", d("2.25")), ("g0", d("0.125"))),
      Seq(("g1", d("7.75")), ("g2", d("100.000001"))),
      Seq(("g0", d("3.5")), ("g2", d("0.999999")), ("g3", d("42"))))
  }

  def startLatest(spark: SparkSession, root: String = root)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    import scala.concurrent.duration._
    val changes = spark.readStream
      .schema("key LONG, ts TIMESTAMP, value STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/latest/feed")
      .as[graft.streaming.StreamOps.Change]
    graft.streaming.StreamOps
      .latestPerKey(changes, ttl = Some(30.minutes),
        watermarkDelay = "1 minute")
      .toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/latest/ckpt")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         bid: Long) =>
          graft.streaming.LogStructuredSink
            .write(b.toDF(), s"$root/latest/out", bid)
          ()
      }
      .start()
  }

  def startEwma(spark: SparkSession, root: String = root)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val obs = spark.readStream
      .schema("key LONG, ts TIMESTAMP, tie LONG, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/ewma/feed")
      .as[graft.streaming.StreamOps.Obs]
    graft.streaming.StreamOps.ewmaStream(obs, alpha = 0.25)
      .toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/ewma/ckpt")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         bid: Long) =>
          graft.streaming.LogStructuredSink
            .write(b.toDF(), s"$root/ewma/out", bid)
          ()
      }
      .start()
  }

  def startIntervalJoin(spark: SparkSession, root: String = root)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val left = spark.readStream.schema("k LONG, ts TIMESTAMP, lv DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/ij/left")
    val right = spark.readStream.schema("k LONG, ts TIMESTAMP, rv DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/ij/right")
    graft.streaming.StreamOps.intervalJoin(left, right, Seq("k"),
        within = "30 minutes", watermarkDelay = "1 minute",
        joinType = "left_outer")
      .writeStream
      .option("checkpointLocation", s"$root/ij/ckpt")
      .outputMode("append")
      .format("parquet").option("path", s"$root/ij/out")
      .start()
  }

  def startDistinctCount(spark: SparkSession, root: String = root)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val rows = spark.readStream.schema("k STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/dc/feed")
    graft.streaming.StreamOps.distinctCountStream(spark, rows, "k",
      s"$root/dc/idx", s"$root/dc/ckpt", p = 16)
  }

  def startAggState(spark: SparkSession, root: String = root)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val rows = spark.readStream.schema("g STRING, v DECIMAL(18,6)")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/agg/feed")
    graft.streaming.StreamOps.aggStateStream(spark, rows, Seq("g"), "v",
      s"$root/agg/state", s"$root/agg/ckpt")
  }

  /** Zip a directory tree with relative paths + mtimes (pure JVM — the
    * suite must extract without external binaries). */
  def zipTree(rootDir: String, outZip: String): Unit = {
    val rootPath = java.nio.file.Paths.get(rootDir)
    val out = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(outZip))
    try {
      java.nio.file.Files.walk(rootPath).forEach { p =>
        val rel = rootPath.relativize(p).toString
        if (rel.nonEmpty) {
          val f = p.toFile
          if (f.isDirectory) {
            val e = new java.util.zip.ZipEntry(rel + "/")
            e.setTime(f.lastModified)
            out.putNextEntry(e); out.closeEntry()
          } else {
            val e = new java.util.zip.ZipEntry(rel)
            e.setTime(f.lastModified)
            out.putNextEntry(e)
            java.nio.file.Files.copy(p, out)
            out.closeEntry()
          }
        }
      }
    } finally out.close()
  }

  /**
   * Relocate an extracted fixture tree: file-source offsets, the
   * FileStreamSourceLog entries (`ckpt/sources/…`), and the parquet
   * sink's `_spark_metadata` log all embed the ABSOLUTE root the fixture
   * was generated at. The generator keeps the fixed [[root]] (so the zip
   * is deterministic); the SUITE extracts to a per-run unique directory
   * — two concurrent test runs on a shared host must not clobber each
   * other's checkpoints mid-run — and rewrites the baked root here.
   * Byte-level search/replace, applied only to files that actually
   * contain the pattern (the checkpoint/metadata logs are JSON text;
   * state-store deltas are binary and embed no paths, so they are
   * untouched).
   */
  def relocate(destRoot: String, bakedRoot: String = root): Unit = {
    val pat = bakedRoot.getBytes("UTF-8")
    java.nio.file.Files.walk(java.nio.file.Paths.get(destRoot))
      .forEach { p =>
        val f = p.toFile
        if (f.isFile && !f.getName.endsWith(".parquet") &&
            !f.getName.endsWith(".crc")) {
          val bytes = java.nio.file.Files.readAllBytes(p)
          if (indexOf(bytes, pat) >= 0) {
            val s = new String(bytes, "UTF-8")
              .replace(bakedRoot, destRoot)
            val mtime = f.lastModified
            java.nio.file.Files.write(p, s.getBytes("UTF-8"))
            f.setLastModified(mtime)
          }
        }
      }
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Extract a [[zipTree]] zip under `destRoot`, restoring mtimes. */
  def unzipTree(zip: java.io.InputStream, destRoot: String): Unit = {
    val in = new java.util.zip.ZipInputStream(zip)
    val dest = java.nio.file.Paths.get(destRoot)
    java.nio.file.Files.createDirectories(dest)
    var e = in.getNextEntry
    val times = scala.collection.mutable.ListBuffer.empty[(java.io.File, Long)]
    while (e != null) {
      val p = dest.resolve(e.getName).normalize()
      require(p.startsWith(dest), s"zip entry escapes root: ${e.getName}")
      if (e.isDirectory) java.nio.file.Files.createDirectories(p)
      else {
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.copy(in, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      times += ((p.toFile, e.getTime))
      in.closeEntry()
      e = in.getNextEntry
    }
    in.close()
    // restore mtimes depth-first AFTER all writes (file creation inside a
    // dir would bump the dir's mtime again)
    times.reverse.foreach { case (f, t) => if (t > 0) f.setLastModified(t) }
  }
}

/**
 * Generate the upgrade fixture: drain slices 0–1 of both streams at
 * [[UpgradeFixture.root]], stop, zip checkpoint + logs + feed (and the
 * third slice STAGED outside the watched dirs) into
 * `src/test/resources/upgrade_fixture_v1.zip`.
 *
 * Run ONCE per deliberate state-schema version:
 *   sbt "runMain graft.tools.MakeUpgradeFixture"
 */
object MakeUpgradeFixture {
  def main(args: Array[String]): Unit = {
    val outZip = args.headOption
      .getOrElse("src/test/resources/upgrade_fixture_v1.zip")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-make-upgrade-fixture")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = UpgradeFixture.root
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

    val ev = UpgradeFixture.eventSlices(spark)
    for (k <- 0 to 1)
      UpgradeFixture.publishSlice(ev(k).toDF(), s"$root/sess/feed", k)
    // the restart slice travels in the zip, staged OUTSIDE the feed
    UpgradeFixture.publishSlice(ev(2).toDS().toDF(), s"$root/sess/stage2", 2)

    val docs = UpgradeFixture.docSlices
    for (k <- 0 to 1)
      UpgradeFixture.publishSlice(docs(k).toDF("doc_id", "text"),
        s"$root/spans/feed", k)
    UpgradeFixture.publishSlice(docs(2).toDF("doc_id", "text"),
      s"$root/spans/stage2", 2)

    val q1 = UpgradeFixture.startSessionize(spark)
    try q1.processAllAvailable() finally q1.stop()
    val q2 = UpgradeFixture.startSpans(spark)
    try q2.processAllAvailable() finally q2.stop()

    new java.io.File(outZip).getParentFile.mkdirs()
    UpgradeFixture.zipTree(root, outZip)
    println(s"fixture written: $outZip (" +
      new java.io.File(outZip).length() + " bytes)")
    spark.stop()
  }
}

/**
 * Generate the v2 fixture (the remaining state-schema families —
 * latestPerKey TTL timers, ewma folds, interval-join two-sided state,
 * distinctCount p = 16 registers, aggState DECIMAL partials): drain
 * slices 0–1 of all five streams at [[UpgradeFixture.root]], stop, zip
 * checkpoints + logs + feeds (+ the third slices STAGED outside the
 * watched dirs) into `src/test/resources/upgrade_fixture_v2.zip`.
 *
 * Run ONCE per deliberate state-schema version:
 *   sbt "runMain graft.tools.MakeUpgradeFixtureV2"
 */
object MakeUpgradeFixtureV2 {
  def main(args: Array[String]): Unit = {
    val outZip = args.headOption
      .getOrElse("src/test/resources/upgrade_fixture_v2.zip")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-make-upgrade-fixture-v2")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = UpgradeFixture.root
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

    // slices 0–1 into the watched feed; slice 2 STAGED beside it (the
    // restarting suite moves it in) — one staging dir per feed, named
    // `<feed>_stage2`, outside every watched path
    def stage3(dfs: Seq[org.apache.spark.sql.DataFrame],
               feed: String): Unit = {
      for (k <- 0 to 1)
        UpgradeFixture.publishSlice(dfs(k), s"$root/$feed", k)
      UpgradeFixture.publishSlice(dfs(2), s"$root/${feed}_stage2", 2)
    }
    stage3(UpgradeFixture.changeSlices.map(_.toDF("key", "ts", "value")),
      "latest/feed")
    stage3(UpgradeFixture.obsSlices
      .map(_.toDF("key", "ts", "tie", "value")), "ewma/feed")
    stage3(UpgradeFixture.ijLeftSlices.map(_.toDF("k", "ts", "lv")),
      "ij/left")
    stage3(UpgradeFixture.ijRightSlices.map(_.toDF("k", "ts", "rv")),
      "ij/right")
    stage3(UpgradeFixture.dcSlices.map(_.toDF("k")), "dc/feed")
    stage3(UpgradeFixture.aggSlices.map(_.toDF("g", "v")
      .select($"g", $"v".cast("decimal(18,6)").as("v"))), "agg/feed")

    for (start <- Seq(
        UpgradeFixture.startLatest(_: SparkSession, root),
        UpgradeFixture.startEwma(_: SparkSession, root),
        UpgradeFixture.startIntervalJoin(_: SparkSession, root),
        UpgradeFixture.startDistinctCount(_: SparkSession, root),
        UpgradeFixture.startAggState(_: SparkSession, root))) {
      val q = start(spark)
      try q.processAllAvailable() finally q.stop()
    }

    new java.io.File(outZip).getParentFile.mkdirs()
    UpgradeFixture.zipTree(root, outZip)
    println(s"fixture written: $outZip (" +
      new java.io.File(outZip).length() + " bytes)")
    spark.stop()
  }
}
