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
