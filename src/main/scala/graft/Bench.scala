package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and prints
 * ONE JSON line {"metric":"total","value":<sec>,...}. The same line is also
 * written to BENCH_RESULT.json in the working directory, because sbt wraps
 * program stdout in "[info] " prefixes that a line-oriented JSON parser
 * rejects.
 *
 * Each query gets one untimed warmup execution (JIT + parquet footer cache +
 * catalog setup) followed by two timed runs (min reported — suppresses
 * GC/JIT noise). Materialization goes through `queryExecution.toRdd.count()`:
 * the physical plan is already finalized at that point, so Catalyst cannot
 * prune deterministic projections the way it can under a DataFrame
 * `.count()` — every output column of every query is actually computed.
 * Failures are NOT swallowed into the total: a failed query is reported in
 * "failed" and its timing excluded, so a regression can only make the
 * numbers worse, never better.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated name-prefix filter (builder-side targeted
    // stress runs, e.g. the sf10 top-5 family datapoints); the driver
    // never sets it, so harness runs always cover the full map
    val only: String => Boolean = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(pfx) if pfx.nonEmpty =>
        val ps = pfx.split(','); name => ps.exists(name.startsWith)
      case _ => _ => true
    }
    val names = SparkEntry.queries.keys.filter(only).toSeq.sorted

    // per-face cost counters, so a streaming-band wall movement is
    // adjudicable from the artifact alone: constant jobs/trigger with a
    // moved wall = ambient host drift; a jobs/trigger step = a real plan
    // regression. Jobs via SparkListener, triggers + per-trigger wall
    // via StreamingQueryListener (both async buses — deltas are read
    // after a short drain and are adjudication aids, not timings).
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    val trigCount = new java.util.concurrent.atomic.AtomicLong
    val trigWallMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
      })
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryProgressEvent): Unit = {
          trigCount.incrementAndGet()
          trigWallMs.addAndGet(e.progress.batchDuration)
        }
        override def onQueryTerminated(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    // full materialization of the finalized physical plan; true on success
    def run(name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"bench: $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
      }

    def timed(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = run(name)
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    final case class Cost(jobs: Long, triggers: Long, wallMs: Long)
    // pass-2 instrumentation: snapshot the counters around each query;
    // stream-running faces get a short listener-bus drain so their
    // trigger events land inside their own window
    def timedInstr(name: String): ((Double, Boolean), Cost) = {
      val (j0, t0c, w0) = (jobCount.get, trigCount.get, trigWallMs.get)
      val r = timed(name)
      if (trigCount.get != t0c) Thread.sleep(50) // drain async bus tail
      (r, Cost(jobCount.get - j0, trigCount.get - t0c,
        trigWallMs.get - w0))
    }

    names.foreach(run) // warmup pass (untimed)

    val r1 = names.map(n => n -> timed(n)).toMap
    val instr = names.map(n => n -> timedInstr(n)).toMap
    val r2 = instr.map { case (n, (t, _)) => n -> t }
    val costs = instr.map { case (n, (_, c)) => n -> c }
    val results = names.map { n =>
      val (t2, ok2) = r2(n)
      val (t1, ok1) = r1(n)
      n -> (math.min(t1, t2), ok1 && ok2)
    }
    val failed = results.collect { case (n, (_, false)) => n }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, (v, true)) => v }.sum
    // the raw per-pass totals expose the host's ambient run-to-run spread
    // (measured 0.85–1.2× between identical passes across rounds 11-12) so
    // round-over-round reads can separate drift from plan regressions
    def passTotal(m: Map[String, (Double, Boolean)]) =
      names.collect { case n if m(n)._2 => m(n)._1 }.sum
    val passes = s"[${passTotal(r1)},${passTotal(r2)}]"
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-face pass-2 counters: jobs for every face; triggers +
    // per-trigger wall for the stream-running ones (0 otherwise)
    val costJson = names.map { n =>
      val c = costs(n)
      "\"" + n + s"""\":{"jobs":${c.jobs},"triggers":${c.triggers},"trigger_wall_ms":${c.wallMs}}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"timing":"min_of_2_after_warmup","pass_totals":$passes,"cost":$costJson,"sf":"$sfDir"}"""
    println(line)
    Files.write(Paths.get("BENCH_RESULT.json"), (line + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
    // Compact total-only summary as the LAST stdout line: the per-query map
    // above outgrew the driver's tail-capture window in round 5 (84 entries),
    // which truncated the JSON mid-line and broke the driver-side parse. Any
    // tail window catches this short line; the full per-query map stays in
    // BENCH_RESULT.json and the longer line above.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${names.size},"n_failed":${failed.length},"sf":"$sfDir"}""")
    if (failed.nonEmpty) sys.exit(1)
  }
}
