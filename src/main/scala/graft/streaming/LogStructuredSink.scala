package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The exactly-once discipline shared by every log-structured streaming
 * sink in [[StreamOps]], extracted to one definition: a `foreachBatch`
 * body writes each micro-batch's rows as the batch's OWN partition
 * (`__batch = bid`) with DYNAMIC partition overwrite, and any read of
 * standing state from inside the loop sees only partitions
 * `__batch < bid`. Together these make an at-least-once replay (crash
 * after the write, before the checkpoint commit) invisible:
 *
 *  - the replayed batch OVERWRITES its own partition with identical
 *    deterministic content instead of appending duplicate rows;
 *  - the probe never sees the crashed attempt's half-written partition,
 *    so a batch can never flag/dedup/aggregate against itself
 *    (the failure the flat-append layout produced in
 *    nearDupFlagsStream's self-review — every replayed document flagged
 *    against its own first-attempt sketches).
 *
 * The happy path is unchanged: `__batch < bid` is exactly "the log as
 * of the previous batch". Hand-rolled five times across round 12's
 * sinks before extraction; a ninth copy is a bug waiting to happen.
 *
 * `subPartitionCols` threads secondary partition columns under
 * `__batch` (e.g. a hash-prefix bucket that lets a standing-index probe
 * prune at the directory level — see
 * [[StreamOps.duplicateSpansStream]]). Dynamic overwrite still keys on
 * the full partition tuple, which stays safe under replay because the
 * batch's content — hence its sub-partition set — is deterministic.
 */
object LogStructuredSink {

  /** Write `df` as batch `bid`'s own partition(s), exactly-once under
    * replay. `df` must not already carry a `__batch` column. With
    * sub-partition columns the rows are first clustered on them so each
    * partition directory gets O(1) files, not one per upstream task —
    * 256 prefix dirs × 32 shuffle partitions of loose files per trigger
    * is exactly the small-file tax the layout must not introduce. */
  def write(df: DataFrame, path: String, bid: Long,
            subPartitionCols: Seq[String] = Nil): Unit = {
    val clustered =
      if (subPartitionCols.isEmpty) df
      else df.repartition(subPartitionCols.map(col): _*)
    clustered.withColumn("__batch", lit(bid))
      .write.partitionBy("__batch" +: subPartitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)
  }

  def exists(spark: SparkSession, path: String): Boolean =
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** The batch ids present in a log's partition layout — ONE driver-side
    * `listStatus`, NO Spark job (the point: per-trigger probes that only
    * need existence or the newest id should not launch a distributed max
    * over a one-column read — at local-mode latency each such job costs
    * ~0.3 s of scheduling, and at cluster scale it is a pointless
    * round-trip). None if the path does not exist yet; Some(empty) for an
    * existing dir with no `__batch=` partitions. */
  def listBatches(spark: SparkSession, path: String): Option[Seq[Long]] = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) None
    else Some(fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("__batch=") =>
        n.stripPrefix("__batch=").toLong })
  }

  /** Newest batch id a log holds — driver-side, no job. None when the
    * path is missing or holds no batch partitions. */
  def maxBatch(spark: SparkSession, path: String): Option[Long] =
    listBatches(spark, path).flatMap(ids =>
      if (ids.isEmpty) None else Some(ids.max))

  /** Newest COMMITTED batch id strictly before `bid` — the in-loop probe
    * for "the latest snapshot partition that applies to this batch"
    * (curateStream's totals base). One dir listing, zero Spark jobs —
    * this replaces a per-trigger `agg(max(__batch)).collect()` job whose
    * local-mode scheduling alone cost ~0.3 s. */
  def maxBatchBefore(spark: SparkSession, path: String,
                     bid: Long): Option[Long] =
    listBatches(spark, path).flatMap { ids =>
      val before = ids.filter(_ < bid)
      if (before.isEmpty) None else Some(before.max)
    }

  /** Per-sink positive-existence memo: a log path never un-exists within
    * one query lifetime, so after the first positive check the
    * per-trigger FS round-trip is skipped (local stat is ~free; on an
    * object store it is a real round trip per trigger). One instance per
    * STARTED query (closure state) — never global: benches and tests
    * delete and recreate the same paths between query lifetimes, and a
    * process-wide memo would poison the second lifetime's first probe. */
  final class PathMemo(path: String) {
    private var known = false
    def exists(spark: SparkSession): Boolean = {
      if (!known) known = LogStructuredSink.exists(spark, path)
      known
    }
    def readBefore(spark: SparkSession, bid: Long): Option[DataFrame] =
      if (exists(spark))
        Some(spark.read.parquet(path).filter(col("__batch") < lit(bid)))
      else None
  }

  /** The committed standing prefix of the log as of batch `bid` —
    * partitions strictly before `bid`; None before the first batch has
    * ever written (the path does not exist yet). */
  def readBefore(spark: SparkSession, path: String,
                 bid: Long): Option[DataFrame] =
    if (exists(spark, path))
      Some(spark.read.parquet(path).filter(col("__batch") < lit(bid)))
    else None

  /**
   * Committed-prefix read of a MULTI-log sink for EXTERNAL readers — the
   * generalized [[graft.streaming.StreamOps.readHeavyHitters]] gate: a
   * sink that commits several logs per trigger (e.g. curateStream's
   * data + sketch index + shard totals) writes them as SEPARATE jobs, so
   * a reader racing an in-flight trigger could see batch N's rows in the
   * first log before its rows land in the last — data without its index,
   * counts without their totals. Batch N is fully committed exactly when
   * EVERY log holds its partition, so the consistent snapshot is each log
   * filtered to `__batch ≤ min over logs of max(__batch)` — one
   * driver-side listing per log ([[listBatches]]), no Spark jobs.
   *
   * In-loop probes don't need this ([[readBefore]]'s `__batch < bid` is
   * already consistent); this is the contract for ad-hoc reads of a LIVE
   * sink's output. Returns one gated frame per path, in order; None for
   * the whole read if any log is missing or empty (no batch has fully
   * committed yet — "data exists but its index doesn't" must read as
   * nothing, not as ungated data).
   */
  def readCommitted(spark: SparkSession,
                    paths: Seq[String]): Option[Seq[DataFrame]] = {
    require(paths.nonEmpty, "at least one log path")
    val maxes = paths.map(maxBatch(spark, _))
    if (maxes.exists(_.isEmpty)) None
    else {
      val committed = maxes.flatten.min
      Some(paths.map(p =>
        spark.read.parquet(p).filter(col("__batch") <= lit(committed))))
    }
  }

  /**
   * Advisory lease serializing a live sink's trigger section against a
   * concurrent in-place compaction of the same log ([[compactLive]]):
   * without it, a compaction's partition deletes can invalidate files a
   * mid-flight probe already listed (trigger fails, replays — correct
   * but disruptive), and a probe could plan against a half-re-laid
   * layout. The lease file is a SIBLING of the log dir (`<path>.__lease`)
   * — inside it, its existence would flip a `readBefore` existence probe
   * before the first batch ever writes.
   *
   * Protocol: atomic create-if-absent of the lease file — on the local
   * scheme via `File.createNewFile` (a single O_CREAT|O_EXCL, because
   * Hadoop's LocalFileSystem `create(overwrite = false)` is a racy
   * exists-then-create), on HDFS-like schemes via `create(path, false)`
   * (atomic at the namenode) — and delete on release. A holder that dies
   * leaves the lease file behind; a contender breaks it after `staleMs`
   * of no modification (the holder's real work is bounded per
   * trigger/compaction, so a stale lease means a crash, not a long job).
   *
   * Cost on the trigger path: two driver-side FS metadata ops per
   * trigger (create + delete) — noise against the trigger's 3–5 jobs.
   */
  def withLease[T](spark: SparkSession, logPath: String,
                   staleMs: Long = 600000L, retryMs: Long = 50L,
                   timeoutMs: Long = 600000L)(body: => T): T = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(
      logPath.stripSuffix("/") + ".__lease")
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + timeoutMs
    var held = false
    while (!held) {
      held =
        if (fs.getScheme == "file") {
          val f = new java.io.File(lease.toUri.getPath)
          f.getParentFile.mkdirs()
          try {
            val got = f.createNewFile() // atomic O_CREAT|O_EXCL
            if (got) java.nio.file.Files.writeString(f.toPath, token)
            got
          } catch { case _: java.io.IOException => false }
        } else
          try {
            val out = fs.create(lease, false) // atomic create-if-absent
            out.write(token.getBytes("UTF-8")); out.close(); true
          } catch { case _: java.io.IOException => false }
      if (!held) {
        val st = try Some(fs.getFileStatus(lease)) catch {
          case _: java.io.FileNotFoundException => None
        }
        st.foreach { s =>
          if (System.currentTimeMillis() - s.getModificationTime > staleMs) {
            // crashed holder: break by renaming the corpse to a unique
            // name (NOT delete — two breakers deleting could remove a
            // fresh lease the other breaker's winner just created; a
            // rename moves only THIS corpse, exactly once) and re-contend
            // through the atomic create
            val corpse = new org.apache.hadoop.fs.Path(
              s"$lease.stale-$token")
            if (fs.rename(lease, corpse)) fs.delete(corpse, false)
          }
        }
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"could not acquire lease $lease within ${timeoutMs} ms")
        Thread.sleep(retryMs)
      }
    }
    try body
    finally fs.delete(lease, false)
  }

  /**
   * In-place compaction of a log-structured index UNDER A LIVE STREAM —
   * for DUPLICATION-TOLERANT read algebras only (distinct/existence,
   * max-merge): the fold lands INSIDE the live path, so there is no
   * swap-by-rename to coordinate with the sink's appends, and every
   * intermediate state a crash can leave behind reads correctly (at
   * worst some rows exist twice — invisible to a distinct/semi-join/max
   * reader — until a re-run cleans up). SUM-merged logs (CMS cells,
   * aggregate partials, top-k ranks) must NOT use this: between the fold
   * write and the stale-partition deletes a reader would double-count;
   * they keep the compact-to-a-new-path + swap-between-lifetimes
   * contract ([[graft.pipeline.Materialize.writeCompacted]]).
   *
   * Safety against the live sink, step by step (all under [[withLease]],
   * shared with the sink's trigger body):
   *
   *  1. Fold only partitions `__batch < max(listed)`: the NEWEST
   *     partition is the only one that can belong to an uncommitted
   *     (crashed, will-be-replayed) attempt — batch N starts only after
   *     batch N−1 committed — so the folded prefix can never be
   *     overwritten by a replay. Folding the newest too would stamp the
   *     fold with its id, and its replay's dynamic overwrite would then
   *     REPLACE the entire fold with just that batch's rows.
   *  2. Stamp the fold `__batch = max(folded ids)` — a committed id, ≥
   *     every folded id and < every future bid, so `__batch < bid`
   *     probes and `readCommitted` gates see the fold exactly where they
   *     saw the raw prefix.
   *  3. Write via dynamic partition overwrite (job-unique staging dir —
   *     safe beside a concurrent trigger's write to a later partition,
   *     which the lease excludes anyway).
   *  4. Delete the folded raw partitions (`__batch < stamp`) and, inside
   *     the stamp partition, stale sub-partition dirs the overwrite
   *     could not match (`staleSubDir` — e.g. a coarser hash-prefix
   *     generation). The lease guarantees no probe holds a file listing
   *     across these deletes.
   *
   * Returns the folded row count, or None when fewer than two partitions
   * exist (nothing is safely foldable yet).
   */
  def compactLive(spark: SparkSession, path: String,
                  fold: DataFrame => DataFrame,
                  subPartitionCols: Seq[String] = Nil,
                  staleSubDir: String => Boolean = _ => false,
                  staleMs: Long = 600000L): Option[Long] =
    withLease(spark, path, staleMs) {
      val ids = listBatches(spark, path).getOrElse(Seq.empty)
      if (ids.size < 2) None
      else {
        val newest = ids.max
        val foldable = ids.filter(_ < newest)
        val stamp = foldable.max
        val folded = fold(spark.read.parquet(path)
          .filter(col("__batch") < lit(newest)).drop("__batch"))
        val clustered =
          if (subPartitionCols.isEmpty) folded.coalesce(1)
          else folded.repartition(subPartitionCols.map(col): _*)
        val pinned = clustered.persist()
        val n = pinned.count()
        pinned.withColumn("__batch", lit(stamp))
          .write.partitionBy("__batch" +: subPartitionCols: _*)
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(path)
        pinned.unpersist()
        val fs = org.apache.hadoop.fs.FileSystem
          .get(spark.sparkContext.hadoopConfiguration)
        foldable.filter(_ != stamp).foreach(id => fs.delete(
          new org.apache.hadoop.fs.Path(s"$path/__batch=$id"), true))
        if (subPartitionCols.nonEmpty) {
          val stampDir = new org.apache.hadoop.fs.Path(
            s"$path/__batch=$stamp")
          fs.listStatus(stampDir).foreach { s =>
            if (s.isDirectory && staleSubDir(s.getPath.getName))
              fs.delete(s.getPath, true)
          }
        }
        Some(n)
      }
    }
}
