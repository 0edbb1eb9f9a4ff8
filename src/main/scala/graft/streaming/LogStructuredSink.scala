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

  /** The committed standing prefix of the log as of batch `bid` —
    * partitions strictly before `bid`; None before the first batch has
    * ever written (the path does not exist yet). */
  def readBefore(spark: SparkSession, path: String,
                 bid: Long): Option[DataFrame] =
    if (exists(spark, path))
      Some(spark.read.parquet(path).filter(col("__batch") < lit(bid)))
    else None
}
