package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Scan-parallelism guard for CPU-dense per-row stages (hashing,
 * sketching, gram/line tokenization).
 *
 * A parquet ROW GROUP is the minimum read unit: a single-row-group file
 * is an unsplittable input (optimization guide §2.5) — however small
 * `spark.sql.files.maxPartitionBytes` makes the splits, every split
 * except the one holding the row-group midpoint is empty, so the whole
 * map stage (per-row md5/minhash/shingling AND its partial aggregation)
 * runs in ONE task while the rest of the cluster idles. Measured on the
 * bench inputs (every table one row group): the p=16 register build over
 * lineitem ran as one 2.5 s task on a 32-core session.
 *
 * [[spread]] repairs exactly that case: when the (narrow, pre-projected)
 * input's planned scan parallelism is well below the session's cores, it
 * inserts ONE deterministic round-robin exchange of the slim columns so
 * the expensive per-row work downstream parallelizes. On well-split
 * sources — the 100 TB regime, where inputs arrive as many files with
 * many row groups — the guard sees adequate parallelism and is a NO-OP,
 * so operators stay scale-adaptive instead of tuned for either local
 * mode or the cluster (guide §2's rule). Call it on the PROJECTED
 * frame (key/value columns only), never the full-width row, so the
 * exchange moves metadata-sized bytes (§2.3).
 *
 * Round-robin repartition sorts its input before assigning rows
 * (`spark.sql.execution.sortBeforeRepartition`, on by default) so task
 * retries reproduce the same placement; every downstream consumer here
 * is an aggregate/join whose result is placement-independent anyway
 * (the whole board hash-matches an engine with a different row order).
 */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // .rdd only plans (no job); ×2 hysteresis so an already-parallel
    // source (or a small session) never pays a pointless exchange
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target)
    else df
  }
}
