package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation — the composed flow a training-data pipeline
 * runs over a 100 TB document store, each stage the scale-safe operator
 * documented on its own object:
 *
 *   1. exact dedup (one digest-keyed shuffle)         [[Dedup.dropExactDuplicates]]
 *   2. near-dup removal (MinHash-LSH candidates →
 *      exact Jaccard verify; keep the lowest id of
 *      each verified pair)                            [[Dedup.nearDuplicatePairs]]
 *   3. quality + language gating (codegen'd
 *      expression compositions)                       [[Text]]
 *   4. deterministic train/val/test split             [[Sampling.hashSplit]]
 *   5. sharding + stream-offset sequence packing      [[Sampling.packSequences]]
 *
 * The result is one lazy DataFrame program — Catalyst fuses the gating
 * projections into the dedup scans, and nothing collects on the driver.
 */
object Curate {

  /** `hotBucketBound`: per-LSH-bucket occupancy guard for the near-dup
    * stage (see [[Dedup.minhashCandidatePairs]]). The default
    * [[Dedup.AutoBound]] self-tunes from the occupancy distribution —
    * template-spam buckets degrade to linear hub-stars with no knob to
    * set; `Int.MaxValue` restores the exact distinct-free unguarded plan. */
  case class Config(
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      nearDupJaccard: Double = 0.9,
      splits: Seq[(String, Int)] = Seq(("train", 9000), ("val", 500), ("test", 500)),
      packTokens: Int = 2048,
      shards: Int = 64,
      hotBucketBound: Int = Dedup.AutoBound)

  /**
   * @return the surviving documents with `quality`, `lang`, `split`,
   *         `shard`, `toks`, `pack_offset`, `pack_id` columns appended.
   */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): DataFrame = {
    // 1. exact duplicates: keep the lowest id per identical content
    val exact = Dedup.dropExactDuplicates(docs, textCol, idCol)

    // 2. near duplicates: LSH candidates, exact verify, greedy keep-lowest —
    // the anti join ignores repeated id_b rows, so no distinct is needed
    val losers = Dedup.nearDuplicatePairs(exact, textCol, idCol, cfg.nearDupJaccard,
      hotBucketBound = cfg.hotBucketBound)
      .select(col("id_b").as(idCol))
    val deduped = exact.join(losers, Seq(idCol), "left_anti")

    // 3. quality + language gate
    val gated = deduped
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .withColumn("lang", Text.langId(col(textCol)))
      .filter(col("quality") >= cfg.minQuality && col("lang").isin(cfg.langs: _*))

    // 4.–5. deterministic split, shard, pack
    val sharded = Sampling.hashSplit(gated, idCol, cfg.splits)
      .withColumn("shard", Sampling.hashBucket(col(idCol), cfg.shards))
      .withColumn("toks", Text.tokenCount(col(textCol)))
    Sampling.packSequences(sharded, "shard", idCol, "toks", cfg.packTokens)
  }

  /**
   * [[curate]] with pipeline observability for free: per-stage row counters
   * (`docs_in`, `exact_kept`, `near_kept`, `gated_kept`) collected via
   * Spark's Observation API — accumulator-backed, so the metrics ride the
   * SAME single pass that materializes the result; at 100 TB a
   * count()-per-stage telemetry would quadruple the pipeline. Read the
   * returned observations' `.get` AFTER an action on the result.
   */
  def curateObserved(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                     idCol: String, textCol: String, cfg: Config = Config())
      : (DataFrame, Seq[org.apache.spark.sql.Observation]) = {
    import org.apache.spark.sql.Observation
    val oIn = Observation("curate_in")
    val oExact = Observation("curate_exact")
    val oGated = Observation("curate_gated")
    val observed = docs.observe(oIn, count(lit(1)).as("docs_in"))
    val exact = Dedup.dropExactDuplicates(observed, textCol, idCol)
    val losers = Dedup.nearDuplicatePairs(exact, textCol, idCol, cfg.nearDupJaccard,
      hotBucketBound = cfg.hotBucketBound)
      .select(col("id_b").as(idCol))
    // observe on the anti-join's LEFT input only: `exact` feeds two plan
    // branches (the LSH candidate pipeline and this anti-join), and a
    // CollectMetrics node duplicated across branches races on the
    // observation name under AQE/exchange reuse — a partially-executed
    // instance could win the collision. The left input flows every
    // exact-dedup survivor exactly once, so the counter is unchanged.
    val deduped = exact.observe(oExact, count(lit(1)).as("exact_kept"))
      .join(losers, Seq(idCol), "left_anti")
    val gated = deduped
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .withColumn("lang", Text.langId(col(textCol)))
      .filter(col("quality") >= cfg.minQuality && col("lang").isin(cfg.langs: _*))
      .observe(oGated, count(lit(1)).as("gated_kept"))
    val sharded = Sampling.hashSplit(gated, idCol, cfg.splits)
      .withColumn("shard", Sampling.hashBucket(col(idCol), cfg.shards))
      .withColumn("toks", Text.tokenCount(col(textCol)))
    (Sampling.packSequences(sharded, "shard", idCol, "toks", cfg.packTokens),
      Seq(oIn, oExact, oGated))
  }

  /**
   * Write a curated frame in the standard training layout:
   * `path/split=<s>/shard=<n>/` parquet files, sorted by pack_id within
   * each file so the loader streams packs sequentially. Partition pruning then
   * serves "give me train shard 17" as a directory lookup — no manifest
   * service, no full-corpus listing; appended batches land as new files
   * in the same directories.
   */
  def writeTrainingLayout(curated: DataFrame, path: String): Unit =
    curated
      .repartition(col("split"), col("shard"))
      .sortWithinPartitions("split", "shard", "pack_id")
      .write.mode("append").partitionBy("split", "shard").parquet(path)

  /**
   * Incremental curation: curate a NEW batch against a STANDING corpus
   * without re-reading any corpus text. Standing state consumed:
   *
   *  - the corpus sketch index ([[Dedup.writeMinhashIndex]] over the KEPT
   *    documents of previous runs) — cross-batch duplicate detection reads
   *    only this slim table;
   *  - optionally `shardBase` = [[shardTokenTotals]] of the previous
   *    output, so the packed token stream CONTINUES where the corpus left
   *    off instead of restarting at offset 0.
   *
   * Equivalence with full [[curate]] over (corpus ∪ batch), given the
   * append-only id discipline (every batch id greater than every corpus
   * id — keep-lowest then never evicts a standing document):
   *
   *  - batch-internal near-dups: identical path (LSH candidates → exact
   *    Jaccard verify);
   *  - batch-vs-corpus near-dups: with `corpusDocs` given, the SAME exact
   *    verify ([[Dedup.nearDuplicatePairsAgainstIndex]]) — corpus text is
   *    read for candidate ids only (broadcast semi-join prune), so the
   *    classification is identical to the full run at a candidate-sized
   *    cost. Without `corpusDocs`, the gate falls back to the ESTIMATED
   *    Jaccard from the stored signatures (no corpus access at all) —
   *    estimate and exact agree in expectation and can differ only for
   *    pairs sitting near the threshold. Exact duplicates of corpus
   *    documents pass either gate (identical text ⇒ identical signature ⇒
   *    estimate 1.0);
   *  - split/shard/quality/lang are pure per-document functions;
   *  - packing continues the per-shard stream when `shardBase` is given
   *    (corpus ids sort before batch ids, so the union's per-shard prefix
   *    sums decompose exactly into corpus totals + batch-internal sums).
   */
  /** @param indexFrame when given, the standing sketch set probed for
    *        cross-corpus near-dups INSTEAD of reading `indexPath` — the
    *        hook for the exactly-once streaming sink, whose standing
    *        side is a read-only seed index unioned with its own
    *        batch-partitioned growth zone restricted to `__batch < bid`
    *        (a path read would see the replayed batch's OWN first-attempt
    *        sketches and drop every replayed survivor as a self-dup).
    *        Must carry the index's `sig`/`bh` field metadata. */
  def curateIncrement(spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
                      idCol: String, textCol: String, indexPath: String,
                      shardBase: Option[DataFrame] = None,
                      cfg: Config = Config(),
                      corpusDocs: Option[DataFrame] = None,
                      indexFrame: Option[DataFrame] = None): DataFrame = {
    val exact = Dedup.dropExactDuplicates(batch, textCol, idCol)
    val losersIn = Dedup.nearDuplicatePairs(exact, textCol, idCol, cfg.nearDupJaccard,
      hotBucketBound = cfg.hotBucketBound)
      .select(col("id_b").as(idCol))
    val sketches = indexFrame.getOrElse(spark.read.parquet(indexPath))
    val losersX = (corpusDocs match {
      case Some(corpus) =>
        Dedup.nearDuplicatePairsAgainstSketchFrame(sketches, exact, corpus,
          textCol, idCol, cfg.nearDupJaccard, hotBucketBound = cfg.hotBucketBound)
      case None =>
        Dedup.minhashCandidatePairsAgainstSketchFrame(sketches, exact,
          textCol, idCol, hotBucketBound = cfg.hotBucketBound)
          .filter(col("est_jaccard") >= cfg.nearDupJaccard)
    }).select(col("id_b").as(idCol))
    val deduped = exact.join(losersIn.unionByName(losersX), Seq(idCol), "left_anti")

    val gated = deduped
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .withColumn("lang", Text.langId(col(textCol)))
      .filter(col("quality") >= cfg.minQuality && col("lang").isin(cfg.langs: _*))

    val sharded = Sampling.hashSplit(gated, idCol, cfg.splits)
      .withColumn("shard", Sampling.hashBucket(col(idCol), cfg.shards))
      .withColumn("toks", Text.tokenCount(col(textCol)))
    val packed = Sampling.packSequences(sharded, "shard", idCol, "toks", cfg.packTokens)
    shardBase match {
      case None => packed
      case Some(base) =>
        packed
          .join(broadcast(base.select(col("shard"), col("base_tokens"))), Seq("shard"), "left")
          .withColumn("pack_offset",
            col("pack_offset") + coalesce(col("base_tokens"), lit(0L)))
          .withColumn("pack_id", floor(col("pack_offset") / cfg.packTokens.toLong))
          .drop("base_tokens")
    }
  }

  /** Per-shard token totals of a curated output — the `shardBase` input of
    * the next [[curateIncrement]]: a tiny aggregate over the previous
    * OUTPUT (one row per shard), never over corpus text. The last document
    * of a shard ends at pack_offset + toks = the shard's stream length. */
  def shardTokenTotals(curated: DataFrame): DataFrame =
    curated.groupBy("shard")
      .agg(max(col("pack_offset") + col("toks")).as("base_tokens"))
}
