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

  case class Config(
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      nearDupJaccard: Double = 0.9,
      splits: Seq[(String, Int)] = Seq(("train", 9000), ("val", 500), ("test", 500)),
      packTokens: Int = 2048,
      shards: Int = 64)

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
    val losers = Dedup.nearDuplicatePairs(exact, textCol, idCol, cfg.nearDupJaccard)
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
}
