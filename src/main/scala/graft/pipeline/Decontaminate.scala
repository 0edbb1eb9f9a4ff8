package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag training documents that share at least
 * one word n-gram with an evaluation/benchmark set — the standard
 * train/test-overlap guard (13-gram overlap in GPT-3's cleanup, 8-gram in
 * several open pipelines). A doc that embeds any eval question verbatim
 * leaks the benchmark; this finds it before training.
 *
 * Scale shape: the EVAL side is small (benchmarks are thousands of
 * documents, the corpus is billions), so its distinct gram set broadcasts;
 * the corpus explodes its grams map-side and equi-joins — no corpus
 * shuffle at all, and the per-doc aggregate is partial map-side. Gram
 * strings are the join key here for oracle exactness; at 100 TB you'd key
 * on `fingerprint64(gram)` instead to shrink the broadcast and the
 * exploded rows (same plan shape, 8 bytes per gram).
 */
object Decontaminate {

  /**
   * @return (doc_id, n_shared_grams) for corpus docs sharing ≥ 1 distinct
   *         word n-gram with any eval doc; clean docs are absent.
   */
  def flags(corpus: DataFrame, evalSet: DataFrame,
            textCol: String, idCol: String, n: Int = 8): DataFrame = {
    val corpusGrams = corpus.select(col(idCol).as("doc_id"),
      explode(array_distinct(Text.wordShingles(col(textCol), n))).as("gram"))
    val evalGrams = evalSet
      .select(explode(array_distinct(Text.wordShingles(col(textCol), n))).as("gram"))
      .distinct()
    // per-doc grams and eval grams are both distinct → join multiplicity is
    // 1 per (doc, shared gram): count(*) IS the distinct shared-gram count
    corpusGrams.join(broadcast(evalGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
  }

  /**
   * Persist the eval set's distinct n-gram FINGERPRINTS as a standing
   * index — the incremental form of [[flags]] for a daily-ingest corpus:
   * benchmarks are tokenized once at index build; every future batch
   * joins the slim 8-byte-per-gram table instead of re-shingling the
   * eval texts. `n` rides in field metadata ([[Dedup.writeMinhashIndex]]
   * convention) so queries cannot mix gram sizes; new benchmarks append
   * via [[appendEvalGramIndex]] (a distinct-per-append log — harmless
   * duplicates across appends are erased by the query-side distinct).
   *
   * Fingerprinting is the documented 100 TB key choice (64-bit
   * fingerprint64 ≡ what the [[flags]] scaladoc recommends): collisions
   * (~n_grams²/2⁶⁴) can only over-flag, never miss a leak. The
   * suite pins parity with the string-keyed [[flags]] on real corpora.
   */
  def writeEvalGramIndex(evalSet: DataFrame, textCol: String, path: String,
                         n: Int = 8): Unit =
    evalGramFrame(evalSet, textCol, n).write.mode("overwrite").parquet(path)

  /** Append a new benchmark's grams; `n` comes from the index metadata. */
  def appendEvalGramIndex(spark: SparkSession, path: String,
                          evalSet: DataFrame, textCol: String): Unit = {
    val n = spark.read.parquet(path).schema("gram_fp")
      .metadata.getLong("n").toInt
    evalGramFrame(evalSet, textCol, n).write.mode("append").parquet(path)
  }

  private def evalGramFrame(evalSet: DataFrame, textCol: String,
                            n: Int): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("n", n).build()
    evalSet
      .select(explode(array_distinct(Text.wordShingles(col(textCol), n)))
        .as("gram"))
      .distinct()
      .select(Text.fingerprint64(col("gram")).as("gram_fp", meta))
  }

  /**
   * [[flags]] against the persisted index: the batch explodes its grams
   * map-side, fingerprints them, and equi-joins the broadcast index —
   * the eval texts are never re-read and the batch never shuffles
   * (identical plan shape to [[flags]], 8-byte keys).
   */
  def flagsAgainstIndex(spark: SparkSession, path: String, corpus: DataFrame,
                        textCol: String, idCol: String): DataFrame = {
    val idx = spark.read.parquet(path)
    val n = idx.schema("gram_fp").metadata.getLong("n").toInt
    val corpusGrams = corpus
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(Text.wordShingles(col(textCol), n))).as("__gram"))
      .select(col("doc_id"), Text.fingerprint64(col("__gram")).as("gram_fp"))
    corpusGrams.join(broadcast(idx.select(col("gram_fp")).distinct()), "gram_fp")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
  }
}
