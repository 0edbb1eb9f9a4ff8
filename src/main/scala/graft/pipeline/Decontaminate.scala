package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
