package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * 10× scale stress for the INCREMENTAL operators — the paths a standing
 * 100 TB corpus exercises daily. Measures whether the cost of
 * curateIncrement / appendMinhashIndex / appendIvfIndex scales with the
 * BATCH (+ slim index), not with the standing corpus: each step runs
 * against a 1× standing corpus and a 10× standing corpus with the SAME
 * batch; the 10×/1× wall-time ratio is the verdict (≪ 10 = batch-bound).
 *
 * Also demonstrates the self-tuning hot-bucket guard on a spam-injected
 * corpus: the DEFAULT (AutoBound) pair generation vs the unguarded plan,
 * with pair counts.
 *
 * Usage: runMain graft.tools.IncrementalStress <sf0.1 dir> <10x dir> [outFile]
 */
object IncrementalStress {
  def main(args: Array[String]): Unit = {
    val dir1 = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dir10 = if (args.length > 1) args(1) else "/tmp/sf1_perturb"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = new StringBuilder
    def log(s: String): Unit = { println(s); report.append(s).append('\n') }

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      log(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs1 = spark.read.parquet(s"$dir1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs10 = spark.read.parquet(s"$dir10/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n1 = docs1.count(); val n10 = docs10.count()
    val maxId = docs10.agg(max("doc_id")).head().getLong(0)
    // append-only discipline: batch ids above every standing id
    val batch = docs1.select((col("doc_id") + (maxId + 1)).as("doc_id"), col("text"))
    log(s"standing 1x = $n1 docs, standing 10x = $n10 docs, batch = $n1 docs")

    // ---- minhash index build (one-time cost, scales with corpus) ----
    val idx1 = "/tmp/graft_incr_idx1"; val idx10 = "/tmp/graft_incr_idx10"
    timed("writeMinhashIndex 1x ")(graft.pipeline.Dedup.writeMinhashIndex(docs1, "text", "doc_id", idx1))
    timed("writeMinhashIndex 10x")(graft.pipeline.Dedup.writeMinhashIndex(docs10, "text", "doc_id", idx10))

    // ---- curateIncrement: same batch vs 1x and 10x standing state ----
    val cfg = graft.pipeline.Curate.Config(minQuality = 0.5, nearDupJaccard = 0.8,
      packTokens = 512, shards = 8)
    log("curateIncrement (estimate gate, no corpus text):")
    (1 to 2).foreach { i =>
      timed(s"  vs 1x  run$i")(graft.pipeline.Curate.curateIncrement(
        spark, batch, "doc_id", "text", idx1, None, cfg).queryExecution.toRdd.count())
      timed(s"  vs 10x run$i")(graft.pipeline.Curate.curateIncrement(
        spark, batch, "doc_id", "text", idx10, None, cfg).queryExecution.toRdd.count())
    }
    log("curateIncrement (EXACT cross-corpus verify, candidate-bounded text reads):")
    (1 to 2).foreach { i =>
      timed(s"  vs 1x  run$i")(graft.pipeline.Curate.curateIncrement(
        spark, batch, "doc_id", "text", idx1, None, cfg,
        corpusDocs = Some(docs1)).queryExecution.toRdd.count())
      timed(s"  vs 10x run$i")(graft.pipeline.Curate.curateIncrement(
        spark, batch, "doc_id", "text", idx10, None, cfg,
        corpusDocs = Some(docs10)).queryExecution.toRdd.count())
    }

    // ---- appendMinhashIndex: batch sketches into standing index ----
    import org.apache.commons.io.FileUtils
    val idx1a = "/tmp/graft_incr_idx1_app"; val idx10a = "/tmp/graft_incr_idx10_app"
    FileUtils.deleteQuietly(new java.io.File(idx1a)); FileUtils.deleteQuietly(new java.io.File(idx10a))
    FileUtils.copyDirectory(new java.io.File(idx1), new java.io.File(idx1a))
    FileUtils.copyDirectory(new java.io.File(idx10), new java.io.File(idx10a))
    timed("appendMinhashIndex to 1x ")(graft.pipeline.Dedup.appendMinhashIndex(
      spark, idx1a, batch, "text", "doc_id"))
    timed("appendMinhashIndex to 10x")(graft.pipeline.Dedup.appendMinhashIndex(
      spark, idx10a, batch, "text", "doc_id"))

    // ---- IVF: build standing, append a batch, query ----
    val emb1 = spark.read.parquet(s"$dir1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb10 = spark.read.parquet(s"$dir10/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val maxVec = emb10.agg(max("vec_id")).head().getLong(0)
    val vbatch = emb1.select((col("vec_id") + (maxVec + 1)).as("vec_id"), col("embedding"))
    val ivf1 = "/tmp/graft_incr_ivf1"; val ivf10 = "/tmp/graft_incr_ivf10"
    timed("writeIvfIndex 1x  (2k vec)")(graft.pipeline.Similarity.writeIvfIndex(
      emb1, "vec_id", "embedding", ivf1, nLists = 16))
    timed("writeIvfIndex 10x (20k vec)")(graft.pipeline.Similarity.writeIvfIndex(
      emb10, "vec_id", "embedding", ivf10, nLists = 16))
    timed("appendIvfIndex to 1x ")(graft.pipeline.Similarity.appendIvfIndex(
      spark, ivf1, vbatch, "vec_id", "embedding"))
    timed("appendIvfIndex to 10x")(graft.pipeline.Similarity.appendIvfIndex(
      spark, ivf10, vbatch, "vec_id", "embedding"))
    val queries = emb1.limit(32)
    (1 to 2).foreach { i =>
      timed(s"ivfTopKIndexed 1x+batch  run$i")(graft.pipeline.Similarity.ivfTopKIndexed(
        spark, ivf1, queries, "vec_id", "embedding", k = 5).queryExecution.toRdd.count())
      timed(s"ivfTopKIndexed 10x+batch run$i")(graft.pipeline.Similarity.ivfTopKIndexed(
        spark, ivf10, queries, "vec_id", "embedding", k = 5).queryExecution.toRdd.count())
    }

    // ---- self-tuning guard on spam-injected 10x corpus ----
    val spamBody = (1 to 60).map(i => s"spamtoken$i").mkString(" ")
    val spam = spark.range(3000)
      .select((col("id") + maxId + 1000000L).as("doc_id"), lit(spamBody).as("text"))
    val spammy = docs10.unionByName(spam)
    log("near-dup pairs on 10x + 3000-clone spam block:")
    (1 to 2).foreach { i =>
      val nAuto = timed(s"  DEFAULT AutoBound run$i")(
        graft.pipeline.Dedup.nearDuplicatePairs(spammy, "text", "doc_id", threshold = 0.8)
          .queryExecution.toRdd.count())
      log(s"    pairs=$nAuto")
    }
    (1 to 2).foreach { i =>
      val nOff = timed(s"  unguarded        run$i")(
        graft.pipeline.Dedup.nearDuplicatePairs(spammy, "text", "doc_id", threshold = 0.8,
          hotBucketBound = Int.MaxValue).queryExecution.toRdd.count())
      log(s"    pairs=$nOff")
    }

    if (args.length > 2)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
        report.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
