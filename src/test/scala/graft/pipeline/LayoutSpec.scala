package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-layout-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Reference bit-by-bit Morton interleave. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; d <- vals.indices) {
      z |= ((vals(d) >> b) & 1L) << (b * vals.size + d)
    }
    z
  }

  test("mortonValue matches the bit-by-bit reference for 2 and 3 dims") {
    import spark.implicits._
    val samples = Seq(
      (0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (65535L, 65535L, 0L), (12345L, 54321L, 7L), (40503L, 2657L, 190123L),
      (65535L, 0L, 2097151L), (31L, 1023L, 1L))
    val df = samples.toDF("a", "b", "c")
    val got2 = df.select(Layout.mortonValue(Seq(col("a"), col("b"))))
      .collect().map(_.getLong(0))
    val exp2 = samples.map { case (a, b, _) => mortonRef(Seq(a & 0xFFFF, b & 0xFFFF), 16) }
    assert(got2.toSeq == exp2)
    val got3 = df.select(Layout.mortonValue(Seq(col("a"), col("b"), col("c"))))
      .collect().map(_.getLong(0))
    val exp3 = samples.map { case (a, b, c) =>
      mortonRef(Seq(a & 0x1FFFFF, b & 0x1FFFFF, c & 0x1FFFFF), 21) }
    assert(got3.toSeq == exp3)
  }

  test("withZValue normalizes per-column ranges and handles nulls/constants") {
    import spark.implicits._
    // y is constant; x spans [100, 300]; null x lands at grid 0
    val df = Seq((Some(100.0), 5.0), (Some(300.0), 5.0), (None, 5.0), (Some(200.0), 5.0))
      .toDF("x", "y")
    val z = Layout.withZValue(df, Seq("x", "y")).select("__z")
      .collect().map(_.getLong(0))
    // constant y contributes 0 bits; x min -> 0, max -> full grid spread
    val full = (0 until 16).map(i => 1L << (2 * i)).sum
    assert(z(0) == 0L && z(2) == 0L && z(1) == full)
    assert(z(3) > 0L && z(3) < full)
  }

  test("zorderWrite files cover small rectangles; a shuffled write does not") {
    import spark.implicits._
    // deterministic scatter over a 1024x1024 square
    val pts = (0 until 20000).map { i =>
      ((i * 2654435761L) % 1024, (i * 40503L) % 1024)
    }.toDF("x", "y")

    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val zDir = base + "/z"
    val sDir = base + "/s"
    Layout.zorderWrite(pts, Seq("x", "y"), zDir, numFiles = 16)
    pts.repartition(16).write.parquet(sDir) // round-robin shuffle: no locality

    def meanFileArea(dir: String): Double = {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = spark.sessionState.newHadoopConf()
      val p = new Path(dir)
      val files = p.getFileSystem(conf).listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      val areas = files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try {
          val ranges = Array.fill(2)((Long.MaxValue, Long.MinValue))
          for (block <- r.getFooter.getBlocks.asScala;
               (cc, i) <- block.getColumns.asScala.zipWithIndex) {
            val st = cc.getStatistics
            val mn = st.genericGetMin.asInstanceOf[Number].longValue
            val mx = st.genericGetMax.asInstanceOf[Number].longValue
            ranges(i) = (math.min(ranges(i)._1, mn), math.max(ranges(i)._2, mx))
          }
          ranges.map { case (mn, mx) => (mx - mn + 1) / 1024.0 }.product
        } finally r.close()
      }
      areas.sum / areas.length
    }

    val zArea = meanFileArea(zDir)
    val sArea = meanFileArea(sDir)
    // each shuffled file spans ~the whole square (area ~1); 16 z-ordered
    // curve tiles each cover ~1/16 of it — require a decisive gap
    assert(sArea > 0.8, s"shuffled files unexpectedly tight: $sArea")
    assert(zArea < sArea / 4, s"z=$zArea shuffled=$sArea")

    // and the data itself round-trips unchanged
    val back = spark.read.parquet(zDir).as[(Long, Long)].collect().toSet
    assert(back == pts.as[(Long, Long)].collect().toSet)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("rowGroupPruneStats: z-order keeps strictly fewer row groups than round-robin") {
    import spark.implicits._
    val pts = (0 until 20000).map { i =>
      ((i * 2654435761L) % 1024, (i * 40503L) % 1024)
    }.toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Layout.zorderWrite(pts, Seq("x", "y"), base + "/z", 16)
    pts.repartition(16).write.parquet(base + "/rr")
    // a ~5%×5% band predicate — the q128_zorder_prune shape
    val bands = Seq(("x", 100L, 150L), ("y", 100L, 150L))
    val (zk, zt) = Layout.rowGroupPruneStats(spark, base + "/z", bands)
    val (rk, rt) = Layout.rowGroupPruneStats(spark, base + "/rr", bands)
    assert(zt >= 16 && rt >= 16, s"z=$zt rr=$rt groups")
    // every round-robin group spans ~the whole square → nothing prunes
    assert(rk == rt, s"round-robin pruned unexpectedly: $rk/$rt")
    assert(zk * 4 <= rk, s"z kept $zk/$zt vs rr $rk/$rt — want ≥4× pruning")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("compactFiles: small-file layout collapses to the byte-derived count, data unchanged") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val small = s"$base/small"
    val out = s"$base/out"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(64).write.parquet(small) // 64 tiny files
    def parts(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(small).length == 64)
    val bytes = parts(small).map(_.length).sum
    val target = bytes / 3 // expect ceil(total/target) ≈ 3-4 outputs
    val n = Layout.compactFiles(spark, small, out, targetBytes = target)
    assert(n >= 3 && n <= 4, s"n=$n")
    assert(parts(out).length == n)
    val a = docs.collect().map(_.toSeq).toSet
    val b = spark.read.parquet(out).select(docs.columns.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(a == b)

    // partitioned layouts compact within each partition directory
    val pSmall = s"$base/psmall"
    val pOut = s"$base/pout"
    docs.withColumn("bucket", col("doc_id") % 2)
      .repartition(32).write.partitionBy("bucket").parquet(pSmall)
    Layout.compactFiles(spark, pSmall, pOut, targetBytes = Long.MaxValue,
      partitionCols = Seq("bucket"))
    for (d <- Seq("bucket=0", "bucket=1"))
      assert(parts(s"$pOut/$d").length == 1, d)
    val pb = spark.read.parquet(pOut)
    assert(pb.count() == docs.count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("bucketWrite: co-bucketed join plans with zero shuffle exchanges") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val fact = spark.range(0, 10000).select(
      (col("id") % 500).as("k"), col("id").as("payload"))
    val dim = spark.range(0, 500).select(
      col("id").as("k"), concat(lit("v"), col("id")).as("tag"))
    Layout.bucketWrite(fact, "graft_test_fact", "k", 8, s"$base/fact")
    Layout.bucketWrite(dim, "graft_test_dim", "k", 8, s"$base/dim")
    val bf = spark.table("graft_test_fact")
    val bd = spark.table("graft_test_dim")
    val joined = bf.hint("MERGE").join(bd, "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // the whole point of the layout: NO exchange anywhere in the join plan
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange"),
      plan.take(2000))
    // one file per bucket (task/bucket alignment) → sortBy metadata valid
    val bucketFiles = new java.io.File(s"$base/fact").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(bucketFiles.length == 8, bucketFiles.length.toString)
    // values survive the layout
    assert(joined.count() == 10000L)
    val sums = joined.groupBy("k").agg(sum("payload").as("s"))
      .orderBy("k").limit(1).head()
    assert(sums.getLong(0) == 0L && sums.getLong(1) == (0L until 10000L by 500L).sum)
    spark.sql("DROP TABLE IF EXISTS graft_test_fact")
    spark.sql("DROP TABLE IF EXISTS graft_test_dim")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
