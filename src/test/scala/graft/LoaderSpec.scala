package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Dtype-drift insurance (the round-6 NTZ episode generalized): the only
 * thing that has ever turned the correctness board red was an upstream
 * physical-encoding change in the harness parquet. This suite reads
 * LOSSLESS variant encodings of every harness table
 * (tools/make_variants.py → src/test/resources/graft/variants/
 * {narrow,wide,zoned}) through the production loader and pins
 *
 *  1. per-table loadability + row-count equality with the base dir,
 *  2. the normalized logical types of every timestamp column
 *     (events.ts → TIMESTAMP µs UTC; l_shipdate / o_orderdate →
 *     TIMESTAMP_NTZ — today's types, whatever the file shipped), and
 *  3. value-identical results for a representative query slice spanning
 *     the column families (int keys narrow+wide, large_string text,
 *     ns/zoned timestamps, float64 embeddings).
 *
 * Variant encodings per table (≥6): narrow int32 keys; wide int64 +
 * large_string + list<double> embeddings + timestamp[ns]; zoned
 * timestamp[us, tz=UTC]; decimal(18,2) money columns; date32
 * date-semantic columns; all-non-null columns flipped to parquet
 * `required`. The full-board equivalent runs builder-side via Verify +
 * the DuckDB oracle gate on each variant dir.
 */
class LoaderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-loader-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val base = "/root/testdata/sf0.001"
  private val variantRoot =
    new java.io.File("src/test/resources/graft/variants").getAbsolutePath
  private val variants =
    Seq("narrow", "wide", "zoned", "decimal", "date32", "required")
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("every variant of every table loads with base row counts") {
    val baseCounts = tables.map(t => t -> Queries.t(spark, base, t).count()).toMap
    for (v <- variants; tbl <- tables) {
      val df = Queries.t(spark, s"$variantRoot/$v", tbl)
      assert(df.count() == baseCounts(tbl), s"$v/$tbl row count")
    }
  }

  test("timestamp columns normalize to today's logical types under every encoding") {
    for (v <- "base" +: variants) {
      val dir = if (v == "base") base else s"$variantRoot/$v"
      assert(Queries.t(spark, dir, "events").schema("ts").dataType == TimestampType,
        s"$v events.ts")
      assert(Queries.t(spark, dir, "lineitem").schema("l_shipdate").dataType ==
        TimestampNTZType, s"$v l_shipdate")
      assert(Queries.t(spark, dir, "orders").schema("o_orderdate").dataType ==
        TimestampNTZType, s"$v o_orderdate")
    }
  }

  test("event timestamps carry identical instants under every encoding") {
    def tsSum(dir: String): Long = Queries.t(spark, dir, "events")
      .select(org.apache.spark.sql.functions.sum(
        graft.pipeline.Time.tsMicros(org.apache.spark.sql.functions.col("ts"))))
      .head().getLong(0)
    val b = tsSum(base)
    for (v <- variants)
      assert(tsSum(s"$variantRoot/$v") == b, s"$v ts instants")
  }

  // representative query slice across the column families; results are
  // compared VALUE-wise with integer widths normalized (narrow int32
  // outputs are the int32 the file carries — by design, matching what an
  // external engine reads from the same file)
  private val slice = Seq(
    "q01_pricing_summary",   // lineitem aggregates + shipdate column present
    "q04_orders_per_region", // 4-table join across int key widths
    "q21_dedup_exact",       // documents md5 over (large_)string text
    "q26_cosine_topk",       // embeddings float32/float64
    "q112_funnel",           // event-time micros through ns/ntz/zoned ts
    "q148_kcore",            // key arithmetic ((a*31+b)%7) across widths
    "q163_bloom_prune",      // orders month string-formatting + bloom probe
    "q107_kmeans_clusters")  // id-typed fold zero vs long centroid ids
                             // (caught the ivfAssignWith width bug)

  // decimal-variant outputs render with fixed scale ("342468.60") where
  // the base double renders "342468.6" — same VALUE, different dtype
  // rendering (output dtype follows the input by design). Normalize
  // decimal-looking strings through BigDecimal before comparing.
  private val num = """-?\d+\.\d+""".r
  private def norm(s: String): String = s match {
    case num() => BigDecimal(s).underlying.stripTrailingZeros.toPlainString
    case _ => s
  }
  private def rows(dir: String, q: String): Seq[Seq[String]] =
    Queries.all(q)(spark, dir).collect().toSeq
      .map(_.toSeq.map(x => norm(String.valueOf(x))))

  for (q <- slice) test(s"$q: identical values on every variant encoding") {
    val expect = rows(base, q)
    assert(expect.nonEmpty || q == "q148_kcore", s"base $q empty")
    for (v <- variants)
      assert(rows(s"$variantRoot/$v", q) == expect, s"$v $q")
  }
}
