package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape regression guards: the scale properties of headline queries —
 * pushdown reaching scans, broadcasts on dim sides, no nested-loop joins in
 * the grid spatial join, partial aggregation before exchanges — must
 * survive refactors. These assert on the optimized/executed plan text.
 */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-planshape-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String =
    Queries.all(q)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filter pushdown reaches the parquet scan + partial aggregation") {
    val plan = executedPlan("q01_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,50.0)]"), plan.take(2000))
    // partial agg before the exchange: at least two HashAggregates
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(1200))
  }

  test("q01: column pruning — unused columns never reach the scan") {
    val plan = executedPlan("q01_pricing_summary")
    val scanPart = plan.substring(plan.indexOf("FileScan"))
    // pruned: keys/dates not referenced by the query
    assert(!scanPart.contains("l_orderkey"), scanPart.take(400))
    assert(!scanPart.contains("l_shipdate"), scanPart.take(400))
    assert(scanPart.contains("l_quantity"), scanPart.take(400))
  }

  test("q03: dimension joins broadcast (no shuffle of the fact side)") {
    val plan = executedPlan("q03_revenue_by_customer")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("q33: grid spatial join is an equi-join on the cell id") {
    val plan = executedPlan("q33_grid_spatial_join")
    // the MAIN path joins on the cell id; nested-loop joins may appear only
    // in the (empty-at-runtime) over-cap fallback branches that make the
    // operator result-preserving at any pitch
    assert(plan.contains("BroadcastHashJoin [__cell") ||
      plan.contains("SortMergeJoin [__cell") ||
      plan.contains("ShuffledHashJoin [__cell"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q21: dedup shuffles the digest, not the text") {
    val plan = executedPlan("q21_dedup_exact")
    // the exchange key is the md5 expression output, and text is not in the
    // post-aggregation schema
    assert(plan.contains("md5"), plan.take(1200))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(1200))
  }

  test("q26: query side broadcasts; corpus is not exchanged before the join") {
    val plan = executedPlan("q26_cosine_topk")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan.take(1500))
  }

  test("q26: scale-safe top-k — no per-query window, partial+final object agg") {
    val plan = executedPlan("q26_cosine_topk")
    // the re-rank must NOT be a window that funnels each query's full
    // candidate set into a single partition
    assert(!plan.contains("Window"), plan.take(2500))
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q07: bounded top-k aggregate — no window, no object codec") {
    val plan = executedPlan("q07_window_rank")
    // map-side partial bounded_top_k + final merge; the whole fact table
    // never lands in one partition per flag, and nothing leaves codegen
    // via the Row codec
    assert("ObjectHashAggregate|SortAggregate".r.findFirstIn(plan).isDefined, plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("DeserializeToObject"), plan.take(2500))
    assert(!plan.contains("MapPartitions"), plan.take(2500))
  }

  test("q43: grid knn candidates flow through a cell-id equi-join") {
    val plan = executedPlan("q43_knn_join")
    assert(plan.contains("__cell"), plan.take(3000))
  }

  test("q25: first-shared-band emission — no distinct re-shuffle of pairs") {
    val plan = executedPlan("q25_minhash_neardup")
    // one exchange for the band-bucket join; none for a trailing distinct
    assert(!plan.contains("HashAggregate(keys=[id_a"), plan.take(2500))
  }

  test("q57: rollup is one Expand + a single partial/final aggregate pair") {
    val plan = executedPlan("q57_rollup_agg")
    // all grouping levels come from ONE scan: Expand duplicates rows per
    // level into a single hash aggregate — never a UNION of re-scans
    assert(plan.contains("Expand"), plan.take(2000))
    assert("FileScan".r.findAllIn(plan).length == 1, plan.take(2000))
    assert("HashAggregate".r.findAllIn(plan).length == 2, plan.take(2000))
  }

  test("q62: all six window functions evaluate in ONE Window operator") {
    val plan = executedPlan("q62_window_suite")
    // identical partitioning + ordering across the functions must collapse
    // to a single Window (one shuffle), not one per function
    assert("Window\\b".r.findAllIn(plan).length == 1, plan.take(2500))
  }

  test("q59: stratified sample is a pure filter — no shuffle, no aggregate") {
    val plan = executedPlan("q59_stratified_sample")
    // one exchange allowed for the final ORDER BY only
    assert(!plan.contains("HashAggregate"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("q83: dims broadcast, date filter pushed into the orders scan") {
    val plan = executedPlan("q83_revenue_rollup_5way")
    // region/nation/customer broadcast; the date range reaches the scan
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3, plan.take(2500))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate") ||
      plan.contains("GreaterThanOrEqual(o_orderdate"), plan.take(3000))
  }

  test("q66: eval grams broadcast — the corpus side never shuffles before the join") {
    val plan = executedPlan("q66_decontamination")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("runtime bloom filter: a selective dim filter prunes the fact side pre-shuffle") {
    // Spark's InjectRuntimeFilter plants a bloom_filter_agg on the selective
    // (dim) side and a might_contain guard on the fact side's scan — the
    // runtime analogue of static pushdown, and the thing that keeps a
    // 100 TB shuffle join from reading fact rows whose key can't match.
    // Size thresholds are tuned for real clusters, so lower them to make
    // the toy-scale plan take the same shape the big plan would.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set(keys(0), "0")
      conf.set(keys(1), "-1")
      conf.set(keys(2), "-1")
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(org.apache.spark.sql.functions.col("o_totalprice") > 450000.0)
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized.take(2500))
      assert(optimized.contains("bloom_filter_agg"), optimized.take(2500))
      assert(joined.count() > 0)
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("constant folding: literal ST_ calls disappear from the optimized plan") {
    graft.spatial.functions.register(spark)
    val opt = spark.sql("SELECT ST_Area(ST_GeomFromText('POLYGON ((0 0,4 0,4 4,0 4,0 0))')) AS a")
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("16.0"), opt)
    assert(!opt.toLowerCase.contains("st_area"), opt)
  }

  test("q109: bucket stats broadcast; no vocabulary-sized exchange") {
    val plan = executedPlan("q109_dsir_weights")
    // the ≤B-row stats and the one-row totals both arrive as broadcasts
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2, plan.take(2000))
    // the per-doc sum partial-aggregates before its exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2000))
  }

  test("q110: no Window — per-doc argmax is a struct-min aggregate") {
    val plan = executedPlan("q110_gopher_repetition")
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("q112: funnel has no Window and no event-array aggregation") {
    val plan = executedPlan("q112_funnel")
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("collect_list"), plan.take(2000))
  }

  test("q113: weighted sample is a TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan("q113_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("q108: assignment is a one-row broadcast argmax — no Window/Sort on the corpus") {
    val plan = executedPlan("q108_semantic_dedup")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2500))
  }

  test("q120: triangle join is equi-only — no cartesian/BNLJ, no Window, partial agg") {
    val plan = executedPlan("q120_triangles")
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q121: scd2 windows confined to batch frames — exactly two Window ops") {
    val plan = executedPlan("q121_scd2_apply")
    assert("\\bWindow\\b".r.findAllIn(plan).length == 2, plan.take(2500))
  }

  test("q122: rank fusion has no Window — bounded aggregates end to end") {
    val plan = executedPlan("q122_rrf_fusion")
    assert(!plan.contains("Window"), plan.take(2500))
  }

  test("q124: span pairing is an md5 equi-join — no cartesian, partial agg") {
    val plan = executedPlan("q124_shared_spans")
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q126: phrase slots broadcast; one vote shuffle, no Window") {
    val plan = executedPlan("q126_phrase_search")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
  }

  // ---- tenth wave (round 7) ----

  test("q129: bigram LM — count joins stay equi-joins, totals broadcast, no Window") {
    val plan = executedPlan("q129_bigram_lm")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    // N/V one-row totals arrive as a broadcast
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(2500))
    // per-doc avg partial-aggregates before its exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q130: set-sim join — prefix equi-join, no cartesian, no Window") {
    val plan = executedPlan("q130_setsim_join")
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
  }

  test("q133: tfidf cosine — posting equi-join with partial dot aggregation") {
    val plan = executedPlan("q133_tfidf_cosine")
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q134: heavy hitters — sketch cells broadcast per depth, no Window") {
    val plan = executedPlan("q134_heavy_hitters")
    assert(!plan.contains("Window"), plan.take(2500))
    // 4 cell joins + the one-row total ride as broadcasts
    assert("BroadcastExchange".r.findAllIn(plan).length >= 4, plan.take(3000))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  test("q135: label propagation — vote argmax is a struct-min aggregate, no Window") {
    // the sf0.001 face takes the size-gated driver path (a local result);
    // the DISTRIBUTED 100 TB shape is what needs pinning — force it
    import org.apache.spark.sql.functions.col
    val li = Queries.t(spark, sf, "lineitem")
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("id_a"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("id_b"))
    val pairs = a.join(b, "ok").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val plan = graft.pipeline.Graph
      .labelPropagation(pairs, "id_a", "id_b", iters = 3, collectThreshold = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
    // and the gated face stays Window/cartesian-free too
    val gated = executedPlan("q135_label_prop")
    assert(!gated.contains("Window") && !gated.contains("CartesianProduct"))
  }

  test("q136: retention — no Window; per-user min partial-aggregates") {
    val plan = executedPlan("q136_retention")
    assert(!plan.contains("Window"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q144: the type filter prunes partitions at the scan") {
    val plan = executedPlan("q144_partition_prune")
    // the partitioned read carries the predicate as a PartitionFilter —
    // directory-level pruning, no data read outside event_type=purchase
    val pf = plan.indexOf("PartitionFilters")
    assert(pf >= 0, plan.take(1500))
    assert(plan.substring(pf).takeWhile(_ != ']').contains("purchase"),
      plan.substring(pf).take(300))
  }

  test("q200: the interval band prunes layout directories; range join stays binned") {
    val plan = executedPlan("q200_pruned_range_join")
    // the band reaches the interval-bucketed scan as a PartitionFilter on
    // __ibucket — directory-level pruning before any join work
    val pf = plan.indexOf("PartitionFilters")
    assert(pf >= 0, plan.take(1500))
    val filters = plan.substring(pf).takeWhile(_ != ']')
    assert(filters.contains("__ibucket"), filters.take(300))
    assert(filters.contains(">=") && filters.contains("<="), filters.take(300))
    // and the overlap join itself is the binned equi-join, not a product
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
  }

  test("q203: the window band prunes grid directories in BOTH axes; no cartesian") {
    val plan = executedPlan("q203_pruned_grid_join")
    // the window reaches the grid-bucketed scan as PartitionFilters on
    // __gx AND __gy — directory-level 2D pruning before the spatial join
    val pf = plan.indexOf("PartitionFilters")
    assert(pf >= 0, plan.take(1500))
    val filters = plan.substring(pf).takeWhile(_ != ']')
    assert(filters.contains("__gx") && filters.contains("__gy"),
      filters.take(300))
    assert(filters.contains(">=") && filters.contains("<="), filters.take(300))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
  }

  test("q222: the margin WIDENS both grid partition filters by the max extent") {
    // window band is x ∈ [2100, 4100], y ∈ [6, 17] on a 1000×5 grid:
    // margin-0 bounds would be gx ∈ [2, 4], gy ∈ [1, 3]; the 400×2
    // extents widen the LOW bounds to gx ≥ 1, gy ≥ 0 — one extra
    // directory row in each axis, pinned SEMANTICALLY on the scan node's
    // partitionFilters (the plan STRING elides long filter lists, and
    // where it cuts depends on ambient attribute-id width — a string pin
    // here flaked between isolated and full-suite runs)
    val exec0 = Queries.all("q222_grid_margin_join")(spark, sf)
      .queryExecution.executedPlan
    val exec = exec0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan // collect() cannot descend through the AQE wrapper
      case p => p
    }
    val scans = exec.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.partitionFilters.nonEmpty => s.partitionFilters.map(_.sql)
    }
    assert(scans.nonEmpty, exec.toString.take(1500))
    val f = scans.head.mkString("; ")
    assert(f.contains("__gx") && f.contains("__gy"), f)
    assert(f.contains(">= 1") && !f.contains(">= 2"), f)
    assert(f.contains(">= 0") && f.contains("<= 4") && f.contains("<= 3"), f)
    assert(!exec.toString.contains("CartesianProduct"))
  }

  // ---- eleventh wave (round 7) ----

  test("q145: histogram windows run over STATE cells only — after the bin aggregate") {
    val plan = executedPlan("q145_histogram_quantiles")
    // binning aggregates (partial+final) strictly below the two windows
    // (cumulative + per-group total): the corpus never enters a Window
    assert("\\bWindow\\b".r.findAllIn(plan).length <= 2, plan.take(2500))
    val firstWindow = plan.indexOf("Window")
    val lastAgg = plan.lastIndexOf("HashAggregate")
    assert(firstWindow >= 0 && lastAgg > firstWindow,
      plan.take(2500)) // plan prints leaves last: the aggregate feeds the window
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
  }

  test("q146: URL canonicalization is scan-side — no Window, no join below the agg") {
    val plan = executedPlan("q146_url_canonicalize")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("SortMergeJoin"), plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
  }

  test("q147: knn vote — query side broadcasts, argmax is struct-min, no Window") {
    val plan = executedPlan("q147_knn_classify")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q149: zipf fit — bounded top-k, regression aggregate, no Window") {
    val plan = executedPlan("q149_zipf_slope")
    assert(!plan.contains("Window"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
  }

  // ---- twelfth wave (round 7) ----

  test("q151: survivor selection is a struct-min aggregate — no extra Window, no cartesian") {
    val plan = executedPlan("q151_dedup_survivors")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
  }

  test("q152: benford is one 9-key aggregate + a one-row broadcast total") {
    val plan = executedPlan("q152_benford")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q153: ewma is a codegen array fold — no Window, one key shuffle") {
    val plan = executedPlan("q153_ewma")
    assert(!plan.contains("Window"), plan.take(2500))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan.take(2500))
  }

  // ---- thirteenth wave (round 7) ----

  test("q154: mojibake gate is scan-side — no shuffle below the sort") {
    val plan = executedPlan("q154_mojibake")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2500))
  }

  test("q155: bootstrap replicas partial-aggregate; percentile over the replica frame") {
    val plan = executedPlan("q155_bootstrap_ci")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  test("q156: welch is ONE conditional-aggregate pass — no join, no second scan") {
    val plan = executedPlan("q156_ab_welch")
    assert(!plan.contains("Join"), plan.take(2500))
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan.take(2500))
  }

  test("q157: ahash pairs flow through a band equi-join — no cartesian, no Window") {
    val plan = executedPlan("q157_image_ahash")
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
  }

  // ---- fourteenth wave (round 7) ----

  test("q158: pmi pair generation is an array comprehension — no posting self-join, no Window") {
    val plan = executedPlan("q158_pmi_pairs")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    // unigram joins are token-keyed equi-joins; only totals broadcast
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  test("q159: chi2 has no row×col cross join — one cell aggregate + broadcasts") {
    val plan = executedPlan("q159_chi2")
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2500))
  }

  // ---- fifteenth wave (round 7) ----

  test("q161: interval sweep — both windows + both aggs ride ONE data shuffle") {
    val plan = executedPlan("q161_interval_coverage")
    // exchanges: the user_id shuffle + the final orderBy range partitioning;
    // the (user, island) and (user) groupBys reuse the window partitioning
    assert("Exchange".r.findAllIn(plan).length <= 2, plan.take(3000))
    assert("Window".r.findAllIn(plan).length == 2, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("q162: cusum — closed-form windows, one-row moments broadcast, no join shuffle") {
    val plan = executedPlan("q162_cusum")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the μ/σ frame is one row: a broadcast NLJ, never a shuffle join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q163: bloom probe filters the fact side BELOW the dim join") {
    val plan = executedPlan("q163_bloom_prune")
    // AutoBits builds the bitset EAGERLY (sizing + build run at
    // construction; the dialog plan carries the materialized one-row
    // filter) — the final plan shows the probe (shiftright bit test)
    // below the real hash join, plus the one-row broadcast NLJ carrier
    assert(plan.contains("shiftright"), plan.take(3500))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3500))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin"), plan.take(3500))
    // pushdown still reaches both scans (the join's IsNotNull(c_custkey)
    // may append to the pushed list)
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)") &&
      plan.contains("IsNotNull(c_mktsegment)"), plan.take(3500))
    // the bitset BUILD plan (now executed eagerly inside prune) keeps the
    // map-side partial ObjectHashAggregate merge shape
    val dim = Queries.t(spark, sf, "customer")
      .where(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .select(org.apache.spark.sql.functions.col("c_custkey"))
    val buildPlan = graft.pipeline.Bloom.build(dim, "c_custkey", 1 << 20, 5)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(buildPlan).length >= 2, buildPlan.take(3500))
  }

  test("q164: SNM neighbor join is an equi-join on rank — no cartesian, no range join") {
    val plan = executedPlan("q164_sorted_neighborhood")
    assert(!plan.contains("CartesianProduct"), plan.take(3500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3500))
    // per-range-partition row_number: every Window partitions by __pid —
    // no single-reducer global Window anywhere
    assert(!plan.contains("Window [row_number()] "), plan.take(3500))
  }

  test("q165: twa is one lead window + one partial-aggregated groupBy") {
    val plan = executedPlan("q165_twa")
    assert("Window".r.findAllIn(plan).length == 1, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  test("q166: attribution rides the as-of union — one LOCF window, no per-conversion join") {
    val plan = executedPlan("q166_attribution")
    assert(plan.contains("Union"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  // ---- sixteenth wave (round 7) ----

  test("q167: rolling distinct is pure aggregation — no window, no join") {
    val plan = executedPlan("q167_rolling_distinct")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("Join"), plan.take(2500))
    // partial aggregation around every exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 6, plan.take(3000))
  }

  test("q168: vocab coverage — token counts cached, scanned once; no global-order window") {
    val plan = executedPlan("q168_vocab_coverage")
    assert(plan.contains("InMemoryTableScan"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the only unpartitioned windows run over the numPartitions-sized
    // offset frame, never the vocab frame: every corpus-sized window
    // partitions by __pid
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q169: co-occurrence joins are all equi — no cartesian, no window") {
    val plan = executedPlan("q169_item_cooccur")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("q170: ndcg — corpus scanned once in the scorer; ranked frame broadcasts to label joins") {
    val plan = executedPlan("q170_ndcg")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    // the scorer's query-set broadcast NLJ plus ≥2 broadcast-hash label joins
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  // ---- seventeenth wave (round 7) ----

  test("q171: residual fit broadcasts back — one moment pass, no second residual scan") {
    val plan = executedPlan("q171_residual_outliers")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("q172: session paths — the sessionizer's windows share one user sort") {
    val plan = executedPlan("q172_session_paths")
    // both windows (lag flag, running session sum) ride the same
    // Exchange; the prefix build is collect_list, not a third window
    assert("Window".r.findAllIn(plan).length == 2, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("q173: integrity joins are left broadcast-hash, parents deduped below") {
    val plan = executedPlan("q173_ref_integrity")
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 2, plan.take(3500))
    assert(plan.contains("LeftOuter"), plan.take(3500))
    assert(!plan.contains("CartesianProduct"), plan.take(3500))
  }

  test("q174: gini rides the distributed rank — windows partition by __pid only") {
    val plan = executedPlan("q174_gini_skew")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(plan.contains("InMemoryTableScan"), plan.take(3000))
  }

  test("q175: mutual info — one cell aggregate, margins broadcast, no cross join") {
    val plan = executedPlan("q175_mutual_info")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  // ---- eighteenth wave (round 7) ----

  test("q176: skyline — no quadratic dominance join, a-keyed equi join back") {
    val plan = executedPlan("q176_skyline")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("InMemoryTableScan"), plan.take(3000))
  }

  test("q177: psi — nothing corpus-sized past the two bin aggregates") {
    val plan = executedPlan("q177_psi")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    // the full-outer join runs over two ≤ nBins frames
    assert(plan.contains("FullOuter"), plan.take(3000))
  }

  test("q178: rbo — bounded ranking frames meet in an equi-join, depth explode ≤ k") {
    val plan = executedPlan("q178_rbo")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    assert(plan.contains("Generate"), plan.take(3000)) // the depth explode
  }

  // ---- nineteenth wave (round 7) ----

  test("q179: holt is one array fold — no Window, one key shuffle") {
    val plan = executedPlan("q179_holt")
    assert(!plan.contains("Window"), plan.take(2500))
    assert(!plan.contains("Join"), plan.take(2500))
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan.take(2500))
  }

  test("q180: gap fill — both navigation frames collapse into ONE Window node") {
    val plan = executedPlan("q180_gap_fill")
    assert("Window".r.findAllIn(plan).length == 1, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("q181/q182: pure partial-aggregated group passes, no window, no join") {
    Seq("q181_k_anonymity", "q182_lexical_diversity").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("Window"), s"$q: ${plan.take(2000)}")
      assert(!plan.contains("Join"), s"$q: ${plan.take(2000)}")
      assert("HashAggregate".r.findAllIn(plan).length >= 3, s"$q: ${plan.take(2500)}")
    }
  }

  // ---- twentieth wave (round 7) ----

  test("q183: rolling median is ONE bounded-frame Window, no join") {
    val plan = executedPlan("q183_rolling_median")
    assert("Window".r.findAllIn(plan).length == 1, plan.take(2500))
    assert(!plan.contains("Join"), plan.take(2500))
  }

  test("q184: funnel timing keeps the chained-minima shape — broadcast joins, no event-list window") {
    val plan = executedPlan("q184_funnel_timing")
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3, plan.take(3500))
  }

  test("q185: markov entropy — one lead window + domain-sized aggregates") {
    val plan = executedPlan("q185_markov_entropy")
    // the corpus-sized lead window runs ONCE: the (from, to, n) frame is
    // cached and every consumer reads the InMemory scan
    assert(plan.contains("InMemoryTableScan"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q186: bfs rounds are equi-joins of node-sized vectors with cached edges") {
    // the sf0.001 face takes the size-gated driver path; pin the
    // DISTRIBUTED shape by forcing collectThreshold = 0
    import org.apache.spark.sql.functions.col
    val pairs = graft.pipeline.Similarity.itemCooccurrence(
      Queries.t(spark, sf, "lineitem"), "l_orderkey", "l_partkey", minTogether = 2L)
    val seeds = Queries.t(spark, sf, "part").where(col("p_partkey") <= 10)
    val plan = graft.pipeline.Graph
      .bfsHops(pairs, "item_a", "item_b", seeds, "p_partkey", maxHops = 3,
        collectThreshold = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("InMemoryTableScan"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    val gated = executedPlan("q186_bfs_hops")
    assert(!gated.contains("CartesianProduct"))
  }

  // ---- twenty-first wave (round 7) ----

  test("q187: CF recs — all equi joins, cached slim frames, no cartesian, no global window") {
    val plan = executedPlan("q187_item_recs")
    assert(!plan.contains("CartesianProduct"), plan.take(3500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3500))
    assert(plan.contains("InMemoryTableScan"), plan.take(3500))
    // per-user and per-item top-k both ride the bounded aggregate
    assert(!plan.contains("Window"), plan.take(3500))
  }

  test("q188/q189: slim-slice join + histogram; lead window + moments") {
    val p1 = executedPlan("q188_peri_event")
    assert(!p1.contains("CartesianProduct"), p1.take(3000))
    assert(!p1.contains("Window"), p1.take(3000))
    val p2 = executedPlan("q189_burstiness")
    assert("Window \\[".r.findAllIn(p2).length == 1, p2.take(3000))
    assert(!p2.contains("Join"), p2.take(3000))
  }

  test("q190: weighted pagerank gated at test scale (LocalTableScan); distributed rounds join cached strength-edges") {
    // at sf0.001 the co-occurrence graph sits far under the 250k gate:
    // the returned plan is the driver loop's local result, no cartesian
    val plan = executedPlan("q190_weighted_pagerank")
    assert(!plan.contains("CartesianProduct"), plan.take(3500))
    assert(plan.contains("LocalTableScan"), plan.take(3500))
    // the distributed shape (collectThreshold = 0) keeps the cached
    // strength-edge rounds: InMemoryTableScan, still no cartesian
    val pairs = graft.pipeline.Similarity.itemCooccurrence(
      Queries.t(spark, sf, "lineitem"), "l_orderkey", "l_partkey",
      minTogether = 2L)
    val edges = pairs.select(col("item_a").as("src"),
        col("item_b").as("dst"), col("n_together").as("w"))
      .unionByName(pairs.select(col("item_b").as("src"),
        col("item_a").as("dst"), col("n_together").as("w")))
    val dist = graft.pipeline.Graph.pageRankWeighted(edges, "src", "dst",
        "w", iters = 3, collectThreshold = 0L)
      .queryExecution.executedPlan.toString
    assert(!dist.contains("CartesianProduct"), dist.take(3500))
    assert(dist.contains("InMemoryTableScan"), dist.take(3500))
  }

  test("q256: single-source overlap builds BOTH register frames from ONE " +
       "FileScan (hllOverlap's two-scan cost halved)") {
    import org.apache.spark.sql.functions._
    val pk = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("pk"))
    val plan = graft.pipeline.Stats.overlapRegisters(pk,
        col("pk") % 3 =!= 2, col("pk") % 3 =!= 0, "pk", p = 16)
      .queryExecution.executedPlan.toString
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly 1 FileScan, got $scans:\n" +
      plan.take(3000))
    // and the register build stays one partial/final aggregate pair —
    // no join, no window
    assert(!plan.contains("Join"), plan.take(3000))
  }
}
