package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rangejoin-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Deterministic pseudo-random intervals: id, start = h(id), len = h2(id). */
  private def intervals(n: Int, idCol: String, startCol: String, endCol: String,
                        maxLen: Int, longEvery: Int = 0): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val start = (i * 2654435761L) % 1000
      val len =
        if (longEvery > 0 && i % longEvery == 0) 400L + (i % 7) * 50
        else (i * 40503L) % maxLen
      (i.toLong, start, start + len)
    }.toDF(idCol, startCol, endCol)
  }

  private def naive(l: DataFrame, r: DataFrame, cond: org.apache.spark.sql.Column): Set[(Long, Long)] =
    l.crossJoin(r).filter(cond).select("lid", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("lid", "rid").collect().map(row => (row.getLong(0), row.getLong(1))).toSet

  test("overlapJoin equals the naive cross-join at several fixed widths") {
    val l = intervals(200, "lid", "ls", "le", maxLen = 30)
    val r = intervals(150, "rid", "rs", "re", maxLen = 50)
    val expected = naive(l, r, col("ls") <= col("re") && col("rs") <= col("le"))
    assert(expected.nonEmpty && expected.size < 200 * 150)
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = pairs(RangeJoin.overlapJoin(l, "ls", "le", r, "rs", "re",
        binWidth = Some(w)))
      assert(got == expected, s"width $w: ${got.size} vs ${expected.size}")
    }
  }

  test("overlapJoin self-tuned width equals the naive join; long intervals exact") {
    // every 25th interval is 8-40x the typical length -> crosses the
    // longIntervalBins bound at small widths and takes the broadcast branch
    val l = intervals(200, "lid", "ls", "le", maxLen = 12, longEvery = 25)
    val r = intervals(150, "rid", "rs", "re", maxLen = 12, longEvery = 30)
    val expected = naive(l, r, col("ls") <= col("re") && col("rs") <= col("le"))
    val auto = pairs(RangeJoin.overlapJoin(l, "ls", "le", r, "rs", "re"))
    assert(auto == expected)
    // force the long branch hard: tiny width, tiny bin cap
    val forced = pairs(RangeJoin.overlapJoin(l, "ls", "le", r, "rs", "re",
      binWidth = Some(2L), longIntervalBins = 4))
    assert(forced == expected)
  }

  test("overlapJoin with equality keys restricts to matching groups") {
    val l = intervals(120, "lid", "ls", "le", maxLen = 60)
      .withColumn("lk", col("lid") % 5)
    val r = intervals(90, "rid", "rs", "re", maxLen = 60)
      .withColumn("rk", col("rid") % 5)
    val expected = naive(l, r,
      col("lk") === col("rk") && col("ls") <= col("re") && col("rs") <= col("le"))
    val got = pairs(RangeJoin.overlapJoin(l, "ls", "le", r, "rs", "re",
      keys = Seq("lk" -> "rk")))
    assert(got == expected && got.nonEmpty)
  }

  test("null bounds and inverted intervals match nothing; negative domain works") {
    import spark.implicits._
    val l = Seq(
      (1L, Some(-50L), Some(-10L)),  // overlaps r1
      (2L, Some(10L), Some(5L)),     // inverted -> dropped
      (3L, None, Some(4L)),          // null -> dropped
      (4L, Some(-3L), Some(3L))      // spans zero, overlaps r1+r2
    ).toDF("lid", "ls", "le")
    val r = Seq((10L, -12L, -2L), (20L, 0L, 100L)).toDF("rid", "rs", "re")
    val got = pairs(RangeJoin.overlapJoin(l, "ls", "le", r, "rs", "re",
      binWidth = Some(8L)))
    assert(got == Set((1L, 10L), (4L, 10L), (4L, 20L)))
  }

  test("binned branch plans an equi-join on the bin, not a cartesian") {
    val l = intervals(50, "lid", "ls", "le", maxLen = 10)
    val r = intervals(50, "rid", "rs", "re", maxLen = 10)
    val plan = RangeJoin.overlapJoin(l, "ls", "le", r, "rs", "re",
      binWidth = Some(16L)).queryExecution.executedPlan.toString
    // the short x short branch must meet in a hash/sort-merge equi-join;
    // the only nested-loop joins allowed are the broadcast long branches
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
