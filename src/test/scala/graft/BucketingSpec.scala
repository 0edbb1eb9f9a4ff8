package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bucketing: pre-partitioning fact tables on the join key at write time
 * makes repeated joins shuffle-free — the core storage-layout lever for a
 * 100 TB star schema (bucket lineitem and orders by orderkey once; every
 * later join on orderkey skips both sort and exchange on the bucketed
 * sides).
 */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // fresh warehouse per JVM: the metastore is ephemeral (in-memory derby)
    // but saveAsTable refuses a pre-existing managed-table location
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse_").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("bucketed join on orderkey plans without Exchange") {
    val sf = "/root/testdata/sf0.001"
    // force the non-broadcast path for this test only (shared session!)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // when another suite already owns the session, our warehouse config is
    // ignored — clean the actual warehouse locations of leftover dirs
    val whDir = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dir = new java.io.File(whDir, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(dir)
      }
    }
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // join itself must not shuffle either side (only the final groupBy may)
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    val exchanges = "Exchange hashpartitioning\\((l|o)_orderkey".r.findAllIn(plan).length
    assert(exchanges == 0, s"unexpected join-side exchanges:\n${plan.take(1500)}")

    // and the result matches the plain-parquet join
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
