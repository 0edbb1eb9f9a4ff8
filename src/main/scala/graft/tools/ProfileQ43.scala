package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spatial.{functions => G, SpatialJoin}

/** Pitch-sensitivity measurement for the grid KNN join: same data, varying
  * cellSize; "auto" runs the statistics-estimated pitch path.
  * Usage: sbt "runMain graft.tools.ProfileQ43 <sfDir> <pitch|auto>..." */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pitches = if (args.length > 1) args.tail.toSeq else Seq("512")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet").select(col("s_suppkey"),
      G.st_point(col("s_acctbal"), col("s_nationkey").cast("double")).as("spt"))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet").select(col("c_custkey"),
      G.st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("cpt"))
    if (sys.env.contains("GRAFT_TIME_STATS")) {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val v = SpatialJoin.adaptivePitch(cust, col("cpt"), 90.0).head().getDouble(0)
        println(f"adaptivePitch run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  pitch=$v%.3f")
      }
    }
    pitches.foreach { p =>
      val t0 = System.nanoTime()
      val rounds = if (p.contains("@")) p.split("@")(1).toInt else 2
      val spec = p.split("@")(0)
      val df =
        if (spec.startsWith("auto")) SpatialJoin.knnJoinGridAuto(supp, cust, col("spt"), col("cpt"),
          Seq("s_suppkey"), Seq("c_custkey"), k = 3, escalateRounds = rounds,
          targetPerCell = spec.stripPrefix("auto").stripPrefix(":") match {
            case "" => 64.0; case t => t.toDouble })
        else SpatialJoin.knnJoinGrid(supp, cust, col("spt"), col("cpt"),
          Seq("s_suppkey"), Seq("c_custkey"), k = 3, cellSize = spec.toDouble,
          escalateRounds = rounds)
      val n = df.count()
      val plan = df.queryExecution.executedPlan.toString
      def c(s: String) = plan.sliding(s.length).count(_ == s)
      println(f"pitch=$p%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n" +
        s"   bcast=${c("BroadcastExchange")} reuse=${c("ReusedExchange")}" +
        s" scans=${c("Scan parquet")} imts=${c("TableCacheQueryStage")}/${c("InMemoryTableScan")}")
    }
    spark.stop()
  }
}
