package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spatial.{functions => G, SpatialJoin}

/** Pitch-sensitivity measurement for the grid KNN join: same data, varying
  * cellSize. Usage: sbt "runMain graft.tools.ProfileQ43 <sfDir> <pitch>..." */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pitches = if (args.length > 1) args.tail.map(_.toDouble).toSeq else Seq(512.0)
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
    pitches.foreach { p =>
      val t0 = System.nanoTime()
      val n = SpatialJoin.knnJoinGrid(supp, cust, col("spt"), col("cpt"),
        Seq("s_suppkey"), Seq("c_custkey"), k = 3, cellSize = p).count()
      println(f"pitch=$p%-8.1f ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    spark.stop()
  }
}
