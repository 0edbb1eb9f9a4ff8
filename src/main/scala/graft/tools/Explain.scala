package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: prints the formatted physical plan of the named
  * queries (or all). Usage: sbt "runMain graft.tools.Explain q03_revenue_by_customer …" */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.Queries.all.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.Queries.all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
