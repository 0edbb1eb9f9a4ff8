package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * A/B of the per-trigger log write modes (builder-side profiling):
 * dynamic-partition-overwrite keyed on `__batch` (the round-12..15
 * LogStructuredSink.write shape) vs a direct overwrite of the batch's
 * own partition DIRECTORY — both replay-idempotent, identical on-disk
 * layout. Times N writes of a small (trigger-sized) frame each way,
 * with and without a 16-way sub-partition column.
 *
 * Run: sbt "runMain graft.tools.WriteModeBench [rows] [iters]"
 */
object WriteModeBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(30000)
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(rows).select(col("id"),
      md5(col("id").cast("string")).as("h"))
    val pinned = df.localCheckpoint(true)
    val base = java.nio.file.Files
      .createTempDirectory("graft_writemode").toString

    def time(name: String)(body: Long => Unit): Unit = {
      body(9999L) // warmup
      val t0 = System.nanoTime()
      (0 until iters).foreach(i => body(i.toLong))
      println(f"""{"mode":"$name","sec_per_write":${(System.nanoTime() - t0) / 1e9 / iters}%.3f}""")
    }

    time("dynamic_overwrite") { bid =>
      pinned.withColumn("__batch", lit(bid))
        .write.partitionBy("__batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$base/dyn")
    }
    time("direct_partition_dir") { bid =>
      pinned.write.mode("overwrite").parquet(s"$base/dir/__batch=$bid")
    }
    val sub = pinned.withColumn("__pfx", substring(col("h"), 1, 1))
    time("dynamic_overwrite_subpart") { bid =>
      sub.repartition(col("__pfx")).withColumn("__batch", lit(bid))
        .write.partitionBy("__batch", "__pfx")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$base/dynsub")
    }
    time("direct_partition_dir_subpart") { bid =>
      sub.repartition(col("__pfx"))
        .write.partitionBy("__pfx")
        .mode("overwrite").parquet(s"$base/dirsub/__batch=$bid")
    }
    spark.stop()
  }
}
