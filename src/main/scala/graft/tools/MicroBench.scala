package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spatial.{functions => G}
import graft.pipeline.Similarity

/**
 * Micro-benchmark of the native kernels vs the composed-builtin
 * alternatives they replaced. Prints one JSON line per comparison.
 * Run: sbt "runMain graft.tools.MicroBench [rows]"
 */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(body: => Long): Unit = {
      body // warmup
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"$name","sec":$sec%.3f,"rows":$n}""")
    }

    // 64-dim float vectors
    val vecs = spark.range(rows).select(col("id"),
      expr("transform(sequence(0, 63), i -> cast(sin(id * 31 + i) as float))").as("v"))
    vecs.cache().count()

    time("cosine_hof_zipwith_aggregate") {
      vecs.select(expr(
        """aggregate(zip_with(v, v, (x, y) -> cast(x as double) * cast(y as double)),
          |cast(0.0 as double), (acc, e) -> acc + e)""".stripMargin).as("d"))
        .agg(sum("d")).head(); rows.toLong
    }
    time("cosine_native_kernel") {
      vecs.select(Similarity.dot(col("v"), col("v")).as("d"))
        .agg(sum("d")).head(); rows.toLong
    }

    // WKB envelope: streaming scan vs full parse via accessors
    val geoms = spark.range(rows).select(col("id"),
      G.st_geomfromtext(concat(lit("LINESTRING ("),
        (col("id") % 100).cast("string"), lit(" 0, "),
        (col("id") % 50).cast("string"), lit(" 10, 5 5)"))).as("g"))
    geoms.cache().count()

    time("envelope_streaming_xmin") {
      geoms.select(G.st_xmin(col("g")).as("x")).agg(sum("x")).head(); rows.toLong
    }
    time("astext_full_parse") {
      geoms.select(length(G.st_astext(col("g"))).as("l")).agg(sum("l")).head(); rows.toLong
    }

    spark.stop()
  }
}
