package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drive the Z-order layout end-to-end on real test data:
  * `runMain graft.tools.ZorderDemo <sfDir> [outDir]` — clusters the events
  * table on (user_id, ts), then compares a two-sided selective scan on the
  * z-ordered vs a shuffled copy: bytes of row groups whose stats survive
  * the predicate, and the identical query results. */
object ZorderDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = if (args.length > 1) args(1) else "/tmp/graft_zorder_demo"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events.ts has shipped as TIMESTAMP(NANOS) (read as raw ns long) and
    // as TIMESTAMP/TIMESTAMP_NTZ µs — either way cluster on the integer
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
    val tsu = ev0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => graft.pipeline.Time.tsMicros(col("ts"))
    }
    val ev = ev0.select(col("event_id"), col("user_id"), tsu.as("tsu"),
      col("value"))
    graft.pipeline.Layout.zorderWrite(ev, Seq("user_id", "tsu"), s"$out/z", 16)
    ev.repartition(16).write.mode("overwrite").parquet(s"$out/shuffled")

    // a selective two-sided predicate: one user band, one time band
    val Array(u0, u1, t0, t1) = ev.agg(
      expr("percentile(user_id, 0.40)"), expr("percentile(user_id, 0.45)"),
      expr("percentile(tsu, 0.40)"), expr("percentile(tsu, 0.45)"))
      .collect()(0).toSeq.map(_.toString.toDouble.toLong).toArray

    def survivingBytes(dir: String): (Long, Long) = {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = spark.sessionState.newHadoopConf()
      val p = new Path(dir)
      val files = p.getFileSystem(conf).listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      var kept = 0L; var total = 0L
      files.foreach { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try r.getFooter.getBlocks.asScala.foreach { b =>
          val byName = b.getColumns.asScala
            .map(c => c.getPath.toDotString -> c).toMap
          def rng(c: String) = {
            val st = byName(c).getStatistics
            (st.genericGetMin.asInstanceOf[Number].longValue,
             st.genericGetMax.asInstanceOf[Number].longValue)
          }
          val (umn, umx) = rng("user_id"); val (tmn, tmx) = rng("tsu")
          total += b.getTotalByteSize
          if (umn <= u1 && u0 <= umx && tmn <= t1 && t0 <= tmx)
            kept += b.getTotalByteSize
        } finally r.close()
      }
      (kept, total)
    }

    val q = (d: String) => spark.read.parquet(d)
      .filter(col("user_id").between(u0, u1) && col("tsu").between(t0, t1))
      .agg(count(lit(1)), coalesce(sum("value"), lit(0.0))).collect()(0)
    val zRes = q(s"$out/z"); val sRes = q(s"$out/shuffled")
    // counts exact; the double sum is order-dependent across layouts
    val same = zRes.getLong(0) == sRes.getLong(0) &&
      math.abs(zRes.getDouble(1) - sRes.getDouble(1)) <= 1e-9 * math.abs(sRes.getDouble(1))
    require(same, s"results diverged: $zRes vs $sRes")

    val (zk, zt) = survivingBytes(s"$out/z")
    val (sk, st) = survivingBytes(s"$out/shuffled")
    println(f"predicate user_id in [$u0,$u1], tsu in [$t0,$t1] -> rows=${zRes.getLong(0)}")
    println(f"z-ordered: ${zk * 100.0 / zt}%.1f%% of bytes survive stats pruning")
    println(f"shuffled : ${sk * 100.0 / st}%.1f%% of bytes survive stats pruning")
    println(s"match=$same")
    spark.stop()
  }
}
