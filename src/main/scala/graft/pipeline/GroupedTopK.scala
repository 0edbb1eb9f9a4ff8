package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Skew-safe grouped top-k.
 *
 * A `row_number() OVER (PARTITION BY g ORDER BY ...)` re-rank shuffles the
 * ENTIRE input into one partition per distinct `g` — a scale-killer when
 * `g` has few distinct values (e.g. 3 return flags over a 100 TB fact
 * table). [[prefilter]] reduces each map partition to its local top-k per
 * group BEFORE any exchange, so the subsequent exact window only ever sees
 * ≤ k·numPartitions rows per group. [[topK]] composes the two steps.
 *
 * Local-top-k ⊇ global-top-k per group, so the composition is exact.
 */
object GroupedTopK {

  /** Per-map-partition top-k rows per group — no shuffle, bounded memory
    * (k rows per group per partition). Null ordering matches window
    * defaults: nulls first ascending, last descending. */
  def prefilter(df: DataFrame, groupCols: Seq[String],
                order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val oIdx = order.map { case (n, asc) => (schema.fieldIndex(n), asc) }.toArray
    implicit val enc = Encoders.row(schema)

    // local closures only — the enclosing object must not leak into the
    // task closure (it is not serializable)
    val cmpValues: (Any, Any) => Int = {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      // Spark's window orders strings as binary UTF-8 (UTF8String); Java
      // String.compareTo orders UTF-16 code units — they disagree on
      // supplementary-plane characters, which would prune a row the exact
      // window downstream still wants. Compare the UTF-8 bytes.
      case (x: String, y: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
      case (x: java.lang.Comparable[_], y) =>
        x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
      case (x, _) => throw new IllegalArgumentException(
        s"GroupedTopK: unsupported order-column type ${x.getClass.getName}")
    }
    val cmp: (Row, Row) => Int = (a, b) => {
      var r = 0
      var i = 0
      while (r == 0 && i < oIdx.length) {
        val (idx, asc) = oIdx(i)
        val c = cmpValues(a.get(idx), b.get(idx))
        r = if (asc) c else -c
        i += 1
      }
      r
    }

    df.mapPartitions { it =>
      val best = mutable.HashMap.empty[Seq[Any], mutable.ArrayBuffer[Row]]
      it.foreach { row =>
        val key: Seq[Any] = gIdx.map(row.get).toSeq
        val buf = best.getOrElseUpdate(key, mutable.ArrayBuffer.empty[Row])
        buf += row
        if (buf.length > 4 * k) { // amortized compaction
          val kept = buf.sortWith((a, b) => cmp(a, b) < 0).take(k)
          buf.clear(); buf ++= kept
        }
      }
      best.valuesIterator.flatMap(buf => buf.sortWith((a, b) => cmp(a, b) < 0).take(k))
    }
  }

  /** Exact grouped top-k with `rank` column: map-side [[prefilter]], then
    * the window runs over ≤ k·numPartitions rows per group. */
  def topK(df: DataFrame, groupCols: Seq[String],
           order: Seq[(String, Boolean)], k: Int,
           rankCol: String = "rank"): DataFrame = {
    val pre = prefilter(df, groupCols, order, k)
    val sorts = order.map { case (n, asc) => if (asc) col(n).asc else col(n).desc }
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(sorts: _*)
    pre.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

}
