package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * 2-D Pareto frontier (skyline): the rows not STRICTLY dominated by any
 * other — q dominates p iff q.a ≥ p.a ∧ q.b ≥ p.b with at least one
 * strict. Duplicated (a, b) points dominate nothing and both survive.
 *
 * The classic sweep ("sort by a desc, keep rows beating the running max
 * of b") decomposes into algebra that never needs a single-reducer
 * global Window:
 *
 *  1. M(a) = max b per a — an ordinary partial aggregate (a row with
 *     b < M(its a) is dominated by the same-a maximum);
 *  2. H(a) = max of M over all STRICTLY GREATER a — the distributed
 *     exclusive running max ([[Dedup.globalOrderedCummaxExcl]]) over
 *     the (a, M) frame sorted by a desc;
 *  3. skyline ⇔ b = M(a) ∧ (H(a) is null ∨ H(a) < b).
 *
 * Step 2's frame is |distinct a| rows — already ≤ corpus-sized, often
 * far smaller — and the join back to the corpus is a-keyed equi. All
 * comparisons are exact (no arithmetic on the values), so results are
 * engine-identical with NO rounding.
 */
object Pareto {

  def skyline2d(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val pts = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
    val ma = pts.groupBy(col(aCol)).agg(max(col(bCol)).as("__mb"))
    val h = Dedup.globalOrderedCummaxExcl(ma, Seq(col(aCol).desc), "__mb", "__hb")
    pts.join(h, Seq(aCol))
      .filter(col(bCol) === col("__mb") &&
        (col("__hb").isNull || col("__hb") < col(bCol)))
      .drop("__mb", "__hb")
  }
}
