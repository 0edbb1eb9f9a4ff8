package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins on hot keys.
 *
 * AQE's skew-join splitting handles most cases at runtime; explicit
 * salting remains the tool when a dimension join has a few keys carrying
 * orders of magnitude more rows than the rest (the classic "null key" /
 * "default value" hot spot) and the dimension is small enough to replicate.
 *
 * `saltedJoin`: the fact side gets a deterministic salt in [0, nSalts);
 * the dimension side is replicated once per salt value; the join key
 * becomes (key, salt), splitting each hot key's rows across nSalts
 * reducers. Row-level results are identical to the unsalted join.
 */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 nSalts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    // deterministic per-row salt: hash of all fact columns
    val factSalted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(nSalts)).cast("int"))
    val dimReplicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    factSalted.join(dimReplicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
