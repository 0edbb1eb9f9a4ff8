package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Bloom-filter runtime join pruning — the 100 TB pattern for a
 * fact ⋈ dim join where the dim's KEY SET fits in a few MB even when
 * the dim rows don't (or the planner missed the broadcast): build a
 * Bloom filter over the dim keys (map-side partial bitsets, OR-merge —
 * one row out), broadcast it, and pre-filter the fact side with a
 * codegen'd bit-probe BEFORE the shuffle join. No false negatives, so
 * the subsequent real join makes the result EXACT — false positives
 * only cost a little extra shuffle.
 *
 * Hash discipline: bit positions are computed with the BUILTIN
 * `xxhash64(lit(seed), key)` on BOTH sides — build and probe share one
 * codegen'd hash, so there is no cross-language hash-consistency trap.
 * The build aggregates positions (long) into an Array[Long] bitset via
 * [[BitsetAggregator]]: zero-allocation reduce, OR-merge, fully
 * commutative — the textbook algebraic aggregate (partial bitsets
 * combine map-side; the exchange carries one bitset per task).
 *
 * Sizing: m bits / k hashes give fp ≈ (1 − e^(−kn/m))^k — which means a
 * FIXED m silently saturates once n ≈ m/10: at n = 10⁶ keys a 2²⁰-bit
 * filter has fp ≈ (1−e⁻⁵)⁵ ≈ 0.97, so the probe prunes nothing and the
 * broadcast + 5 hashes per fact row are pure overhead (correctness is
 * preserved by the follow-up exact join, but the point of the pattern is
 * lost). [[prune]] therefore SELF-SIZES by default: one
 * `approx_count_distinct` over the dim keys picks m ≈ 10·n bits
 * (fp ≈ 1% at k=5), floored at 2²⁰ (128 KiB) and capped at 2²⁷ (16 MiB
 * — still a comfortable broadcast; beyond ~1.3·10⁷ keys the filter
 * degrades gracefully toward pass-through and a caller who wants more
 * should pass `nbits` explicitly, or reconsider whether the key set
 * still qualifies as "a few MB").
 */
object Bloom {

  /** Sentinel for [[prune]]'s `nbits`: size the filter from the dim key
    * cardinality (~10 bits/key) instead of a fixed constant. */
  val AutoBits: Int = -1

  /** `numHashes` bit positions for `key` (builtin xxhash64 per seed —
    * identical codegen on build and probe sides). */
  private def positions(key: Column, nbits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => pmod(xxhash64(lit(i), key), lit(nbits.toLong)))

  /** Build the filter: one row, one `bits: Array[Long]` column. */
  def build(dim: DataFrame, keyCol: String, nbits: Int,
            numHashes: Int): DataFrame = {
    val agg = udaf(new BitsetAggregator(nbits),
      ExpressionEncoder[Long]())
    dim.select(explode(array(
        positions(col(keyCol), nbits, numHashes): _*)).as("__pos"))
      .agg(agg(col("__pos")).as("bits"))
  }

  /** Probe predicate: all `numHashes` bits set in the broadcast bitset —
    * a codegen'd element_at/shift/mask chain, no UDF on the hot path. */
  def mightContain(key: Column, bits: Column, nbits: Int,
                   numHashes: Int): Column =
    positions(key, nbits, numHashes).map { pos =>
      (call_function("shiftright", element_at(bits, (pos / 64).cast("int") + 1),
        pmod(pos, lit(64L)).cast("int")).bitwiseAND(1L)) === 1L
    }.reduce(_ && _)

  /**
   * Prune `fact` to rows whose `keyCol` might be in `dim`'s key set —
   * a semi-join with bounded false-positive slack (zero false
   * negatives). The one-row filter arrives via broadcast.
   *
   * EAGERNESS CONTRACT: with the default `nbits = AutoBits` this call
   * runs Spark jobs NOW, not at the returned frame's first action — a
   * sizing `approx_count_distinct` plus the filter build itself. `dim`
   * is persisted across those two passes (and unpersisted before
   * returning), so an expensive derived `dim` is computed once, not
   * twice; the built one-row bitset is materialized, so the returned
   * frame no longer references `dim` at all. With an explicit
   * `nbits > 0` the call stays fully lazy (one `dim` pass at action
   * time, unchanged).
   */
  def prune(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
            nbits: Int = AutoBits, numHashes: Int = 5): DataFrame = {
    require(nbits == AutoBits || nbits > 0,
      s"nbits must be Bloom.AutoBits or positive, got $nbits")
    if (nbits == AutoBits) {
      // one metadata-sized aggregate sizes the filter from the data —
      // the self-tuning discipline (cf. Dedup.AutoBound): ~10 bits/key,
      // floor 2^20, cap 2^27 (16 MiB broadcast). dim stays cached across
      // the sizing pass and the build pass, then the one-row bitset is
      // collected so dim can be released immediately.
      val d = dim.persist()
      try {
        val n = d.agg(approx_count_distinct(col(dimKey))).head().getLong(0)
        val m = math.min(math.max(n * 10L, 1L << 20), 1L << 27).toInt
        val f = build(d, dimKey, m, numHashes)
        val row = f.head() // second (cached) dim pass; one row out
        val fMat = dim.sparkSession.createDataFrame(
          java.util.Collections.singletonList(row), f.schema)
        fact.crossJoin(broadcast(fMat))
          .where(mightContain(col(factKey), col("bits"), m, numHashes))
          .drop("bits")
      } finally d.unpersist()
    } else {
      val f = build(dim, dimKey, nbits, numHashes)
      fact.crossJoin(broadcast(f))
        .where(mightContain(col(factKey), col("bits"), nbits, numHashes))
        .drop("bits")
    }
  }
}

/** OR-merge bitset aggregate over bit positions in [0, nbits). */
class BitsetAggregator(nbits: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  private val words = (nbits + 63) >>> 6
  def zero: Array[Long] = new Array[Long](words)
  def reduce(b: Array[Long], pos: Long): Array[Long] = {
    val p = pos.toInt; b(p >>> 6) |= (1L << (p & 63)); b
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0; while (i < words) { a(i) |= b(i); i += 1 }; a
  }
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
