package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic dataset splitting and sequence packing for training-data
 * pipelines.
 *
 * `randomSplit` is the wrong tool at 100 TB: its assignment depends on
 * partition layout and seed plumbing, so re-runs, retries, and appended
 * data shuffle documents across splits. Hash splitting assigns every row
 * by a pure function of its key — stable across runs, cluster layouts,
 * and incremental loads, and any engine can reproduce it (the DuckDB
 * oracle recomputes the same md5 buckets).
 */
object Sampling {

  /** Bucket in [0, 10000) from the first 8 hex chars of md5(key) — a pure,
    * engine-portable function of the key. */
  def hashBucket(key: Column, buckets: Int = 10000): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /**
   * Deterministic train/validation/test split: adds `split` chosen by the
   * key's hash bucket against cumulative weight thresholds. Weights are in
   * basis points of 10000 (exact integer thresholds — no float boundary
   * ambiguity between engines).
   */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 10000, "weights must sum to 10000 bp")
    val bucket = hashBucket(col(keyCol))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cum).foldRight(lit(null: String)) {
      case (((name, _), hi), elseE) => when(bucket < hi, lit(name)).otherwise(elseE)
    }
    df.withColumn("split", expr)
  }

  /** Group-aware variant: every row of a group lands in the same split
    * (hash the group key, not the row key) — e.g. keep all documents of a
    * source domain out of the eval set. */
  def hashSplitByGroup(df: DataFrame, groupCol: String,
                       splits: Seq[(String, Int)]): DataFrame =
    hashSplit(df, groupCol, splits)

  /**
   * Temperature-based domain mixing: sample so domain d's share of the
   * output follows `n_d^alpha / Σ n^alpha` — the standard training-mixture
   * move (alpha < 1 flattens dominant domains toward rare ones; alpha = 1
   * keeps natural proportions). Rates derive from the DATA (one tiny
   * per-domain count aggregate, broadcast back), selection is the same
   * md5-bucket predicate as [[stratifiedSampleHash]] — stable across
   * runs, layouts, and appends, reproducible by any engine.
   *
   * Cross-engine exactness: per-domain weights go through
   * `round(n^alpha * 1e6)` as integers, totals are integer sums, and the
   * final rate is one fixed left-to-right double chain
   * `targetBp * total * pw / sumpw / n` — identical IEEE results
   * everywhere (use alpha = 0.5: sqrt is correctly rounded by spec;
   * general pow is not and may drift a last-ulp between engines).
   *
   * @param targetBp overall keep fraction in basis points of 10000; a
   *                 domain whose computed rate exceeds 10000 bp is kept
   *                 whole (rare domains under strong flattening)
   */
  def temperatureSampleHash(df: DataFrame, keyCol: String, domainCol: String,
                            targetBp: Int, alpha: Double = 0.5): DataFrame = {
    require(targetBp >= 0 && targetBp <= 10000,
      s"targetBp must be in [0, 10000], got $targetBp")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val nD = col("__n").cast("double")
    val powed = if (alpha == 0.5) sqrt(nD) else pow(nD, lit(alpha))
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("__n"))
      .withColumn("__pw", round(powed * lit(1e6)).cast("long"))
    // full-frame window sums over the tiny domain table (integer-exact)
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = counts
      .withColumn("__total", sum(col("__n")).over(w))
      .withColumn("__sumpw", sum(col("__pw")).over(w))
      .select(col(domainCol),
        least(lit(10000L), floor(
          lit(targetBp.toDouble) * col("__total") * col("__pw") /
            col("__sumpw") / col("__n")).cast("long")).as("__bp"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashBucket(col(keyCol)) < col("__bp"))
      .drop("__bp")
  }

  /**
   * Token-budget corpus mixing: given a TARGET mixture specification
   * (domain → relative weight) and a total token budget, compute each
   * domain's keep rate and emit the deterministically sampled corpus —
   * the "hit the 1T-token pretraining mix" solver. Complements
   * [[temperatureSampleHash]] (whose weights derive from the data): here
   * the weights are the PLAN, handed down from the mixture designer.
   *
   * Per listed domain d: target_d = ⌊budget · w_d / Σw⌋ tokens (weights
   * quantized to integer micro-units driver-side — exact in any engine),
   * avail_d = Σ tokens over d's rows (one tiny aggregate, broadcast
   * back), rate = min(1, target_d / avail_d) applied as the md5-bucket
   * predicate of [[stratifiedSampleHash]] in integer basis points
   * (`target·10000 DIV avail` — pure integer arithmetic, no float
   * boundary). Domains not listed are dropped; a domain with fewer
   * available than target tokens is kept whole — the emitted `deficit`
   * column reports the shortfall the designer must source elsewhere
   * (upsampling/epoching is a separate decision, not silently applied).
   * The limit case avail = 0 (every row zero/null tokens) follows the
   * same rule: kept whole, deficit = the full target — never a silent
   * disappearance.
   *
   * Sampling docs at a token-derived rate hits the token target in
   * expectation (doc length is independent of the md5 bucket); the
   * selection is a pure function of the key — stable across runs,
   * layouts, and appends.
   *
   * Scale shape: one domain-sized aggregate + broadcast join + codegen'd
   * filter; the corpus never shuffles.
   *
   * Returns the kept rows plus (target_tokens, avail_tokens, rate_bp,
   * deficit) — per-domain audit columns riding the broadcast join.
   */
  def mixToBudget(df: DataFrame, keyCol: String, domainCol: String,
                  tokensCol: Column, budgetTokens: Long,
                  targetWeights: Seq[(String, Double)]): DataFrame = {
    require(budgetTokens > 0 && budgetTokens <= Long.MaxValue / 10000,
      s"budgetTokens must be in (0, ${Long.MaxValue / 10000}], got $budgetTokens")
    require(targetWeights.nonEmpty, "targetWeights must list at least one domain")
    require(targetWeights.forall(_._2 > 0), "target weights must be positive")
    require(targetWeights.map(_._1).distinct.size == targetWeights.size,
      "duplicate domain in targetWeights")
    // integer micro-unit weights, targets resolved driver-side in BigInt —
    // both engines see the same literal token targets
    val wI = targetWeights.map { case (dom, w) =>
      dom -> BigInt(math.round(w * 1e6)) }
    val sumW = wI.map(_._2).sum
    val targets = wI.map { case (dom, w) =>
      dom -> (BigInt(budgetTokens) * w / sumW).toLong }
    val tgtCol = targets.foldRight(lit(0L)) { case ((dom, t), elseE) =>
      when(col("__dom") === dom, lit(t)).otherwise(elseE) }
    val avail = df
      .filter(col(domainCol).isInCollection(targets.map(_._1)))
      .groupBy(col(domainCol).as("__dom"))
      .agg(sum(tokensCol.cast("long")).as("avail_tokens"))
    val rates = avail
      // a listed domain whose rows all carry zero/null token counts sums
      // to 0 (or null): the DIV below would yield null, the rate filter
      // would drop every row, and the domain would VANISH with no deficit
      // audit — the documented contract is the opposite (fewer available
      // than target ⇒ kept whole + deficit), and avail = 0 is just its
      // limit: keep the rows (they add 0 tokens), report the full target
      // as deficit
      .withColumn("avail_tokens", coalesce(col("avail_tokens"), lit(0L)))
      .withColumn("target_tokens", tgtCol)
      // integer basis points: target·10000 fits a long (require above);
      // DIV on positive longs is exact floor division in both engines
      .withColumn("rate_bp", when(col("avail_tokens") === 0L, lit(10000L))
        .otherwise(least(lit(10000L),
          expr("(target_tokens * 10000) DIV avail_tokens"))))
      .withColumn("deficit",
        greatest(col("target_tokens") - col("avail_tokens"), lit(0L)))
    df.join(broadcast(rates), col(domainCol) === col("__dom"))
      .filter(hashBucket(col(keyCol)) < col("rate_bp"))
      .drop("__dom")
  }

  /**
   * Epoch-aware mixing — [[mixToBudget]]'s upsampling complement and
   * the shape real pretraining samplers take: a domain with fewer
   * tokens than its target REPEATS, up to `maxEpochs` passes (the
   * quality cliff beyond a few epochs is the designer's documented
   * risk, so the cap is explicit, never implicit). Per listed domain
   * the total rate r = target/avail quantizes to integer basis points
   * capped at maxEpochs·10000: every doc emits ⌊r⌋ full copies
   * (`epoch` 0..⌊r⌋−1) plus one more iff its md5 bucket falls under
   * the fractional remainder — deterministic, append-stable, and
   * engine-replayable like every sampler here. Rows carry `epoch` so
   * downstream shuffling/packing can interleave copies, plus the
   * audit columns (avail/target/rate_bp_total/full_epochs/frac_bp and
   * the post-cap deficit).
   *
   * Scale shape: one domain-sized aggregate, broadcast back, and a
   * bounded per-row explode (≤ maxEpochs) — the corpus never shuffles.
   */
  def mixToBudgetEpochs(df: DataFrame, keyCol: String, domainCol: String,
                        tokensCol: Column, budgetTokens: Long,
                        targetWeights: Seq[(String, Double)],
                        maxEpochs: Int): DataFrame = {
    require(budgetTokens > 0 && budgetTokens <= Long.MaxValue / 10000,
      s"budgetTokens must be in (0, ${Long.MaxValue / 10000}], got $budgetTokens")
    require(maxEpochs >= 1 && maxEpochs <= 1000,
      s"maxEpochs must be in [1, 1000], got $maxEpochs")
    require(targetWeights.nonEmpty, "targetWeights must list at least one domain")
    require(targetWeights.forall(_._2 > 0), "target weights must be positive")
    require(targetWeights.map(_._1).distinct.size == targetWeights.size,
      "duplicate domain in targetWeights")
    val wI = targetWeights.map { case (dom, w) =>
      dom -> BigInt(math.round(w * 1e6)) }
    val sumW = wI.map(_._2).sum
    val targets = wI.map { case (dom, w) =>
      dom -> (BigInt(budgetTokens) * w / sumW).toLong }
    val tgtCol = targets.foldRight(lit(0L)) { case ((dom, t), elseE) =>
      when(col("__dom") === dom, lit(t)).otherwise(elseE) }
    val rates = df
      .filter(col(domainCol).isInCollection(targets.map(_._1)))
      .groupBy(col(domainCol).as("__dom"))
      .agg(sum(tokensCol.cast("long")).as("avail_tokens"))
      // zero-availability guard (see mixToBudget): the rate caps out at
      // maxEpochs — its limit as avail → 0 — so the rows survive (one
      // copy per allowed epoch of 0 tokens) and the deficit below
      // reports the full target instead of the domain silently vanishing
      .withColumn("avail_tokens", coalesce(col("avail_tokens"), lit(0L)))
      .withColumn("target_tokens", tgtCol)
      .withColumn("rate_bp_total",
        when(col("avail_tokens") === 0L, lit(maxEpochs * 10000L))
          .otherwise(least(lit(maxEpochs * 10000L),
            expr("(target_tokens * 10000) DIV avail_tokens"))))
      .withColumn("full_epochs", expr("rate_bp_total DIV 10000"))
      .withColumn("frac_bp", col("rate_bp_total") % 10000L)
      // expected emitted tokens = avail·full + ⌊avail·frac/10000⌋ —
      // pure integer arithmetic, exact floor in both engines (a decimal
      // division here would round at engine-specific scales)
      .withColumn("deficit", greatest(col("target_tokens") -
        (col("avail_tokens") * col("full_epochs") +
          expr("(avail_tokens * frac_bp) DIV 10000")), lit(0L)))
    val emptyArr = array().cast("array<bigint>")
    df.join(broadcast(rates), col(domainCol) === col("__dom"))
      .withColumn("epoch", explode(concat(
        when(col("full_epochs") > 0,
          sequence(lit(0L), col("full_epochs") - 1)).otherwise(emptyArr),
        when(hashBucket(col(keyCol)) < col("frac_bp"),
          array(col("full_epochs"))).otherwise(emptyArr))))
      .drop("__dom")
  }

  /**
   * Deterministic stratified sampling: keep a row iff its key's hash
   * bucket falls under the stratum's sampling rate (basis points of
   * 10000). The standard corpus-rebalancing move — downsample dominant
   * domains/languages, keep rare strata — expressed as a pure per-row
   * predicate: no shuffle, no driver state, stable under re-runs and
   * appends, and codegen'd as a plain filter so it pushes past column
   * pruning. Unlike `DataFrame.sampleBy`, the result is independent of
   * partition layout and reproducible by any engine (the DuckDB oracle
   * recomputes identical buckets).
   *
   * @param ratesBp  (stratum value → rate) in basis points; strata not
   *                 listed fall back to `defaultBp`
   */
  def stratifiedSampleHash(df: DataFrame, keyCol: String, stratumCol: String,
                           ratesBp: Seq[(String, Int)],
                           defaultBp: Int = 0): DataFrame = {
    require(ratesBp.forall { case (_, bp) => bp >= 0 && bp <= 10000 },
      "rates are basis points in [0, 10000]")
    val threshold = ratesBp.foldRight(lit(defaultBp)) {
      case ((value, bp), elseE) => when(col(stratumCol) === value, lit(bp)).otherwise(elseE)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /**
   * Stream-offset sequence packing (GPT-pretraining style): documents form
   * a contiguous token stream per shard (deterministic order by
   * `orderCol`), the stream is cut into `maxTokens` chunks, and each
   * document is keyed by the chunk its first token lands in. Long
   * documents span chunks; short ones share them — the packing used when
   * the loader concatenates-and-cuts rather than bin-packs. (TRUE first-
   * fit bin packing is a sequential recurrence — not expressible as
   * window algebra; this closed form is, which also makes it exactly
   * reproducible by any engine with window sums, including the oracle.)
   *
   * The cumulative sum runs as a window per shard — scale-safe because
   * shard fan-in is |rows|/|shards|, set by the caller (pack per output
   * file / per worker), never the whole corpus in one partition.
   *
   * Adds `pack_id` (0-based within shard) and `pack_offset` (the doc's
   * starting token offset within the stream).
   */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    tokenCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0)
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    val prefix = sum(col(tokenCol).cast("long")).over(w) - col(tokenCol).cast("long")
    df.withColumn("pack_offset", prefix)
      .withColumn("pack_id", floor(col("pack_offset") / maxTokens.toLong))
  }

  /**
   * TRUE greedy (next-fit) bin packing (the loader semantics when documents are
   * never split and packs never overflow): walk each shard in `orderCol`
   * order, open a new pack whenever the current document does not fit;
   * documents longer than `maxTokens` get a pack of their own. This is a
   * sequential recurrence — not expressible as window algebra (which is
   * why [[packSequences]] exists as the closed-form alternative) — so it
   * runs as a per-partition fold after `repartition(shard)` +
   * `sortWithinPartitions`: one shuffle, constant state per open shard,
   * no per-group materialization. The Row-codec hop is the cost of the
   * recurrence, confined to this one operator.
   *
   * Adds `pack_id` (0-based within shard).
   */
  def packSequencesNextFit(df: DataFrame, shardCol: String, orderCol: String,
                            tokenCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0)
    val schema = df.schema
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("pack_id", org.apache.spark.sql.types.LongType,
        nullable = false))
    val shardIdx = schema.fieldIndex(shardCol)
    val tokIdx = schema.fieldIndex(tokenCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val max = maxTokens.toLong
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(orderCol))
      .mapPartitions { it =>
        // rows of one shard are contiguous after the sort; track the open
        // pack of the CURRENT shard only — constant memory
        var curShard: Any = null
        var first = true
        var packId = -1L
        var used = 0L
        it.map { row =>
          val shard = row.get(shardIdx)
          val toks = row.get(tokIdx) match {
            case n: Number => n.longValue()
            case other => throw new IllegalArgumentException(
              s"token count must be numeric, got $other")
          }
          if (first || shard != curShard) { curShard = shard; first = false; packId = 0L; used = 0L }
          else if (used + toks > max && used > 0L) { packId += 1L; used = 0L }
          used += toks
          org.apache.spark.sql.Row.fromSeq(row.toSeq :+ packId)
        }
      }
  }

  /**
   * Deterministic weighted sampling WITHOUT replacement (Efraimidis &
   * Spirakis 2006): item i ranks by key uᵢ^(1/wᵢ) with uᵢ uniform —
   * equivalently by ln(uᵢ)/wᵢ (monotone transform, avoids pow) — and the
   * top-m keys are the sample; inclusion probability is proportional to
   * weight, exactly the reservoir-A-ES semantics but with uᵢ derived from
   * md5(key) instead of an RNG, so the SAME m items are selected across
   * runs, layouts, engines, and appends (the [[hashBucket]] philosophy).
   * u = (h₃₂ + 0.5) / 2³², h₃₂ = first 8 md5 hex chars — never 0 or 1, so
   * ln is finite.
   *
   * Adds `__wkey` (the ln(u)/w rank key, higher = more likely selected);
   * callers take the global top-m via orderBy+limit —
   * TakeOrderedAndProject computes per-partition top-m then merges m·P
   * rows on the driver stage: no global sort, no Window, scales to any
   * corpus (the q02/q07 top-k argument).
   *
   * Cross-engine exactness: h₃₂ is an exact integer, u one fixed
   * division, and ln's ≤1-ulp libm drift (~1e-19 after the weight
   * division) sits ~10 orders under measured adjacent-key gaps
   * (≥4e-9 on the documents fixture at sf0.01) — rank order is stable.
   * Rows with NULL or non-positive weight are dropped (log-key
   * undefined), matching the paper's w > 0 domain.
   */
  def weightedKey(df: DataFrame, keyCol: String, weightCol: String): DataFrame = {
    val h32 = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (h32.cast("double") + lit(0.5)) / lit(4294967296.0)
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wkey", log(u) / col(weightCol).cast("double"))
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
   * score every raw document by how much more likely its hashed-unigram
   * bag is under the TARGET distribution than under the RAW one,
   *
   *   log w(x) = Σ_{t ∈ tokens(x)} [ ln p̂_T(b(t)) − ln p̂_R(b(t)) ]
   *
   * with add-one-smoothed bucket probabilities
   * p̂(b) = (count(b) + 1) / (total + buckets) over `buckets` hashed
   * features ([[hashBucket]] — md5-derived, engine-portable). Selecting
   * the top-weighted raw docs approximates sampling from the target
   * distribution (importance resampling) — the standard "pick pretraining
   * data that looks like the quality corpus" move.
   *
   * Returns (idCol, n_tokens long, log_weight double). Callers select by
   * thresholding/ranking log_weight (deterministic; pair with
   * [[hashBucket]] Gumbel-free top-k for an exact-size sample).
   *
   * Scale shape: the raw corpus tokenizes into (id, bucket) once per
   * consuming branch; bucket statistics are TWO bounded aggregations
   * (≤ `buckets` rows each, partial-agg combined map-side) that join back
   * as a BROADCAST, and the per-doc score is one groupBy(id) sum — the
   * corpus never shuffles on anything wider than its own id, and no
   * vocabulary-sized table ever crosses a shuffle (the hashing trick's
   * point: the feature space is fixed at `buckets` regardless of corpus
   * vocabulary, so the broadcast stays KB-sized at 100 TB).
   *
   * Cross-engine exactness: counts and totals are exact integers; each
   * token's term is two divisions and two `ln`s (≤ 1-ulp libm drift) and
   * the per-doc sum's order dependence is ~1e-13 relative — callers round
   * to 4 dp like the q79 NLL precedent.
   */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def toks(df: DataFrame, extra: Column*): DataFrame =
      df.select(extra :+ explode(
          filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")).as("__t"): _*)
        .withColumn("__b", hashBucket(col("__t"), buckets)).drop("__t")
    val rawToks = toks(raw, col(idCol))
    val tgtToks = toks(target)
    val rawC = rawToks.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val tgtC = tgtToks.groupBy("__b").agg(count(lit(1)).as("__ct"))
    val stats = rawC.join(tgtC, Seq("__b"), "left")
      .select(col("__b"), col("__cr"), coalesce(col("__ct"), lit(0L)).as("__ct"))
    val totals = rawToks.agg(count(lit(1)).as("__nr"))
      .crossJoin(tgtToks.agg(count(lit(1)).as("__nt")))
    val b = lit(buckets.toLong)
    rawToks
      .join(broadcast(stats), "__b")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(log((col("__ct") + 1).cast("double") / (col("__nt") + b).cast("double")) -
            log((col("__cr") + 1).cast("double") / (col("__nr") + b).cast("double")))
          .as("log_weight"))
  }

  /**
   * Neyman-allocated stratified sample: the survey-statistics optimum —
   * a total budget of `totalN` rows splits across strata PROPORTIONALLY
   * TO N_h·σ_h (big and internally-varied strata get more samples; a
   * huge but homogeneous stratum needs few), then an exact-n_h
   * deterministic pick per stratum by md5 order (the q102 discipline).
   * Allocations floor (Σ n_h ≤ totalN; the remainder is deliberately
   * unassigned rather than tie-broken) and cap at the stratum size.
   *
   * Determinism: σ_h rounds to 6dp before the allocation arithmetic
   * (the cusum pin), so n_h is the same integer in any engine; the
   * pick ranks (md5(id), id) via the bounded top-k aggregate — k =
   * totalN bounds every per-stratum buffer, no Window.
   *
   * Degenerate inputs: when EVERY stratum is homogeneous (all σ_h = 0,
   * so Σ N_h·σ_h = 0 and the Neyman weights are undefined) the
   * allocation falls back to PROPORTIONAL (weight = N_h) instead of
   * silently returning an empty sample; rows with a null `valueCol`
   * are excluded from the pick pool, matching the stats frame — they
   * contributed nothing to the allocation weights, so they must not
   * consume allocations either.
   *
   * Returns sampled rows: (stratum, id, rank, alloc).
   */
  def neymanSample(df: DataFrame, stratumCol: String, idCol: String,
                   valueCol: String, totalN: Int): DataFrame = {
    require(totalN >= 1)
    val stats = df.where(col(valueCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__nh"),
        round(stddev_pop(col(valueCol)), 6).as("__sh"))
      .withColumn("__w", col("__nh").cast("double") * col("__sh"))
    val tot = stats.agg(sum(col("__w")).as("__tw"),
      sum(col("__nh")).as("__tn"))
    val alloc = stats.crossJoin(broadcast(tot))
      .withColumn("__frac",
        when(col("__tw").isNull || col("__tw") === 0.0,
          col("__nh").cast("double") / col("__tn").cast("double"))
          .otherwise(col("__w") / col("__tw")))
      .select(col(stratumCol),
        least(floor(lit(totalN.toDouble) * col("__frac"))
          .cast("long"), col("__nh")).as("alloc"))
    val base = df.where(col(valueCol).isNotNull)
      .select(col(stratumCol), col(idCol),
        md5(col(idCol).cast("string")).as("__h"))
    GroupedTopK.topK(base, Seq(stratumCol),
        Seq(("__h", true), (idCol, true)), totalN, rankCol = "rank")
      .join(broadcast(alloc), Seq(stratumCol))
      .where(col("rank") <= col("alloc"))
      .drop("__h")
  }
}
