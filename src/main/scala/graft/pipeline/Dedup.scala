package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deduplication operators for training-data pipelines, designed for the
 * 100 TB regime:
 *
 *  - exact:   one hash-shuffle on a 16-byte digest (never on raw text);
 *             map-side partial aggregation applies.
 *  - minhash: shingle → signature → LSH band explode → shuffle on
 *             (band, bucket-hash) → within-bucket candidate pairs →
 *             exact-similarity verify. The only shuffle key is a short
 *             bucket hash; bucket skew is bounded because identical bands
 *             imply near-identical docs.
 *  - simhash: 64-bit sketch, banded into 4×16-bit chunks (Hamming ≤3 ⇒
 *             at least one identical chunk) → bucket join → Hamming verify.
 *
 * All return DataFrames lazily — no driver-side collection anywhere.
 */
object Dedup {

  /** Stable 128-bit content key — shuffle/dedup on this, not raw text. */
  def contentKey(text: Column): Column = md5(text)

  /**
   * Exact dedup: keep the lowest-id row per identical content.
   *
   * Implemented as keeper selection + LEFT SEMI join, NOT a
   * `row_number` Window: the keeper per content key is a partial
   * aggregate ([[exactDuplicateGroups]] — `min(id)` combines map-side,
   * so a template spammed 10⁹× collapses to one row per map task before
   * any shuffle), and the semi-join probes on (content_key, id) —
   * unique combinations, no hot key. A Window would sort every
   * duplicate of the hottest content key in ONE reducer partition: the
   * classic single-task stall on spam-heavy corpora at 100 TB. The
   * plan shape (no Window node) is suite-asserted.
   *
   * Null text: `md5(null)` is null, so null-text rows share the null
   * content key. The semi-join probes with null-safe equality (`<=>`) so
   * that group behaves like any other — the lowest-id null-text row is
   * kept, the rest dropped (identical to the row_number-over-Window
   * formulation, which groups nulls into one partition).
   */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keepers = exactDuplicateGroups(df, textCol, idCol)
      .select(col("content_key").as("__ck"), col("keeper_id").as("__keep"))
    val left = df.withColumn("__ck", contentKey(col(textCol)))
    left.join(keepers,
        (left("__ck") <=> keepers("__ck")) && left(idCol) === keepers("__keep"),
        "left_semi")
      .drop("__ck")
  }

  /** Exact duplicate groups: (content_key, dup_count, keeper_id). */
  def exactDuplicateGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(contentKey(col(textCol)).as("content_key"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("keeper_id"))

  /**
   * MinHash-LSH near-duplicate candidate pairs.
   *
   * @param numHashes  signature length (bands × rowsPerBand)
   * @param bands      LSH bands; P(candidate) = 1-(1-s^r)^b for Jaccard s
   * @param shingle    tokens per shingle
   * @return (id_a, id_b, est_jaccard) with id_a < id_b — estimated Jaccard
   *         from signature agreement of the full signatures.
   */
  /** Band-hash array over an already-computed signature column.
    *
    * Built as an EXPLICIT `array(xxhash64(slice(sig, …)), …)` — `bands`
    * syntactic references to `sig` — and NOT as a `transform` over a
    * lambda. The lambda form references `sig` once syntactically, so
    * CollapseProject considers it safe to inline the (expensive) minhash
    * expression into the lambda body — which then evaluates it `bands`
    * times per row, and the Generate's pushed-down `size(bh) > 0` filter
    * duplicates all of it again into the scan (measured 3× the whole
    * q25 runtime). With `bands` explicit references the alias is not
    * cheap-to-inline, the signature stays computed ONCE in its own
    * projection, and the pushed filter merely re-hashes the 64-long
    * array. */
  private def bandHashes(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    array((0 until bands).map(b => xxhash64(slice(sig, b * rows + 1, rows))): _*)
  }

  /** `hotBucketBound` sentinel: derive the bound from the data, inside the
    * plan — no knob to go stale when the corpus shifts (the adaptive-pitch
    * precedent). See [[occupancyBoundFrame]] for the estimate. */
  val AutoBound: Int = -1

  /**
   * The [[AutoBound]] bound as a ONE-ROW frame:
   * `greatest(64, 16 × p99.9(occupancy))` with the percentile computed
   * EXACTLY — the ANSI `percentile_disc` rule (the value at 1-based rank
   * `ceil(999·n/1000)` of the ascending occupancy order, equivalently
   * the smallest value whose cumulative count reaches
   * `(999·n + 999) DIV 1000`, which is how the q119 oracle replays it
   * in pure integer arithmetic). An approx_percentile sketch here could
   * drift with partitioning/merge order, letting a group sitting near
   * the bound flip between hub-star and all-pairs output across layouts
   * — the exact form is layout-independent AND SQL-replayable.
   */
  private[pipeline] def occupancyBoundFrame(occ: DataFrame,
                                            occCol: String = "__occ"): DataFrame =
    // ONE exact aggregate (Spark's percentile_disc buffers a value→count
    // map — bounded by the handful of DISTINCT occupancy values, with
    // map-side partial merge; no extra shuffle, no window). Its ANSI
    // selection rule — smallest value with cume_dist ≥ p — coincides
    // with the integer rank rule above for p = 0.999 at any realistic n
    // (cum/total = 0.999 exactly IEEE-divides to the double literal, and
    // any smaller cum sits ≥ 1/n below it, dwarfing the ulp), which the
    // randomized suite fuzz pins against an independent integer-rule
    // reference. Occupancies are exact-in-double longs, so 16·v and the
    // long cast are exact.
    occ.agg(coalesce(
      greatest(lit(64L),
        (lit(16.0) * expr(
          s"percentile_disc(0.999) WITHIN GROUP (ORDER BY $occCol)"))
          .cast("long")),
      lit(64L)).as("__bound"))

  /**
   * Buckets whose occupancy exceeds the (possibly self-tuned) bound.
   *
   * With [[AutoBound]] the bound is
   * `greatest(64, 16 × p99.9(occupancy))` ([[occupancyBoundFrame]] —
   * EXACT percentile, layout-independent), computed
   * inside the SAME query as a one-row aggregate broadcast back onto the
   * occupancy frame (the bm25 corpus-stats shape): natural LSH occupancy
   * is ~1 per bucket at any corpus size (a bucket collects near-dups and
   * hash collisions, both rare; measured p99.99 = 4 on the sf0.1 corpus),
   * so the floor of 64 sits far above legitimate buckets while
   * template-spam buckets (hundreds+) are unambiguous; the quantile term
   * lifts the bound on corpora whose legitimate near-dup clusters are
   * genuinely larger.
   *
   * Deliberately NOT a ScalarSubquery over a persisted frame (the
   * adaptive-pitch shape): a subquery executes in its own job BEFORE the
   * main query, which decouples the occupancy aggregate from the main
   * job's exchange reuse — on the composed curate pipeline that split
   * re-executed the upstream dedup window per job and measured 2.2×.
   * The broadcast one-row join keeps every reference inside one AQE
   * query, where the identical occupancy exchanges are reused.
   */
  /** The exact AutoBound rule as a one-row frame (`__bound`) — public so
    * certification faces can ASSERT the guard's no-trip precondition
    * against the same arithmetic the operators run. */
  def occupancyBound(occ: DataFrame, occCol: String = "__occ"): DataFrame =
    occupancyBoundFrame(occ, occCol)

  private[pipeline] def hotBuckets(occ: DataFrame, hotBucketBound: Int): DataFrame = {
    require(hotBucketBound > 0 || hotBucketBound == AutoBound,
      s"hotBucketBound must be positive or AutoBound, got $hotBucketBound")
    if (hotBucketBound == AutoBound) {
      val bf = occupancyBoundFrame(occ)
      occ.crossJoin(broadcast(bf)).filter(col("__occ") > col("__bound"))
        .drop("__bound")
    } else occ.filter(col("__occ") > lit(hotBucketBound.toLong))
  }

  /**
   * @param hotBucketBound per-bucket occupancy guard: buckets holding more
   *        rows than this emit HUB-STAR pairs (every member against the
   *        bucket's minimum id) instead of all pairs — linear, not
   *        quadratic, in the occupancy. Template spam concentrates
   *        thousands of near-identical docs into few buckets, and the
   *        all-pairs OUTPUT itself is quadratic there (the sf1 stress
   *        measured exactly this); the star keeps every spam member
   *        connected to one keeper, which is what downstream
   *        keep-lowest dedup consumes, at linear cost. Non-hub pairs
   *        confined to hot buckets are not emitted (documented recall
   *        trade), and a pair meeting in both a hot and a cold bucket can
   *        be emitted by both paths (each path itself is exactly-once;
   *        keep-lowest consumers are insensitive to the duplicate). The
   *        default [[AutoBound]] derives the bound from the occupancy
   *        distribution inside the plan ([[occupancyBoundCol]]) — on
   *        spam-free corpora no bucket reaches it, so the OUTPUT equals
   *        the unguarded path's. Int.MaxValue disables the guard entirely
   *        — the plan is then byte-identical to the unguarded shape, no
   *        occupancy aggregate.
   */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            numHashes: Int = 64, bands: Int = 16,
                            shingle: Int = 3,
                            hotBucketBound: Int = AutoBound): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // band b = hash(sig[b*rows .. (b+1)*rows)) — the band hashes are
    // computed ONCE per doc (not per exploded row, and not re-sliced per
    // candidate pair) and carried as a `bands`-long array next to the
    // signature. A pair sharing m bands appears m times in the bucket
    // join; it is emitted only from the FIRST shared band (a zip of the
    // carried band-hash arrays) — exactly-once, no distinct() shuffle.
    val sig = df.select(col(idCol).as("id"),
        Text.minhash(col(textCol), numHashes, shingle).as("sig"))
    pairsFromSketches(sig, numHashes, bands, hotBucketBound)
  }

  /**
   * Persist the MinHash sketches (signature + band hashes) of a corpus —
   * the write-once form of [[minhashCandidatePairs]] for the 100 TB
   * regime: the text corpus is scanned ONCE at index build; candidate
   * generation afterwards reads only the slim sketch table (~0.6 KB/doc
   * vs the documents), so re-running dedup (or running it incrementally
   * against a new batch's sketches) never re-tokenizes the corpus.
   */
  def writeMinhashIndex(df: DataFrame, textCol: String, idCol: String,
                        path: String, numHashes: Int = 64, bands: Int = 16,
                        shingle: Int = 3): Unit =
    sketchFrame(df, textCol, idCol, numHashes, bands, shingle)
      .write.mode("overwrite").parquet(path)

  /** Grow a persisted sketch index with a new batch's sketches — the
    * standing corpus is never re-tokenized (parallel to
    * [[graft.pipeline.Similarity.appendIvfIndex]]). Sketch parameters come
    * from the index metadata so old and new rows band identically. */
  def appendMinhashIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         batch: DataFrame, textCol: String, idCol: String,
                         shingle: Int = 3): Unit =
    sketchForIndex(spark, path, batch, textCol, idCol, shingle)
      .write.mode("append").parquet(path)

  /** [[sketchForIndex]] with EXPLICIT parameters — for callers creating a
    * fresh index (no standing schema to recover them from). */
  def sketchBatch(df: DataFrame, textCol: String, idCol: String,
                  numHashes: Int = 64, bands: Int = 16,
                  shingle: Int = 3): DataFrame =
    sketchFrame(df, textCol, idCol, numHashes, bands, shingle)

  private def sketchFrame(df: DataFrame, textCol: String, idCol: String,
                          numHashes: Int, bands: Int, shingle: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("numHashes", numHashes).build()
    val bhMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("bands", bands).build()
    df.select(col(idCol).as("id"),
        Text.minhash(col(textCol), numHashes, shingle).as("sig", sigMeta))
      .withColumn("bh", bandHashes(col("sig"), numHashes, bands))
      .select(col("id"), col("sig"), col("bh").as("bh", bhMeta))
  }

  /** Candidate pairs from a persisted sketch index — same result as
    * [[minhashCandidatePairs]] over the original corpus, no text scan.
    * The signature length travels as field metadata — reading it is a
    * schema lookup, not a data action. */
  def minhashCandidatePairsIndexed(spark: org.apache.spark.sql.SparkSession,
                                   path: String): DataFrame = {
    val sig = spark.read.parquet(path)
    val numHashes = sig.schema("sig").metadata.getLong("numHashes").toInt
    val bands = sig.schema("bh").metadata.getLong("bands").toInt
    pairsFromSketches(sig.select(col("id"), col("sig")), numHashes, bands)
  }

  /**
   * Incremental dedup: near-dup candidate pairs between a NEW batch and a
   * persisted corpus index — the corpus is never re-tokenized, only the
   * batch is sketched. Returns (id_a = corpus id, id_b = batch id,
   * est_jaccard); batch-internal duplicates are found separately with
   * [[minhashCandidatePairs]] on the batch. Sketch parameters come from
   * the index metadata so both sides band identically.
   */
  /** @param hotBucketBound guard on the CORPUS side's per-bucket occupancy
    *        (the standing side is where template spam accumulates): hot
    *        index buckets compare the batch against the bucket HUB sketch
    *        only (minimum corpus id) — linear instead of occ_corpus ×
    *        occ_batch per bucket; the hub estimate is the drop signal the
    *        incremental curate consumes. Default disables the guard with a
    *        plan byte-identical to before. */
  def minhashCandidatePairsAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                                        path: String, batch: DataFrame,
                                        textCol: String, idCol: String,
                                        shingle: Int = 3,
                                        hotBucketBound: Int = AutoBound): DataFrame =
    minhashCandidatePairsAgainstSketchFrame(spark.read.parquet(path), batch,
      textCol, idCol, shingle, hotBucketBound)

  /** [[minhashCandidatePairsAgainstIndex]] against an ALREADY-LOADED
    * (possibly filtered or unioned) corpus sketch frame carrying the
    * index's `sig`/`bh` field metadata — the hook for callers whose
    * standing side spans more than one directory or must exclude
    * partitions (the exactly-once streaming sinks' `__batch < bid`
    * probe). The batch is sketched here under the frame's recorded
    * parameters. */
  def minhashCandidatePairsAgainstSketchFrame(corpusSketches: DataFrame,
                                              batch: DataFrame,
                                              textCol: String, idCol: String,
                                              shingle: Int = 3,
                                              hotBucketBound: Int = AutoBound): DataFrame = {
    val numHashes = corpusSketches.schema("sig").metadata
      .getLong("numHashes").toInt
    val batchSig = batch.select(col(idCol).as("id"),
        Text.minhash(col(textCol), numHashes, shingle).as("sig"))
    pairsSketchedAgainstIndex(corpusSketches, batchSig, hotBucketBound)
  }

  /** Sketch a batch under an index's RECORDED parameters — the one-scan
    * input shared by [[minhashCandidatePairsSketchedAgainstIndex]] and a
    * plain `.write.mode("append")` onto the index (schema + metadata are
    * the index's own): callers that both flag against an index and grow
    * it ([[graft.streaming.StreamOps.nearDupFlagsStream]]) tokenize the
    * batch ONCE instead of once per consumer. */
  def sketchForIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     batch: DataFrame, textCol: String, idCol: String,
                     shingle: Int = 3): DataFrame = {
    val schema = spark.read.parquet(path).schema
    sketchFrame(batch, textCol, idCol,
      schema("sig").metadata.getLong("numHashes").toInt,
      schema("bh").metadata.getLong("bands").toInt, shingle)
  }

  /** [[minhashCandidatePairsAgainstIndex]] over an ALREADY-SKETCHED batch
    * ([[sketchForIndex]]) — no text scan at all. */
  def minhashCandidatePairsSketchedAgainstIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batchSketch: DataFrame,
      hotBucketBound: Int = AutoBound): DataFrame =
    pairsSketchedAgainstIndex(spark.read.parquet(path),
      batchSketch.select(col("id"), col("sig")), hotBucketBound)

  /** [[minhashCandidatePairsSketchedAgainstIndex]] against an
    * ALREADY-LOADED (possibly filtered) corpus sketch frame — the hook for
    * callers that must restrict the standing side, e.g. the streaming
    * flags sink excluding its own batch's partition on replay. The frame
    * must carry the index's `sig`/`bh` field metadata (any projection or
    * filter of an index read does). */
  def minhashCandidatePairsSketched(corpusSketches: DataFrame,
                                    batchSketch: DataFrame,
                                    hotBucketBound: Int = AutoBound): DataFrame =
    pairsSketchedAgainstIndex(corpusSketches,
      batchSketch.select(col("id"), col("sig")), hotBucketBound)

  private def pairsSketchedAgainstIndex(corpus: DataFrame, batchSig: DataFrame,
                                        hotBucketBound: Int): DataFrame = {
    val numHashes = corpus.schema("sig").metadata.getLong("numHashes").toInt
    val bands = corpus.schema("bh").metadata.getLong("bands").toInt
    // bands explode as inline expressions over the sig attribute (never an
    // aliased column) — see pairsFromSketches for why
    def explodeSide(df: DataFrame, suffix: String): DataFrame =
      df.select(col("id"), col("sig"),
          posexplode(bandHashes(col("sig"), numHashes, bands)).as(Seq("band", "bucket")))
        .select(col("band"), col("bucket"), col("id").as(s"id_$suffix"),
          col("sig").as(s"sig_$suffix"))
    def estJaccard = (size(filter(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => x === y), bb => bb))
      .cast("double") / lit(numHashes.toDouble)).as("est_jaccard")
    val corpusBanded = explodeSide(corpus.select(col("id"), col("sig")), "a")
    val batchBanded = explodeSide(batchSig, "b")
    def pairs(corpusSide: DataFrame): DataFrame = corpusSide
      .join(batchBanded, Seq("band", "bucket"))
      .filter(col("band") === array_position(zip_with(
        bandHashes(col("sig_a"), numHashes, bands),
        bandHashes(col("sig_b"), numHashes, bands), (x, y) => x === y), true) - 1)
      .select(col("id_a"), col("id_b"), estJaccard)
    if (hotBucketBound == Int.MaxValue) return pairs(corpusBanded)

    // corpus-side occupancy + hub on the join's own key (the index is the
    // big standing side); hot buckets contribute hub-vs-batch comparisons
    // only, deduplicated across bands on the bounded hub-pair set
    val occ = corpusBanded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__occ"), min(col("id_a")).as("__hub"))
    val hotB = hotBuckets(occ, hotBucketBound)
    val cold = corpusBanded.join(hotB, Seq("band", "bucket"), "left_anti")
    val hotHubs = corpusBanded.join(hotB, Seq("band", "bucket"))
      .filter(col("id_a") === col("__hub")).drop("__occ", "__hub")
    val hotPairs = hotHubs.join(batchBanded, Seq("band", "bucket"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), estJaccard)
    pairs(cold).unionByName(hotPairs)
  }

  /**
   * EXACT cross-corpus near-dup pairs: LSH candidates from the sketch
   * index ([[minhashCandidatePairsAgainstIndex]]) re-verified with exact
   * n-gram Jaccard — the same verify [[nearDuplicatePairs]] applies
   * batch-internally, so an incremental run classifies threshold-adjacent
   * pairs identically to a full run over the union.
   *
   * Corpus text is read for CANDIDATE ids only: the candidate-id set
   * (LSH-fan-out-sized, tiny vs the corpus) broadcasts into a LEFT SEMI
   * join that prunes the corpus before tokenization — no corpus-wide
   * shuffle, no shingling of non-candidate documents. At 100 TB, store
   * the corpus id-sorted so the same join's min/max row-group stats also
   * bound the I/O. The slim candidate subtree is referenced twice (the
   * broadcast prune and the verify join) — both index-sized, never
   * corpus-sized.
   *
   * Output: (id_a corpus id, id_b batch id, jaccard ≥ threshold) —
   * `jaccard` is the exact n-gram value for pairs whose corpus text is
   * present in `corpusDocs`. A candidate whose corpus id has NO text row
   * (the caller seeded the index beyond the corpus frame — e.g. a
   * pre-built index over documents that were never appended to the data
   * dir) cannot verify exactly; it falls back to the ESTIMATE gate
   * (`est_jaccard ≥ threshold`, the no-corpusDocs behavior) instead of
   * being silently dropped by the inner verify join — dropping it would
   * KEEP near-dups of pre-existing corpus docs, strictly worse than the
   * estimate gate this method upgrades. For such pairs `jaccard` carries
   * the estimate. Under the curateStream/curateIncrement append
   * discipline index ⊆ corpus holds and the fallback branch is empty.
   */
  def nearDuplicatePairsAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                                     path: String, batch: DataFrame,
                                     corpusDocs: DataFrame,
                                     textCol: String, idCol: String,
                                     threshold: Double, n: Int = 3,
                                     hotBucketBound: Int = AutoBound): DataFrame =
    nearDuplicatePairsAgainstSketchFrame(spark.read.parquet(path), batch,
      corpusDocs, textCol, idCol, threshold, n, hotBucketBound)

  /** [[nearDuplicatePairsAgainstIndex]] against an ALREADY-LOADED corpus
    * sketch frame (see [[minhashCandidatePairsAgainstSketchFrame]]) —
    * identical semantics including the estimate-gate fallback for
    * index-only candidates. */
  def nearDuplicatePairsAgainstSketchFrame(corpusSketches: DataFrame,
                                           batch: DataFrame,
                                           corpusDocs: DataFrame,
                                           textCol: String, idCol: String,
                                           threshold: Double, n: Int = 3,
                                           hotBucketBound: Int = AutoBound): DataFrame = {
    val cand0 = minhashCandidatePairsAgainstSketchFrame(corpusSketches, batch,
      textCol, idCol, n, hotBucketBound)
    // the guarded run can emit a pair from both the hot and cold path —
    // dedup before the verify join (same rule as nearDuplicatePairs); the
    // kept est_jaccard is identical across duplicates (a pure function of
    // the two signatures), so the arbitrary-row keep is deterministic
    val candidates =
      if (hotBucketBound == Int.MaxValue) cand0
      else cand0.dropDuplicates("id_a", "id_b")
    val corpusCand = corpusDocs
      .select(col(idCol).as("id_a"), col(textCol).as("__text_a"))
      .join(broadcast(candidates.select("id_a").dropDuplicates("id_a")),
        Seq("id_a"), "left_semi")
    val gramsA = corpusCand.select(col("id_a"),
      array_distinct(Text.wordShingles(col("__text_a"), n)).as("grams_a"))
    val gramsB = batch.select(col(idCol).as("id_b"),
      array_distinct(Text.wordShingles(col(textCol), n)).as("grams_b"))
    val exact = candidates
      .join(gramsA, Seq("id_a"))
      .join(gramsB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // index-only candidates (no corpus text) → estimate gate. The anti
    // join's RIGHT side is the candidate-pruned corpus id set
    // (candidate-sized, broadcast) — never the corpus itself; the branch
    // costs one extra candidate-pruned scan of the corpus id column and
    // emits nothing when index ⊆ corpus.
    val orphans = candidates
      .join(broadcast(corpusCand.select("id_a").dropDuplicates("id_a")),
        Seq("id_a"), "left_anti")
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard").as("jaccard"))
    exact.unionByName(orphans)
  }

  /** Banded bucket join + first-shared-band emission over (id, sig).
    *
    * The band array is exploded as an inline expression over the carried
    * `sig` attribute and NEVER aliased to a column: an aliased band array
    * drags the minhash computation with it when the Generate's inferred
    * `size > 0` filter is pushed below the projection (PushDownPredicates
    * substitutes aliases with no cost guard). The first-shared-band filter
    * re-derives the band hashes from the carried signatures — 16 cheap
    * xxhash64 calls per CANDIDATE row, instead of a full minhash per
    * corpus row per band. */
  private def pairsFromSketches(sig: DataFrame, numHashes: Int, bands: Int,
                                hotBucketBound: Int = AutoBound): DataFrame = {
    def estJaccard = (size(filter(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => x === y), bb => bb))
      .cast("double") / lit(numHashes.toDouble)).as("est_jaccard")
    def allPairs(banded: DataFrame): DataFrame = {
      val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"),
        col("sig").as("sig_a"))
      val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"),
        col("sig").as("sig_b"))
      a.join(b, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .filter(col("band") === array_position(zip_with(
          bandHashes(col("sig_a"), numHashes, bands),
          bandHashes(col("sig_b"), numHashes, bands), (x, y) => x === y), true) - 1)
        .select(col("id_a"), col("id_b"), estJaccard)
    }
    if (hotBucketBound == Int.MaxValue)
      return allPairs(sig.select(col("id"), col("sig"),
        posexplode(bandHashes(col("sig"), numHashes, bands)).as(Seq("band", "bucket"))))

    // hot-bucket guard: occupancy + hub (min id) per bucket — ONE extra
    // aggregate on the same (band, bucket) key the pair join shuffles on.
    // Cold buckets take the exact all-pairs path; hot buckets emit each
    // member against the hub only (linear), deduplicated across bands —
    // the dedup input is bounded by Σ hot-bucket occupancies, not its
    // square, so the distinct here cannot reintroduce the quadratic cost.
    val banded = sig.select(col("id"), col("sig"),
      posexplode(bandHashes(col("sig"), numHashes, bands)).as(Seq("band", "bucket")))
    // Occupancy and hub via WINDOW functions over the (band, bucket)
    // partitioning the pair join shuffles on anyway — no extra exchange of
    // the banded frame (a groupBy+join guard shape measured 2.4×, and even
    // a hot-LIST anti-join added AQE stage depth that doubled the composed
    // curate pipeline at bench scale). The windows ride the join's own
    // shuffle; their (band, bucket) sort satisfies the sort-merge join's
    // ordering requirement, so the marginal cost is the in-partition
    // window pass itself.
    val w = Window.partitionBy("band", "bucket")
    val withOcc = banded
      .withColumn("__occ", count(lit(1)).over(w))
      .withColumn("__hub", min(col("id")).over(w))
    val guarded =
      if (hotBucketBound == AutoBound) {
        // one row per BUCKET (not per banded row — spam would drag the
        // row-weighted quantile up to its own occupancy) → one-row bound,
        // broadcast back (the bm25 corpus-stats shape)
        val bf = occupancyBoundFrame(withOcc
          .withColumn("__rn", row_number().over(w.orderBy("id")))
          .filter(col("__rn") === 1))
        withOcc.crossJoin(broadcast(bf))
      } else withOcc.withColumn("__bound", lit(hotBucketBound.toLong))
    val cold = guarded.filter(col("__occ") <= col("__bound"))
      .drop("__occ", "__hub", "__bound")
    val hotRows = guarded.filter(col("__occ") > col("__bound"))
    val hubSide = hotRows.filter(col("id") === col("__hub"))
      .select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val hotPairs = hotRows.filter(col("id") =!= col("__hub"))
      .select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
      .join(hubSide, Seq("band", "bucket"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), estJaccard)
    allPairs(cold).unionByName(hotPairs)
  }

  /**
   * Repeated-long-span detection at fixed-window granularity — the
   * exact-substring-dedup signal (Lee et al., "Deduplicating Training
   * Data Makes Language Models Better") at window resolution: two
   * documents sharing any `window`-char span aligned to a `stride` grid
   * are reported with the count of distinct shared windows. Character
   * windows at offsets 0, stride, 2·stride… (full windows only) hash via
   * md5 — the shuffle key is 16 bytes regardless of window size and both
   * engines agree on the digest; (id, hash) dedups first so internal
   * repetition inside one document never inflates the pair count.
   *
   * The stride trades recall for cost the standard way: a shared span of
   * length ≥ window + stride − 1 is ALWAYS detected (it covers a full
   * grid window on both sides only when stride divides the alignment —
   * with the same grid on both documents, a common span that long
   * contains at least one grid-aligned window of the EARLIER document;
   * detection therefore needs the span to start at equal offsets mod
   * stride, which exact copies and boilerplate blocks satisfy).
   * Stride 1 removes the alignment condition at stride× the cost.
   *
   * Boilerplate spans (licence headers, nav chrome) occur in thousands
   * of documents and would emit occupancy² pairs — the LSH hot-bucket
   * trap in span clothing. The same self-tuned guard applies
   * ([[AutoBound]]: `greatest(64, 16 × p99.9(occupancy))` as a one-row
   * broadcast): spans over the bound contribute HUB-STAR pairs (member ↔
   * span's minimum id) — linear, keeps every member connected for
   * downstream keep-lowest dedup; `n_shared` then counts cold spans plus
   * hub-star hot contributions (documented partial count on guarded
   * pairs; inert on natural corpora, where span occupancy is ~1).
   */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
                      window: Int = 64, stride: Int = 32,
                      hotSpanBound: Int = AutoBound): DataFrame = {
    require(window >= 8, s"window must be >= 8, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val spans = df.filter(length(col(textCol)) >= window)
      .select(col(idCol).as("id"), col(textCol).as("__txt"))
      .select(col("id"), col("__txt"),
        explode(sequence(lit(0),
          ((length(col("__txt")) - lit(window)) / lit(stride)).cast("int"))).as("__w"))
      .select(col("id"),
        md5(expr(s"substring(__txt, __w * $stride + 1, $window)")).as("h"))
      .distinct()
    val occ = spans.groupBy(col("h"))
      .agg(count(lit(1)).as("__occ"), min(col("id")).as("__hub"))
    val withBound =
      if (hotSpanBound == AutoBound) {
        val bf = occupancyBoundFrame(occ)
        occ.crossJoin(broadcast(bf))
      } else {
        require(hotSpanBound > 0,
          s"hotSpanBound must be positive or AutoBound, got $hotSpanBound")
        occ.withColumn("__bound", lit(hotSpanBound.toLong))
      }
    val ann = spans.join(withBound, "h")
    val cold = ann.filter(col("__occ") <= col("__bound"))
    val coldPairs = cold.select(col("h"), col("id").as("id_a"))
      .join(cold.select(col("h"), col("id").as("id_b")), "h")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val hotPairs = ann
      .filter(col("__occ") > col("__bound") && col("id") =!= col("__hub"))
      .select(col("__hub").as("id_a"), col("id").as("id_b"))
    coldPairs.unionByName(hotPairs)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /**
   * Near-duplicate pairs by SimHash Hamming distance ≤ `maxHamming` (≤ 3
   * guaranteed found with the 4-chunk banding; larger distances may be
   * missed — standard LSH recall trade-off).
   */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), Text.simhash64(col(textCol)).as("sh"))
    val banded = sh.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)).as(Seq("chunk", "key")))
    val a = banded.select(col("chunk"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("chunk"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    // first-shared-chunk emission: exactly-once per pair, no distinct() shuffle
    val chunkAgrees = array((0 until 4).map(i =>
      shiftrightunsigned(col("sh_a"), i * 16).bitwiseAND(lit(0xffffL)) ===
      shiftrightunsigned(col("sh_b"), i * 16).bitwiseAND(lit(0xffffL))): _*)
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("chunk") === array_position(chunkAgrees, true) - 1)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * The composed near-duplicate pipeline, scale-correct end to end:
   * MinHash-LSH candidate generation (no quadratic stage) → join texts
   * back by id → EXACT n-gram Jaccard verification ≥ `threshold`.
   * This is the shape to run at 100 TB: the only all-pairs work happens
   * within LSH buckets.
   */
  def nearDuplicatePairs(df: DataFrame, textCol: String, idCol: String,
                         threshold: Double, n: Int = 3,
                         numHashes: Int = 64, bands: Int = 16,
                         hotBucketBound: Int = AutoBound): DataFrame = {
    val cand0 = minhashCandidatePairs(df, textCol, idCol, numHashes, bands, n,
      hotBucketBound).select("id_a", "id_b")
    // a guarded run can emit a pair from BOTH the hot and the cold path
    // (documented on minhashCandidatePairs) — dedup before the verify join
    // so jaccard rows stay unique; the unguarded path is exactly-once by
    // construction and keeps its distinct-free plan
    val candidates =
      if (hotBucketBound == Int.MaxValue) cand0
      else cand0.dropDuplicates("id_a", "id_b")
    val grams = df.select(col(idCol).as("__gid"),
      array_distinct(Text.wordShingles(col(textCol), n)).as("__grams"))
    candidates
      .join(grams.withColumnRenamed("__gid", "id_a").withColumnRenamed("__grams", "grams_a"), Seq("id_a"))
      .join(grams.withColumnRenamed("__gid", "id_b").withColumnRenamed("__grams", "grams_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Near-duplicate CLUSTERS: connected components over the verified
   * near-dup pair graph ([[nearDuplicatePairs]]), labeled by the minimum
   * doc id of each component — the grouping view of dedup (pick one
   * canonical per cluster, count cluster sizes, audit what keep-lowest
   * dropped). Fixed-round min-label propagation: after round k every
   * label is the minimum id within k hops, so the result is EXACT when no
   * component's diameter exceeds `rounds` — near-dup components are
   * cliques or short chains in practice (a diameter-9 chain needs nine
   * successive ≥ τ overlaps with no transitive pair). Fixed rounds keep
   * the whole computation ONE lazy plan — no driver-side convergence
   * loop; every round is a self-equi-join of the label table on ids plus
   * a min-aggregate, partial-aggregated map-side. Singletons keep their
   * own id as cluster id.
   *
   * Scale shape: the iteration runs over the DUP-GRAPH ONLY — nodes with
   * at least one edge — never the corpus. At 100 TB the corpus is huge
   * but the near-dup graph is a sliver of it; isolated docs skip the
   * propagation entirely and get their label back through one left join
   * against the (small, usually broadcast) component table.
   *
   * Each round is ONE join against the edge list augmented with
   * self-loops, not `labels ∪ (labels ⋈ edges)`: the union form
   * references `labels` twice, so the lazy plan doubles per round —
   * 2^rounds copies of the whole LSH candidate pipeline (measured: 512
   * FileScans / 525 Exchanges in the 5-round plan, vs ~20 for the
   * self-loop form). A self-loop delivers each node its own label
   * through the same join, which is exactly the union's semantics, with
   * a single `labels` reference keeping the plan linear in rounds. The
   * augmented edge list is persisted (lazily — no driver action): every
   * round references it, and one in-memory materialization of the
   * sliver-sized dup graph replaces five replays of the LSH candidate
   * pipeline (measured 2× on q56 at sf0.1; entries are edge-list-sized
   * and LRU-evicted, the price of iterating without a driver loop).
   */
  def nearDuplicateClusters(df: DataFrame, textCol: String, idCol: String,
                            threshold: Double, n: Int = 3,
                            numHashes: Int = 64, bands: Int = 16,
                            rounds: Int = 5,
                            hotBucketBound: Int = AutoBound): DataFrame = {
    require(rounds >= 1)
    val pairs = nearDuplicatePairs(df, textCol, idCol, threshold, n, numHashes,
      bands, hotBucketBound).select("id_a", "id_b")
    // ONE self-loop per node (distinct ids, not one per directed edge —
    // min() would absorb duplicates but a hot node of degree d would
    // otherwise carry d copies of its own label through every round's
    // join, multiplying join output proportional to degree) makes one
    // join per round sufficient — see the plan-shape note above.
    // persist() (inside connectedComponents) is lazy (no driver action);
    // entries are edge-list sized and LRU-evicted. Long-lived sessions
    // issuing many cluster queries should call
    // `spark.catalog.clearCache()` or rely on LRU; the frame cannot be
    // unpersisted here because the returned plan references it lazily.
    // The seed labels are the self-loop rows of the CACHED edge list, so
    // the LSH candidate pipeline is not replayed a second time.
    val labels = Graph.connectedComponents(pairs, rounds)
    df.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("label"), col("id")).as("cluster_id"))
  }

  /**
   * Quality-aware survivor selection over a clustered frame — the step
   * real pipelines run AFTER near-dup clustering: keep the BEST member
   * of each duplicate cluster (longest / highest quality score), not
   * the arbitrary first. Winner per cluster by (`scoreCol` desc,
   * `idCol` asc) as a struct-min aggregate — one map-side-combined
   * groupBy on the cluster id, no Window; ties and floating scores are
   * caller concerns (pass an exact integer score — length, token count
   * — for engine-portable determinism). Returns one row per cluster:
   * (`clusterCol`, n_members, survivor_id, survivor_score).
   */
  def keepBest(clustered: DataFrame, idCol: String, clusterCol: String,
               scoreCol: String): DataFrame =
    clustered
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col(scoreCol)).as("ns"), col(idCol).as("id"))).as("__w"))
      .select(col(clusterCol), col("n_members"),
        col("__w.id").as("survivor_id"), (-col("__w.ns")).as("survivor_score"))

  /**
   * CCNet/C4-style LINE-level exact dedup across the WHOLE corpus: each
   * distinct line keeps only its globally first occurrence (ordered by
   * (idCol, line position)); later occurrences are cut from their
   * documents and the survivors are re-joined with `separator` in
   * original order. Lines shorter than `minChars` characters are exempt
   * (kept everywhere): short boilerplate — "Home", list bullets, blank
   * lines — is navigation noise, and with minChars = 0 a corpus-wide
   * unique constraint on blank lines would gut every document below the
   * first.
   *
   * Returns one row per input document: (idCol, textCol [deduped],
   * n_kept, n_removed). Documents whose every line is removed survive
   * with an empty string (the caller filters on n_kept if it wants drops).
   * `normalize` switches the match key from raw bytes (C4-style) to a
   * caller-supplied normalization of the line (CCNet-style lower/trim);
   * survivors always keep their original bytes.
   *
   * Scale shape: the first-occurrence winner per line is a PARTIAL-
   * AGGREGATED `min(struct(id, pos))` — deliberately not
   * `row_number() over (partition by line)`: a boilerplate line with 10^6
   * occurrences would sort all of them in one reducer partition under a
   * window, while min() combines map-side and moves one row per
   * (partition, line) into the shuffle. Then one line-keyed join marks
   * survivors (probe side streams; AQE splits hot lines) and one id-keyed
   * aggregation reassembles documents. No driver actions, no windows.
   */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
                 separator: String = "\n", minChars: Int = 0,
                 normalize: Option[Column => Column] = None): DataFrame = {
    require(separator.nonEmpty, "separator must be non-empty")
    val sepRe = java.util.regex.Pattern.quote(separator)
    val lines = df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), sepRe, -1)).as(Seq("__pos", "__line")))
    // match key: raw bytes (C4-style) or caller-normalized (CCNet-style —
    // e.g. lower+trim so casing/whitespace variants of a boilerplate line
    // collapse); output always keeps the winner's ORIGINAL bytes.
    // Exemption length is measured on the raw line either way.
    val keyed = lines.withColumn("__key",
      normalize.map(f => f(col("__line"))).getOrElse(col("__line")))
    // dedup-eligible occurrences only: exempt lines never contend for (or
    // consume) the first-occurrence slot, and never shuffle by content
    val winners = keyed.filter(length(col("__line")) >= minChars)
      .groupBy("__key")
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
    val kept = keyed.join(winners, Seq("__key"), "left")
      .filter(col("__first").isNull ||  // exempt (short) line
        (col("__first.__id") === col("__id") &&
          col("__first.__pos") === col("__pos")))
    reassembleLines(df, kept, textCol, idCol, separator, sepRe)
  }

  /** Rejoin surviving (id, pos, line) rows into documents; every input
    * document survives (empty string if all lines were cut). */
  private def reassembleLines(df: DataFrame, kept: DataFrame, textCol: String,
                              idCol: String, separator: String,
                              sepRe: String): DataFrame = {
    val rebuilt = kept.groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__pos"), col("__line")))).as("__a"),
        count(lit(1)).as("n_kept"))
      .select(col("__id"),
        array_join(transform(col("__a"), e => e("__line")), separator).as("__t"),
        col("n_kept"))
    df.select(col(idCol),
        size(split(col(textCol), sepRe, -1)).cast("long").as("__n0"))
      .join(rebuilt, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("__t"), lit("")).as(textCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n0") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /**
   * Persist the standing corpus's distinct ELIGIBLE line keys — the index
   * for incremental line dedup. The corpus text is split exactly once;
   * every later batch dedups against this slim key set (one short row per
   * distinct line, not per occurrence) instead of re-reading corpus text.
   * `separator`/`minChars` ride as field metadata so batches split
   * identically; `normalize` must be re-supplied verbatim on the
   * increment side (functions don't serialize — a `normalized` marker in
   * the metadata guards against forgetting it).
   */
  def writeLineIndex(df: DataFrame, textCol: String, idCol: String,
                     path: String, separator: String = "\n", minChars: Int = 0,
                     normalize: Option[Column => Column] = None): Unit = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("separator", separator).putLong("minChars", minChars)
      .putBoolean("normalized", normalize.isDefined).build()
    lineKeys(df, textCol, idCol, separator, minChars, normalize)
      .select(col("__key").as("key", meta))
      .write.mode("overwrite").parquet(path)
  }

  /** Distinct eligible (length ≥ minChars) line keys of a corpus —
    * `private[graft]` so the exactly-once streaming sink
    * ([[graft.streaming.StreamOps.dedupLinesStream]]) derives its
    * growth-zone partition prefixes from the same split. */
  private[graft] def lineKeys(df: DataFrame, textCol: String, idCol: String,
                              separator: String, minChars: Int,
                              normalize: Option[Column => Column]): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(separator)
    df.select(posexplode(split(col(textCol), sepRe, -1)).as(Seq("__pos", "__line")))
      .filter(length(col("__line")) >= minChars)
      .select(normalize.map(f => f(col("__line"))).getOrElse(col("__line"))
        .as("__key"))
      .distinct()
  }

  /**
   * Dedup a NEW batch against the standing line index plus itself: a
   * batch line survives iff it is exempt-short, or its key is absent from
   * the index AND this is its first occurrence within the batch. Under
   * append-only ids this equals [[dedupLines]] over (standing ∪ batch)
   * restricted to batch documents — standing documents are untouched by
   * construction (suite-pinned). Reads ONLY the index (one row per
   * distinct standing line) — standing text is never re-split. Call
   * [[appendLineIndex]] afterwards to grow the index with the batch's
   * surviving new keys.
   */
  def dedupLinesIncrement(spark: org.apache.spark.sql.SparkSession, path: String,
                          batch: DataFrame, textCol: String, idCol: String,
                          normalize: Option[Column => Column] = None): DataFrame =
    dedupLinesIncrementWith(spark.read.parquet(path), batch, textCol, idCol,
      normalize)

  /** [[dedupLinesIncrement]] against an ALREADY-LOADED key frame (any
    * filter/union of index reads that preserves the `key` field
    * metadata) — the hook for the exactly-once streaming sink, whose
    * standing key set spans a read-only seed index plus its own
    * batch-partitioned growth zone restricted to `__batch < bid`. */
  def dedupLinesIncrementWith(idx: DataFrame,
                              batch: DataFrame, textCol: String, idCol: String,
                              normalize: Option[Column => Column] = None): DataFrame = {
    val meta = idx.schema("key").metadata
    val separator = meta.getString("separator")
    val minChars = meta.getLong("minChars").toInt
    require(meta.getBoolean("normalized") == normalize.isDefined,
      "index was built with a different normalize setting")
    val sepRe = java.util.regex.Pattern.quote(separator)
    val lines = batch.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), sepRe, -1)).as(Seq("__pos", "__line")))
    val keyed = lines.withColumn("__key",
      normalize.map(f => f(col("__line"))).getOrElse(col("__line")))
    // batch-internal first occurrences whose key the standing corpus has
    // never seen (anti join against the slim index)
    val freshWinners = keyed.filter(length(col("__line")) >= minChars)
      .groupBy("__key")
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
      .join(idx, col("__key") === idx("key"), "left_anti")
    val kept = keyed.join(freshWinners, Seq("__key"), "left")
      .filter(length(col("__line")) < minChars ||   // exempt
        (col("__first").isNotNull &&                 // fresh key, winner row
          col("__first.__id") === col("__id") &&
          col("__first.__pos") === col("__pos")))
    reassembleLines(batch, kept, textCol, idCol, separator, sepRe)
  }

  /** Grow the line index with a batch's new eligible keys (those not
    * already present). Standing text is never re-split; cost scales with
    * the batch plus one anti-join probe of the index. */
  def appendLineIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      batch: DataFrame, textCol: String, idCol: String,
                      normalize: Option[Column => Column] = None): Unit =
    newLineKeys(spark.read.parquet(path), batch, textCol, idCol, normalize)
      .write.mode("append").parquet(path)

  /** The batch's eligible distinct line keys NOT already present in the
    * standing key frame — the rows [[appendLineIndex]] appends, exposed
    * so the exactly-once streaming sink can write them under its own
    * batch-partitioned layout instead of a flat append. Metadata
    * (separator/minChars/normalized) re-stamps from the standing frame. */
  def newLineKeys(idx: DataFrame,
                  batch: DataFrame, textCol: String, idCol: String,
                  normalize: Option[Column => Column] = None): DataFrame = {
    val meta = idx.schema("key").metadata
    require(meta.getBoolean("normalized") == normalize.isDefined,
      "index was built with a different normalize setting")
    lineKeys(batch, textCol, idCol, meta.getString("separator"),
        meta.getLong("minChars").toInt, normalize)
      .join(idx, col("__key") === idx("key"), "left_anti")
      .select(col("__key").as("key", meta))
  }

  /**
   * Exact n-gram Jaccard similarity for ALL pairs via cross join — array
   * built-ins only, fully codegen'd. QUADRATIC: use only on small inputs;
   * at scale use [[nearDuplicatePairs]] (LSH candidates → exact verify).
   */
  def ngramJaccard(df: DataFrame, textCol: String, idCol: String, n: Int = 3,
                   minJaccard: Double = 0.0): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(Text.wordShingles(col(textCol), n)).as("grams"))
    val a = sh.select(col("id").as("id_a"), col("grams").as("grams_a"))
    val b = sh.select(col("id").as("id_b"), col("grams").as("grams_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /**
   * Exact set-similarity self-join (distinct-token Jaccard ≥ `threshold`)
   * via PREFIX FILTERING — the deterministic counterpart to MinHash LSH:
   * every qualifying pair is emitted (recall 1 by theorem, no sketch
   * probability), yet no all-pairs comparison happens.
   *
   * Prefix principle: order tokens by the global total order (document
   * frequency asc, token asc) — rarest first — and index only each
   * document's first |x| − ⌈t·|x|⌉ + 1 tokens. For J(x,y) ≥ t the overlap
   * i satisfies i ≥ ⌈t·max(|x|,|y|)⌉ (if |y| < t·|x| then J < t outright),
   * and two sorted sets with overlap ≥ α must share a member of their
   * (n − α + 1)-prefixes: were the smallest common element outside one
   * prefix, all α common elements would sit in that side's α−1 suffix
   * slots. So candidates meet in an ordinary EQUI-join on prefix tokens
   * and only candidates pay the exact verification.
   *
   * Scale shape: prefixes hold each doc's RAREST tokens, so high-df
   * stopwords never enter the candidate index — the join fan-out is
   * bounded by low-df posting lists (the same guard philosophy as the
   * LSH hot-bucket bound, but exact). Token ordering needs no Window:
   * per-doc `collect_list` + `array_sort` buffers are doc-length-bounded,
   * and verification is `array_intersect` over the two sorted arrays in
   * codegen. Output: (id_a, id_b, intersection, union_size, jaccard),
   * id_a < id_b; all counts exact, jaccard an exact-int ratio (identical
   * IEEE in any engine).
   */
  def setSimJoin(df: DataFrame, idCol: String, textCol: String,
                 threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val toks = df.select(col(idCol).as("__id"),
      explode(array_distinct(filter(split(trim(col(textCol)), "\\s+"),
        t => t =!= ""))).as("__t"))
    val dfreq = toks.groupBy("__t").agg(count(lit(1)).as("__df"))
    val ordered = toks.join(dfreq, "__t")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__df"), col("__t")))).as("__st"))
      .select(col("__id"),
        transform(col("__st"), s => s.getField("__t")).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // exact-integer ⌈t·n⌉ — see containmentJoin's prefix-bound note (an
    // IEEE ceil can overshoot an integer product and shorten the prefix)
    val tBp = math.floor(threshold * 10000).toLong
    val prefLen = (col("__n") -
      expr(s"(CAST(__n AS BIGINT) * ${tBp}L + 9999L) DIV 10000L") + 1).cast("int")
    val prefix = ordered.select(col("__id"),
      explode(slice(col("__toks"), lit(1), prefLen)).as("__t"))
    // the explicit repartition pins the VERIFY stage's parallelism: the
    // candidate frame is byte-light (two ids/row) so AQE's byte-based
    // coalescing squeezes it to ~1 partition, but each row then pays an
    // array_intersect over full token arrays — compute-dense (measured
    // 2×1.2 s single-task stages in q130's 3.9 s). User-specified
    // shuffles are exempt from coalescing; the extra exchange moves
    // 16-byte rows, noise next to the verify work at any scale.
    val cands = prefix.select(col("__id").as("id_a"), col("__t"))
      .join(prefix.select(col("__id").as("id_b"), col("__t")), Seq("__t"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("id_a"), col("id_b"))
    val sets = ordered.select(col("__id"), col("__toks"), col("__n"))
    cands
      .join(sets.select(col("__id").as("id_a"), col("__toks").as("__ta"),
        col("__n").as("__na")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__toks").as("__tb"),
        col("__n").as("__nb")), Seq("id_b"))
      .withColumn("intersection",
        size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("union_size",
        (col("__na") + col("__nb")).cast("long") - col("intersection"))
      .withColumn("jaccard",
        col("intersection").cast("double") / col("union_size").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("intersection"),
        col("union_size"), col("jaccard"))
  }

  /**
   * Exact set-CONTAINMENT self-join: ordered pairs (a, b) with
   * |Tₐ ∩ T_b| / |Tₐ| ≥ `threshold` — "a is t-contained in b". The
   * asymmetric sibling of [[setSimJoin]]: Jaccard misses a snippet
   * embedded in a much larger page (the size mismatch drags J below any
   * useful τ), but containment flags exactly that — quotes, aggregator
   * pages, boilerplate-wrapped copies — the dedup view that decides
   * which SIDE survives (drop the contained doc, keep the superset).
   *
   * Prefix principle, one-sided: order tokens rarest-first (df asc,
   * token asc — the [[setSimJoin]] total order). If a misses more than
   * |Tₐ| − ⌈t·|Tₐ|⌉ of its own tokens in b the containment is < t, so
   * among a's first |Tₐ| − ⌈t·|Tₐ|⌉ + 1 tokens at least one is in b —
   * candidates meet in an equi-join of a's PREFIX against b's FULL
   * token index (containment puts no lower bound on where the shared
   * token sits in b), recall 1 by the lemma. Both directions qualify
   * independently ((a,b) from a's prefix, (b,a) from b's).
   *
   * Scale shape: the candidate fan-out per token is
   * prefix-occurrences × posting-list length; prefixes hold each doc's
   * rarest tokens, so hot stopwords enter only through docs so small
   * (or thresholds so low) that hot tokens reach their prefix — the
   * exact-guard argument of [[setSimJoin]] one side wider. The verify
   * stage repartitions on the pair key at session parallelism (the
   * byte-light/compute-dense AQE-coalescing fix, q130 precedent).
   * Output: (id_a, id_b, intersection, n_a, n_b, containment) with
   * id_a ≠ id_b; counts exact, containment an exact-int ratio.
   *
   * @param shingle containment unit: 1 = distinct words (pure
   *        vocabulary nesting — degenerates on small-vocabulary/template
   *        corpora where every doc's words nest in every longer doc;
   *        measured 628k pairs at sf0.1 vs 289 with 3-grams on the same
   *        fixture); n ≥ 2 = distinct word n-grams, which only fire on
   *        genuinely embedded SPANS — the span-dedup primitive. Docs
   *        shorter than `shingle` words have no units and emit nothing.
   */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, shingle: Int = 1): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(shingle >= 1, s"shingle must be >= 1, got $shingle")
    val units =
      if (shingle == 1)
        array_distinct(filter(split(trim(col(textCol)), "\\s+"),
          t => t =!= ""))
      else array_distinct(Text.wordShingles(col(textCol), shingle))
    val toks = df.select(col(idCol).as("__id"), explode(units).as("__t"))
    val dfreq = toks.groupBy("__t").agg(count(lit(1)).as("__df"))
    val ordered = toks.join(dfreq, "__t")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__df"), col("__t")))).as("__st"))
      .select(col("__id"),
        transform(col("__st"), s => s.getField("__t")).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // required overlap ⌈t·n⌉ in EXACT integer arithmetic (floor-quantized
    // basis points): IEEE `ceil(t * n)` can land just above an integer
    // product (0.07·100 → 7.000000000000001 → ceil 8), shortening the
    // prefix by one and voiding the recall-1 lemma for exactly-at-
    // threshold pairs. The floor quantization can only LENGTHEN the
    // prefix (more candidates, never fewer); the exact verify below
    // keeps the output identical. Same discipline as mixToBudget.
    val tBp = math.floor(threshold * 10000).toLong
    val prefLen = (col("__n") -
      expr(s"(CAST(__n AS BIGINT) * ${tBp}L + 9999L) DIV 10000L") + 1).cast("int")
    val prefix = ordered.select(col("__id"),
      explode(slice(col("__toks"), lit(1), prefLen)).as("__t"))
    val cands = prefix.select(col("__id").as("id_a"), col("__t"))
      .join(toks.select(col("__id").as("id_b"), col("__t")), Seq("__t"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("id_a"), col("id_b"))
    val sets = ordered.select(col("__id"), col("__toks"), col("__n"))
    cands
      .join(sets.select(col("__id").as("id_a"), col("__toks").as("__ta"),
        col("__n").as("__na")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__toks").as("__tb"),
        col("__n").as("__nb")), Seq("id_b"))
      .withColumn("intersection",
        size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("containment",
        col("intersection").cast("double") / col("__na").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("intersection"),
        col("__na").cast("long").as("n_a"), col("__nb").cast("long").as("n_b"),
        col("containment"))
  }

  /**
   * Fuzzy self-join at edit distance ≤ 1 via SymSpell-style
   * DELETION-NEIGHBORHOOD blocking (Garbe's symmetric-delete idea): two
   * strings with ed ≤ 1 necessarily share a member of
   * {s} ∪ {single-deletions of s} — equality, one insertion/deletion, and
   * one substitution (both sides delete the differing position) are all
   * covered — so candidates meet in an ordinary EQUI-join on the variant
   * string and only candidates pay the exact `levenshtein` verify (which
   * also rejects the false positives the block admits, e.g. "ab"/"ba"
   * sharing deletions at different positions with true ed 2). Returns
   * (id_a, id_b, dist 0|1) with id_a < id_b, each pair once.
   *
   * Scale shape — duplicates collapse BEFORE blocking: a value repeated c
   * times would flood its variant buckets with c² candidates (measured:
   * 39 s at sf0.1's ~50-copy name groups vs 1 s collapsed), so the
   * variant join runs over DISTINCT strings only, and id pairs expand
   * back afterward at OUTPUT size: ed-0 pairs come straight from an
   * equi-join on the string (each duplicate group emits exactly its own
   * pairs), ed-1 string pairs expand through two string-keyed joins.
   * Every stage is candidates→verify with a deterministic, recall-1
   * blocking key; nothing exceeds output size except the distinct-string
   * variant shuffle (|distinct| · (len+1) slim rows).
   *
   * @param hotStringBound per-string duplicate-group guard (the OUTPUT
   *        itself is quadratic in a string's multiplicity — a 10⁷-copy
   *        template name means 10¹⁴ ed-0 pairs; the sf1 stress measured
   *        313M pairs / 100× output growth for 10× data). A string held
   *        by more rows than the bound emits HUB-STAR pairs only: every
   *        member against the group's minimum id (c−1 pairs, dist 0),
   *        and the group participates in the ed-1 expansion through its
   *        KEEPER row alone (a hot string ⋈ a c-copy neighbor would
   *        otherwise emit hot·c pairs). Connectivity for keep-lowest
   *        consumers is preserved: every member reaches the keeper, and
   *        the keeper carries the group's edit-distance edges. The
   *        default [[AutoBound]] derives the bound in-plan from the
   *        group-size distribution ([[occupancyBoundFrame]] — EXACT
   *        `greatest(64, 16 × p99.9(occ))` as a broadcast one-row
   *        aggregate, layout-independent and SQL-replayable; q119
   *        certifies this default against an oracle that recomputes
   *        the bound): on corpora without template spam no group
   *        reaches it and the OUTPUT equals the unguarded path's.
   *        `Int.MaxValue` disables the guard with a plan byte-identical
   *        to the historical unguarded shape (no occupancy aggregate at
   *        all — kept as a suite/BENCH_SF1 A/B artifact).
   */
  def fuzzyPairsEd1(df: DataFrame, idCol: String, strCol: String,
                    hotStringBound: Int = AutoBound): DataFrame = {
    require(hotStringBound > 0 || hotStringBound == AutoBound,
      s"hotStringBound must be positive or AutoBound, got $hotStringBound")
    val base = df.select(col(idCol).as("__fid"), col(strCol).as("__fs"))
      .where(col("__fs").isNotNull)
    val guarded = hotStringBound != Int.MaxValue
    // Annotate every row with its group's keeper + hot flag in ONE
    // string-keyed shuffle; all downstream faces derive from this slim
    // frame. Persisted because four branches consume it (both ed-0
    // faces and both sides of the ed-1 id expansion) and the
    // aggregate+join upstream is not reliably exchange-reused across
    // them (the globalRank precedent). Unguarded path skips all of it.
    val baseM = if (!guarded) base else {
      val occ = base.groupBy("__fs")
        .agg(count(lit(1)).as("__occ"), min(col("__fid")).as("__keeper"))
      val marked =
        if (hotStringBound == AutoBound) {
          val bf = occupancyBoundFrame(occ)
          occ.crossJoin(broadcast(bf))
            .withColumn("__hot", col("__occ") > col("__bound"))
        } else occ.withColumn("__hot", col("__occ") > lit(hotStringBound.toLong))
      base.join(marked.select(col("__fs"), col("__keeper"), col("__hot")),
          Seq("__fs"))
        .persist()
    }
    // ed-0: all id pairs sharing the exact string — output-sized for
    // cold groups; hot groups collapse to the member→keeper star.
    val ed0 = if (!guarded) {
      base.select(col("__fid").as("id_a"), col("__fs"))
        .join(base.select(col("__fid").as("id_b"), col("__fs")), Seq("__fs"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), lit(0L).as("dist"))
    } else {
      val cold = baseM.filter(!col("__hot"))
      val coldPairs = cold.select(col("__fid").as("id_a"), col("__fs"))
        .join(cold.select(col("__fid").as("id_b"), col("__fs")), Seq("__fs"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), lit(0L).as("dist"))
      val hotStar = baseM.filter(col("__hot") && col("__fid") =!= col("__keeper"))
        .select(col("__keeper").as("id_a"), col("__fid").as("id_b"),
          lit(0L).as("dist"))
      coldPairs.unionByName(hotStar)
    }
    // ed-1: deletion-neighborhood blocking over DISTINCT strings (the
    // distinct-string stage is multiplicity-free — the guard changes
    // only the id EXPANSION below, where hot groups contribute their
    // keeper row alone).
    val names = base.select(col("__fs")).distinct()
    val s = col("__fs")
    val deletes = when(length(s) > 0,
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))
      .otherwise(array().cast("array<string>"))
    val variants = names.select(col("__fs"),
      explode(array_union(array(s), deletes)).as("__var"))
    val namePairs = variants.select(col("__fs").as("__sa"), col("__var"))
      .join(variants.select(col("__fs").as("__sb"), col("__var")), Seq("__var"))
      .filter(col("__sa") < col("__sb"))
      .select(col("__sa"), col("__sb")).distinct()
      .filter(levenshtein(col("__sa"), col("__sb")) === 1)
    val rep = if (!guarded) base
      else baseM.filter(!col("__hot") || col("__fid") === col("__keeper"))
        .select(col("__fid"), col("__fs"))
    val ed1 = namePairs
      .join(rep.select(col("__fid").as("__ida"), col("__fs").as("__sa")), Seq("__sa"))
      .join(rep.select(col("__fid").as("__idb"), col("__fs").as("__sb")), Seq("__sb"))
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"), lit(1L).as("dist"))
    ed0.unionByName(ed1)
  }

  /**
   * DISTRIBUTED global rank (1-based, dense total order) without a
   * single-partition Window: range-repartition on the sort key, local
   * `row_number` per range partition (each Window partition is one
   * range partition — bounded), then add per-partition offsets from a
   * numPartitions-sized count frame (cumulative sum over that tiny
   * frame runs in one task; it is metadata-sized, not data-sized).
   * Rank values depend ONLY on the total order `(sortCols…)`, which
   * must be a total order (include a unique id as the last key) — the
   * sampled range boundaries move work between partitions but cannot
   * change any rank. This is the scale-safe form of
   * `row_number() OVER (ORDER BY …)`, whose naive plan funnels the
   * corpus through one reducer.
   */
  def globalRank(df: DataFrame, sortCols: Seq[String],
                 rankCol: String = "rank"): DataFrame = {
    val sc = sortCols.map(col)
    val parted = df.repartitionByRange(sc: _*)
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
    // persist the slim per-partition-ranked frame: BOTH the offset
    // aggregation and the final offset join read it — without the cache
    // the whole scan+sort pipeline runs twice (measured: q174 0.31→0.55 s,
    // q195 0.43→1.25 s at sf0.1 when this was briefly de-persisted; the
    // range Exchange is NOT reliably reused across the two branches).
    // Session-cache lifetime is a caller concern — see OPERATORS.md
    // "Cache hygiene" (Verify clears per query).
    val local = parted.withColumn("__lr",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(sc: _*))
        .cast("long"))
      .persist()
    val offs = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }

  /**
   * DISTRIBUTED ordered cumulative sum + rank: like [[globalRank]], but
   * also carries the running total of `valueCol` over the same total
   * order — the scale-safe form of
   * `sum(v) OVER (ORDER BY …)` / `row_number() OVER (ORDER BY …)`,
   * which Spark would otherwise plan as a single-reducer Window.
   * Per range partition: local rank + local running sum; the
   * numPartitions-sized totals frame cumulates once (one tiny task)
   * and joins back as a broadcast. Adds `rankCol` (1-based) and
   * `cumCol` (inclusive running sum, long).
   */
  def globalOrderedCumsum(df: DataFrame, sortCols: Seq[Column],
                          valueCol: String, rankCol: String = "rank",
                          cumCol: String = "cum"): DataFrame = {
    val sc = sortCols
    val parted = df.repartitionByRange(sc: _*)
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(sc: _*)
    val local = parted
      .withColumn("__lr", row_number().over(w).cast("long"))
      .withColumn("__ls", sum(col(valueCol))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .persist() // both the offset agg and the final join read it (see globalRank)
    val offs = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col(valueCol).cast("long")).as("__tot"))
      .withColumn("__roff", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__soff", coalesce(
        sum(col("__tot")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__roff"), col("__soff"))
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn(rankCol, col("__roff") + col("__lr"))
      .withColumn(cumCol, col("__soff") + col("__ls"))
      .drop("__pid", "__lr", "__ls", "__roff", "__soff")
  }

  /**
   * DISTRIBUTED EXCLUSIVE running max over a total order — the prefix-
   * aggregate pattern of [[globalOrderedCumsum]] with max instead of
   * sum: per range partition a local exclusive cummax window, plus the
   * max of every EARLIER partition from the numPartitions-sized
   * per-partition-max frame (broadcast back). Adds `cummaxCol` =
   * max(valueCol) over all rows STRICTLY BEFORE the row in
   * `sortCols` order (null for the global first row) — the primitive
   * behind scale-safe skyline/frontier sweeps.
   */
  def globalOrderedCummaxExcl(df: DataFrame, sortCols: Seq[Column],
                              valueCol: String,
                              cummaxCol: String = "cummax"): DataFrame = {
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val local = parted
      .withColumn("__lm", max(col(valueCol))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .persist() // both the offset agg and the final join read it (see globalRank)
    val offs = local.groupBy(col("__pid"))
      .agg(max(col(valueCol)).as("__pm"))
      .withColumn("__off",
        max(col("__pm")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn(cummaxCol, greatest(col("__lm"), col("__off")))
      .drop("__pid", "__lm", "__off")
  }

  /**
   * Sorted-neighborhood method (SNM) record linkage: sort the corpus by
   * a blocking key, slide a window of `w` positions, and verify each
   * in-window pair with an edit-distance check on the key. The classic
   * complement to LSH for SHORT keys (names, titles, addresses) where
   * lexicographic closeness ≈ typo closeness: candidate volume is
   * exactly n·w, independent of skew — no hot buckets possible.
   *
   * Semantics are EXACT and engine-independent: positions come from the
   * total order (blockKey, id) via [[globalRank]]; a pair qualifies iff
   * 0 < rank_b − rank_a ≤ w AND levenshtein(key_a, key_b) ≤ maxEd.
   * The window join is an EQUI-join on rank + d (d ∈ 1…w exploded) —
   * no range/theta join, no cartesian.
   *
   * Returns (id_a, id_b, pos_gap, edit_dist) with id order following
   * the sort order.
   */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
                              blockKey: Column, w: Int,
                              maxEd: Int): DataFrame = {
    require(w >= 1 && maxEd >= 0)
    val keyed = df.select(col(idCol).as("__id"), blockKey.as("__k"))
    // both sides of the neighbor self-join read the ranked frame; the
    // corpus-sized part is already cached inside globalRank, so the two
    // reads only replay a cached-scan + broadcast join
    val ranked = globalRank(keyed, Seq("__k", "__id"), "__rank")
    val left = ranked.select(col("__id").as("id_a"), col("__k").as("__ka"),
        col("__rank").as("__ra"))
      .withColumn("__d", explode(sequence(lit(1), lit(w))))
      .withColumn("__rb", col("__ra") + col("__d"))
    val right = ranked.select(col("__id").as("id_b"), col("__k").as("__kb"),
      col("__rank").as("__rb"))
    // banded threshold levenshtein: O(len·maxEd) cells and an early
    // length-difference exit, vs the full O(len²) matrix — it returns −1
    // beyond the bound, which IS the filter (measured 3.5× on the
    // verification stage at 10×)
    left.join(right, Seq("__rb"))
      .withColumn("edit_dist",
        levenshtein(col("__ka"), col("__kb"), maxEd).cast("long"))
      .filter(col("edit_dist") >= 0)
      .select(col("id_a"), col("id_b"), col("__d").cast("long").as("pos_gap"),
        col("edit_dist"))
  }

  /**
   * Exact-substring duplicate spans — the "remove repeated training data at
   * the substring level" operator (the published suffix-array formulation
   * finds substrings of ≥ L tokens occurring more than once in the corpus;
   * a suffix array is a sequential construction, so the Spark-first
   * equivalence is used instead): any duplicated token run of length ≥ l
   * contains a duplicated l-gram, so flagging every token position whose
   * l-gram occurs ≥ `minCount` times corpus-wide and merging the
   * overlapping/adjacent flagged windows per document yields exactly the
   * maximal duplicated spans at l-token resolution.
   *
   * Plan shape at 100 TB: the corpus tokenizes via the native
   * [[graft.pipeline.Text.wordShingles]] expression and explodes to
   * (id, pos, md5(gram)) — the shuffle key is the FIXED-WIDTH digest, never
   * the gram text, so the corpus-token-sized exchange carries 32-byte keys
   * regardless of token length. The occurrence count is a partial-agg
   * groupBy (map-side combine collapses within-partition repeats); the
   * duplicated-hash set joins back by hash (AQE broadcasts it when the
   * duplicated vocabulary is small, the common case); the island merge is
   * one per-document window over the surviving positions only — documents
   * with no duplicated grams never reach the window, and the two windows
   * plus the island aggregate all ride ONE doc-keyed sort/exchange.
   * The tokenize+hash projection deliberately runs TWICE (once under the
   * count, once under the flag join) rather than once: the one-scan
   * alternative — `collect_list` of (id, pos) per hash, filter, explode —
   * would put every occurrence of a hot boilerplate gram into a single
   * task's array (the exact hub blow-up the LSH `hotBucketBound` guard
   * exists for), while the recompute is embarrassingly parallel scan CPU
   * and no corpus-sized frame is ever cached or skew-collected.
   *
   * @param l        span resolution in tokens (the published pipelines use
   *                 50 BPE tokens; any duplicated run shorter than l is
   *                 below resolution and unreported)
   * @param minCount flag grams occurring at least this many times
   *                 corpus-wide (2 = "appears more than once", counting
   *                 within-document repeats — self-repetition is duplication)
   * @return one row per maximal duplicated span:
   *         (id, span_start, span_end, span_len) with 1-based inclusive
   *         token indices, span_len = span_end − span_start + 1 ≥ l
   */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     l: Int, minCount: Long = 2L): DataFrame = {
    require(l >= 1, s"span resolution l must be >= 1, got $l")
    require(minCount >= 2L, s"minCount must be >= 2, got $minCount")
    val grams = gramHashes(df, textCol, idCol, l)
    val dup = grams.groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount).select("__h")
    mergeIslands(grams.join(dup, Seq("__h")).select(col(idCol), col("__p")),
      idCol, l)
  }

  /** (id, pos, md5(l-gram)) frame — the shared substrate of the span
    * operators (fixed-width digests keep the shuffle key 32 bytes).
    * `private[graft]` so the streaming face
    * ([[graft.streaming.StreamOps.duplicateSpansStream]]) builds on the
    * same tokenization. */
  private[graft] def gramHashes(df: DataFrame, textCol: String, idCol: String,
                                l: Int): DataFrame =
    df.select(col(idCol),
        posexplode(graft.pipeline.Text.wordShingles(col(textCol), l))
          .as(Seq("__p", "__g")))
      .select(col(idCol), col("__p").cast("long").as("__p"),
        md5(col("__g")).as("__h"))

  /** Island merge over flagged windows [p, p+l-1]: a window starts a new
    * span iff its first token lies beyond (running max end) + 1 — merging
    * both overlapping and back-to-back windows into one contiguous span.
    * One per-document window over flagged positions only. */
  private[graft] def mergeIslands(hits: DataFrame, idCol: String, l: Int): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("__p")
    hits
      .withColumn("__pe", max(col("__p") + lit(l.toLong - 1L))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pe").isNull || col("__p") > col("__pe") + 1L, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum("__new").over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg((min("__p") + 1L).as("span_start"),
        (max("__p") + lit(l.toLong)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_len"))
  }

  /**
   * Exact-substring CONTAMINATION spans: positions of `df` whose l-gram
   * occurs anywhere in `reference` — [[duplicateSpans]] pointed at an eval
   * corpus instead of at the training corpus itself, localizing WHERE a
   * training document verbatim-overlaps a benchmark (the span-level
   * complement of the document-level n-gram decontamination flags). The
   * reference's distinct gram-hash set is typically benchmark-sized —
   * AQE broadcasts it and the training corpus never shuffles.
   *
   * @return one row per maximal contaminated span of `df`:
   *         (id, span_start, span_end, span_len), 1-based inclusive.
   */
  def contaminationSpans(df: DataFrame, reference: DataFrame,
                         textCol: String, idCol: String, l: Int): DataFrame =
    contaminationSpansWith(df,
      referenceGramHashes(reference, textCol, l), textCol, idCol, l)

  /** The reference corpus's distinct l-gram digest set — benchmark-sized,
    * the broadcastable right side of [[contaminationSpansWith]]. Compute
    * once (and pin, e.g. `localCheckpoint(true)`) when probing many
    * batches against the same benchmark — the streaming face's shape. */
  def referenceGramHashes(reference: DataFrame, textCol: String,
                          l: Int): DataFrame = {
    require(l >= 1, s"span resolution l must be >= 1, got $l")
    reference
      .select(explode(array_distinct(
        graft.pipeline.Text.wordShingles(col(textCol), l))).as("__g"))
      .select(md5(col("__g")).as("__h")).distinct()
  }

  /**
   * Fold a [[graft.streaming.StreamOps.duplicateSpansStream]] gram-digest
   * log to ONE row per distinct digest, re-laid at a FINER hash prefix —
   * the steady-state probe structure: per-batch writes partition on a
   * 1-hex prefix (16 dirs — a per-trigger write at the flat layout's
   * file count; finer per-batch prefixes profiled at ~3 s/trigger of
   * writer-open overhead, PLANS_r13), and compaction pays the finer
   * 3-hex layout (4096 dirs) ONCE, so every later trigger's probe reads
   * ≈ |batch prefixes|/4096 of the standing digest bytes. Existence is
   * the only signal the probe needs, so the distinct fold preserves the
   * read semantics exactly; the output keeps the `__batch =
   * max(__batch)` layout ([[Materialize.writeCompacted]] contract —
   * compact only COMMITTED prefixes, swap by rename). The stream's
   * probe prunes on the union of its batch's 1-/2-/3-hex prefix sets,
   * so mixed compacted + later per-batch partitions prune correctly
   * side by side.
   */
  def compactSpanIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, outPath: String,
                       pfxLen: Int = 3): Long = {
    require(pfxLen == 2 || pfxLen == 3,
      s"supported prefix lengths are 2 and 3 hex chars, got $pfxLen")
    val log = spark.read.parquet(path)
    val folded = log.select("__h").distinct()
      .withColumn("__pfx", substring(col("__h"), 1, pfxLen))
    Materialize.writeCompacted(folded, log, outPath,
      subPartitionCols = Seq("__pfx"))
  }

  /**
   * [[compactSpanIndex]] while the
   * [[graft.streaming.StreamOps.duplicateSpansStream]] that owns the log
   * is LIVE — the production shape, where a months-running intake stream
   * cannot be stopped for maintenance. Via
   * [[graft.streaming.LogStructuredSink.compactLive]]'s generation
   * layout: the fold publishes with one atomic marker flip, superseded
   * files outlive readers by the retention window, and the sink's
   * trigger body and this compactor share the log's lease, so neither
   * ever sees the other mid-layout. Folds the committed prefix
   * (everything but the newest partition, plus the standing generation)
   * to one row per distinct digest at a `pfxLen`-hex `__pfx` (the probe
   * prunes 1-/2-/3-hex layouts side by side). Returns the folded digest
   * count, or None when nothing new is safely foldable yet.
   */
  def compactSpanIndexLive(spark: org.apache.spark.sql.SparkSession,
                           path: String, pfxLen: Int = 3,
                           retainMs: Long = 600000L): Option[Long] = {
    require(pfxLen >= 1 && pfxLen <= 3,
      s"supported prefix lengths are 1-3 hex chars, got $pfxLen")
    graft.streaming.LogStructuredSink.compactLive(spark, path,
      df => df.select("__h").distinct()
        .withColumn("__pfx", substring(col("__h"), 1, pfxLen)),
      subPartitionCols = Seq("__pfx"), retainMs = retainMs)
  }

  /**
   * Live compaction of a [[graft.streaming.StreamOps.dedupLinesStream]]
   * growth zone — the line-key sibling of [[compactSpanIndexLive]]: one
   * row per distinct key, re-laid at a `pfxLen`-hex md5(key) `__pfx`
   * (per-batch partitions write 1-hex; the probe prunes the 1-/3-hex
   * union). The `key` field metadata (separator/minChars) re-stamps
   * from the fold's own input frame — read INSIDE the leased section,
   * so no unleased footer read can race a concurrent writer's layout
   * change — and a schema merge never blanks it.
   */
  def compactLineIndexLive(spark: org.apache.spark.sql.SparkSession,
                           path: String, pfxLen: Int = 3,
                           retainMs: Long = 600000L): Option[Long] = {
    require(pfxLen >= 1 && pfxLen <= 3,
      s"supported prefix lengths are 1-3 hex chars, got $pfxLen")
    graft.streaming.LogStructuredSink.compactLive(spark, path,
      df => {
        val meta = df.schema("key").metadata
        df.select(col("key").as("key", meta)).distinct()
          .withColumn("__pfx", substring(md5(col("key")), 1, pfxLen))
      },
      subPartitionCols = Seq("__pfx"), retainMs = retainMs)
  }

  /** [[contaminationSpans]] against a precomputed `__h` digest frame
    * ([[referenceGramHashes]]). */
  def contaminationSpansWith(df: DataFrame, refHashes: DataFrame,
                             textCol: String, idCol: String,
                             l: Int): DataFrame = {
    require(l >= 1, s"span resolution l must be >= 1, got $l")
    val hits = gramHashes(df, textCol, idCol, l)
      .join(refHashes, Seq("__h"), "left_semi")
      .select(col(idCol), col("__p"))
    mergeIslands(hits, idCol, l)
  }

  /**
   * Apply [[duplicateSpans]]: cut every duplicated span out of the text
   * and report the per-document token savings — the operator the
   * published substring-dedup pipelines actually run over the training
   * corpus. Cleaned text is reassembled with single spaces (whitespace
   * NORMALIZES — runs of whitespace in the source collapse, the
   * tokenization's inherent resolution).
   *
   * The spans frame per doc is span-count-sized (bounded by
   * tokens/l), collected into one array per document via a groupBy —
   * never corpus-token-sized — and the cut itself is a codegen'd
   * higher-order filter over the token array: no second shuffle of the
   * corpus beyond the [[duplicateSpans]] plan and one doc-keyed join.
   *
   * @return `df`'s id column + (n_spans, tokens_removed, tokens_kept,
   *         text_clean)
   */
  def removeDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
                           l: Int, minCount: Long = 2L): DataFrame = {
    val spans = duplicateSpans(df, textCol, idCol, l, minCount)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("span_start"),
        col("span_end")))).as("__spans"))
    val toks = graft.pipeline.Text.wordShingles(col(textCol), 1)
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(size(col("__spans")), lit(0)).cast("long").as("n_spans"),
        coalesce(aggregate(col("__spans"), lit(0L),
          (a, s) => a + s.getField("span_end") - s.getField("span_start")
            + 1L), lit(0L)).as("tokens_removed"),
        toks.as("__t"), col("__spans"))
      .select(col(idCol), col("n_spans"), col("tokens_removed"),
        (size(col("__t")).cast("long") - col("tokens_removed"))
          .as("tokens_kept"),
        array_join(
          when(col("__spans").isNull, col("__t")).otherwise(
            filter(col("__t"), (t, i) => !exists(col("__spans"), s =>
              i + 1 >= s.getField("span_start") &&
                i + 1 <= s.getField("span_end")))),
          " ").as("text_clean"))
  }
}
