package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Partial state for the element-wise vector mean: running sums + count.
  * Dim-sized double buffers cross the shuffle, never member vectors. */
case class VecMeanBuf(var sums: Array[Double], var n: Long)

/** Literal centroid row for kmeansFit's per-round injected array — field
  * names match [[Similarity.assignFold]]'s `__cents` struct contract. */
case class CentroidLit(centroid_id: Long, cvec: Seq[Double])

/**
 * Element-wise mean of `array<double>` vectors as ONE partial-aggregated
 * shuffle: `reduce` sums map-side into a dim-sized buffer, `merge` folds
 * buffers, `finish` divides. The corpus is never exploded per-dimension —
 * the posexplode/groupBy(pos) alternative shuffles rows × dim and needs a
 * second shuffle to reassemble arrays. Null or length-mismatched vectors
 * are ignored; an all-null group yields null.
 */
class VecMeanAggregator extends Aggregator[Seq[Double], VecMeanBuf, Seq[Double]] {
  def zero: VecMeanBuf = VecMeanBuf(Array.emptyDoubleArray, 0L)

  def reduce(b: VecMeanBuf, v: Seq[Double]): VecMeanBuf = {
    if (v == null) return b
    if (b.n == 0L) { b.sums = v.toArray; b.n = 1L; return b }
    if (v.length != b.sums.length) return b
    var i = 0
    while (i < b.sums.length) { b.sums(i) += v(i); i += 1 }
    b.n += 1L
    b
  }

  def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf = {
    if (b.n == 0L) return a
    if (a.n == 0L) return b
    if (a.sums.length != b.sums.length) return a
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.n += b.n
    a
  }

  def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0L) null
    else { val n = b.n.toDouble; b.sums.map(_ / n).toSeq }

  def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/**
 * Spherical k-means (Lloyd's) over an embedding column — the centroid
 * TRAINER behind IVF routing quality and topic/SemDeDup-style corpus
 * clustering. Cosine assignment with a plain mean update IS spherical
 * k-means: cosine is scale-invariant, so the un-normalized mean ranks
 * identically to the normalized spherical centroid.
 *
 * Scale shape per iteration: ONE corpus scan with the k×dim centroid
 * matrix broadcast into a pure-map argmax (the ivfAssignWith shape — no
 * Window, no sort, no exchange keyed on the vector id), then ONE
 * partial-aggregated shuffle of dim-sized sum buffers
 * ([[VecMeanAggregator]]). Between iterations the k×dim matrix passes
 * through the driver — a documented metadata-sized collect (the
 * ivfTopKIndexed precedent), which keeps every iteration an independent
 * compact plan instead of doubling the lineage per round (the q56 lesson).
 *
 * Determinism: init picks the k corpus vectors with smallest
 * md5(cast(id as string)) — engine-portable, so an external engine can
 * replay the whole trajectory (ivfAssign's xxhash64 sample is
 * Spark-specific). Ties in the argmax break toward the lowest centroid
 * id; empty clusters keep their previous centroid. All arithmetic is
 * double (vectors cast once up front): dot products accumulate in
 * sequential order on every engine, leaving the mean's summation order
 * as the only cross-engine nondeterminism (~1e-13 relative — orders of
 * magnitude under real assignment margins).
 */
object Clustering {

  lazy val vecMeanUdaf =
    udaf(new VecMeanAggregator, ExpressionEncoder[Seq[Double]]())

  /** Train k centroids; returns (centroid_id long, cvec array<double>).
    * `iters` Lloyd rounds after the deterministic init (iters = 0 returns
    * the init sample itself). */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus
      .select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .persist()
    try {
      var cents: Array[(Long, Seq[Double])] = vecs
        .select(col("vid"), col("v"), md5(col("vid").cast("string")).as("__h"))
        .orderBy(col("__h"), col("vid"))
        .limit(k)
        .as[(Long, Seq[Double], String)]
        .collect()
        .map { case (id, v, _) => (id, v) }
      var it = 0
      while (it < iters) {
        // the k×dim centroid matrix is ALREADY on the driver — inject it
        // as a literal array column instead of round-tripping through a
        // LocalRelation + one-row aggregate + broadcast job per round
        // (the old shape re-planned and re-broadcast the centroid frame
        // every iteration; the fold, its visit order, and every double it
        // computes are unchanged, so the trajectory is bit-identical —
        // pinned by KmeansSpec). ONE driver action per round remains: the
        // k-sized means collect. That action is IRREDUCIBLE in Spark's
        // execution model — round t+1's assignment literal depends on
        // round t's means, so one job boundary per Lloyd round is
        // inherent (MLlib KMeans runs the identical
        // collectAsMap-per-iteration shape) — and bounded: the
        // synchronized payload is k×dim doubles (262 KB at k=256,d=128),
        // never corpus-sized, and the measured marginal cost per round
        // (tools/KmeansRounds, sf0.1: 0.21 s at k=8 AND k=32, 0.58 s at
        // k=256) tracks the round's distributed assignment work, not a
        // fixed barrier — the scheduling barrier itself is O(10 ms).
        val centsCol = typedLit(cents.toSeq.map { case (id, v) =>
          CentroidLit(id, v) })
        val means = Similarity.assignFold(
            vecs.select(col("vid").as("neighbor_id"), col("v").as("nvec"))
              .withColumn("__cents", centsCol),
            org.apache.spark.sql.types.LongType)
          .groupBy(col("list_id"))
          .agg(vecMeanUdaf(col("nvec")).as("mean"))
          .where(col("mean").isNotNull)
          .as[(Long, Seq[Double])]
          .collect()
          .toMap
        cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
        it += 1
      }
      cents.toSeq.toDF("centroid_id", "cvec")
    } finally vecs.unpersist()
  }

  /** Final assignment against trained centroids: (neighbor_id, nvec,
    * list_id). Vectors cast to double so both cosine operands share the
    * centroids' precision (VecBinary keys element width off one side). */
  def kmeansAssign(corpus: DataFrame, centroids: DataFrame,
                   idCol: String, vecCol: String): DataFrame =
    Similarity.ivfAssignWith(
      corpus.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol)),
      centroids, idCol, vecCol)

  /** [[Similarity.ivfAssign]] drop-in with TRAINED centroids: Lloyd rounds
    * balance the inverted lists, shrinking the hottest list a probe must
    * scan (the hash-sample init inherits the data's density skew). The
    * returned pair feeds the same write/append/query index paths. */
  def ivfFitKmeans(corpus: DataFrame, idCol: String, vecCol: String,
                   nLists: Int = 16, iters: Int = 3): (DataFrame, DataFrame) = {
    val centroids = kmeansFit(corpus, idCol, vecCol, nLists, iters)
    (kmeansAssign(corpus, centroids, idCol, vecCol), centroids)
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023,
   * arXiv:2303.09540): cluster the embedding space with [[kmeansFit]],
   * then compare pairs ONLY within a cluster — the clusters bound the
   * quadratic so the pair join is k independent |cluster|² problems
   * instead of one corpus². A vector is dropped when a SMALLER-id member
   * of its cluster has cosine ≥ `tau` (keep-first, the dedupLines /
   * nearDuplicatePairs winner rule).
   *
   * Returns one row per input vector: (id, cluster_id, kept boolean).
   *
   * Scale shape: assignment is the exchange-free broadcast-centroid map
   * of [[Similarity.ivfAssignWith]] (no shuffle of the corpus); the pair
   * join shuffles both sides once on cluster_id; the removal set flows
   * back as a distinct + left anti-style join on id. At 100 TB, k is the
   * capacity knob — size it so E[|cluster|] stays in the 10³–10⁴ range
   * (the SemDeDup paper's regime) and the per-cluster pairwise cost stays
   * bounded; a skew-heavy cluster degrades this like a hot LSH bucket, so
   * monitor occupancy the same way ([[Dedup]] auto-guard pattern applies
   * if a corpus needs it).
   *
   * Cross-engine exactness: pair cosines are computed on the RAW vectors
   * (sequential dot products — bit-identical in any engine), so the τ
   * comparison carries no float drift; only the cluster boundary inherits
   * the kmeans mean's ~1e-13 summation-order noise, which q107's margin
   * audit bounds far below real assignment margins.
   */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, tau: Double): DataFrame = {
    val cents = kmeansFit(corpus, idCol, vecCol, k, iters)
    val assigned = kmeansAssign(corpus, cents, idCol, vecCol)
    val a = assigned.select(col("neighbor_id").as("id_a"),
      col("nvec").as("va"), col("list_id"))
    val b = assigned.select(col("neighbor_id").as("id_b"),
      col("nvec").as("vb"), col("list_id"))
    val removed = a.join(b, Seq("list_id"))
      .where(col("id_a") < col("id_b") &&
        Similarity.cosine(col("va"), col("vb")) >= tau)
      .select(col("id_b").as("__rid")).distinct()
    assigned
      .join(removed, col("neighbor_id") === col("__rid"), "left")
      .select(col("neighbor_id").as("id"), col("list_id").as("cluster_id"),
        col("__rid").isNull.as("kept"))
  }

  /**
   * Davies–Bouldin index — the clustering-quality gate run after
   * [[kmeansFit]] before a clustering feeds SemDeDup or an IVF index
   * (a bad k silently degrades both): per cluster i, scatter
   * s_i = avg‖x − c_i‖₂ over members, separation d_ij = ‖c_i − c_j‖₂,
   * and R_i = max_{j≠i} (s_i + s_j)/d_ij; DB = avg_i R_i (lower is
   * better — tight, well-separated clusters).
   *
   * Returns one row per NON-EMPTY cluster: (cluster_id, n_members,
   * scatter, r_max) plus the overall db_index (the same scalar on every
   * row, riding a one-row broadcast). Empty clusters have no scatter and
   * are excluded, the classical convention; with a single non-empty
   * cluster r_max and db_index are null (no j≠i). Duplicate-centroid
   * pairs (d_ij = 0) are excluded from the max rather than emitting a
   * division by zero — callers with duplicated centroids have a k too
   * large for their data, which the remaining ratios already scream.
   *
   * Scale shape: assignment is the exchange-free broadcast-centroid map
   * of [[kmeansAssign]]; scatter is ONE partial-aggregated shuffle of
   * k-sized keys; everything after is k²-sized driver-free broadcast
   * arithmetic. Per-member distances are sequential left-to-right
   * folds (engine-replayable); only the scatter avg carries Σ-order
   * drift (~1e-15) — callers round (q107 precedent).
   */
  def daviesBouldin(corpus: DataFrame, centroids: DataFrame,
                    idCol: String, vecCol: String): DataFrame = {
    val cents = centroids.select(col("centroid_id"),
      col("cvec").cast("array<double>").as("cvec"))
    def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v))
    val scatter = kmeansAssign(corpus, cents, idCol, vecCol)
      .join(broadcast(cents), col("list_id") === col("centroid_id"))
      .select(col("list_id"), l2(col("nvec"), col("cvec")).as("__d"))
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_members"), avg(col("__d")).as("scatter"))
    // materialize the k-sized scatter frame EAGERLY: THREE consumers below
    // (both sides of the pairwise-separation join and the per-cluster
    // output) — without it each reference replays the corpus-sized
    // assignment scan (measured 3× in=|corpus| stages in the q206 profile;
    // the globalRank slim-frame precedent). localCheckpoint, NOT persist:
    // the method returns before any consumer drains, so a persist() here
    // had no natural unpersist point and leaked one cache entry per call
    // in a long-lived session; checkpoint blocks are reference-tracked and
    // GC-reaped with the plan. Values unchanged — the scatter job merely
    // runs at call time instead of first action (q206 re-certified).
    val sc = scatter.join(broadcast(cents),
      col("list_id") === col("centroid_id")).drop("centroid_id")
      .localCheckpoint(true)
    val rmax = sc.select(col("list_id").as("__i"), col("scatter").as("__si"),
        col("cvec").as("__ci"))
      .join(sc.select(col("list_id").as("__j"), col("scatter").as("__sj"),
        col("cvec").as("__cj")), col("__i") =!= col("__j"))
      .select(col("__i"), ((col("__si") + col("__sj")) /
        l2(col("__ci"), col("__cj"))).as("__r"),
        l2(col("__ci"), col("__cj")).as("__dij"))
      .where(col("__dij") > 0.0)
      .groupBy(col("__i")).agg(max(col("__r")).as("r_max"))
    val perCluster = sc
      .join(rmax, col("list_id") === col("__i"), "left").drop("__i")
      .select(col("list_id").as("cluster_id"), col("n_members"),
        col("scatter"), col("r_max"))
    val db = perCluster.agg(avg(col("r_max")).as("db_index"))
    perCluster.crossJoin(broadcast(db))
  }
}
