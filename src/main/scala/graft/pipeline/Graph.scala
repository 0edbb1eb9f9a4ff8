package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Iterative graph algorithms as plain joins + aggregations — the
 * "sparse matrix-vector product on a shuffle" family. Complements
 * [[Dedup.nearDuplicateClusters]] (label propagation / connected
 * components) with rank propagation.
 */
object Graph {

  /** Hard ceiling on any size-gated driver path's edge collect,
    * independent of the caller-tunable `collectThreshold`: 8M undirected
    * edges ≈ 1.2 GB at ~150 bytes/edge all-in (ids + HashMap/ArrayBuffer
    * boxing) — safe on any reasonably-provisioned driver. A caller
    * passing a larger threshold gets the distributed path, not a driver
    * OOM. */
  val DriverEdgeCap: Long = 8000000L

  /** Primitive CSR over collected DIRECTED edge rows (a symmetrized list
    * carries each undirected edge twice): node ids sorted-deduped,
    * neighbors as index ranges — zero boxing, ~20 bytes/edge, built in
    * O(m log m). The driver-gated graph loops run on this instead of
    * HashMap[Long, ArrayBuffer[Long]] (measured ~1 µs/edge boxed vs
    * ~50 ns/edge here — the gate crossover moves up an order). */
  private[pipeline] final class Csr(src: Array[Long], dst: Array[Long]) {
    val ids: Array[Long] = {
      val all = new Array[Long](src.length * 2)
      System.arraycopy(src, 0, all, 0, src.length)
      System.arraycopy(dst, 0, all, src.length, dst.length)
      java.util.Arrays.sort(all)
      var n = 0
      var i = 0
      while (i < all.length) {
        if (n == 0 || all(i) != all(n - 1)) { all(n) = all(i); n += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(all, n)
    }
    val n: Int = ids.length
    def idx(x: Long): Int = java.util.Arrays.binarySearch(ids, x)
    val offsets: Array[Int] = {
      val deg = new Array[Int](n + 1)
      var i = 0
      while (i < src.length) { deg(idx(src(i)) + 1) += 1; i += 1 }
      var j = 1
      while (j <= n) { deg(j) += deg(j - 1); j += 1 }
      deg
    }
    val adj: Array[Int] = {
      val fill = offsets.clone()
      val out = new Array[Int](src.length)
      var i = 0
      while (i < src.length) {
        val s = idx(src(i)); out(fill(s)) = idx(dst(i)); fill(s) += 1; i += 1
      }
      out
    }
    def maxDegree: Int = {
      var m = 0; var j = 0
      while (j < n) { m = math.max(m, offsets(j + 1) - offsets(j)); j += 1 }
      m
    }
  }

  private[pipeline] def collectEdges(
      sym: org.apache.spark.sql.DataFrame): (Array[Long], Array[Long]) = {
    val rows = sym.collect()
    val a = new Array[Long](rows.length)
    val b = new Array[Long](rows.length)
    var i = 0
    while (i < rows.length) {
      a(i) = rows(i).getLong(0); b(i) = rows(i).getLong(1); i += 1
    }
    (a, b)
  }

  /**
   * Connected components by fixed-round min-label propagation over an
   * UNDIRECTED pair list (`id_a`, `id_b` — each unordered edge once):
   * returns (id, label) for every node incident to an edge, label = the
   * minimum node id within `rounds` hops — exact when no component's
   * diameter exceeds `rounds` (the [[Dedup.nearDuplicateClusters]]
   * contract, where this loop originated; see its scaladoc for the
   * plan-shape argument: one self-loop-augmented join per round keeps
   * the lazy plan LINEAR in rounds, and the slim edge list persists
   * because every round references it).
   */
  def connectedComponents(pairs: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1)
    val p = pairs.select(col("id_a"), col("id_b"))
    val edges = p.unionByName(
      p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val edgesPlus = edges.unionByName(
      edges.select(col("id_a")).distinct()
        .select(col("id_a"), col("id_a").as("id_b"))).persist()
    var labels = edgesPlus.filter(col("id_a") === col("id_b"))
      .select(col("id_a").as("id"), col("id_a").as("label"))
    var r = 0
    while (r < rounds) {
      labels = labels.join(edgesPlus, col("id") === col("id_a"))
        .select(col("id_b").as("id"), col("label"))
        .groupBy("id").agg(min("label").as("label"))
      r += 1
    }
    labels
  }

  /**
   * Connected components run to EXACT convergence: min-label propagation
   * plus pointer-jumping path compression (label ← label-of-label) per
   * round, stopping when a round changes nothing. Compression makes the
   * reachable horizon roughly DOUBLE per round, so convergence takes
   * O(log diameter) rounds — a 10⁶-hop filament (the failure mode of
   * fixed-round propagation on density-connected chains) converges in
   * ~20 rounds instead of 10⁶. Each round is two slim label-table joins
   * plus ONE bounded driver action (`limit(1).count()` on the changed-row
   * check — the kmeansFit per-round-collect precedent); per-round frames
   * persist and the previous round unpersists after the check, so memory
   * stays one label table. Use [[connectedComponents]] when a diameter
   * bound is known (clique-ish near-dup graphs); use this when the graph
   * shape is data-dependent (DBSCAN cores, arbitrary link graphs).
   */
  def connectedComponentsConverged(pairs: DataFrame,
                                   maxRounds: Int = 50): DataFrame = {
    require(maxRounds >= 1)
    val p = pairs.select(col("id_a"), col("id_b"))
    val edges = p.unionByName(
      p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val edgesPlus = edges.unionByName(
      edges.select(col("id_a")).distinct()
        .select(col("id_a"), col("id_a").as("id_b"))).persist()
    // localCheckpoint (eager), NOT persist: the pointer-jumping self-join
    // references the round's frame TWICE, so a lazy lineage would DOUBLE
    // in plan size every round — 2^rounds analysis cost (the q56 lesson,
    // replayed in plan space; observed as a driver OOM during planning at
    // round ~20). Checkpointing cuts the plan back to a leaf each round;
    // blocks are freed by the ContextCleaner as rounds are GC'd. On a
    // multi-executor cluster prefer a reliable checkpoint dir for
    // executor-loss tolerance (localCheckpoint trades that for speed).
    var labels = edgesPlus.filter(col("id_a") === col("id_b"))
      .select(col("id_a").as("id"), col("id_a").as("label")).localCheckpoint()
    var r = 0
    var done = false
    while (!done && r < maxRounds) {
      val nmin = labels.join(edgesPlus, col("id") === col("id_a"))
        .select(col("id_b").as("id"), col("label"))
        .groupBy("id").agg(min("label").as("label"))
      // pointer jumping: label(v) ← label(label(v)); label ids are node
      // ids of the same component, so the lookup side is nmin itself
      val next = nmin
        .join(nmin.select(col("id").as("__lid"), col("label").as("__llab")),
          nmin("label") === col("__lid"), "left")
        .select(nmin("id"), coalesce(col("__llab"), nmin("label")).as("label"))
        .localCheckpoint()
      val changed = next
        .join(labels.select(col("id"), col("label").as("__old")), Seq("id"))
        .filter(col("label") =!= col("__old")).count()
      labels = next
      done = changed == 0L
      r += 1
    }
    labels
  }

  /**
   * Exact connected components with a SIZE-GATED strategy — the
   * broadcast-join-threshold philosophy applied to graph contraction:
   *
   *  - edge list ≤ `collectThreshold` rows (ONE count job to decide):
   *    collect the slim (id_a, id_b) sliver and run driver union-find
   *    (path-halving + union-by-attachment toward the smaller id) —
   *    exact, microseconds, zero iterative jobs. A near-dup/DBSCAN core
   *    graph is a sliver of the corpus, so at bench scales the
   *    distributed loop's per-round fixed costs (plan, schedule,
   *    checkpoint) dominate its sub-second real work by 10-40×; the gate
   *    removes exactly that overhead, the way the planner collapses a
   *    small join side into a broadcast.
   *  - larger: [[connectedComponentsConverged]] (pointer jumping,
   *    O(log diameter) rounds) — per-round real work now dominates the
   *    fixed costs, which is when the distributed loop earns its keep.
   *
   * Both paths produce identical labels (component minimum), so the gate
   * affects time only. Default threshold 2M edges ≈ 32 MB driver-side.
   */
  def connectedComponentsExact(pairs: DataFrame,
                               collectThreshold: Long = 2000000L,
                               maxRounds: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist()
    val m = p.count()
    // collectThreshold clamped to DriverEdgeCap — see kCore's
    // driver-memory contract
    if (m > math.min(collectThreshold, DriverEdgeCap))
      return connectedComponentsConverged(p, maxRounds)
    val edgeArr = p.as[(Long, Long)].collect()
    p.unpersist()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edgeArr.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { // attach the larger root under the smaller → min label
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val nodes = edgeArr.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.iterator.map(v => (v, find(v))).toSeq.toDF("id", "label")
  }

  /**
   * Per-node triangle participation counts over an UNDIRECTED edge list
   * (`id_a`, `id_b`; self-loops and duplicate/reversed edges tolerated —
   * canonicalized away). Classic compact-forward shape:
   *
   *  1. canonicalize edges to (lo, hi), lo < hi, distinct;
   *  2. orient every edge from the (degree, id)-SMALLER endpoint to the
   *     larger — a total order, so each undirected edge appears exactly
   *     once and every wedge is generated at its lowest-ordered node;
   *  3. wedges = self-join of the oriented list on src (dst₁ < dst₂ by id
   *     so each unordered wedge appears once);
   *  4. close each wedge against the canonical edge set on
   *     (lo, hi) = (dst₁, dst₂) — each triangle found exactly once;
   *  5. explode the 3 corners and count per node.
   *
   * Why the degree orientation matters at 100 TB: wedge count under this
   * orientation is O(m^1.5) worst-case and in practice bounded by the
   * out-degree cap ~√m — a celebrity node with 10⁷ followers generates
   * wedges only from its (few) higher-degree peers, not 10¹⁴ follower
   * pairs. The wedge self-join and the closing join both shuffle on plain
   * equi-keys (src, then (lo,hi)), so AQE's skew splitting applies; no
   * Window, no driver actions. Returns (node, triangles) for nodes in at
   * least one triangle.
   */
  def triangleCounts(pairs: DataFrame,
                     broadcastThreshold: Long = 200000L): DataFrame = {
    val e0 = pairs.select(
        least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .persist() // referenced by degree, orientation, and the closing join
    val deg = e0.select(col("lo").as("node"))
      .unionAll(e0.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = e0
      .join(deg.select(col("node").as("lo"), col("d").as("__dlo")), "lo")
      .join(deg.select(col("node").as("hi"), col("d").as("__dhi")), "hi")
    val fwd = col("__dlo") < col("__dhi") ||
      (col("__dlo") === col("__dhi") && col("lo") < col("hi"))
    // src-keyed repartition at session parallelism: co-partitions the
    // wedge self-join below (both aliases of the cached frame carry the
    // partitioning — no exchange under the join) and pins the
    // compute-dense wedge-explode stage's parallelism — AQE's byte-based
    // coalescing otherwise squeezes the slim edge frame to a handful of
    // tasks that then pay Σ outdeg² wedge work (measured 48 s CPU
    // through 16 tasks = 3.1 s of q120's 4.9 s warm wall).
    val o = withDeg.select(
        when(fwd, col("lo")).otherwise(col("hi")).as("src"),
        when(fwd, col("hi")).otherwise(col("lo")).as("dst"))
      .repartition(pairs.sparkSession.sparkContext.defaultParallelism,
        col("src"))
      .persist() // self-joined for wedges
    val wedges = o.select(col("src"), col("dst").as("b"))
      .join(o.select(col("src"), col("dst").as("c")), "src")
      .filter(col("b") < col("c"))
    // closing join: the WEDGE stream is the big side (Σ outdeg² rows);
    // when the edge set itself fits a SMALL broadcast, closing against
    // it in-map means wedges never shuffle at all. The default
    // crossover is 200k edges — NOT the shuffle gate's 2M: a 1.2M-edge
    // broadcast map is ~40 MB and every wedge probe misses cache, and
    // the round-9 A/B measured the partitioned shuffle-hash build
    // FASTER there (2.0 s vs 3.15 s warm on the sf0.1 co-order graph)
    // despite shuffling the wedge stream. Size-gated like the ≤2M-edge
    // union-find (Graph.connectedComponents): beyond the gate the join
    // shuffles both sides on (b, c) / (lo, hi) as a SHUFFLE-HASH join
    // built on the EDGE side — never a SortMergeJoin, because SMJ would
    // externally SORT the wedge stream, and at 100× scale that spill is
    // the whole disk (found empirically: sf10 q120 died with
    // SPILL_OUT_OF_MEMORY / no-space during the wedge sort). The
    // partition count self-tunes to ~500k build edges per partition
    // (m/500k, floored at the session default) so each per-partition
    // hash map stays tens of MB — a fixed session partition count would
    // otherwise make the build maps grow WITH the graph and OOM (also
    // found empirically at sf10 under 32 partitions).
    val m = e0.count()
    val tri =
      if (m <= broadcastThreshold) {
        val closing = broadcast(e0)
        wedges.join(closing,
          wedges("b") === closing("lo") && wedges("c") === closing("hi"))
      } else {
        val parts = math.max(
          pairs.sparkSession.sessionState.conf.numShufflePartitions,
          (m / 500000L).toInt + 1)
        val w = wedges.repartition(parts, col("b"), col("c"))
        val closing = e0.repartition(parts, col("lo"), col("hi"))
          .hint("shuffle_hash")
        w.join(closing,
          w("b") === closing("lo") && w("c") === closing("hi"))
      }
    tri.select(explode(array(col("src"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /**
   * PageRank over a directed edge list, `iters` synchronous power
   * iterations of
   *
   *   r'(v) = (1 − d)/N + d · Σ_{u→v} r(u)/outdeg(u)
   *
   * from the uniform start r₀ = 1/N. Dangling mass (nodes with no
   * out-edges) is dropped, not redistributed — on an undirected
   * (symmetrized) edge list every node has out-edges, so Σr stays exactly
   * 1 − that is the intended input shape for web-/domain-graph ranking
   * over a co-occurrence projection. Returns (node, rank) for ALL nodes.
   *
   * Scale shape per iteration: one equi-join of the edge list with the
   * dim-one rank vector on src (both sides shuffle-partitioned on the
   * join key; the rank side is |V| rows — broadcastable when V is small,
   * left to the planner's threshold otherwise), one partial-aggregated
   * groupBy(dst) for the in-mass, and one left join back to the node set.
   * N rides as a one-row broadcast (the adaptivePitch scalar pattern —
   * no driver action). The edge list is scanned once per iteration;
   * at 100 TB you persist/checkpoint `ranks` between rounds to cut the
   * lineage (the q56 propagation lesson) — iterations here stay unrolled
   * in one declarative plan because certification runs are short (≤ 3
   * rounds) and purity keeps the oracle replayable.
   *
   * Cross-engine exactness: per-edge contribution r/outdeg, the damping
   * multiply, and the base term are fixed-order IEEE scalar ops; only the
   * per-node in-mass sum is order-dependent (~1e-16 relative per round).
   * Callers round (10 dp absorbs ~9 orders of magnitude of drift at
   * graph sizes where ranks sit near 1/N ≈ 1e-3…1e-6).
   */
  /**
   * Multi-source BFS hop distance (undirected): the minimum number of
   * edges from any seed node, up to `maxHops`. Unreached nodes are
   * absent from the output.
   *
   * Shape: the pageRank discipline — the symmetrized edge list persists
   * once; each unrolled round is ONE equi-join of the current distance
   * vector with the cached edges + a partial-aggregated min; rounds
   * stay declarative so an oracle can replay the trajectory. Frontier
   * frames are node-sized, never corpus-sized. `maxHops` bounds the
   * plan depth (for unbounded reachability use
   * [[connectedComponentsConverged]]).
   */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, maxHops: Int,
              collectThreshold: Long = 250000L): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct().persist()
    val seed0 = seeds.select(col(seedCol).as("node")).distinct()
    // the distributed path's union coerces the seed and edge id types —
    // the gated path must land on the SAME node dtype (the ivfAssignWith
    // id-width lesson), derived here from the zero-cost unioned schema
    // (maxHops = 0 never unions, so the seed type stands)
    val nodeType =
      if (maxHops == 0) seed0.schema("node").dataType
      else seed0.select(col("node"))
        .union(sym.select(col("v").as("node"))).schema("node").dataType
    val integralIds = {
      import org.apache.spark.sql.types._
      Seq(e.schema("u").dataType, seed0.schema("node").dataType).forall {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    val gate = math.min(collectThreshold, DriverEdgeCap)
    // SIZE-GATED like kCore: sym has 2 rows per undirected edge; at bench
    // scale the unrolled rounds are driver-synchronized fixed cost. Both
    // paths produce the identical (node, dist) fixpoint (suite-pinned);
    // collectThreshold = 0 forces the distributed 100 TB shape. The
    // driver loop runs on a primitive [[Csr]] (not boxed maps), so the
    // collect dominates; measured ~1.1 µs/collected row against a
    // ~0.6-0.9 s distributed fixed cost, the crossover sits near 250k
    // undirected edges — the default gate (kCore peels in O(m) with no
    // per-round rebuild, hence its higher 2M gate). sym
    // stays cached (the house convention — pageRank etc.): the edge
    // derivation is often an expensive upstream join a caller will
    // drive again; sessions clear via spark.catalog.clearCache().
    if (integralIds && sym.count() <= 2L * gate) {
      import spark.implicits._
      val (ea, eb) = collectEdges(
        sym.select(col("u").cast("long"), col("v").cast("long")))
      val g = new Csr(ea, eb)
      val sd = seed0.select(col("node").cast("long")).as[Long].collect()
      val dist = new Array[Int](g.n)
      java.util.Arrays.fill(dist, -1)
      var frontier = new Array[Int](g.n)
      var fn = 0
      // isolated seeds (absent from the edge list) still emit dist 0
      val isolated = scala.collection.mutable.ArrayBuffer.empty[Long]
      val seen = scala.collection.mutable.HashSet.empty[Long]
      sd.foreach { s =>
        if (seen.add(s)) {
          val i = g.idx(s)
          if (i >= 0) { dist(i) = 0; frontier(fn) = i; fn += 1 }
          else isolated += s
        }
      }
      var h = 0
      while (h < maxHops && fn > 0) {
        val next = new Array[Int](g.n)
        var nn = 0
        var f = 0
        while (f < fn) {
          val v = frontier(f)
          var p = g.offsets(v)
          val end = g.offsets(v + 1)
          while (p < end) {
            val w = g.adj(p)
            if (dist(w) < 0) { dist(w) = h + 1; next(nn) = w; nn += 1 }
            p += 1
          }
          f += 1
        }
        frontier = next; fn = nn; h += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var j = 0
      while (j < g.n) {
        if (dist(j) >= 0) out += ((g.ids(j), dist(j).toLong)); j += 1
      }
      isolated.foreach(s => out += ((s, 0L)))
      return spark.createDataset(out.toSeq).toDF("node", "dist")
        .select(col("node").cast(nodeType).as("node"), col("dist"))
    }
    var dist = seed0.withColumn("dist", lit(0L))
    var h = 0
    while (h < maxHops) {
      val next = sym.join(dist.select(col("node").as("u"), col("dist")),
          Seq("u"))
        .select(col("v").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.union(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      h += 1
    }
    dist
  }

  /** Per-iteration driver loop over dictionary-encoded collected edges —
    * the SIZE-GATED path shared by [[pageRank]]/[[pageRankWeighted]].
    * Ids are ANY type (q111's graphs carry string node ids, so a
    * Long-only CSR gate would never fire there): the driver encodes them
    * to dense ints once, then each power iteration is a primitive
    * scatter-add over the edge arrays — zero boxing in the hot loop,
    * zero per-round Spark jobs. Double-sum ORDER differs from the
    * distributed aggregation's (both are run-order nondeterministic);
    * consumers absorb it the same way they already absorb distributed
    * drift — the oracles' 10dp rounding (suite-pinned at 10dp). */
  private def gatedPageRank(spark: org.apache.spark.sql.SparkSession,
                            rows: Array[org.apache.spark.sql.Row],
                            weighted: Boolean, iters: Int, damping: Double,
                            nodeType: org.apache.spark.sql.types.DataType): DataFrame = {
    val m = rows.length
    val idx = new java.util.HashMap[Any, Integer]()
    val srcI = new Array[Int](m)
    val dstI = new Array[Int](m)
    val w = if (weighted) new Array[Double](m) else null
    def enc(x: Any): Int = {
      var i = idx.get(x)
      if (i == null) { i = Integer.valueOf(idx.size); idx.put(x, i) }
      i.intValue()
    }
    var i = 0
    while (i < m) {
      srcI(i) = enc(rows(i).get(0)); dstI(i) = enc(rows(i).get(1))
      if (weighted) w(i) = rows(i).getDouble(2)
      i += 1
    }
    val n = idx.size
    // out-degree / out-strength per src (sequential double sum — see
    // order note above)
    val os = new Array[Double](n)
    i = 0
    while (i < m) { os(srcI(i)) += (if (weighted) w(i) else 1.0); i += 1 }
    var r = new Array[Double](n)
    java.util.Arrays.fill(r, 1.0 / n)
    var it = 0
    while (it < iters) {
      val im = new Array[Double](n)
      i = 0
      while (i < m) {
        im(dstI(i)) += r(srcI(i)) * (if (weighted) w(i) else 1.0) / os(srcI(i))
        i += 1
      }
      val next = new Array[Double](n)
      var v = 0
      while (v < n) { next(v) = (1.0 - damping) / n + damping * im(v); v += 1 }
      r = next; it += 1
    }
    val ids = new Array[Any](n)
    idx.forEach((k, v) => ids(v.intValue()) = k)
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    var v = 0
    while (v < n) {
      out.add(org.apache.spark.sql.Row(ids(v), r(v))); v += 1
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(out,
      StructType(Seq(StructField("node", nodeType), StructField("rank", DoubleType))))
  }

  /** SIZE-GATED like [[bfsHops]]: under `collectThreshold` directed
    * distinct edges (one count job on the persisted edge list, clamped to
    * [[DriverEdgeCap]]) the power iterations run as a driver loop over
    * dictionary-encoded edges ([[gatedPageRank]] — any id type, strings
    * included) — identical trajectory, zero per-round Spark jobs; above,
    * the unchanged unrolled distributed rounds (the 100 TB shape).
    * Default gate 2M directed edges (the kCore tier, not the 250k BFS
    * tier): three unrolled rounds cost ~1.2 s of driver-synchronized
    * fixed overhead, and the measured A/B on q111's real 1.17M-edge
    * string-id graph has the gated loop at 2.7-2.8 s warm vs 3.9-4.1 s
    * distributed (collect+encode ≈ 0.5 s/M string edges — the crossover
    * sits past 2M). `collectThreshold = 0` forces the distributed
    * path. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85,
               collectThreshold: Long = 2000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping >= 0.0 && damping <= 1.0,
      s"damping must be in [0,1], got $damping")
    // persist the SLIM derived frames (2-col edge list, node set, degree):
    // every unrolled round references them, and without the cache the
    // upstream edge derivation (often a join + distinct) re-executes once
    // per reference — measured 8.3 s → 3.6 s on q111 at sf0.1. Cached
    // blocks stay until LRU/session eviction (the nearDuplicateClusters
    // precedent — the returned plan references them lazily, so they
    // cannot be unpersisted here; long-lived sessions evict via
    // spark.catalog.clearCache() between unrelated jobs).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    if (e.count() <= math.min(collectThreshold, DriverEdgeCap)) {
      // e stays cached (house convention — the upstream edge derivation
      // is often an expensive join a caller drives again). BOTH id
      // columns cast to the union-coerced dtype BEFORE the collect so a
      // mixed-width graph dictionary-encodes int 5 and long 5 to the
      // same node (and the output dtype matches the distributed path)
      val nodeType = e.select(col("src"))
        .union(e.select(col("dst"))).schema("src").dataType
      return gatedPageRank(edges.sparkSession,
        e.select(col("src").cast(nodeType), col("dst").cast(nodeType)).collect(),
        weighted = false, iters, damping, nodeType)
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    // outdeg folds INTO the cached edge list once (a window over the
    // edge shuffle's own partitioning would also work; the join keeps it
    // partial-aggregated) — each iteration then joins ONE cached frame
    // with the rank vector instead of re-joining degree every round
    val eDeg = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg")),
      "src").persist()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
    var it = 0
    while (it < iters) {
      val r = ranks.select(col("node").as("__rn"), col("rank").as("__rv"))
      val inMass = eDeg
        .join(r, col("src") === col("__rn"))
        .select(col("dst").as("node"), (col("__rv") / col("__outdeg")).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__im"))
      ranks = nodes.crossJoin(broadcast(nRow))
        .join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__im"), lit(0.0))).as("rank"))
      it += 1
    }
    ranks
  }

  /**
   * Edge-WEIGHTED PageRank: mass flows proportionally to edge weight
   * (rank·w / out-strength) instead of 1/outdeg — the natural ranking
   * over similarity/co-occurrence graphs where edge strength matters.
   * Same declarative unrolled-round shape and caching discipline as
   * [[pageRank]]; the weight column must be positive.
   */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iters: Int = 3,
                       damping: Double = 0.85,
                       collectThreshold: Long = 2000000L): DataFrame = {
    require(iters >= 0 && damping >= 0.0 && damping <= 1.0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w")).persist()
    if (e.count() <= math.min(collectThreshold, DriverEdgeCap)) {
      // size-gated driver loop — see pageRank (same contract; weights
      // ride along as the third collected column)
      val nodeType = e.select(col("src"))
        .union(e.select(col("dst"))).schema("src").dataType
      return gatedPageRank(edges.sparkSession,
        e.select(col("src").cast(nodeType), col("dst").cast(nodeType),
          col("w")).collect(),
        weighted = true, iters, damping, nodeType)
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val eStr = e.join(
      e.groupBy(col("src")).agg(sum(col("w")).as("__os")), "src").persist()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
    var it = 0
    while (it < iters) {
      val r = ranks.select(col("node").as("__rn"), col("rank").as("__rv"))
      val inMass = eStr
        .join(r, col("src") === col("__rn"))
        .select(col("dst").as("node"),
          (col("__rv") * col("w") / col("__os")).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__im"))
      ranks = nodes.crossJoin(broadcast(nRow))
        .join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__im"), lit(0.0))).as("rank"))
      it += 1
    }
    ranks
  }

  /**
   * Synchronous label propagation (community detection): every node
   * starts labeled with its own id; each round it adopts the most
   * frequent label among its neighbors, ties to the SMALLEST label —
   * fully deterministic (the async/random-order variants of LPA are
   * not), so a fixed-round trajectory is replayable by any engine.
   * Communities differ from connected components ([[connectedComponents]]
   * converges every component to one label): LPA's majority vote splits
   * weakly-bridged dense regions inside one component.
   *
   * Scale shape per round (the [[pageRank]] discipline): the symmetrized
   * edge list is derived and persisted ONCE; labels join into it, the
   * (node, label) vote partial-aggregates map-side, and the argmax is a
   * struct-min aggregate — no Window. Isolated-node handling: nodes keep
   * their own label when a round delivers no votes (left join +
   * coalesce). All integer arithmetic — exact in any engine.
   */
  /**
   * k-core decomposition for a FIXED k: the maximal subgraph in which
   * every node keeps degree ≥ k — the standard "dense backbone" cut
   * before community detection or embedding training (peripheral
   * low-degree nodes drop out together with the cascades they trigger).
   * Returns (node, degree) for the surviving nodes, degree measured
   * INSIDE the core.
   *
   * Algorithm: iterative peeling to the fixpoint — each round recounts
   * degrees within the surviving node set (two semi-joins of the slim
   * edge list against the survivor frame + one map-side-combined count)
   * and drops nodes under k; removal cascades until a round removes
   * nothing. Convergence needs at most |V| rounds but in practice a
   * handful (`maxIters` guards pathological chains; the loop asserts it
   * converged rather than silently returning a non-core).
   *
   * Scale shape, per round: survivors are a NODE-sized frame (the
   * planner broadcasts it when small — at web scale it is an equi-join
   * on node id); the edge list persists once and never grows;
   * `localCheckpoint` truncates each round's lineage (the q116
   * pointer-jumping lesson — an unpersisted loop doubles the plan per
   * round). Driver work per round is ONE count action; nothing
   * data-sized is ever collected.
   *
   * SIZE-GATED like [[connectedComponentsExact]]: when the (integral-id)
   * edge list fits under `collectThreshold` undirected edges (ONE count
   * job to decide), the peel runs as driver bucket-queue cascade — exact,
   * O(m), zero iterative jobs. At bench scale the distributed loop's
   * 8-10 driver-synchronized rounds are pure fixed cost (plan, schedule,
   * checkpoint) against sub-second real work; the gate removes exactly
   * that, the way the planner collapses a small join side into a
   * broadcast. Both paths produce the identical fixpoint (suite-pinned
   * on seeded random graphs), so the gate affects time only; the
   * distributed path stays the 100 TB shape.
   *
   * DRIVER-MEMORY CONTRACT: the gated path collects the undirected edge
   * list and builds adjacency + degree maps on the driver — budget
   * ≈150 bytes per undirected edge all-in (two 8-byte ids per direction
   * plus ArrayBuffer/HashMap boxing overhead), i.e. ~300 MB at the
   * default threshold. `collectThreshold` is additionally clamped to
   * [[DriverEdgeCap]] (8M undirected edges ≈ 1.2 GB) so no caller value
   * can push an unbounded collect onto the driver; above the clamp the
   * distributed fixpoint runs regardless.
   */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxIters: Int = 50, collectThreshold: Long = 2000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val gate = math.min(collectThreshold, DriverEdgeCap)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val nbr = e0.union(e0.select(col("dst"), col("src"))).distinct().persist()
    // both id columns integral + union-coerced output dtype — see
    // labelPropagation/bfsHops (the mixed-id-width lesson)
    val integralIds = {
      import org.apache.spark.sql.types._
      Seq(e0.schema("src").dataType, e0.schema("dst").dataType).forall {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    // nbr is the symmetric closure: exactly 2 rows per undirected edge
    if (integralIds && nbr.count() <= 2L * gate) {
      val spark = edges.sparkSession
      import spark.implicits._
      val srcType = nbr.schema("src").dataType
      val und = nbr.where(col("src") < col("dst"))
        .select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].collect()
      nbr.unpersist()
      val adj = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
      und.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
      }
      val deg = scala.collection.mutable.HashMap.empty[Long, Int]
      adj.foreach { case (v, ns) => deg(v) = ns.size }
      val removed = scala.collection.mutable.HashSet.empty[Long]
      val queue = scala.collection.mutable.ArrayDeque.empty[Long]
      adj.keysIterator.filter(deg(_) < k).foreach(queue.append)
      while (queue.nonEmpty) {
        val v = queue.removeHead()
        if (!removed(v) && deg(v) < k) {
          removed += v
          adj(v).foreach { u =>
            if (!removed(u)) {
              deg(u) -= 1
              if (deg(u) == k - 1) queue.append(u)
            }
          }
        }
      }
      val rows = adj.keysIterator.filterNot(removed)
        .map(v => (v, deg(v).toLong)).toSeq
      return spark.createDataset(rows).toDF("node", "degree")
        .select(col("node").cast(srcType).as("node"), col("degree"))
    }
    var alive = nbr.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var n = alive.count()
    var it = 0
    var converged = false
    while (!converged && it < maxIters && n > 0) {
      val deg = nbr
        .join(alive.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree"))
      val next = deg.where(col("degree") >= k).localCheckpoint(true)
      val m = next.count()
      converged = m == n
      alive = next
      n = m
      it += 1
    }
    require(converged || n == 0, s"k-core did not converge in $maxIters rounds")
    nbr.unpersist()
    if (it == 0) alive.select(col("node"), lit(0L).as("degree")).where(lit(false))
    else alive.select(col("node"), col("degree"))
  }

  /** SIZE-GATED like [[kCore]]: under `collectThreshold` undirected
    * integral-id edges (one count job to decide, clamped to
    * [[DriverEdgeCap]]) the synchronous rounds run as a driver loop —
    * identical semantics (simultaneous update from the previous round's
    * labels; winner = max vote count, ties to the smallest label), zero
    * per-round Spark jobs. Both paths produce identical labels
    * (suite-pinned); `collectThreshold = 0` forces the distributed
    * 100 TB shape. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 3,
                       collectThreshold: Long = 250000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val nbr = e0.union(e0.select(col("dst"), col("src"))).distinct().persist()
    // BOTH id columns must be integral (a non-integral dst would
    // null-cast in collectEdges), and the gated output lands on the
    // UNION-COERCED node dtype — the same type the distributed path's
    // symmetrizing union produces (the bfsHops mixed-id-width lesson)
    val integralIds = {
      import org.apache.spark.sql.types._
      Seq(e0.schema("src").dataType, e0.schema("dst").dataType).forall {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    val gate = math.min(collectThreshold, DriverEdgeCap)
    if (integralIds && nbr.count() <= 2L * gate) {
      import spark.implicits._
      val srcType = nbr.schema("src").dataType
      // primitive CSR loop (see Csr) — the collect dominates; 250k
      // default gate (see bfsHops). nbr stays cached (house convention).
      val (ea, eb) = collectEdges(
        nbr.select(col("src").cast("long"), col("dst").cast("long")))
      val g = new Csr(ea, eb)
      var labels = new Array[Long](g.n)
      var j = 0
      while (j < g.n) { labels(j) = g.ids(j); j += 1 }
      val scratch = new Array[Long](math.max(g.maxDegree, 1))
      var it = 0
      while (it < iters) {
        val next = new Array[Long](g.n)
        var v = 0
        while (v < g.n) {
          // winner = (max votes, min label) over the PREVIOUS round's
          // neighbor labels — the distributed min(struct(-votes, label)):
          // gather, sort, scan runs
          val start = g.offsets(v); val end = g.offsets(v + 1)
          val d = end - start
          if (d == 0) next(v) = labels(v)
          else {
            var p = start
            while (p < end) { scratch(p - start) = labels(g.adj(p)); p += 1 }
            java.util.Arrays.sort(scratch, 0, d)
            var best = scratch(0); var bestCnt = 0
            var runVal = scratch(0); var runCnt = 0
            var k = 0
            while (k < d) {
              if (scratch(k) == runVal) runCnt += 1
              else {
                if (runCnt > bestCnt) { best = runVal; bestCnt = runCnt }
                runVal = scratch(k); runCnt = 1
              }
              k += 1
            }
            if (runCnt > bestCnt) { best = runVal; bestCnt = runCnt }
            next(v) = best
          }
          v += 1
        }
        labels = next; it += 1
      }
      val out = new Array[(Long, Long)](g.n)
      var i = 0
      while (i < g.n) { out(i) = (g.ids(i), labels(i)); i += 1 }
      return spark.createDataset(out.toSeq).toDF("node", "label")
        .select(col("node").cast(srcType).as("node"),
          col("label").cast(srcType).as("label"))
    }
    val nodes = nbr.select(col("src").as("node")).distinct().persist()
    var labels = nodes.select(col("node"), col("node").as("label"))
    var it = 0
    while (it < iters) {
      val votes = nbr
        .join(labels.select(col("node").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("__votes"))
      val winner = votes
        .groupBy(col("node"))
        .agg(min(struct((-col("__votes")).as("nv"), col("label").as("l")))
          .as("__w"))
        .select(col("node"), col("__w.l").as("__new"))
      // persist each round's |V|-row label vector: it is referenced
      // TWICE next round (the vote join AND the keep-own-label join), so
      // an unpersisted chain recomputes round r−1 twice per round —
      // 2^rounds blow-up (the q116 pointer-jumping lesson). Measured
      // 14.0 s → (see bench) at sf0.1 with 3 rounds.
      labels = labels.join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("__new"), col("label")).as("label"))
        .persist()
      it += 1
    }
    labels
  }

  /**
   * HITS hubs & authorities (Kleinberg) over a directed edge list —
   * [[pageRank]]'s bidirectional sibling for link/citation/provenance
   * graphs where "points at good pages" (hub) and "is pointed at by
   * good hubs" (authority) are DIFFERENT qualities: auth ← Σ hub over
   * in-edges, hub ← Σ auth over out-edges, `iters` full rounds from
   * hub ≡ 1.
   *
   * Exactness by construction: the iterations run UNNORMALIZED — every
   * intermediate score is a sum of integer-valued doubles, exact in
   * any engine and any summation order (auth₁ is the in-degree, and
   * each later score is an integer sum of integers) — and the single
   * max-normalization at the end is scale-equivalent to the classical
   * per-round normalization (the iteration is linear, so per-round
   * scaling only changes scale, never ratios). The outputs therefore
   * certify UNROUNDED: each is one exact-integer division. Growth is
   * DEGREE-DEPENDENT (scores grow roughly like maxdeg^(2·iters)), so the
   * `iters ≤ 6` cap alone does not bound magnitude on dense graphs — the
   * final max aggregate therefore ASSERTS max score < 2⁵³ and fails loudly
   * rather than silently voiding the unrounded contract; callers hitting
   * the assert should lower `iters` (ratios converge in few rounds).
   *
   * Returns (node, hub, auth) max-normalized to [0, 1]; nodes with no
   * out-edges have hub 0, no in-edges auth 0.
   *
   * Scale shape: the [[pageRank]] discipline — slim cached edge/node
   * frames, one edge⋈vector join + partial-aggregated sum per
   * half-step, an unrolled lazy plan with no driver action beyond the
   * one-row max frame.
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 6,
      s"iters must be in [1, 6] (integer-exactness headroom), got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    var hub: DataFrame = nodes.select(col("node"), lit(1.0).as("s"))
    var auth: DataFrame = null
    var it = 0
    while (it < iters) {
      val h = hub.select(col("node").as("__hn"), col("s").as("__hv"))
      auth = nodes
        .join(e.join(h, col("src") === col("__hn"))
          .groupBy(col("dst").as("node")).agg(sum(col("__hv")).as("__a")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("__a"), lit(0.0)).as("s"))
        .persist() // referenced by the hub half-step AND the output
      val a = auth.select(col("node").as("__an"), col("s").as("__av"))
      hub = nodes
        .join(e.join(a, col("dst") === col("__an"))
          .groupBy(col("src").as("node")).agg(sum(col("__av")).as("__h")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("__h"), lit(0.0)).as("s"))
        .persist()
      it += 1
    }
    val joined = hub.select(col("node"), col("s").as("__hub"))
      .join(auth.select(col("node"), col("s").as("__auth")), Seq("node"))
      .persist()
    // max of doubles is order-independent — the one deterministic
    // corpus-wide normalizer (an L2 norm would reintroduce Σ-order drift)
    // integer-double exactness ends at 2^53: refuse to certify beyond it.
    // The check is the VALUE-PRODUCING branch of each max column (a
    // free-standing assert_true column gets null-folded away by the
    // optimizer before it can ever run — IsNull over a NullType branch
    // simplifies to true); raise_error in the otherwise branch cannot be
    // elided because the expression's value is needed.
    val lim = lit(9007199254740992.0) // 2^53
    def checked(c: Column): Column =
      when(coalesce(c, lit(0.0)) < lim, c)
        .otherwise(raise_error(lit("hits: unnormalized score reached 2^53 " +
          "— integer-double exactness void; reduce iters")).cast("double"))
    val mx = joined.agg(max(col("__hub")).as("__mh0"),
        max(col("__auth")).as("__ma0"))
      .select(checked(col("__mh0")).as("__mh"), checked(col("__ma0")).as("__ma"))
    joined.crossJoin(broadcast(mx))
      .select(col("node"),
        when(col("__mh") > 0.0, col("__hub") / col("__mh"))
          .otherwise(lit(0.0)).as("hub"),
        when(col("__ma") > 0.0, col("__auth") / col("__ma"))
          .otherwise(lit(0.0)).as("auth"))
  }
}
