package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Event sessionization — gap-based session assignment over the `events`
 * table using only window functions (one shuffle on user_id, sort within
 * partition; no stateful custom operator needed for batch).
 *
 * For the streaming variant see [[graft.streaming.StreamSessions]].
 */
object Sessions {

  /**
   * Assign session ids: a new session starts when the gap to the previous
   * event of the same user exceeds `gapMinutes`.
   * Adds: session_seq (per-user session ordinal), session_id (user_id#seq).
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull, 1)
          .when(Time.tsMicros(col(tsCol)) - Time.tsMicros(col("__prev_ts")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("session_id", concat_ws("#", col(userCol), col("session_seq")))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session aggregates: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))

  /**
   * Ordered funnel: for each user, the FIRST time they completed stage i
   * strictly after their stage-(i−1) completion — t1 = min ts of
   * stages(0), t_{i+1} = min ts of stages(i) with ts > t_i. Returns one
   * row per distinct user: (userCol, stage (0…N reached, bigint),
   * t1…tN timestamps, null from the first missed stage on).
   *
   * The funnel is chained conditional minima, NOT a per-user event-list
   * scan: stage i is one filter on the event type + one broadcast-or-
   * shuffle join against the (user, t_i) frame (one slim row per user
   * who reached stage i — strictly shrinking), then a partial-aggregated
   * min. No Window, no collect_list — a user with 10⁸ events never
   * materializes an in-memory event array, and each stage's shuffle
   * carries only that stage's event slice. (A match_recognize-style
   * NFA would express richer patterns; for first-completion funnels the
   * min-chain is equivalent and stays in whole-stage codegen.)
   */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val users = events.select(col(userCol)).distinct()
    var prev: DataFrame = null
    val frames = stages.zipWithIndex.map { case (st, i) =>
      val f = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("__ts"))
      val cur =
        if (i == 0)
          f.groupBy(col(userCol)).agg(min(col("__ts")).as("t1"))
        else
          f.join(prev.select(col(userCol), col(s"t$i")), Seq(userCol))
            .where(col("__ts") > col(s"t$i"))
            .groupBy(col(userCol)).agg(min(col("__ts")).as(s"t${i + 1}"))
      prev = cur
      cur
    }
    val joined = frames.foldLeft(users)((acc, f) => acc.join(f, Seq(userCol), "left"))
    val stageCol = stages.indices.foldLeft(lit(0L)) { (e, i) =>
      when(col(s"t${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(e)
    }
    joined.select(col(userCol) +: stageCol.as("stage") +:
      stages.indices.map(i => col(s"t${i + 1}")): _*)
  }

  /**
   * First-order transition matrix over per-user event sequences — the
   * Markov-chain view of behavioral data (what follows what, with
   * conditional probabilities): one row per observed (from_type,
   * to_type) with the pair count and p = n / Σ n over the same
   * from_type. Ordering is (event time, `tieCol`) so simultaneous
   * events sequence deterministically in any engine.
   *
   * Scale shape: one Window per USER partition for the lead() pairing
   * (the sessionize precedent — user-bounded frames), then two
   * partial-aggregated counts; the per-from totals join back
   * from_type-keyed (a handful of rows — broadcast). p is an
   * exact-integer ratio (identical IEEE everywhere). NTZ-proof via
   * [[Time.tsMicros]].
   */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", typeCol: String = "event_type",
                       tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(Time.tsMicros(col(tsCol)), col(tieCol))
    // persist the domain-sized (from, to, n) frame: the totals join (and
    // downstream consumers like markovEntropy) reference it several
    // times, and each uncached reference would re-run the corpus-sized
    // lead window
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .withColumn("p", col("n").cast("double") / col("__tot").cast("double"))
      .drop("__tot")
  }

  /**
   * Peri-event time histogram: the distribution of `relType` events
   * relative to each `anchorType` event of the SAME key — "what happens
   * around a purchase". Relative offsets Δt ∈ [−window, window] bucket
   * by ⌊Δt / bucket⌋; output is (bucket, bucket_start_micros, n).
   *
   * Shape: one key-keyed equi-join of the two (slim, filtered) event
   * slices + a range filter + a domain-sized histogram aggregate. The
   * per-key pair fan-out is n_anchor·n_rel for that key — bounded by
   * per-key activity, not the corpus; for pathological hot keys route
   * through [[RangeJoin]]'s binned machinery instead. Floor division
   * on DOUBLE keeps negative offsets exact (|Δt| < 2⁵³ µs). NTZ-proof.
   */
  def periEventHistogram(events: DataFrame, keyCol: String, tsCol: String,
                         typeCol: String, anchorType: String,
                         relType: String, windowMicros: Long,
                         bucketMicros: Long): DataFrame = {
    require(windowMicros > 0 && bucketMicros > 0)
    val base = events.select(col(keyCol).as("__k"),
      Time.tsMicros(col(tsCol)).as("__t"), col(typeCol).as("__e"))
    val anchors = base.where(col("__e") === anchorType)
      .select(col("__k"), col("__t").as("__ta"))
    val rels = base.where(col("__e") === relType)
      .select(col("__k"), col("__t").as("__tr"))
    anchors.join(rels, Seq("__k"))
      .withColumn("__dt", col("__tr") - col("__ta"))
      .where(col("__dt") >= -windowMicros && col("__dt") <= windowMicros)
      .withColumn("bucket",
        floor(col("__dt").cast("double") / bucketMicros.toDouble)
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_start_micros", col("bucket") * bucketMicros)
  }

  /**
   * Inter-event burstiness per key — Goh & Barabási's
   * B = (σ − μ)/(σ + μ) over the consecutive-gap distribution: B → −1
   * for a metronome, ≈ 0 for a Poisson process, → 1 for extreme
   * bursts. One lead window for the gaps + one partial-aggregated
   * moment pass; keys need ≥ `minGaps` gaps. NTZ-proof.
   */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, minGaps: Long = 2L): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col(tieCol))
    events
      .withColumn("__t", Time.tsMicros(col(tsCol)))
      .withColumn("__gap",
        (lead(col("__t"), 1).over(byKey) - col("__t")).cast("double"))
      .where(col("__gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        avg(col("__gap")).as("__mu"),
        stddev_pop(col("__gap")).as("__sigma"))
      .where(col("n_gaps") >= minGaps)
      .select(col(keyCol), col("n_gaps"),
        col("__mu").as("mean_gap_us"),
        ((col("__sigma") - col("__mu")) / (col("__sigma") + col("__mu")))
          .as("burstiness"))
  }

  /**
   * Week-over-week audience overlap: Jaccard similarity of consecutive
   * weeks' DISTINCT active-key sets — the stickiness curve ("how much
   * of last week's audience came back"). Weeks are ⌊epoch-days / 7⌋
   * (the retentionCohorts grid — engine-replayable integer math).
   *
   * Shape: one distinct over (key, week) — the only corpus-sized
   * shuffle — then the consecutive-week intersection is an equi-join
   * of that slim frame with itself SHIFTED one week (join on key and
   * week+1), and per-week set sizes join in by week. All exact
   * integers; jaccard is one division — UNROUNDED. NTZ-proof.
   */
  def weekOverWeekOverlap(events: DataFrame, keyCol: String,
                          tsCol: String): DataFrame = {
    val kw = events
      .select(col(keyCol).as("__k"), Time.tsMicros(col(tsCol)).as("__us"))
      .withColumn("__w", expr("__us DIV 604800000000"))
      .select(col("__k"), col("__w")).distinct().persist()
    val sizes = kw.groupBy(col("__w")).agg(count(lit(1)).as("__n"))
    val inter = kw.select(col("__k"), col("__w"))
      .join(kw.select(col("__k"), (col("__w") - 1).as("__w")), Seq("__k", "__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__i"))
    sizes.select(col("__w"), col("__n").as("n_prev"))
      .join(sizes.select((col("__w") - 1).as("__w"), col("__n").as("n_next")),
        Seq("__w"))
      .join(inter, Seq("__w"), "left")
      .select(col("__w").as("week"), col("n_prev"), col("n_next"),
        coalesce(col("__i"), lit(0L)).as("n_both"),
        (coalesce(col("__i"), lit(0L)).cast("double") /
          (col("n_prev") + col("n_next") - coalesce(col("__i"), lit(0L)))
            .cast("double")).as("jaccard"))
  }

  /**
   * First-order Markov entropy of the event-type process, per source
   * state: H(s) = −Σ_t p(t|s)·ln p(t|s) over the observed transition
   * distribution ([[transitionMatrix]]), plus each state's share of
   * all transitions (the stationary weight Σ_s share·H(s) estimates
   * the process entropy rate — how predictable user behavior is).
   * Domain-sized aggregates over the transition frame; share is an
   * exact-int ratio.
   */
  def markovEntropy(events: DataFrame, userCol: String = "user_id",
                    tsCol: String = "ts", typeCol: String = "event_type",
                    tieCol: String = "event_id"): DataFrame = {
    val tm = transitionMatrix(events, userCol, tsCol, typeCol, tieCol)
    val g = tm.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_out"),
        (-sum(col("p") * log(col("p")))).as("entropy"))
    val tot = g.agg(sum(col("n_out")).as("__t"))
    g.crossJoin(broadcast(tot))
      .select(col("from_type"), col("n_out"),
        (col("n_out").cast("double") / col("__t").cast("double")).as("share"),
        col("entropy"))
  }

  /**
   * Retention cohort table — the product-analytics staple over an events
   * stream: users cohort by their FIRST-seen week, and each (cohort,
   * age-in-weeks) cell counts the distinct users active that week.
   * Weeks are ⌊days-since-epoch / 7⌋ of the UTC event date (a fixed
   * 7-day grid — no locale/week-start dependence, replayable by any
   * engine in integer arithmetic).
   *
   * Scale shape: one distinct over (user, week) — the only corpus-sized
   * shuffle — feeds a per-user min (partial-aggregated) that joins back
   * user-keyed; the cohort×age cell count then aggregates the slim
   * (user, week) frame. No Window; timestamps flow through
   * [[Time.tsMicros]] so TIMESTAMP and TIMESTAMP_NTZ inputs both work.
   */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val uw = events.select(col(userCol).as("__u"),
        Time.tsMicros(col(tsCol)).as("__m"))
      .select(col("__u"), expr("__m DIV 604800000000").as("__w")) // 7d of µs
      .distinct()
    val first = uw.groupBy(col("__u")).agg(min(col("__w")).as("__w0"))
    uw.join(first, Seq("__u"))
      .groupBy(col("__w0").as("cohort_week"),
        (col("__w") - col("__w0")).as("age_weeks"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Exact per-key EWMA of a value stream — the decayed "current level"
   * behind rate limiting, user-value scoring and drift monitors:
   * y₀ = x₀, yₜ = α·xₜ + (1−α)·yₜ₋₁ over each key's events ordered by
   * (event time, `tieCol`). A sequential recurrence, computed as ONE
   * left fold over the key's sorted event array (collect_list +
   * array_sort + `aggregate` — all codegen; no Window, no UDF): one
   * shuffle on the key, per-key memory proportional to that key's
   * events (the q51 per-group-buffer caveat — for unbounded keys use
   * the streaming state ops). Returns (key, n_events, ewma).
   *
   * Determinism: the fold applies α·x + (1−α)·acc left-to-right in
   * event order — the exact same IEEE operation sequence any engine's
   * ordered-list reduce replays; pick α with an exact binary
   * representation (0.25, 0.5) and the replay is bit-identical.
   * NTZ-proof via [[Time.tsMicros]].
   */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val arr = array_sort(collect_list(struct(
      Time.tsMicros(col(tsCol)).as("t"), col(tieCol).as("k"),
      col(valCol).cast("double").as("v"))))
    events
      .where(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(arr.as("__a"))
      .select(col(keyCol), size(col("__a")).cast("long").as("n_events"),
        // slice length must be exact: a start+Int.MaxValue length
        // overflows Slice's index arithmetic into an empty array
        aggregate(slice(col("__a"), lit(2), greatest(size(col("__a")) - 1, lit(0))),
          element_at(col("__a"), 1).getField("v"),
          (acc, e) => lit(alpha) * e.getField("v") + lit(1.0 - alpha) * acc)
          .as("ewma"))
  }

  /**
   * Union length of (possibly overlapping) time intervals per key — the
   * classic interval-merge sweep. Each event contributes the interval
   * [ts, ts + durationExpr µs); the result is one row per key with the
   * total covered microseconds, the merged-island count, and the span.
   *
   * Shape: ONE shuffle on the key; both window passes (running max of
   * prior interval ends → island flag; island ordinal) share the same
   * (key, start, tie) sort, so Spark plans a single Exchange + Sort and
   * the sweep runs in whole-stage codegen. Partitions are per-key —
   * bounded by the busiest key, never the corpus — so the plan survives
   * a 100× scale-up as long as no single key holds the whole table
   * (the same contract as sessionize). NTZ-proof via [[Time.tsMicros]].
   *
   * Determinism: ties on start break by `tieCol`; the running max and
   * the island sums are integer µs arithmetic — any engine replays them
   * exactly.
   */
  def intervalCoverage(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, durationMicros: org.apache.spark.sql.Column): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col("__s"), col(tieCol))
    val prior = byKey.rowsBetween(Window.unboundedPreceding, -1)
    val prefix = byKey.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("__s", Time.tsMicros(col(tsCol)))
      .withColumn("__e", col("__s") + durationMicros.cast("long"))
      .withColumn("__runend", max(col("__e")).over(prior))
      .withColumn("__new_island",
        when(col("__runend").isNull || col("__s") > col("__runend"), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new_island")).over(prefix))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__ie") - col("__is")).as("covered_micros"),
        count(lit(1)).as("n_islands"),
        (max(col("__ie")) - min(col("__is"))).as("span_micros"))
  }

  /**
   * Time-weighted average of a signal per key — trapezoidal integration
   * over consecutive samples: ∫v dt / ∫dt with v linear between events.
   * Keys with a single sample report that sample (zero-width integral).
   *
   * Shape: one key-partitioned window (lead of ts and value in event
   * order) + one partial-aggregated groupBy — the standard downsample
   * for irregular IoT/metrics streams, where a plain avg() over-weights
   * chatty periods. All arithmetic is a fixed IEEE sequence in event
   * order, so an oracle replays it exactly. NTZ-proof.
   */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, valCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col(tieCol))
    events
      .where(col(valCol).isNotNull)
      .withColumn("__t", Time.tsMicros(col(tsCol)))
      .withColumn("__v", col(valCol).cast("double"))
      .withColumn("__nt", lead(col("__t"), 1).over(byKey))
      .withColumn("__nv", lead(col("__v"), 1).over(byKey))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_samples"),
        sum(when(col("__nt").isNotNull,
          (col("__nv") + col("__v")) / 2.0 *
            (col("__nt") - col("__t")).cast("double"))).as("__area"),
        sum(when(col("__nt").isNotNull,
          (col("__nt") - col("__t")).cast("double"))).as("__dt"),
        // min, not first: deterministic for the single-sample (and the
        // degenerate all-same-instant) fallback
        min(col("__v")).as("__any"))
      .select(col(keyCol), col("n_samples"),
        when(col("__dt").isNotNull && col("__dt") > 0.0,
          col("__area") / col("__dt")).otherwise(col("__any")).as("twa"))
  }

  /**
   * Top event-type paths: sessionize ([[sessionize]] gap rule), take
   * each session's first `prefixLen` event types in (time, tie) order,
   * and count path frequencies — the product-analytics "what do
   * sessions look like" query. Returns the `topK` most frequent paths
   * as (path, n_sessions), ties broken by path asc.
   *
   * Shape: the per-session ordered prefix is a session-bounded
   * `array_sort(collect_list(struct))` + `slice` — no second Window
   * beyond the sessionizer's; path counting partial-aggregates; the
   * final top-k is a bounded sort+limit on the path-cardinality frame
   * (exponentially smaller than the corpus). NTZ-proof.
   */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               tieCol: String, typeCol: String, gapMinutes: Int,
               prefixLen: Int, topK: Int): DataFrame = {
    val arr = array_sort(collect_list(struct(
      Time.tsMicros(col(tsCol)).as("t"), col(tieCol).as("k"),
      col(typeCol).as("e"))))
    sessionize(events, gapMinutes, userCol, tsCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(arr.as("__a"))
      .select(concat_ws(">",
        transform(slice(col("__a"), 1, prefixLen), e => e.getField("e")))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  /**
   * Holt double-exponential smoothing (level + trend) per key — the
   * next step up from [[ewma]] for signals with drift. Recursion:
   * lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁); bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁,
   * initialized l₁ = x₁, b₁ = 0. Returns per key: n_events, level,
   * trend, forecast (= level + trend, the 1-step-ahead prediction).
   *
   * Exactly like ewma, the fold is ONE codegen'd array reduce over the
   * (time, tie)-ordered values — no Window, one key shuffle. The
   * accumulator is a 2-element double array [l, b] and every element
   * is padded to [x, 0], so the first fold step IS the initialization
   * and the whole chain is a fixed IEEE operation sequence any
   * engine's ordered list-fold replays bit-for-bit (pick α, β with
   * exact binary representations). NTZ-proof.
   */
  def holt(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0)
    val arr = array_sort(collect_list(struct(
      Time.tsMicros(col(tsCol)).as("t"), col(tieCol).as("k"),
      array(col(valCol).cast("double"), lit(0.0)).as("v"))))
    val lvl = (acc: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =>
      lit(alpha) * element_at(e, 1) +
        lit(1.0 - alpha) * (element_at(acc, 1) + element_at(acc, 2))
    events
      .where(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(arr.as("__a"))
      .select(col(keyCol), size(col("__a")).cast("long").as("n_events"),
        aggregate(
          slice(col("__a"), lit(2), greatest(size(col("__a")) - 1, lit(0))),
          element_at(col("__a"), 1).getField("v"),
          (acc, s) => {
            val e = s.getField("v")
            array(lvl(acc, e),
              lit(beta) * (lvl(acc, e) - element_at(acc, 1)) +
                lit(1.0 - beta) * element_at(acc, 2))
          }).as("__lb"))
      .select(col(keyCol), col("n_events"),
        element_at(col("__lb"), 1).as("level"),
        element_at(col("__lb"), 2).as("trend"),
        (element_at(col("__lb"), 1) + element_at(col("__lb"), 2))
          .as("forecast"))
  }

  /**
   * Per-key linear interpolation of missing values — the sensor-data
   * gap filler. A null sample takes
   * pv + (nv − pv)·(t − pt)/(nt − pt) between its nearest non-null
   * neighbors in (time, tie) order; leading gaps backfill (NOCB),
   * trailing gaps carry forward (LOCF), keys with no observed value
   * stay null. Adds `filled` + a `fill_kind` tag
   * (observed|interp|locf|nocb|none).
   *
   * Shape: two IGNORE NULLS navigation windows over ONE (key, t, tie)
   * sort — the conditional (value, ts) pairs go null together, so the
   * LOCF/NOCB reads are consistent row pairs. NTZ-proof.
   */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              tieCol: String, valCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col(tieCol))
    val past = byKey.rowsBetween(Window.unboundedPreceding, -1)
    val future = byKey.rowsBetween(1, Window.unboundedFollowing)
    val obsV = when(col(valCol).isNotNull, col(valCol).cast("double"))
    val obsT = when(col(valCol).isNotNull, col("__t"))
    events
      .withColumn("__t", Time.tsMicros(col(tsCol)))
      // one projection → Spark collapses same-frame expressions into a
      // single Window node per frame (two total), one shared sort
      .select(col("*"),
        last(obsV, ignoreNulls = true).over(past).as("__pv"),
        last(obsT, ignoreNulls = true).over(past).as("__pt"),
        first(obsV, ignoreNulls = true).over(future).as("__nv"),
        first(obsT, ignoreNulls = true).over(future).as("__nt"))
      .withColumn("filled",
        when(col(valCol).isNotNull, col(valCol).cast("double"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              (col("__t") - col("__pt")).cast("double") /
              (col("__nt") - col("__pt")).cast("double"))
          .when(col("__pv").isNotNull, col("__pv"))
          .when(col("__nv").isNotNull, col("__nv")))
      .withColumn("fill_kind",
        when(col(valCol).isNotNull, "observed")
          .when(col("__pv").isNotNull && col("__nv").isNotNull, "interp")
          .when(col("__pv").isNotNull, "locf")
          .when(col("__nv").isNotNull, "nocb")
          .otherwise("none"))
      .drop("__pv", "__pt", "__nv", "__nt")
  }

  /**
   * Rolling median of the last `nEvents` samples per key — the robust
   * sibling of a moving average (spikes shift a mean, not a median).
   * The frame is ROWS-bounded, so the per-row buffer is ≤ nEvents
   * values: `collect_list` over the sliding frame + an interpolated
   * (type-7) middle — matching `quantile_cont` semantics, so an oracle
   * replays it exactly. One key shuffle, one Window node; partial
   * frames at the start of each key use the available rows (standard
   * rolling semantics). NTZ-proof.
   */
  def rollingMedian(events: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valCol: String, nEvents: Int): DataFrame = {
    require(nEvents >= 1)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col(tieCol))
      .rowsBetween(-(nEvents - 1).toLong, 0L)
    events
      .where(col(valCol).isNotNull)
      .withColumn("__t", Time.tsMicros(col(tsCol)))
      .withColumn("__a",
        array_sort(collect_list(col(valCol).cast("double")).over(w)))
      .select(col(keyCol), col(tieCol), col("__t"),
        size(col("__a")).cast("long").as("n_in_window"),
        // element_at needs INT positions; the double divisions are exact
        // for these small frame sizes
        when(size(col("__a")) % 2 === 1,
          element_at(col("__a"),
            ((size(col("__a")) + 1) / 2).cast("int")))
          .otherwise((element_at(col("__a"),
            (size(col("__a")) / 2).cast("int")) +
            element_at(col("__a"),
              (size(col("__a")) / 2).cast("int") + 1)) / 2.0)
          .as("rolling_median"))
  }

  /**
   * Rolling distinct actives: for every day D, the number of DISTINCT
   * keys with at least one event in the trailing `windowDays`-day
   * window [D − windowDays + 1, D] — the DAU/WAU/MAU family, exact.
   *
   * Sliding distinct counts resist windowing (distinct doesn't
   * decompose over overlapping frames), but the COVER trick makes it
   * two ordinary aggregations: reduce to distinct (key, day) — one
   * row per key-day, the only corpus-sized shuffle — then each key-day
   * covers the `windowDays` output days it contributes to (a bounded
   * ×windowDays explode of the already-slim frame), distinct again,
   * and count per day. No window function at all, fully partial-
   * aggregated; output days run to max(day) + windowDays − 1 (windows
   * whose trailing span still contains data). NTZ-proof.
   */
  def rollingDistinct(events: DataFrame, keyCol: String, tsCol: String,
                      windowDays: Int): DataFrame = {
    require(windowDays >= 1)
    // integer DIV, not `/`: epoch µs exceed double's exact range
    val keyDays = events
      .select(col(keyCol).as("__k"), Time.tsMicros(col(tsCol)).as("__us"))
      .withColumn("__d", expr("__us DIV 86400000000"))
      .select(col("__k"), col("__d"))
      .distinct()
    keyDays
      .select(col("__k"),
        explode(sequence(col("__d"), col("__d") + lit(windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"))
  }

  /**
   * Last-touch attribution: each conversion event is credited to the
   * latest touch event of the same key at-or-before it, provided the
   * touch is within `lookbackMicros`. Returns per-(touch type) credit
   * counts plus the unattributed bucket (`touch_type` null).
   *
   * Built ON the engine's as-of join ([[AsOf.join]] backward) — one
   * union + one key-partitioned LOCF window, no per-conversion scan of
   * the touch history. The lookback filter runs AFTER the as-of match
   * (the match is the latest touch; if the latest is stale, older ones
   * are staler), which keeps it a post-window projection. NTZ-proof:
   * the ts columns are normalized to µs before the join.
   *
   * `idCol` names the unique per-event id used for the conversion id
   * and the same-instant touch tiebreak (defaults to "event_id" for the
   * harness events table — parameterized like every other column so the
   * operator works on any frame with a unique event key).
   */
  def lastTouchAttribution(events: DataFrame, keyCol: String, tsCol: String,
                           typeCol: String, conversionType: String,
                           touchTypes: Seq[String],
                           lookbackMicros: Long,
                           idCol: String = "event_id"): DataFrame = {
    val base = events.withColumn("__t", Time.tsMicros(col(tsCol)))
    val conversions = base.where(col(typeCol) === conversionType)
      .select(col(keyCol), col("__t"), col(idCol).as("conv_id"))
    // collapse same-instant touches (max id wins) so the as-of
    // LOCF has a unique right row per (key, ts) — deterministic match
    val touches = base.where(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(keyCol), col("__t"))
      .agg(max(struct(col(idCol), col(typeCol))).as("__w"))
      .select(col(keyCol), col("__t"),
        col("__w").getField(typeCol).as("__touch_type"),
        col("__t").as("__touch_t"))
    AsOf.join(conversions, touches, Seq(keyCol), "__t")
      .withColumn("touch_type",
        when(col("__touch_t").isNotNull &&
          col("__t") - col("__touch_t") <= lookbackMicros,
          col("__touch_type")))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        countDistinct(col(keyCol)).as("n_users"))
  }
}
