package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics in batch form (SURVEY.md C14): tumbling-window
  * aggregation, gap-based sessionization, JSON property extraction.
  * The same transforms are Structured-Streaming-compatible (`window()` +
  * watermark) if the source becomes `readStream`.
  *
  * Scale posture: both operators are a single shuffle on the series key;
  * sessionization keeps only one lag row of state per key per task.
  */
object EventOps {

  /** Tumbling-window aggregation per user: Spark's `window()` function —
    * identical semantics to a streaming windowed aggregation. Window start
    * is emitted as epoch-aligned (origin 1970-01-01) like streaming windows.
    */
  def tumblingWindowStats(df: DataFrame, keyCol: String, tsCol: String, valueCol: String, width: String): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), width).as("win"))
      .agg(
        count(lit(1)).as("n_events"),
        Portable.decSum(col(valueCol)).as("sum_value"))
      .select(
        col(keyCol),
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n_events"),
        col("sum_value"))

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event exceeds `gapSeconds`. Pure window-function form — one
    * shuffle, no iterative driver logic. The window orders by the timestamp
    * itself with `orderCol` as a unique tiebreaker, so gaps are always
    * computed in time order (round-1 defect: ordering by orderCol alone
    * could disagree with time order and produce negative gaps).
    * unix_timestamp truncates to whole seconds — sub-second gaps are
    * intentionally below the resolution of `gapSeconds`.
    */
  def sessionize(df: DataFrame, keyCol: String, orderCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(orderCol).asc)
    val epoch = unix_timestamp(col(tsCol))
    val prevEpoch = lag(epoch, 1).over(w)
    val isNew = when(prevEpoch.isNull || (epoch - prevEpoch) > gapSeconds, 1).otherwise(0)
    df.withColumn("session_seq", sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Extract a typed field from a JSON string column (SURVEY.md C2/C13 —
    * `events.props` like {"k": 87}).
    */
  def jsonField(df: DataFrame, jsonCol: String, path: String, asType: String): DataFrame =
    df.withColumn("json_value", get_json_object(col(jsonCol), path).cast(asType))

  /** Hopping (sliding) window aggregation: windows of `width` starting
    * every `slide` — each event lands in width/slide overlapping windows
    * (Spark's `window(ts, width, slide)` expands the event via an internal
    * generator, then aggregates; the expansion factor is the overlap
    * count, bounded and known at plan time). The streaming-compatible
    * twin of tumblingWindowStats for overlap analytics (rolling rates,
    * smoothing).
    */
  def hoppingWindowStats(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                         width: String, slide: String): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), width, slide).as("win"))
      .agg(
        count(lit(1)).as("n_events"),
        Portable.decSum(col(valueCol)).as("sum_value"))
      .select(
        col(keyCol),
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n_events"),
        col("sum_value"))

  /** Sequential funnel analysis: for each user, the earliest time of step
    * i AT OR AFTER their recorded step i−1 time (ties allowed — equal
    * timestamps progress the funnel), plus how many steps were reached.
    * One row per user who completed step 0; `step_ts_i` is null from the
    * first uncompleted step on.
    *
    * Shape: per step, one type-filtered scan (the predicate pushes to the
    * source) joined to the previous stage on the user key and
    * min-aggregated — steps run over ever-shrinking cohorts, and every
    * join/agg shuffles on the user key, so the whole funnel reuses one
    * partitioning. No window over the full event stream.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = df.select(col(userCol), col(tsCol), col(typeCol))
    var stage = ev.where(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("step_ts_0"))
    val stages = scala.collection.mutable.ArrayBuffer(stage)
    steps.indices.tail.foreach { i =>
      stage = ev.where(col(typeCol) === steps(i))
        .join(stage.select(col(userCol), col(s"step_ts_${i - 1}")), Seq(userCol))
        .where(col(tsCol) >= col(s"step_ts_${i - 1}"))
        .groupBy(userCol).agg(min(tsCol).as(s"step_ts_$i"))
      stages += stage
    }
    val joined = stages.tail.zipWithIndex.foldLeft(stages.head) { case (acc, (st, idx)) =>
      acc.join(st, Seq(userCol), "left")
    }
    val reached = steps.indices.tail
      .map(i => when(col(s"step_ts_$i").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    joined.withColumn("reached", reached)
  }

  /** Interval (range) join, bucketed: match fact rows whose timestamp
    * falls inside `[startCol, endCol]` of an intervals table. A naive
    * `ts BETWEEN start AND end` join has no equi-key, so Spark plans a
    * broadcast-nested-loop — O(fact × intervals), a scale-killer. This is
    * the standard rewrite: quantize time into `bucketSeconds` buckets,
    * explode each interval onto every bucket it overlaps (bounded fan-out:
    * ⌈len/bucket⌉+1 rows per interval), equi-join on the bucket, then
    * refine with the exact range predicate. Each (fact, interval) pair
    * matches in exactly one bucket — the fact's own — so no dedup pass is
    * needed. With `bucketSeconds` ≈ the typical interval length the
    * fan-out is ≤ 2×, and the join is an ordinary shuffled/broadcast hash
    * join that scales like any equi-join.
    */
  def intervalJoinBucketed(fact: DataFrame, factTsCol: String,
                           intervals: DataFrame, startCol: String, endCol: String,
                           bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val fb = fact.withColumn("_bucket",
      floor(unix_timestamp(col(factTsCol)) / bucketSeconds))
    val ib = intervals.withColumn("_bucket",
      explode(sequence(floor(unix_timestamp(col(startCol)) / bucketSeconds),
                       floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    fb.join(ib, Seq("_bucket"))
      .where(col(factTsCol) >= col(startCol) && col(factTsCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Weekly cohort retention: users bucketed by first-seen week, then
    * distinct-user counts per (cohort_week, week_offset) — the retention
    * matrix every product-analytics stack ships. Three aggregations, all
    * keyed on (user, week) or coarser; week alignment means the offset
    * division is always exact. The initial distinct collapses the event
    * stream to one row per (user, week) BEFORE any join, so the heavy
    * input is touched once.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekly = df.select(col(userCol), date_trunc("week", col(tsCol)).as("w")).distinct()
    val cohort = weekly.groupBy(userCol).agg(min(col("w")).as("cohort_week"))
    weekly.join(cohort, Seq(userCol))
      .groupBy(col("cohort_week"),
        floor(datediff(col("w"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Consecutive-day activity streaks per user — the gaps-and-islands
    * window idiom. Distinct active days first (the one heavy collapse),
    * then island id = day − row_number() days (constant within a run of
    * consecutive dates), then one aggregate per island and one per user.
    * Everything after the initial distinct is keyed on the user, so the
    * whole chain rides a single exchange; per-row window state is O(1).
    */
  def activityStreaks(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = df.select(col(userCol), to_date(col(tsCol)).as("d")).distinct()
    val w = Window.partitionBy(userCol).orderBy(col("d").asc)
    val islands = days
      .withColumn("_island", date_sub(col("d"), row_number().over(w)))
      .groupBy(col(userCol), col("_island"))
      .agg(count(lit(1)).as("len"), min(col("d")).as("streak_start"))
    islands.groupBy(userCol)
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
  }

  /** Per-user burstiness of inter-event gaps — Goh & Barabási's
    * B = (σ − μ)/(σ + μ) over the microsecond gaps between a user's
    * consecutive events (+1 periodic clock, 0 Poisson, →1 heavy-tailed
    * bursts) — the temporal-pattern diagnostic that separates bot-like
    * schedulers from human sessions at a glance.
    *
    * Numeric contract: gaps are exact integer microseconds
    * (`unix_micros` both engines); Σg stays a long, Σg² is summed in
    * decimal(38,0) (a microsecond gap squares past 2^63) so both moment
    * sums are EXACT, and μ/σ/B are then fixed-shape IEEE doubles on
    * bit-identical inputs — the whole row hash-checks. Variance uses
    * E[g²] − μ² guarded non-negative (catastrophic cancellation on
    * near-constant gaps).
    *
    * Scale shape: one per-user ordered window (lag) riding the same
    * exchange as the final per-user aggregate — one shuffle total, O(1)
    * window state per row, no global ordering anywhere.
    */
  def burstiness(df: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, minGaps: Long = 2L): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val us = unix_micros(col(tsCol))
    val gap = (us - lag(us, 1).over(w)).as("_g")
    val gaps = df.select(col(userCol), gap).where(col("_g").isNotNull)
    val agg = gaps.groupBy(userCol).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("_g")).as("_sg"),
      sum(col("_g").cast("decimal(20,0)") * col("_g")).as("_sg2"))
    burstinessFromMoments(agg, userCol, minGaps)
  }

  /** Shared finalization for [[burstiness]] and the streaming moment
    * state: the fixed-shape double combination over exact (n_gaps, Σg,
    * Σg²) moments. Both paths produce bit-identical moments, so routing
    * them through one projection makes streamed and batch rows equal by
    * construction.
    */
  private[graft] def burstinessFromMoments(agg: DataFrame, userCol: String,
                                           minGaps: Long): DataFrame = {
    val n = col("n_gaps").cast("double")
    val mu = col("_sg").cast("double") / n
    val variance = greatest(col("_sg2").cast("double") / n - mu * mu, lit(0.0))
    val sigma = sqrt(variance)
    agg.where(col("n_gaps") >= minGaps)
      .select(col(userCol), col("n_gaps"),
        round(mu, 3).as("mean_gap_us"),
        // Guard the all-gaps-zero group (sigma + mu = 0): Spark's double
        // 0/0 yields NULL while DuckDB IEEE division yields NaN — emit
        // NULL explicitly in both engines (oracle mirrors the CASE).
        // pround: burstiness is signed, so round(-eps) needs -0.0 canon.
        when(sigma + mu > 0,
          Portable.pround((sigma - mu) / (sigma + mu), 6)).as("burstiness"))
  }

  /** RFM segmentation: per-user recency (days since last event, against
    * the corpus max date), frequency (event count) and monetary (exact
    * decimal-summed value), each scored into quintiles 1–5 — the classic
    * behavioral-segmentation primitive (churn targeting, whale
    * detection) with `segment` = r·100 + f·10 + m.
    *
    * The quintile boundaries come from the C126 portable histogram
    * sketch over the per-user metric frames (constant group) — NOT from
    * ntile, whose global sort would put every user through one
    * partition at 100 TB user cardinalities. Boundaries are the
    * UNROUNDED fixed-shape interpolations (histogramQuantilesRaw), so
    * the comparisons are engine-identical; each score is
    * 1 + Σ [metric > boundary_q] — a broadcast 1-row join + three
    * codegen'd comparisons per user row. Deterministic: all inputs to
    * every comparison are exact counts, integer day diffs, or decimal
    * sums.
    *
    * Score orientation: every score is the ASCENDING-value quintile
    * index — r_score 1 = most recent (recency_days small), f/m_score 5
    * = most frequent / highest spend. Callers wanting the inverted
    * marketing convention for recency apply 6 - r_score.
    */
  def rfmSegments(df: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, nBins: Int = 128): DataFrame = {
    val ref = df.agg(max(to_date(col(tsCol))).as("_ref"))
    // Materialized EAGERLY (the triangleCounts caveat: plan construction
    // runs a job): the per-user frame feeds three boundary histograms
    // (two passes each) plus the final scoring join — seven consumers
    // that would otherwise each rescan the raw event log. One
    // user-catalog-sized frame, the same state class as kCore's degree
    // frames.
    val per = df.groupBy(userCol).agg(
      max(to_date(col(tsCol))).as("_last"),
      count(lit(1)).as("frequency"),
      Portable.decSum(col(valueCol).cast("double"), 4).as("_mon"))
      .crossJoin(broadcast(ref))
      .withColumn("recency_days", datediff(col("_ref"), col("_last")).cast("long"))
      .localCheckpoint(true)
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    // ONE grouped histogram pass over the three metrics stacked as
    // (metric, value) — each group's sketch is computed independently so
    // the boundaries are identical to three separate passes, at a third
    // of the pipeline cost.
    val metrics = per
      .select(lit("r").as("_m"), col("recency_days").cast("double").as("_v"))
      .unionByName(per.select(lit("f").as("_m"), col("frequency").cast("double").as("_v")))
      .unionByName(per.select(lit("m").as("_m"), col("_mon").as("_v")))
    val pivots = for (m <- Seq("r", "f", "m"); q <- qs)
      yield max(when(col("_m") === m && col("q") === q, col("_est_raw")))
        .as(s"_${m}b${(q * 100).round}")
    val bounds = Profiling.histogramQuantilesRaw(metrics, Seq("_m"), "_v", nBins, qs)
      .agg(pivots.head, pivots.tail: _*)
    def score(c: Column, prefix: String): Column =
      lit(1) + qs.map(q => when(c > col(s"$prefix${(q * 100).round}"), 1).otherwise(0))
        .reduce(_ + _)
    per
      .crossJoin(broadcast(bounds))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("_mon").as("monetary"),
        score(col("recency_days").cast("double"), "_rb").as("r_score"),
        score(col("frequency").cast("double"), "_fb").as("f_score"),
        score(col("_mon"), "_mb").as("m_score"))
      .withColumn("segment",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("long"))
  }

  /** First-touch / last-touch attribution: for every conversion event,
    * the first and the most recent PRECEDING non-conversion event type
    * of the same user — the channel-credit primitive marketing analytics
    * runs on every touch log. One per-user ordered window carrying both
    * ignore-null extremes (first_value/last_value over the unbounded-
    * preceding frame), O(1) state per row, conversions with no prior
    * touch keep NULLs (they are data, not an error).
    */
  def touchAttribution(df: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String, convType: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= convType, col(typeCol))
    df.select(col(tieCol), col(userCol), col(typeCol),
        first(touch, ignoreNulls = true).over(w).as("first_touch"),
        last(touch, ignoreNulls = true).over(w).as("last_touch"))
      .where(col(typeCol) === convType)
      .drop(typeCol)
  }

  /** Top-1 Markov baseline accuracy: train the order-1 transition
    * argmax on the corpus's own event sequences (ties count-desc then
    * type-asc — deterministic in any engine) and score it in-sample —
    * the sanity floor every sequence model must beat before its lift
    * means anything, and the evaluation layer over C98's transition
    * matrix. Per source state: the predicted next type, transition
    * count, hits, and accuracy (one exact division).
    *
    * Scale shape: one per-user ordered window (the same lag exchange as
    * C98), one (state, state)-sized count table whose argmax row set is
    * state-CATALOG-sized and broadcasts into the transition stream —
    * the corpus-sized side never reshuffles.
    */
  def markovTopPredAccuracy(df: DataFrame, userCol: String, tsCol: String,
                            tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val trans = df
      .select(col(typeCol).as("_prev"),
        lead(col(typeCol), 1).over(w).as("_next"))
      .where(col("_next").isNotNull)
    val counts = trans.groupBy("_prev", "_next").agg(count(lit(1)).as("_c"))
    val wp = Window.partitionBy("_prev").orderBy(col("_c").desc, col("_next").asc)
    val pred = counts.withColumn("_rn", row_number().over(wp))
      .where(col("_rn") === 1)
      .select(col("_prev"), col("_next").as("predicted_next"))
    trans.join(broadcast(pred), Seq("_prev"))
      .groupBy(col("_prev").as("prev_type"), col("predicted_next"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("_next") === col("predicted_next"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("prev_type"), col("predicted_next"), col("n_transitions"),
        col("n_correct"),
        round(col("n_correct").cast("double") / col("n_transitions").cast("double"), 6)
          .as("accuracy"))
  }

  /** Per-user gap moments of ONE time-contiguous event segment — the
    * mergeable state behind streaming burstiness: (n_events, first_us,
    * last_us, Σg, Σg²) forms a monoid under segment concatenation
    * (left ⊕ right adds the BRIDGE gap first_right − last_left, and
    * (n_l−1) + (n_r−1) + 1 bridge = n_l+n_r−1 keeps the gap count
    * consistent), so per-batch moments fold into a running total without
    * ever revisiting raw events. Exactness contract as [[burstiness]]:
    * Σg long, Σg² decimal(38,0).
    */
  private[graft] def gapSegmentMoments(df: DataFrame, userCol: String,
                                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val us = unix_micros(col(tsCol))
    df.select(col(userCol), us.as("_us"),
        (us - lag(us, 1).over(w)).as("_g"))
      .groupBy(userCol).agg(
        count(lit(1)).as("n_events"),
        min("_us").as("first_us"),
        max("_us").as("last_us"),
        coalesce(sum(col("_g")), lit(0L)).as("_sg"),
        coalesce(sum(col("_g").cast("decimal(20,0)") * col("_g")),
          lit(0L).cast("decimal(38,0)")).as("_sg2"))
  }

  /** Entropy rate of the empirical event-type Markov chain: H = Σ_i π_i
    * H(row i) with π the empirical from-state frequencies — the
    * per-step predictability of the behavior stream in nats (0 =
    * deterministic scripting, ln|types| = uniform noise; the
    * distribution-level reading of [[markovTopPredAccuracy]]'s
    * pointwise top-1 score). One row per from-state (n_from, π, row
    * entropy) with the rolled-up rate repeated.
    *
    * Rides the same transition shape as the transition-matrix operator:
    * one lead window per entity, one hash agg to the |types|² matrix;
    * −p·ln p terms and the π-weighted rate decimal-sum.
    */
  def markovEntropyRate(df: DataFrame, userCol: String, tsCol: String,
                        orderCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val trans = df
      .select(col(userCol), col(typeCol),
        lead(col(typeCol), 1).over(w).as("_next"))
      .where(col("_next").isNotNull)
      .groupBy(col(typeCol), col("_next")).agg(count(lit(1)).as("_t"))
      .withColumn("_ft", sum(col("_t")).over(Window.partitionBy(typeCol)))
    val p = col("_t").cast("double") / col("_ft").cast("double")
    val perState = trans.groupBy(typeCol)
      .agg(max("_ft").as("_ft"), Portable.decSum(-p * log(p), 12).as("_h"))
    val tot = perState.agg(sum("_ft").as("_tot"))
    val withPi = perState.crossJoin(broadcast(tot))
      .select(col(typeCol), col("_ft"),
        (col("_ft").cast("double") / col("_tot").cast("double")).as("_pi"),
        col("_h"))
    val rate = withPi.agg(Portable.decSum(col("_pi") * col("_h"), 12).as("_rate"))
    withPi.crossJoin(broadcast(rate))
      .select(col(typeCol), col("_ft").as("n_from"),
        round(col("_pi"), 9).as("pi"), round(col("_h"), 9).as("h_state"),
        round(col("_rate"), 9).as("entropy_rate"))
      .orderBy(typeCol)
  }

  /** Length-3 sequential-pattern support mining (the PrefixSpan instinct,
    * Pei et al. 2001, specialized to the bounded-catalog/length-3 case):
    * support of (a, b, c) = how many entities' streams contain an
    * a-event, then a b-event, then a c-event as a SUBSEQUENCE (gaps
    * allowed) in `orderCol` order. The mining complement of [[funnel]]:
    * funnel counts a GIVEN sequence, this discovers which sequences are
    * frequent. Top `topK` out, ties on the full pattern key.
    *
    * The subsequence test collapses to spans twice: (a,b,c) occurs iff
    * the entity's LAST c lies strictly after its EARLIEST b-event that
    * follows its FIRST a (the greedy-matching equivalence) — so one
    * (entity, type) min/max aggregate, an a-span join whose fan the
    * per-entity (a, b) MIN aggregation absorbs map-side, and a c-span
    * join over the ≤ catalog²-per-entity frame replace any scan over
    * the exponential subsequence space (and the row-scale distinct a
    * direct formulation needs). All counts exact integers; top-k is
    * TakeOrderedAndProject on (support desc, pattern asc) — total
    * order, no ambiguous boundary.
    */
  def sequencePatterns(df: DataFrame, userCol: String, orderCol: String,
                       typeCol: String, topK: Int): DataFrame = {
    val e = df.select(col(userCol).as("_u"), col(orderCol).as("_t"),
      col(typeCol).as("_y"))
    val spans = e.groupBy("_u", "_y")
      .agg(min("_t").as("_mn"), max("_t").as("_mx"))
    val firstBAfterA = e
      .join(spans.select(col("_u"), col("_y").as("type_a"), col("_mn")), Seq("_u"))
      .where(col("_mn") < col("_t"))
      .groupBy(col("_u"), col("type_a"), col("_y").as("type_b"))
      .agg(min("_t").as("_tb"))
    firstBAfterA
      .join(spans.select(col("_u"), col("_y").as("type_c"), col("_mx")), Seq("_u"))
      .where(col("_mx") > col("_tb"))
      .groupBy("type_a", "type_b", "type_c")
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("type_a").asc, col("type_b").asc,
        col("type_c").asc)
      .limit(topK)
  }

  /** Multi-touch attribution — the fractional-credit counterpart of
    * [[touchAttribution]]'s first/last picks: every conversion splits one
    * unit of credit over the touches in ITS segment (the events since the
    * user's previous conversion), under two standard models at once:
    * linear (1/n each) and U-shaped (40% first, 40% last, the middle
    * 20% split over the interior; n=1 → 1.0, n=2 → 0.5/0.5). Credits
    * roll up per touch type — the budget-allocation view of the same
    * event stream.
    *
    * Engine parity: each credit is one double division on exact integer
    * counts, decimal-summed across conversions. Segment membership and
    * positions come from the (ts, tie) order both engines share.
    *
    * Scale shape: ONE user-keyed exchange serves the conversion-counting
    * window; the segment join is user-local (conversion ordinals); the
    * per-segment position/size windows ride the same user hash; the
    * rollup output is touch-catalog-sized.
    */
  def multiTouchAttribution(df: DataFrame, userCol: String, tsCol: String,
                            tieCol: String, typeCol: String,
                            convType: String): DataFrame = {
    val w = Window.partitionBy("_u")
      .orderBy(col("_ts").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val base = df.select(col(userCol).as("_u"), col(tsCol).as("_ts"),
        col(tieCol).as("_tie"), col(typeCol).as("_ty"),
        (col(typeCol) === convType).as("_conv"))
      .withColumn("_cum",
        sum(when(col("_conv"), 1L).otherwise(0L)).over(w))
    // a touch with c prior-or-current conversions belongs to conversion
    // ordinal c+1; the conversion row itself carries its own ordinal
    val touches = base.where(!col("_conv"))
      .select(col("_u"), (col("_cum") + 1).as("_cid"),
        col("_ts"), col("_tie"), col("_ty"))
    val convs = base.where(col("_conv")).select(col("_u"), col("_cum").as("_cid"))
    val seg = touches.join(convs, Seq("_u", "_cid")) // only converted segments
    val ws = Window.partitionBy("_u", "_cid")
      .orderBy(col("_ts").asc, col("_tie").asc)
    val withPos = seg
      .withColumn("_pos", row_number().over(ws))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("_u", "_cid")))
    val linear = lit(1.0) / col("_n")
    val uShape = when(col("_n") === 1, lit(1.0))
      .when(col("_n") === 2, lit(0.5))
      .when(col("_pos") === 1 || col("_pos") === col("_n"), lit(0.4))
      .otherwise(lit(0.2) / (col("_n") - 2))
    withPos.groupBy(col("_ty").as("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        round(Portable.decSum(linear, 12), 6).as("linear_credit"),
        round(Portable.decSum(uShape, 12), 6).as("u_credit"))
  }

  /** Daily user-growth curve: per day, the distinct active users, the
    * NEW users (first ever event that day), and the cumulative user
    * count — the corpus-growth read every ingestion pipeline tracks
    * (new vs returning decomposition; a day where active ≈ new is
    * acquisition, active ≫ new is retention).
    *
    * Scale shape: one (user) aggregate for first-seen days, one
    * (day, user) distinct for actives — both map-side combinable — then
    * day-catalog-sized frames only; the cumulative window is global but
    * runs over the bounded day catalog, never over rows.
    */
  def userGrowth(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstDay = df.groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val active = df.select(to_date(col(tsCol)).as("day"), col(userCol))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("n_active"))
    active.join(firstDay, Seq("day"), "left")
      .na.fill(0L, Seq("n_new"))
      .withColumn("cum_users", // day-catalog-sized cumulative window
        sum("n_new").over(Portable.kRowWindow(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"), col("cum_users"))
  }

  /** Two-proportion z-test on conversion by deterministic cohort — the
    * A/B primitive for RATES ([[graft.ops.Profiling.welchTTest]] is the
    * means sibling): did cohort A's conversion rate differ from B's?
    * z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) with the pooled p̂. Exact
    * integer counts; the z chain is fixed double arithmetic; degenerate
    * cohorts (empty, or pooled rate 0/1 — no variance) emit NULL.
    *
    * The flags are evaluated per event and OR-reduced per user (max), so
    * the test counts USERS; pass a user-deterministic `cohortFlag` (a
    * hash of the user id, an assignment-table lookup) — a flag that
    * varies within a user would silently land that user in cohort A.
    */
  def abProportionTest(df: DataFrame, userCol: String, cohortFlag: Column,
                       convFlag: Column): DataFrame = {
    val perUser = df.groupBy(col(userCol))
      .agg(max(cohortFlag.cast("boolean")).as("_a"),
        max(convFlag.cast("boolean")).as("_conv"))
    val agged = perUser.agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_a") && col("_conv"), 1L).otherwise(0L)).as("conv_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("_a") && col("_conv"), 1L).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se2 = pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))
    agged.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0, round(pa, 9)).as("rate_a"),
      when(col("n_b") > 0, round(pb, 9)).as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && se2 > 0,
        Portable.pround((pa - pb) / sqrt(se2), 6)).as("z_stat"))
  }

  /** Kaplan–Meier survival estimate of user lifetime (Kaplan & Meier
    * 1958) with right-censoring: lifetime = days between a user's first
    * and last event; users whose last event falls within `censorDays` of
    * the corpus's last day are CENSORED (still alive — their lifetime is
    * a lower bound), not churned. S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over
    * observed lifetimes — the churn curve that does not pretend active
    * users already died (a naive lifetime histogram biases every cohort
    * younger than the corpus).
    *
    * Engine parity: the curve is a bounded catalog (≤ the corpus's day
    * span), so the running product folds LEFT-TO-RIGHT over the sorted
    * per-lifetime rows inside one collected array (Spark `aggregate` =
    * DuckDB `list_reduce`, the q_holt list-accumulator pattern) — never
    * exp/ln round-trips, never a windowed product whose association an
    * engine may tree-shape. Every nᵢ, dᵢ is an exact integer; each
    * factor is one double division.
    *
    * Scale shape: one user-keyed aggregate collapses the corpus to one
    * row per user; one lifetime-keyed aggregate collapses that to the
    * day-span catalog; the fold runs on ONE collected row of that
    * catalog (the kMeansCentroids sanctioned model-sized shape).
    */
  /** Shared right-censored lifetime table for [[kaplanMeier]] /
    * [[nelsonAalen]]: one row per distinct lifetime bucket with churn
    * and censor counts (lifetime = whole `unitDays` between a unit's
    * first and last event; units whose last event falls within
    * `censorDays` of the corpus edge are censored, not churned).
    */
  private def lifeTable(df: DataFrame, userCol: String, tsCol: String,
                        censorDays: Int, unitDays: Int): DataFrame =
    lifeTableFromSpan(perUserSpan(df, userCol, tsCol), censorDays, unitDays)

  /** Per-unit (first, last) DATE span — the survival shelf's complete
    * sufficient statistic: every read (KM, Nelson–Aalen, log-rank, Cox)
    * is a pure function of this table, and (min, max) over dates is an
    * additive monoid (date casting is monotone, so per-batch mins/maxes
    * merge to the global span exactly) — which is what lets the
    * streaming SurvivalState serve the whole shelf bit-identically.
    */
  private[graft] def perUserSpan(df: DataFrame, userCol: String,
                                 tsCol: String): DataFrame =
    df.groupBy(col(userCol).as("_u"))
      .agg(to_date(min(col(tsCol))).as("_f"), to_date(max(col(tsCol))).as("_l"))

  private[graft] def lifeTableFromSpan(span: DataFrame, censorDays: Int,
                                       unitDays: Int): DataFrame = {
    val gmax = span.agg(max("_l").as("_gmax"))
    span.crossJoin(broadcast(gmax))
      .select((datediff(col("_l"), col("_f")).cast("long") / unitDays)
          .cast("long").as("_life"), // int floor-div: datediff >= 0
        (col("_l") < date_sub(col("_gmax"), censorDays)).as("_churn"))
      .groupBy("_life")
      .agg(sum(when(col("_churn"), 1L).otherwise(0L)).as("_d"),
        sum(when(!col("_churn"), 1L).otherwise(0L)).as("_c"))
  }

  /** Nelson–Aalen cumulative hazard (r18b) — the survival shelf's third
    * member (C221's KM estimates the survival CURVE by products, C292's
    * log-rank TESTS two curves; Nelson–Aalen estimates the cumulative
    * HAZARD H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ by sums — the additive form whose
    * slope reads as the churn INTENSITY per lifetime bucket, the
    * quantity a retention intervention is aimed at, and the
    * lower-variance estimator at small risk sets).
    *
    * Portability/scale: risk sets are one DESCENDING cumulative window
    * over the bounded lifetime catalog (integer counts); each hazard
    * increment dᵢ/nᵢ is one fixed double division; the cumulative sum
    * decimal-snapshots the increments (order-independent). No
    * row-scale work after the [[lifeTable]] unit aggregate.
    */
  def nelsonAalen(df: DataFrame, userCol: String, tsCol: String,
                  censorDays: Int = 7, unitDays: Int = 30): DataFrame =
    nelsonAalenFromSpan(perUserSpan(df, userCol, tsCol), censorDays, unitDays)

  private[graft] def nelsonAalenFromSpan(span: DataFrame, censorDays: Int,
                                         unitDays: Int): DataFrame = {
    val perLife = lifeTableFromSpan(span, censorDays, unitDays)
    val wDesc = Portable.kRowWindow(col("_life").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Portable.kRowWindow(col("_life").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perLife
      .withColumn("_n", sum(col("_d") + col("_c")).over(wDesc))
      .withColumn("_h", col("_d").cast("double") / col("_n").cast("double"))
      .withColumn("_hc", sum(col("_h").cast("decimal(28,12)")).over(wAsc)
        .cast("double"))
      .select(col("_life").as("life"), col("_n").as("n_risk"),
        col("_d").as("n_churned"), col("_c").as("n_censored"),
        round(col("_h"), 9).as("hazard"),
        round(col("_hc"), 9).as("cum_hazard"))
      .orderBy("life")
  }

  def kaplanMeier(df: DataFrame, userCol: String, tsCol: String,
                  censorDays: Int = 7, unitDays: Int = 30): DataFrame =
    kaplanMeierFromSpan(perUserSpan(df, userCol, tsCol), censorDays, unitDays)

  private[graft] def kaplanMeierFromSpan(span: DataFrame, censorDays: Int,
                                         unitDays: Int): DataFrame = {
    val perLife = lifeTableFromSpan(span, censorDays, unitDays)
    // one catalog-sized row: [life, d, c] triples sorted by life
    val curve = perLife
      .agg(sort_array(collect_list(array(col("_life").cast("double"),
          col("_d").cast("double"), col("_c").cast("double")))).as("_arr"),
        sum(col("_d") + col("_c")).cast("double").as("_total"))
    // acc = [remaining_at_risk, survival]; e = [life, d, c]
    val fold = (acc: Column, e: Column) => array(
      element_at(acc, 1) - element_at(e, 2) - element_at(e, 3),
      element_at(acc, 2) *
        (element_at(acc, 1) - element_at(e, 2)) / element_at(acc, 1))
    curve
      .select(col("_total"), col("_arr"),
        posexplode(col("_arr")).as(Seq("_i0", "_e")))
      .select(
        element_at(col("_e"), 1).cast("long").as("life"),
        (col("_total") -
          aggregate(slice(col("_arr"), lit(1), col("_i0")), lit(0.0d),
            (acc, e) => acc + element_at(e, 2) + element_at(e, 3)))
          .cast("long").as("n_risk"),
        element_at(col("_e"), 2).cast("long").as("n_churned"),
        element_at(col("_e"), 3).cast("long").as("n_censored"),
        round(element_at(
          aggregate(slice(col("_arr"), lit(1), col("_i0") + 1),
            array(col("_total"), lit(1.0d)), fold), 2), 9)
          .as("km_survival"))
  }
  /** Difference-in-differences (r19) — the pre/post × cohort PANEL
    * estimator the experimentation shelf lacked: C230/C209 compare two
    * cohorts at one time, C264 reduces variance with a pre-period
    * covariate, C304 audits balance — DiD estimates the effect when
    * assignment is NOT randomized but both cohorts share a time trend:
    * δ = (Ȳ_A,post − Ȳ_A,pre) − (Ȳ_B,post − Ȳ_B,pre), differencing out
    * both the level gap between cohorts and the common shock between
    * periods (Card & Krueger 1994's workhorse).
    *
    * Panel construction: per-unit per-period outcome totals on the
    * DENSE unit × {pre, post} panel (a unit silent in a period is a
    * true zero — absence IS the outcome for engagement totals); the
    * period split is the midpoint of the observed date range
    * (deterministic, derived — no magic date literal). SE treats the
    * four cell means as independent (the two-period OLS-equivalent):
    * se² = Σ_c s²_c/n_c over per-unit outcomes, z = δ/se. Exact
    * decimal sums per cell, every division (n−1)-guarded (the ANSI
    * lesson), fixed IEEE shapes. ONE unit-period aggregate collapses
    * the corpus; the panel and the 12-way conditional cell aggregate
    * are unit-catalog-sized.
    */
  def didEstimate(df: DataFrame, userCol: String, tsCol: String,
                  valueCol: Column, isA: Column => Column): DataFrame =
    didFromDaily(didDailyPanel(df, userCol, tsCol, valueCol), isA)

  /** The (unit, day) outcome-sum panel [[didEstimate]] reduces through —
    * per-day DECIMAL(28,6) partials, an additive monoid keyed by
    * (unit, day): day-sum-merged partials from any batch split roll up
    * to the same (unit, period) totals bit-exactly, and the period
    * boundary re-derives from the maintained day span at READ time (the
    * SurvivalState censoring pattern) — which is exactly what lets the
    * streaming twin serve DiD continuously while the split date moves
    * with the stream.
    */
  private[graft] def didDailyPanel(df: DataFrame, userCol: String,
                                   tsCol: String, valueCol: Column): DataFrame =
    df.select(col(userCol).as("_u"), to_date(col(tsCol)).as("_dt"),
        valueCol.cast("double").as("_v"))
      .groupBy("_u", "_dt")
      .agg(sum(col("_v").cast("decimal(28,6)")).cast("decimal(28,6)").as("_yd"))

  private[graft] def didFromDaily(daily: DataFrame,
                                  isA: Column => Column): DataFrame = {
    val span = daily.agg(min(col("_dt")).as("_mn"), max(col("_dt")).as("_mx"))
    val withSplit = span.select(col("_mn"), col("_mx"),
      date_add(col("_mn"),
        (datediff(col("_mx"), col("_mn")) / 2).cast("int")).as("_split"))
    val perUP = daily.crossJoin(broadcast(withSplit))
      .select(col("_u"), (col("_dt") >= col("_split")).as("_post"),
        col("_yd"), col("_split"))
      .groupBy("_u", "_post")
      .agg(sum("_yd").cast("double").as("_y"), max("_split").as("_split"))
    val users = perUP.select("_u").distinct()
    val panel = users
      .select(col("_u"), explode(array(lit(false), lit(true))).as("_post"))
      .join(perUP, Seq("_u", "_post"), "left_outer")
      .select(isA(col("_u")).as("_a"), col("_post"),
        coalesce(col("_y"), lit(0.0d)).as("_y"))
    def cell(a: Boolean, post: Boolean) = {
      val in = (if (a) col("_a") else !col("_a")) &&
        (if (post) col("_post") else !col("_post"))
      (sum(when(in, 1L).otherwise(0L)),
        Portable.decSum(when(in, col("_y")), 6),
        Portable.decSum(when(in, col("_y") * col("_y")), 6))
    }
    val ((naC, saPreC, qaPreC)) = cell(a = true, post = false)
    val ((_, saPostC, qaPostC)) = cell(a = true, post = true)
    val ((nbC, sbPreC, qbPreC)) = cell(a = false, post = false)
    val ((_, sbPostC, qbPostC)) = cell(a = false, post = true)
    val agged = panel.agg(naC.as("_na"), saPreC.as("_sa0"), qaPreC.as("_qa0"),
      saPostC.as("_sa1"), qaPostC.as("_qa1"),
      nbC.as("_nb"), sbPreC.as("_sb0"), qbPreC.as("_qb0"),
      sbPostC.as("_sb1"), qbPostC.as("_qb1"))
    def m(s: String, n: String) = when(col(n) > 0, col(s) / col(n))
    def v(q: String, s: String, n: String) = when(col(n) > 1,
      (col(q) - col(n) * m(s, n) * m(s, n)) / (col(n) - 1))
    val did = (m("_sa1", "_na") - m("_sa0", "_na")) -
      (m("_sb1", "_nb") - m("_sb0", "_nb"))
    val se2 = v("_qa0", "_sa0", "_na") / col("_na") +
      v("_qa1", "_sa1", "_na") / col("_na") +
      v("_qb0", "_sb0", "_nb") / col("_nb") +
      v("_qb1", "_sb1", "_nb") / col("_nb")
    val ok = col("_na") > 1 && col("_nb") > 1 && se2 > 0
    agged.crossJoin(broadcast(withSplit.select(
        date_format(col("_split"), "yyyy-MM-dd").as("split_date"))))
      .select(col("split_date"), col("_na").as("n_a"), col("_nb").as("n_b"),
        Portable.pround(did, 9).as("did"),
        when(ok, Portable.pround(sqrt(se2), 9)).as("se"),
        when(ok, Portable.pround(did / sqrt(se2), 6)).as("z_stat"))
  }

  /** Restricted mean survival time per cohort (r19) — the
    * DECISION-GRADE scalar over the KM curve: RMST(τ) = ∫₀^τ S(t)dt =
    * E[min(lifetime, τ)], "how many lifetime units a unit retains
    * within the first τ", and the cohort delta is the effect size a
    * retention readout actually wants (C311's hazard ratio says the
    * rates differ multiplicatively; RMST says how much LIFETIME that
    * is worth — and it stays meaningful when proportional hazards is
    * false). Royston & Parmar 2013's recommended KM summary.
    *
    * One fold computes it: the C221 KM fold gains a prev-mark and an
    * accumulator — each step adds surv·(clamped interval width) BEFORE
    * updating survival, and the tail past the last bucket closes at
    * the final survival. Spark `aggregate` = DuckDB `list_reduce`
    * (both left folds over the sorted bucket array), so the chained
    * products/sums are bit-identical cross-engine; widths are exact
    * integers-as-doubles; one 6-dp round at read-out. Catalog-sized
    * after the unit aggregate, two rows out.
    */
  def rmstByCohort(df: DataFrame, userCol: String, tsCol: String,
                   isA: Column => Column, censorDays: Int = 7,
                   unitDays: Int = 30, tauUnits: Int = 12): DataFrame = {
    val span = perUserSpan(df, userCol, tsCol)
    val gmax = span.agg(max("_l").as("_gmax"))
    val lives = span.crossJoin(broadcast(gmax))
      .select(when(isA(col("_u")), "A").otherwise("B").as("cohort"),
        (datediff(col("_l"), col("_f")).cast("long") / unitDays)
          .cast("long").as("_life"),
        (col("_l") < date_sub(col("_gmax"), censorDays)).as("_churn"))
    val perLife = lives.groupBy("cohort", "_life").agg(
      sum(when(col("_churn"), 1L).otherwise(0L)).as("_d"),
      sum(when(!col("_churn"), 1L).otherwise(0L)).as("_c"))
    val curve = perLife.groupBy("cohort")
      .agg(sort_array(collect_list(array(col("_life").cast("double"),
          col("_d").cast("double"), col("_c").cast("double")))).as("_arr"),
        sum(col("_d") + col("_c")).cast("double").as("_total"))
    val tau = lit(tauUnits.toDouble)
    // acc = [at_risk, survival, prev_mark, rmst_acc]; e = [life, d, c]
    val fold = (acc: Column, e: Column) => array(
      element_at(acc, 1) - element_at(e, 2) - element_at(e, 3),
      element_at(acc, 2) *
        (element_at(acc, 1) - element_at(e, 2)) / element_at(acc, 1),
      element_at(e, 1),
      element_at(acc, 4) + element_at(acc, 2) *
        greatest(lit(0.0d), least(element_at(e, 1), tau) - element_at(acc, 3)))
    val folded = aggregate(col("_arr"),
      array(col("_total"), lit(1.0d), lit(0.0d), lit(0.0d)), fold)
    curve
      .select(col("cohort"), col("_total").cast("long").as("n_units"),
        lit(tauUnits.toLong).as("tau_units"),
        Portable.pround(element_at(folded, 4) + element_at(folded, 2) *
          greatest(lit(0.0d), tau - element_at(folded, 3)), 6).as("rmst"))
  }

  /** Exponentially time-decayed leaderboard — "what's trending": per
    * key, score = Σ_days count(day) · 2^(−age·dailyHalfLives) where age
    * is whole days before the corpus's max day. The half-life base 1/2
    * with an INTEGER exponent makes every per-day weight an exact dyadic
    * double (2^−k is representable — no pow/exp ulp hazard at all, the
    * trick that keeps this hash-checkable), and per-day counts are exact
    * ints, so every addend is bit-identical across engines before the
    * decimal-snapshot sum.
    *
    * Scale shape: one (key, day) count aggregate (map-side combinable),
    * the 1-row max-day aggregate broadcast onto it, one key aggregate,
    * one top-k heap. Decay re-ranks daily with NO state: yesterday's
    * leaderboard is never read — the decayed sum is recomputed from the
    * (key, day) counts, which a real deployment keeps as its daily
    * rollup table anyway.
    */
  def decayedLeaderboard(df: DataFrame, tsCol: String, keyCol: String,
                         k: Int): DataFrame = {
    val daily = df.select(col(keyCol).as("key"), to_date(col(tsCol)).as("_day"))
      .groupBy("key", "_day").agg(count(lit(1)).as("_cnt"))
    val maxDay = daily.agg(max("_day").as("_maxDay"))
    val w = Portable.kRowWindow(col("score").desc, col("key").asc)
    daily.crossJoin(broadcast(maxDay))
      .withColumn("_wgt", pow(lit(0.5), datediff(col("_maxDay"), col("_day"))))
      .groupBy("key")
      .agg(Portable.decSum(col("_cnt") * col("_wgt"), 12).as("_raw"),
        sum("_cnt").as("raw_count"))
      .select(col("key"), col("raw_count"), Portable.pround(col("_raw"), 6).as("score"))
      .orderBy(col("score").desc, col("key").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "key", "raw_count", "score")
  }

  /** Wald's SPRT over a daily Bernoulli stream — the SEQUENTIAL member
    * of the experimentation family (C230 tests one frozen snapshot;
    * C268 permutes it; SPRT monitors the accumulating stream and says
    * when enough evidence has arrived to STOP): per day the
    * log-likelihood ratio of H1: p = p1 vs H0: p = p0 advances by
    * hits·ln(p1/p0) + misses·ln((1−p1)/(1−p0)), and the cumulative walk
    * is compared to Wald's boundaries ln((1−β)/α) / ln(β/(1−α)). The
    * decision column records what a sequential monitor would have
    * concluded BY each day — the difference between a week-long and a
    * quarter-long rollout gate.
    *
    * Portability: daily hit/miss counts are exact integers, both
    * per-trial increments and both boundaries enter as 9-dp rounded
    * literals (the r17 constant convention — ln differs in final ulps
    * across engines, a ≤15-digit decimal literal does not), the daily
    * increment is integer×literal and the walk a decimal-summed window
    * over the bounded day catalog. Decisions persist: the walk keeps
    * accumulating for the record, but `decision` reports the FIRST
    * boundary crossed at or before the day (a real monitor stops there).
    */
  def sprt(df: DataFrame, tsCol: String, hitCol: Column,
           p0: Double, p1: Double, alpha: Double, beta: Double): DataFrame =
    sprtFromDaily(
      // the ts filter is load-bearing cross-engine: a NULL day would
      // SORT differently in the catalog walk (Spark NULLS FIRST, DuckDB
      // NULLS LAST) — the one place a NULL is an ordering hazard, not
      // just a skipped row
      df.where(hitCol.isNotNull && col(tsCol).isNotNull)
        .groupBy(to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(hitCol.cast("boolean"), 1L).otherwise(0L)).as("n_hit")),
      p0, p1, alpha, beta)

  /** The walk + decision read off a (day, n, n_hit) daily-count frame —
    * the arithmetic shared by [[sprt]] and the streaming twin
    * ([[graft.streaming.StreamingOps.SprtState]]): daily counts are the
    * canonical additive monoid, so counts merged at any micro-batch
    * boundary equal the batch counts exactly and one formula serves both
    * paths.
    */
  private[graft] def sprtFromDaily(daily: DataFrame, p0: Double, p1: Double,
                                   alpha: Double, beta: Double): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      "need distinct interior hypothesis rates")
    def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val aInc = r9(math.log(p1 / p0))
    val bInc = r9(math.log((1.0 - p1) / (1.0 - p0)))
    val upper = r9(math.log((1.0 - beta) / alpha))
    val lower = r9(math.log(beta / (1.0 - alpha)))
    val w = Portable.kRowWindow(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walk = daily.withColumn("_llr",
      sum((col("n_hit").cast("double") * lit(aInc) +
        (col("n") - col("n_hit")).cast("double") * lit(bInc))
        .cast("decimal(28,12)")).over(w).cast("double"))
    // first boundary crossed at or before each day: the earliest
    // crossing DAY of each boundary (a cumulative min over the catalog
    // window), so a walk that later crosses the other boundary still
    // reports what the monitor decided FIRST
    walk
      .withColumn("_hiDay", min(when(col("_llr") >= upper, col("day"))).over(w))
      .withColumn("_loDay", min(when(col("_llr") <= lower, col("day"))).over(w))
      .select(col("day"), col("n"), col("n_hit"),
        Portable.pround(col("_llr"), 6).as("llr"),
        when(col("_hiDay").isNotNull &&
            (col("_loDay").isNull || col("_hiDay") <= col("_loDay")), lit("accept_h1"))
          .when(col("_loDay").isNotNull, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
  }

  /** Likelihood-ratio e-process with anytime-valid p — the MODERN
    * sequential gate completing C277's classical SPRT (r18, VERDICT r17
    * item 8): the e-value E_t = Π LR_i is a nonnegative supermartingale
    * under H0: p = p0, so by Ville's inequality P(sup E ≥ 1/α) ≤ α — the
    * monitor may be read (and stopped) at ANY time, at any data-dependent
    * moment, without alpha-spending bookkeeping; p_t = min(1, 1/max_s≤t
    * E_s) is a p-value valid at every t simultaneously. Where the SPRT
    * commits to α/β and reports accept/reject, the e-process never
    * accepts H0 — evidence can only accumulate or wait.
    *
    * Everything stays in LOG space (no exp anywhere — exp differs in
    * final ulps across engines and would poison the hash): log E_t IS
    * the SPRT's LLR walk (same 9-dp per-trial increments, shared day
    * catalog), log p_t = min(0, −max_s≤t log E_s), and the level-α
    * rejection gate compares the walk to the 9-dp literal ln(1/α).
    * Rejection is inherently sticky — the running max never decreases.
    */
  def eProcess(df: DataFrame, tsCol: String, hitCol: Column,
               p0: Double, p1: Double, alpha: Double): DataFrame =
    eProcessFromDaily(
      df.where(hitCol.isNotNull && col(tsCol).isNotNull)
        .groupBy(to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(hitCol.cast("boolean"), 1L).otherwise(0L)).as("n_hit")),
      p0, p1, alpha)

  /** The e-value walk + anytime-valid p read off a (day, n, n_hit)
    * daily-count frame — the arithmetic shared by [[eProcess]] and the
    * streaming read ([[graft.streaming.StreamingOps.SprtState.eValues]]):
    * the SAME maintained day counts serve both sequential monitors.
    */
  private[graft] def eProcessFromDaily(daily: DataFrame, p0: Double, p1: Double,
                                       alpha: Double): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      "need distinct interior hypothesis rates")
    require(alpha > 0 && alpha < 1, "need an interior level")
    def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val aInc = r9(math.log(p1 / p0))
    val bInc = r9(math.log((1.0 - p1) / (1.0 - p0)))
    val thr = r9(math.log(1.0 / alpha))
    val w = Portable.kRowWindow(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("_loge",
        sum((col("n_hit").cast("double") * lit(aInc) +
          (col("n") - col("n_hit")).cast("double") * lit(bInc))
          .cast("decimal(28,12)")).over(w).cast("double"))
      .withColumn("_maxe", max(col("_loge")).over(w))
      .select(col("day"), col("n"), col("n_hit"),
        Portable.pround(col("_loge"), 6).as("log_e"),
        Portable.pround(least(lit(0.0), -col("_maxe")), 6).as("log_avp"),
        when(col("_maxe") >= thr, lit("reject_h0"))
          .otherwise(lit("continue")).as("decision"))
  }

  /** Minimum detectable effect + Cohen's d for a two-cohort experiment
    * (r18b) — the PLANNING member of the experimentation shelf: C230/
    * C209 test a snapshot, C264's CUPED shrinks the variance, C277/C278
    * decide when to stop; THIS says what the current sample can even
    * see. MDE = (z_{1−α/2} + z_{power})·√(v_A/n_A + v_B/n_B) — the
    * smallest true mean difference the test would flag at the given
    * size/power — plus Cohen's d = (m_A − m_B)/s_pooled, the
    * standardized effect actually observed (at corpus scale every
    * difference is "significant"; d says whether it is 0.02σ noise or
    * a 0.5σ shift worth acting on). An MDE far above |m_A − m_B| reads
    * "this experiment cannot answer its question yet".
    *
    * The z quantiles enter as caller-passed 9-dp literals (defaults
    * Φ⁻¹(0.975) = 1.959963985, Φ⁻¹(0.8) = 0.841621234) — the C265
    * convention: the inverse-normal transcendental is a cross-engine
    * ulp hazard, a short decimal literal is not.
    *
    * Portability/scale: per-unit metric = exact decimal event-value
    * sum (ONE unit-keyed map-side-combinable aggregate collapses the
    * stream); cohort moments are exact decimal sums over the unit
    * table; every division/√ is a fixed IEEE shape. n ≤ 1 on a side or
    * a zero variance NULLs the affected statistics, never throws.
    */
  def mdePower(df: DataFrame, unitCol: String, isA: Column => Column,
               valueCol: Column,
               zAlpha: Double = 1.959963985, zPower: Double = 0.841621234): DataFrame = {
    val per = df.where(valueCol.isNotNull)
      .groupBy(col(unitCol).as("_u"))
      .agg(sum(valueCol.cast("decimal(28,6)")).cast("double").as("_m"))
      .select(isA(col("_u")).as("_a"), col("_m"))
    val agg = per.agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
      Portable.decSum(when(col("_a"), col("_m")).otherwise(lit(0.0)), 6).as("_sa"),
      Portable.decSum(when(!col("_a"), col("_m")).otherwise(lit(0.0)), 6).as("_sb"),
      Portable.decSum(when(col("_a"), col("_m") * col("_m")).otherwise(lit(0.0)), 6)
        .as("_qa"),
      Portable.decSum(when(!col("_a"), col("_m") * col("_m")).otherwise(lit(0.0)), 6)
        .as("_qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val meanA = col("_sa") / na
    val meanB = col("_sb") / nb
    // variances are NULL-guarded at the DIVISION (not just at the output
    // projection): ANSI mode evaluates `when` CONDITIONS unconditionally,
    // so a bare (n−1) divisor would throw on a one-unit cohort before
    // any outer guard could suppress it. NULL propagates instead.
    val varA = when(col("n_a") > 1,
      (col("_qa") - col("_sa") * col("_sa") / na) / (na - 1.0))
    val varB = when(col("n_b") > 1,
      (col("_qb") - col("_sb") * col("_sb") / nb) / (nb - 1.0))
    val se2 = varA / na + varB / nb
    val sp2 = ((na - 1.0) * varA + (nb - 1.0) * varB) / (na + nb - 2.0)
    val meanAll = (col("_sa") + col("_sb")) / (na + nb)
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0, round(meanA, 9)).as("mean_a"),
      when(col("n_b") > 0, round(meanB, 9)).as("mean_b"),
      when(sp2 > 0,
        Portable.pround((meanA - meanB) / sqrt(sp2), 6)).as("cohens_d"),
      when(se2 > 0, round(sqrt(se2), 9)).as("se_diff"),
      when(se2 > 0,
        round(lit(zAlpha + zPower) * sqrt(se2), 6)).as("mde_abs"),
      when(se2 > 0 && meanAll =!= 0.0,
        Portable.pround(lit(zAlpha + zPower) * sqrt(se2) / meanAll, 6)).as("mde_rel"))
  }

  /** Log-rank test between two survival cohorts (r18b) — do cohorts A
    * and B CHURN at the same rate, the hypothesis test over the
    * [[kaplanMeier]] curves (Mantel 1966; the same O−E machinery as
    * C283's Mantel–Haenszel, stratified by event TIME instead of day):
    * at each distinct lifetime with d > 0 churn events, cohort A's
    * observed events d₁ are compared to the hypergeometric expectation
    * d·n₁/n given the at-risk sets, and z = (O−E)/√V with
    * V = Σ d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1). Censored units (still alive
    * at the corpus edge) leave the risk set without counting as events
    * — the naive "compare mean lifetimes" read cannot do this and
    * biases toward whichever cohort joined earlier.
    *
    * Portability: lifetimes/cells/risk sets are exact integers (the
    * at-risk sets are one DESCENDING cumulative window over the
    * bounded lifetime catalog); each E/V term is a fixed double shape,
    * decimal-snapshotted before the final sums; the single √/division
    * is the only remaining float step. No churn events or V = 0 →
    * NULL z, never a throw.
    *
    * Scale shape: one unit-keyed aggregate collapses the corpus, one
    * lifetime-keyed aggregate collapses the units to the day-span
    * catalog; everything after is catalog-sized.
    */
  def logRank(df: DataFrame, userCol: String, tsCol: String,
              isA: Column => Column, censorDays: Int = 7,
              unitDays: Int = 30): DataFrame =
    logRankFromSpan(perUserSpan(df, userCol, tsCol), isA, censorDays, unitDays)

  private[graft] def logRankFromSpan(perUser: DataFrame, isA: Column => Column,
                                     censorDays: Int, unitDays: Int): DataFrame = {
    val gmax = perUser.agg(max("_l").as("_gmax"))
    val lives = perUser.crossJoin(broadcast(gmax))
      .select((datediff(col("_l"), col("_f")).cast("long") / unitDays)
          .cast("long").as("_life"), // int floor-div: datediff >= 0
        (col("_l") < date_sub(col("_gmax"), censorDays)).as("_churn"),
        isA(col("_u")).as("_a"))
    val perLife = lives.groupBy("_life").agg(
      sum(when(col("_churn") && col("_a"), 1L).otherwise(0L)).as("_d1"),
      sum(when(col("_churn"), 1L).otherwise(0L)).as("_d"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("_t1"),
      count(lit(1)).as("_t"))
    val wDesc = Portable.kRowWindow(col("_life").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = perLife
      .withColumn("_n1", sum("_t1").over(wDesc))
      .withColumn("_n", sum("_t").over(wDesc))
    val nD = col("_n").cast("double")
    val n1D = col("_n1").cast("double")
    val dD = col("_d").cast("double")
    val terms = risk.where(col("_d") > 0).select(
      col("_d1"),
      (dD * n1D / nD).as("_e"),
      when(col("_n") > 1,
        dD * (n1D / nD) * (lit(1.0) - n1D / nD) * (nD - dD) / (nD - 1.0))
        .otherwise(lit(0.0)).as("_v"))
    val tot = lives.agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"))
    val agg = terms.agg(
      sum("_d1").as("o_a"),
      Portable.decSum(col("_e"), 12).as("_ea"),
      Portable.decSum(col("_v"), 12).as("_vv"))
    tot.crossJoin(broadcast(agg))
      .select(col("n_a"), col("n_b"), col("o_a"),
        round(col("_ea"), 9).as("e_a"),
        round(col("_vv"), 9).as("var_lr"),
        when(col("_vv") > 0,
          Portable.pround((col("o_a").cast("double") - col("_ea")) / sqrt(col("_vv")), 6))
          .as("z_stat"))
  }

  /** Cox proportional hazards with a single binary covariate (r19) —
    * the REGRESSION closer of the survival shelf: Kaplan–Meier (C221)
    * draws the curve, the log-rank test (C292) says WHETHER the two
    * cohorts' hazards differ, Nelson–Aalen (C310) gives the additive
    * hazard — Cox says BY HOW MUCH, as a hazard ratio with a standard
    * error (Cox 1972, Breslow tie handling). Identical lifetime /
    * censoring construction and integer risk sets as [[logRank]].
    *
    * Fitting: Newton–Raphson parameterized in θ = e^β rather than β, so
    * EVERY iteration is rational arithmetic over the event-time stats —
    * U(θ) = Σ_t (d1 − d·n1·θ/(n0+n1·θ)), J(θ) = Σ_t d·n0·n1/(n0+n1·θ)²,
    * θ ← θ + U/J — and the single transcendental (ln θ) happens ONCE,
    * at the read-out, on a 12-dp-rounded argument (the C266/C156 ln
    * convention): no cross-engine exp drift can compound through the
    * loop. Per-iteration sums decimal-snapshot at 12 dp and θ re-rounds
    * to 12 dp each step, so the DuckDB oracle's unrolled-CTE replay of
    * the same iteration lands on the same bits. The observed Fisher
    * information in β-scale is I(β) = θ·J(θ), giving se = 1/√(θ·J) and
    * z = ln(θ)·√(θ·J).
    *
    * Scale shape: one user-keyed aggregate collapses the corpus to
    * lifetimes, the risk sets ride the catalog-sized descending
    * cumulative, and each Newton step is one tiny aggregate over the
    * CHECKPOINTED event-time stats (the Bradley–Terry iterative-fit
    * precedent) — the per-round collect moves two doubles, the
    * sanctioned model-sized read. Degenerate inputs (no events, or a
    * vanishing information) freeze θ at its current value instead of
    * throwing, exactly like the oracle's guarded CASE.
    */
  def coxPh(df: DataFrame, userCol: String, tsCol: String,
            isA: Column => Column, censorDays: Int = 7,
            unitDays: Int = 30, iters: Int = 12): DataFrame =
    coxPhFromSpan(perUserSpan(df, userCol, tsCol), isA, censorDays, unitDays, iters)

  private[graft] def coxPhFromSpan(perUser: DataFrame, isA: Column => Column,
                                   censorDays: Int, unitDays: Int,
                                   iters: Int): DataFrame = {
    val gmax = perUser.agg(max("_l").as("_gmax"))
    val lives = perUser.crossJoin(broadcast(gmax))
      .select((datediff(col("_l"), col("_f")).cast("long") / unitDays)
          .cast("long").as("_life"),
        (col("_l") < date_sub(col("_gmax"), censorDays)).as("_churn"),
        isA(col("_u")).as("_a"))
    val perLife = lives.groupBy("_life").agg(
      sum(when(col("_churn") && col("_a"), 1L).otherwise(0L)).as("_d1"),
      sum(when(col("_churn"), 1L).otherwise(0L)).as("_d"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("_t1"),
      count(lit(1)).as("_t"))
    val wDesc = Portable.kRowWindow(col("_life").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = perLife
      .withColumn("_n1", sum("_t1").over(wDesc))
      .withColumn("_n", sum("_t").over(wDesc))
      .where(col("_d") > 0)
      .select(col("_d1").cast("double").as("_d1"),
        col("_d").cast("double").as("_d"),
        col("_n1").cast("double").as("_n1"),
        (col("_n") - col("_n1")).cast("double").as("_n0"),
        col("_d").as("_dl"))
      .localCheckpoint(true)
    val statRows = collectCoxStats(stats)
    val th = coxNewtonThetaLocal(statRows, iters)
    val tot = lives.agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"))
    tot.crossJoin(broadcast(coxFinalLocal(perUser.sparkSession, statRows, th)))
      .select((Seq(col("n_a"), col("n_b"), col("n_events")) ++
        coxReadoutCols(th)): _*)
  }

  /** See [[Portable.decSum12Local]] — the one shared driver-side replica
    * of the decSum(_, 12) recipe (r21 review: two copies of
    * bit-identity-critical logic would drift).
    */
  private def decSum12(terms: Iterator[Double]): Option[Double] =
    Portable.decSum12Local(terms)

  /** Per-event-time stats rows (d1, d, n1, n0) collected once — the
    * lifetime catalog, ≤ a few dozen rows (the sanctioned model-sized
    * read; the frame is checkpointed by every caller).
    */
  private def collectCoxStats(stats: DataFrame): Array[(Double, Double, Double, Double, Long)] =
    stats.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getLong(4)))

  /** The θ-space Newton loop shared by [[coxPh]] and
    * [[coxPhStratified]]: the stratified partial likelihood is the
    * PRODUCT over strata, so its score and information are the same
    * per-event-time sums taken over the pooled stats rows.
    *
    * r21: the loop runs DRIVER-SIDE over the collected event-time
    * catalog — 12 iterations used to cost 12 plan+codegen+job round
    * trips (~0.2 s each of pure driver latency) for aggregates over a
    * couple dozen checkpointed rows. Every term replays the engine
    * expression tree verbatim (same IEEE op order) and [[decSum12]]
    * replays the decimal snapshot, so θ is bit-identical per round;
    * a null score read as 0.0 (Row.getDouble on null) is replicated
    * by getOrElse(0.0).
    */
  private def coxNewtonThetaLocal(rows: Array[(Double, Double, Double, Double, Long)],
                                  iters: Int): Double = {
    var th = 1.0
    for (_ <- 0 until iters) {
      val u = decSum12(rows.iterator.map { case (d1, d, n1, n0, _) =>
        d1 - d * n1 * th / (n0 + n1 * th) })
      val j = decSum12(rows.iterator.map { case (_, d, n1, n0, _) =>
        val den = n0 + n1 * th; d * n0 * n1 / (den * den) })
      if (j.isDefined && j.get > 0) {
        val step = th + u.getOrElse(0.0) / j.get
        th = java.math.BigDecimal.valueOf(math.max(step, 1e-12))
          .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue
      }
    }
    th
  }

  /** (n_events, J(θ)) as a 1-row local frame — same values the former
    * in-engine aggregate produced, without its job.
    */
  private def coxFinalLocal(spark: org.apache.spark.sql.SparkSession,
                            rows: Array[(Double, Double, Double, Double, Long)],
                            th: Double): DataFrame = {
    import spark.implicits._
    val nEvents = rows.map(_._5).sum
    val j = decSum12(rows.iterator.map { case (_, d, n1, n0, _) =>
      val den = n0 + n1 * th; d * n0 * n1 / (den * den) })
    Seq((nEvents, j)).toDF("n_events", "_j")
  }

  private def coxReadoutCols(th: Double): Seq[Column] = {
    val info = lit(th) * col("_j")
    Seq(
      Portable.pround(lit(th), 6).as("hazard_ratio"),
      Portable.pround(log(lit(th)), 6).as("beta"),
      when(info > 0, Portable.pround(lit(1.0) / sqrt(info), 6)).as("se_beta"),
      when(info > 0, Portable.pround(log(lit(th)) * sqrt(info), 6)).as("z_stat"))
  }

  /** Stratified Cox proportional hazards (r19) — [[coxPh]] with the
    * baseline hazard freed PER STRATUM (the survival analogue of C283's
    * Mantel–Haenszel stratified pooling): each stratum keeps its own
    * risk sets and event times, the partial likelihood multiplies
    * across strata, so the score/information are the SAME sums over the
    * pooled per-(stratum, event-time) stats and the one fitted β is the
    * within-stratum effect — "does the cohort churn faster than its own
    * stratum's baseline", immune to confounding by the stratum mix.
    * `strata` maps the unit key to its stratum (broadcast,
    * catalog-sized); risk sets ride a stratum-partitioned descending
    * cumulative. Same θ-space Newton, same single read-out ln.
    */
  def coxPhStratified(df: DataFrame, userCol: String, tsCol: String,
                      strata: DataFrame, strataKeyCol: String,
                      strataValCol: String, isA: Column => Column,
                      censorDays: Int = 7, unitDays: Int = 30,
                      iters: Int = 12): DataFrame = {
    val perUser = df.groupBy(col(userCol).as("_u"))
      .agg(to_date(min(col(tsCol))).as("_f"), to_date(max(col(tsCol))).as("_l"))
    val gmax = perUser.agg(max("_l").as("_gmax"))
    val lives = perUser
      .join(broadcast(strata.select(col(strataKeyCol).as("_u"),
        col(strataValCol).as("_st"))), Seq("_u"))
      .crossJoin(broadcast(gmax))
      .select(col("_st"),
        (datediff(col("_l"), col("_f")).cast("long") / unitDays)
          .cast("long").as("_life"),
        (col("_l") < date_sub(col("_gmax"), censorDays)).as("_churn"),
        isA(col("_u")).as("_a"))
    val perLife = lives.groupBy("_st", "_life").agg(
      sum(when(col("_churn") && col("_a"), 1L).otherwise(0L)).as("_d1"),
      sum(when(col("_churn"), 1L).otherwise(0L)).as("_d"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("_t1"),
      count(lit(1)).as("_t"))
    val wDesc = Window.partitionBy("_st").orderBy(col("_life").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = perLife
      .withColumn("_n1", sum("_t1").over(wDesc))
      .withColumn("_n", sum("_t").over(wDesc))
      .where(col("_d") > 0)
      .select(col("_d1").cast("double").as("_d1"),
        col("_d").cast("double").as("_d"),
        col("_n1").cast("double").as("_n1"),
        (col("_n") - col("_n1")).cast("double").as("_n0"),
        col("_d").as("_dl"))
      .localCheckpoint(true)
    val statRows = collectCoxStats(stats)
    val th = coxNewtonThetaLocal(statRows, iters)
    val tot = lives.agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
      countDistinct("_st").as("n_strata"))
    tot.crossJoin(broadcast(coxFinalLocal(df.sparkSession, statRows, th)))
      .select((Seq(col("n_a"), col("n_b"), col("n_strata"), col("n_events")) ++
        coxReadoutCols(th)): _*)
  }

  /** Cochran's Q test (r18b) — do the k treatments differ in a BINARY
    * outcome across matched blocks, the k-treatment completion of
    * C288's McNemar exactly as C281 completes C250 (Cochran 1950; for
    * k = 2 it reduces to McNemar's χ²): blocks = units, treatments =
    * the event types, outcome = "did the unit perform this type".
    * Q = (k−1)·(k·ΣT_j² − T²)/(k·Σu_i − Σu_i²) with T_j the per-type
    * engagement totals, u_i the per-unit engaged-type counts, T the
    * grand total — "do the event types reach DIFFERENT user bases once
    * each user is their own control".
    *
    * Exact integers end to end (the absent (unit, type) cells are
    * implicit zeros — both Σ shapes only touch the 1-cells), one final
    * division; an all-or-nothing design (denominator 0) → NULL, never
    * a throw. ONE distinct-pair aggregate collapses the corpus; the
    * unit and type roll-ups are catalog-sized.
    */
  /** Two-covariate Cox proportional hazards (C320, r20) — [[coxPh]]
    * with a 2-vector β = (β₁, β₂) over two BINARY covariates, the
    * regression answer to confounding the survival shelf could so far
    * only reach by stratification (C313 frees the baseline per stratum;
    * this fits both effects jointly — "does the cohort still churn
    * faster once the second covariate's effect is in the model").
    *
    * Same lifetime/censoring construction and integer risk sets; the
    * risk set partitions into the FOUR covariate cells g = (x₁, x₂)
    * with weights w_g = θ₁^{x₁}·θ₂^{x₂} (θ_j = e^{β_j}), so with
    * r₁ = S₁/S₀, r₂ = S₂/S₀, r₁₂ = S₁₂/S₀ over the cell-count sums,
    * EVERY iteration stays rational in (θ₁, θ₂):
    *   U₁ = Σ_t (d₁ − d·r₁)            U₂ = Σ_t (d₂ − d·r₂)
    *   I₁₁ = Σ_t d·(r₁ − r₁²)          I₂₂ = Σ_t d·(r₂ − r₂²)
    *   I₁₂ = Σ_t d·(r₁₂ − r₁·r₂)
    * and the Newton step solves the 2×2 system through the explicit
    * determinant (det = I₁₁I₂₂ − I₁₂², the C311 θ-form generalized:
    * θ_j ← θ_j·(1 + δ_j), δ = I⁻¹U — exactly C311's θ + U/J when I is
    * 1×1), frozen when det ≤ 0 or any sum is NULL (no-variation /
    * degenerate corpus — the zero-event freeze generalized). θ rounds
    * at 9 dp per step (NOT C311's 12: two θs × 12 iterations doubles
    * the rounding count, and 12 dp sits at mantissa digit ~13 for
    * O(1) values where Spark's string-based and DuckDB's binary
    * rounding measurably disagree — the C317 lesson), clamped at the
    * 1e-9 grid point so a large negative step can never drive θ to 0.
    * The two read-out lns land once each, on 9-dp-rounded arguments;
    * se_j = √((I⁻¹)_jj) with the same det guard.
    *
    * Scale shape: one unit-keyed aggregate collapses the corpus, the
    * four risk-set cumulatives ride ONE descending window over the
    * lifetime catalog, each Newton step is one tiny aggregate over the
    * CHECKPOINTED event-time stats (five doubles to the driver — the
    * sanctioned model-sized read), and the second covariate joins from
    * a broadcast catalog dimension (the C313 posture).
    */
  def coxPhMulti(df: DataFrame, userCol: String, tsCol: String,
                 isA: Column => Column,
                 dim: DataFrame, dimKeyCol: String, dimValCol: String,
                 isB: Column => Column,
                 censorDays: Int = 7, unitDays: Int = 30,
                 iters: Int = 12): DataFrame = {
    val perUser = perUserSpan(df, userCol, tsCol)
    val gmax = perUser.agg(max("_l").as("_gmax"))
    val lives = perUser
      .join(broadcast(dim.select(col(dimKeyCol).as("_u"),
        isB(col(dimValCol)).as("_b2"))), Seq("_u"))
      .crossJoin(broadcast(gmax))
      .select((datediff(col("_l"), col("_f")).cast("long") / unitDays)
          .cast("long").as("_life"),
        (col("_l") < date_sub(col("_gmax"), censorDays)).as("_churn"),
        isA(col("_u")).as("_a"), col("_b2"))
    def inCell(a: Boolean, b: Boolean): Column =
      (if (a) col("_a") else !col("_a")) &&
        (if (b) col("_b2") else !col("_b2"))
    val cells = Seq((false, false), (true, false), (false, true), (true, true))
    val cellAggs = cells.zipWithIndex.flatMap { case ((a, b), g) => Seq(
      sum(when(inCell(a, b), 1L).otherwise(0L)).as(s"_t$g"),
      sum(when(inCell(a, b) && col("_churn"), 1L).otherwise(0L)).as(s"_e$g"))
    }
    // catalog-sized and CHECKPOINTED: both the risk-set cumulatives and
    // the cohort totals derive from it, so the corpus (and the dim
    // join) is scanned exactly once
    val perLife = lives.groupBy("_life").agg(cellAggs.head, cellAggs.tail: _*)
      .localCheckpoint(true)
    val wDesc = Portable.kRowWindow(col("_life").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = (0 to 3).foldLeft(perLife) { (f, g) =>
      f.withColumn(s"_n$g", sum(s"_t$g").over(wDesc))
    }
    val dTot = col("_e0") + col("_e1") + col("_e2") + col("_e3")
    val stats = withRisk
      .where(dTot > 0)
      .select(dTot.cast("double").as("_d"),
        (col("_e1") + col("_e3")).cast("double").as("_d1"),
        (col("_e2") + col("_e3")).cast("double").as("_d2"),
        col("_n0").cast("double").as("_n0"),
        col("_n1").cast("double").as("_n1"),
        col("_n2").cast("double").as("_n2"),
        col("_n3").cast("double").as("_n3"),
        dTot.as("_dl"))
      .localCheckpoint(true)

    // r21: the 2×2 Newton runs DRIVER-SIDE over the collected event-time
    // catalog (same move as coxNewtonThetaLocal — 12 iterations of
    // plan+codegen+job round trips for a few-dozen-row aggregate were
    // ~5 s of pure driver latency). Each term replays the engine
    // expression tree verbatim; [[decSum12]] replays the decimal
    // snapshot; the all-five-non-null gate matches the former
    // row.isNullAt check, so θ₁/θ₂ are bit-identical per round.
    val statRows: Array[(Double, Double, Double, Double, Double, Double, Double, Long)] =
      stats.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    // stats row order: (_d, _d1, _d2, _n0, _n1, _n2, _n3, _dl)
    def localSums(th1: Double, th2: Double): Seq[Option[Double]] = {
      def terms(f: (Double, Double, Double, Double, Double, Double, Double) => Double) =
        decSum12(statRows.iterator.map { case (d, d1, d2, n0, n1, n2, n3, _) =>
          f(d, d1, d2, n0, n1, n2, n3) })
      def s0(n0: Double, n1: Double, n2: Double, n3: Double) =
        n0 + n1 * th1 + n2 * th2 + n3 * th1 * th2
      def r1(n0: Double, n1: Double, n2: Double, n3: Double) =
        (n1 * th1 + n3 * th1 * th2) / s0(n0, n1, n2, n3)
      def r2(n0: Double, n1: Double, n2: Double, n3: Double) =
        (n2 * th2 + n3 * th1 * th2) / s0(n0, n1, n2, n3)
      def r12(n0: Double, n1: Double, n2: Double, n3: Double) =
        (n3 * th1 * th2) / s0(n0, n1, n2, n3)
      Seq(
        terms((d, d1, _, n0, n1, n2, n3) => d1 - d * r1(n0, n1, n2, n3)),
        terms((d, _, d2, n0, n1, n2, n3) => d2 - d * r2(n0, n1, n2, n3)),
        terms((d, _, _, n0, n1, n2, n3) => {
          val r = r1(n0, n1, n2, n3); d * (r - r * r) }),
        terms((d, _, _, n0, n1, n2, n3) => {
          val r = r2(n0, n1, n2, n3); d * (r - r * r) }),
        terms((d, _, _, n0, n1, n2, n3) =>
          d * (r12(n0, n1, n2, n3) - r1(n0, n1, n2, n3) * r2(n0, n1, n2, n3))))
    }
    def round9clamp(x: Double): Double =
      java.math.BigDecimal.valueOf(math.max(x, 1e-9))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    var th1 = 1.0; var th2 = 1.0
    for (_ <- 0 until iters) {
      val ss = localSums(th1, th2)
      if (ss.forall(_.isDefined)) {
        val Seq(u1, u2, i11, i22, i12) = ss.map(_.get)
        val det = i11 * i22 - i12 * i12
        if (det > 0) {
          val d1 = (i22 * u1 - i12 * u2) / det
          val d2 = (i11 * u2 - i12 * u1) / det
          th1 = round9clamp(th1 * (1 + d1))
          th2 = round9clamp(th2 * (1 + d2))
        }
      }
    }

    // cohort totals from the checkpointed cell counts — identical longs
    // (Σ over the life catalog of per-cell memberships), no second
    // corpus pass
    val tot = perLife.agg(
      sum(col("_t1") + col("_t3")).as("n_a"),
      sum(col("_t0") + col("_t2")).as("n_b"),
      sum(col("_t2") + col("_t3")).as("n_x2"))
    val fin = {
      val spark = df.sparkSession
      import spark.implicits._
      val nEvents = statRows.map(_._8).sum
      val Seq(_, _, i11, i22, i12) = localSums(th1, th2)
      Seq((nEvents, i11, i22, i12)).toDF("n_events", "_i11", "_i22", "_i12")
    }
    val det = col("_i11") * col("_i22") - col("_i12") * col("_i12")
    tot.crossJoin(broadcast(fin))
      .select(col("n_a"), col("n_b"), col("n_x2"), col("n_events"),
        Portable.pround(lit(th1), 6).as("hazard_ratio_1"),
        Portable.pround(log(lit(th1)), 6).as("beta_1"),
        when(det > 0, Portable.pround(sqrt(col("_i22") / det), 6)).as("se_1"),
        when(det > 0,
          Portable.pround(log(lit(th1)) / sqrt(col("_i22") / det), 6)).as("z_1"),
        Portable.pround(lit(th2), 6).as("hazard_ratio_2"),
        Portable.pround(log(lit(th2)), 6).as("beta_2"),
        when(det > 0, Portable.pround(sqrt(col("_i11") / det), 6)).as("se_2"),
        when(det > 0,
          Portable.pround(log(lit(th2)) / sqrt(col("_i11") / det), 6)).as("z_2"))
  }

  def cochranQ(df: DataFrame, unitCol: String, treatmentCol: String): DataFrame = {
    val cells = df.where(col(unitCol).isNotNull && col(treatmentCol).isNotNull)
      .select(col(unitCol).as("_u"), col(treatmentCol).as("_t")).distinct()
    val k = cells.agg(countDistinct("_t").as("k"))
    val byType = cells.groupBy("_t").agg(count(lit(1)).as("_tj"))
      .agg(coalesce(sum("_tj"), lit(0L)).as("_tt"),
        coalesce(sum(col("_tj") * col("_tj")), lit(0L)).as("_tj2"))
    val byUnit = cells.groupBy("_u").agg(count(lit(1)).as("_ui"))
      .agg(count(lit(1)).as("n_units"),
        coalesce(sum("_ui"), lit(0L)).as("_us"),
        coalesce(sum(col("_ui") * col("_ui")), lit(0L)).as("_u2"))
    val kD = col("k").cast("double")
    val num = (kD - 1.0) *
      (kD * col("_tj2").cast("double") -
        col("_tt").cast("double") * col("_tt").cast("double"))
    val den = kD * col("_us").cast("double") - col("_u2").cast("double")
    byUnit.crossJoin(broadcast(k)).crossJoin(broadcast(byType))
      .select(col("n_units"), col("k"),
        when(col("k") > 1, col("k") - 1L).as("df"),
        when(col("k") > 1 && den > 0, Portable.pround(num / den, 6)).as("q_stat"))
  }

  /** Covariate-balance audit via standardized mean differences (r18b) —
    * the check UNDER every two-cohort comparison this engine ships
    * (C230/C209/C264/C291): are the cohorts comparable on their
    * PRE-EXISTING characteristics, SMD = (m_A − m_B)/√((v_A+v_B)/2) per
    * covariate, with the conventional |SMD| < 0.1 balance rule as a
    * caller-passed threshold. A "significant" outcome difference on
    * imbalanced cohorts is a covariate effect wearing a costume — this
    * is the one-table read that catches it (the observational-data
    * complement of C265's randomization check: C265 audits the hash,
    * THIS audits what the hash delivered).
    *
    * `covariates` are named per-unit AGGREGATES (count, sums, distinct
    * days…) evaluated in ONE unit-keyed exchange; the unit table then
    * unpivots row-locally to (covariate, value) and one catalog-sized
    * aggregate computes both cohorts' moments per covariate. Exact
    * decimal sums, variances NULL-guarded at the (n−1) division (the
    * ANSI lesson), fixed IEEE shapes.
    */
  def covariateBalance(df: DataFrame, unitCol: String, isA: Column => Column,
                       covariates: Seq[(String, Column)],
                       threshold: Double = 0.1): DataFrame = {
    require(covariates.nonEmpty, "need at least one covariate")
    val per = df.groupBy(col(unitCol).as("_u"))
      .agg(covariates.head._2.cast("double").as(covariates.head._1),
        covariates.tail.map { case (n, c) => c.cast("double").as(n) }: _*)
      .select(isA(col("_u")).as("_a"),
        explode(array(covariates.map { case (n, _) =>
          struct(lit(n).as("c"), col(n).as("v")) }: _*)).as("_e"))
      .select(col("_a"), col("_e.c").as("_c"), col("_e.v").as("_v"))
      .where(col("_v").isNotNull)
    val agg = per.groupBy("_c").agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
      Portable.decSum(when(col("_a"), col("_v")).otherwise(lit(0.0)), 6).as("_sa"),
      Portable.decSum(when(!col("_a"), col("_v")).otherwise(lit(0.0)), 6).as("_sb"),
      Portable.decSum(when(col("_a"), col("_v") * col("_v")).otherwise(lit(0.0)), 6)
        .as("_qa"),
      Portable.decSum(when(!col("_a"), col("_v") * col("_v")).otherwise(lit(0.0)), 6)
        .as("_qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val meanA = col("_sa") / na
    val meanB = col("_sb") / nb
    val varA = when(col("n_a") > 1,
      (col("_qa") - col("_sa") * col("_sa") / na) / (na - 1.0))
    val varB = when(col("n_b") > 1,
      (col("_qb") - col("_sb") * col("_sb") / nb) / (nb - 1.0))
    val pooled = (varA + varB) / 2.0
    val smd = (meanA - meanB) / sqrt(pooled)
    agg.select(col("_c").as("covariate"), col("n_a"), col("n_b"),
      when(col("n_a") > 0, round(meanA, 9)).as("mean_a"),
      when(col("n_b") > 0, round(meanB, 9)).as("mean_b"),
      when(pooled > 0, Portable.pround(smd, 6)).as("smd"),
      when(pooled > 0, abs(smd) < threshold).as("balanced"))
  }
}
