package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators declared by the reference's data model
  * (SURVEY.md §2.6, Tier B — /root/reference/README.md:22-24,173-180):
  * lag returns, rolling volatility, forward-fill of gaps, OHLC resampling,
  * cross-asset index aggregation.
  *
  * Scale posture: every window partitions by the series key (isin /
  * user_id), so state never exceeds one series per task; resampling is a
  * hash aggregation with map-side partials; the dense-grid forward fill
  * generates the grid *per key* with `sequence()` (distributed, no driver
  * loop) and fills with an unbounded-preceding `last(ignoreNulls)` window.
  */
object TimeSeries {

  /** Exponentially weighted moving average per series:
    * y₀ = x₀, yₜ = α·xₜ + (1−α)·yₜ₋₁ in orderCol order.
    *
    * The recursion is genuinely inexpressible as a window function (each
    * output depends on the previous OUTPUT, not a frame of inputs), so
    * this is the one sanctioned `mapPartitions` case: repartition by the
    * series key, sort each partition by (key, order), and run the
    * constant-space recurrence per key within a partition. State is two
    * doubles per task; keys never span partitions, so results are
    * independent of parallelism. The fold is left-to-right over the same
    * double ops as DuckDB's list_reduce, so the oracle matches
    * bit-for-bit. Key and order columns keep their original types (Row
    * encoder); only the value column is cast to double.
    */
  def ewma(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String,
           alpha: Double): DataFrame = {
    val in = df.select(col(seriesKey), col(orderCol), col(valueCol).cast("double"))
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields :+ org.apache.spark.sql.types.StructField(
        "ewma", org.apache.spark.sql.types.DoubleType, nullable = false))
    in.repartition(col(seriesKey))
      .sortWithinPartitions(col(seriesKey), col(orderCol))
      .mapPartitions { rows =>
        var curKey: Any = null
        var haveKey = false
        var acc = 0.0
        rows.map { r =>
          val k = r.get(0)
          val x = r.getDouble(2)
          if (!haveKey || k != curKey) { curKey = k; haveKey = true; acc = x }
          else acc = alpha * x + (1.0 - alpha) * acc
          org.apache.spark.sql.Row(r.get(0), r.get(1), x, acc)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(seriesKey, orderCol, valueCol, "ewma")
  }

  /** One-observation lag return per series: (x / lag(x)) - 1.
    * README.md:177: "shift df.end_price by one observation, grouped by isin".
    * `orderCol` must be unique within a series for determinism. Division by
    * a zero previous value yields null (nullif guard) — declared oracles
    * must mirror this with `nullif(prev, 0)`.
    */
  def lagReturns(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesKey).orderBy(orderCol)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn("prev_value", prev)
      .withColumn("ret", col(valueCol) / nullif(col("prev_value"), lit(0.0)) - lit(1.0))
  }

  /** Rolling sample volatility over the trailing `n` observations
    * (README.md:177), computed from exact-decimal window sums
    * (var = (Σx² − (Σx)²/n) / (n−1)) so the result is bit-portable across
    * engines regardless of each engine's internal stddev algorithm or
    * accumulation order. Null (not NaN) for windows with < 2 rows.
    */
  def rollingVol(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(seriesKey).orderBy(orderCol).rowsBetween(-(n - 1), 0)
    val v = col(valueCol)
    val cnt = count(v).over(w).cast("double")
    val s1 = sum(v.cast("decimal(28,6)")).over(w).cast("double")
    val s2 = sum((v * v).cast("decimal(28,6)")).over(w).cast("double")
    val variance = (s2 - s1 * s1 / cnt) / (cnt - lit(1.0))
    df.withColumn("roll_vol", when(cnt > 1, round(sqrt(greatest(variance, lit(0.0))), 6)))
  }

  /** Trailing TIME-window aggregate (RANGE frame): sum/count of the value
    * over the last `windowSeconds` of event time per series — unlike the
    * ROWS frames above, the frame is defined by timestamp distance, so
    * irregular sampling is handled correctly (a README.md:177-style
    * "rolling window of previous observations" keyed by time, not count).
    */
  def trailingTimeWindow(df: DataFrame, seriesKey: String, tsCol: String,
                         valueCol: String, windowSeconds: Long): DataFrame = {
    val epoch = unix_timestamp(col(tsCol))
    val w = Window.partitionBy(seriesKey).orderBy(epoch)
      .rangeBetween(-windowSeconds, 0)
    df.withColumn("trail_sum", sum(col(valueCol).cast("decimal(28,6)")).over(w).cast("double"))
      .withColumn("trail_cnt", count(col(valueCol)).over(w))
  }

  /** Forward-fill: carry the last non-null observation forward within a
    * series (README.md:22-24 "price needs to be inferred from the previous
    * observation"). Uses last(ignoreNulls) over an unbounded-preceding
    * window — single pass, no self-join.
    */
  def forwardFill(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesKey).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("filled_value", last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Densify a time series to a fixed step, then forward-fill: builds the
    * per-key grid with sequence()+explode (distributed — each key's grid is
    * generated where the key's data lives), left-joins the observations,
    * and carries values forward.
    *
    * Observations are first snapped DOWN to their grid bucket (epoch-aligned
    * floor to stepSeconds, keeping the observation with the latest raw
    * tsCol per bucket via max_by) so off-grid timestamps are bucketed
    * rather than silently dropped (round-1 defect: exact-equality join
    * lost unaligned rows). Caveat: two observations sharing the identical
    * raw timestamp within one bucket tie under max_by and resolve
    * arbitrarily — pre-aggregate to unique timestamps if that matters.
    * The grid itself is epoch-aligned so bucket boundaries are independent
    * of each key's min(ts) — stable under data arrival order.
    */
  def densifyAndFill(
      df: DataFrame,
      seriesKey: String,
      tsCol: String,
      valueCol: String,
      stepSeconds: Long): DataFrame = {
    val bucketTs = timestamp_seconds(
      floor(unix_timestamp(col(tsCol)) / stepSeconds) * stepSeconds)
    val snapped = df
      .withColumn("_bucket_ts", bucketTs)
      .groupBy(col(seriesKey), col("_bucket_ts"))
      .agg(max_by(col(valueCol), col(tsCol)).as(valueCol))
    val bounds = snapped.groupBy(seriesKey)
      .agg(min(col("_bucket_ts")).as("_t0"), max(col("_bucket_ts")).as("_t1"))
    val step = expr(s"interval $stepSeconds seconds")
    val grid = bounds
      .select(col(seriesKey), explode(sequence(col("_t0"), col("_t1"), step)).as("_bucket_ts"))
    val joined = grid.join(snapped, Seq(seriesKey, "_bucket_ts"), "left")
      .withColumnRenamed("_bucket_ts", tsCol)
    forwardFill(joined, seriesKey, tsCol, valueCol)
  }

  /** As-of join with a staleness tolerance: like `asOfJoin`, but the
    * carried state is nulled out when it is older than
    * `toleranceSeconds` at the event's timestamp — "the last quote, but
    * only if it is fresh enough". Second-resolution comparison
    * (unix_timestamp floor), matching the sessionizer's gap rule.
    */
  def asOfJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftValueCols: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    val joined = asOfJoin(left, right, keyCol, tsCol, leftValueCols)
    val fresh = col("asof_ts").isNotNull &&
      (unix_timestamp(col(tsCol)) - unix_timestamp(col("asof_ts"))) <= toleranceSeconds
    val asofCols = "asof_ts" +: leftValueCols.map(c => s"asof_$c")
    asofCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }
  }

  /** OHLCV resample to a coarser time bucket (README.md:178). open/close
    * use min_by/max_by on a unique order column — deterministic under
    * parallel execution (never first()/last(), which are order-dependent).
    * `volumeCol`/`tradesCol` are summed separately from the price column
    * (round-1 defect: volume was the sum of prices). Volume sums use the
    * exact-decimal trick (Portable.decSum) so partial-aggregation order
    * can't perturb the result.
    */
  def resampleOhlc(
      df: DataFrame,
      seriesKey: String,
      tsCol: String,
      orderCol: String,
      priceCol: String,
      volumeCol: String,
      bucket: String): DataFrame = {
    val b = date_trunc(bucket, col(tsCol)).as("bucket_ts")
    df.groupBy(col(seriesKey), b)
      .agg(
        min_by(col(priceCol), col(orderCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(orderCol)).as("close"),
        sum(col(volumeCol)).as("volume"),
        count(lit(1)).as("n_trades"))
  }

  /** As-of join: attach to every `right` row the most recent `left`
    * observation with left.ts <= right.ts for the same key (inclusive —
    * a left row at exactly right.ts is visible). The natural time-series
    * join for the reference's data model (README.md:175-177 joins
    * derivatives to their underlying's state at trade time).
    *
    * Spark has no native as-of join; the naive form is a range join
    * (quadratic blowup). This implementation is the scalable union-window
    * form: tag both streams, union, one window per key ordered by
    * (ts, tag), carry the last left payload forward — a SINGLE shuffle on
    * the key, per-task state of one row, no range join, no skew blowup.
    *
    * `leftValueCols` are emitted on matched rows as `asof_<name>`, plus
    * `asof_ts` (the matched left timestamp); unmatched rows get nulls.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftValueCols: Seq[String]): DataFrame = {
    val lPayload = struct(
      (col(tsCol).as("asof_ts") +: leftValueCols.map(c => col(c).as(s"asof_$c"))): _*)
    val l = left.select(col(keyCol), col(tsCol), lPayload.as("_lval"), lit(0).as("_tag"))
    val r = right.withColumn("_tag", lit(1))
    val unioned = r.unionByName(l, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("_filled", last(col("_lval"), ignoreNulls = true).over(w))
    val outCols = right.columns.map(col) ++
      (col("_filled.asof_ts").as("asof_ts") +:
        leftValueCols.map(c => col(s"_filled.asof_$c").as(s"asof_$c")))
    filled.where(col("_tag") === 1).select(outCols: _*)
  }

  /** Forward as-of join — the FIRST left row at-or-AFTER each right row's
    * timestamp per key ("the next quote/fill after the event"; asOfJoin's
    * mirror). Same union + single-window shape, with the frame flipped to
    * [current, unbounded following] and the tie order flipped so a left
    * row at exactly the right row's timestamp still matches. Determinism
    * requires (key, ts) uniqueness on the left, same as the backward
    * variant.
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftValueCols: Seq[String]): DataFrame = {
    val lPayload = struct(
      (col(tsCol).as("asof_ts") +: leftValueCols.map(c => col(c).as(s"asof_$c"))): _*)
    val l = left.select(col(keyCol), col(tsCol), lPayload.as("_lval"), lit(0).as("_tag"))
    val r = right.withColumn("_tag", lit(1))
    val unioned = r.unionByName(l, allowMissingColumns = true)
    // right (_tag 1) sorts BEFORE left (_tag 0) at equal ts, so the
    // forward frame starting at the right row includes same-ts left rows
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col("_tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned.withColumn("_filled", first(col("_lval"), ignoreNulls = true).over(w))
    val outCols = right.columns.map(col) ++
      (col("_filled.asof_ts").as("asof_ts") +:
        leftValueCols.map(c => col(s"_filled.asof_$c").as(s"asof_$c")))
    filled.where(col("_tag") === 1).select(outCols: _*)
  }

  /** Weighted cross-asset index per timestamp bucket (README.md:179):
    * sum(value*weight)/sum(weight), exact-decimal accumulation.
    */
  def weightedIndex(df: DataFrame, bucketCol: Column, valueCol: Column, weightCol: Column): DataFrame = {
    df.groupBy(bucketCol.as("bucket"))
      .agg(
        (sum((valueCol * weightCol).cast("decimal(28,8)")).cast("double") /
          sum(weightCol.cast("decimal(28,8)")).cast("double")).as("index_value"),
        count(lit(1)).as("n_assets"))
  }

  /** Linear gap interpolation: nulls in `valueCol` are filled by the
    * time-weighted line between the nearest non-null observations on
    * either side (forward-fill's smoother sibling — the standard sensor /
    * market-data gap repair). Leading gaps take the next value, trailing
    * gaps the previous (no extrapolation). Two windows per key carry the
    * nearest (timestamp, value) pair in each direction as a struct, so
    * state per row is O(1) and the shuffle is the usual one series-key
    * exchange. Weights use microsecond epochs; `orderCol` breaks
    * timestamp ties deterministically.
    */
  def interpolateLinear(df: DataFrame, keyCol: String, tsCol: String,
                        orderCol: String, valueCol: String): DataFrame = {
    val wPrev = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(orderCol).asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val obs = when(col(valueCol).isNotNull,
      struct(unix_micros(col(tsCol)).as("t"), col(valueCol).as("v")))
    val prev = last(obs, ignoreNulls = true).over(wPrev)
    val next = first(obs, ignoreNulls = true).over(wNext)
    val t = unix_micros(col(tsCol))
    df.withColumn("_prev", prev).withColumn("_next", next)
      .withColumn("filled_value",
        when(col(valueCol).isNotNull, col(valueCol))
          .when(col("_prev").isNull && col("_next").isNull, lit(null).cast("double"))
          .when(col("_prev").isNull, col("_next.v"))
          .when(col("_next").isNull, col("_prev.v"))
          .otherwise(col("_prev.v") + (col("_next.v") - col("_prev.v")) *
            ((t - col("_prev.t")).cast("double") /
              (col("_next.t") - col("_prev.t")).cast("double"))))
      .drop("_prev", "_next")
  }

  /** Volume-weighted average price per (key, bucket) — the execution /
    * market-microstructure resample (OHLCV's weighted sibling, reference
    * README.md:173-180 query family). One partial+final hash aggregate;
    * both sums are exact decimals so the ratio is order-independent
    * (Portable.decSum rationale) and safe to hash-check on any cluster.
    */
  def vwap(df: DataFrame, keyCol: String, bucketCol: Column,
           priceCol: Column, volCol: Column): DataFrame =
    df.groupBy(col(keyCol), bucketCol.as("bucket"))
      .agg(
        (sum((priceCol * volCol).cast("decimal(28,8)")).cast("double") /
          sum(volCol.cast("decimal(28,8)")).cast("double")).as("vwap"),
        Portable.decSum(volCol).as("total_vol"),
        count(lit(1)).as("n_trades"))

  /** Trailing N-row Pearson correlation between two columns per series —
    * the co-movement signal (pairs-trading / feature drift). All five
    * sufficient statistics are exact-decimal window sums over the same
    * frame (Portable.decCorr rationale: IEEE accumulation order is not
    * reproducible across partitionings; decimal sums are), so the rolling
    * coefficient is bit-stable and oracle-matchable. Frames shorter than
    * 2 rows or with zero variance yield null, not NaN/Inf. Callers must
    * pre-filter to rows where BOTH columns are non-null (e.g. drop the
    * lag-null head row) — mixed-null frames would make the five sums
    * range over inconsistent row sets.
    */
  def rollingCorr(df: DataFrame, keyCol: String, orderCol: String,
                  xCol: String, yCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol).asc)
      .rowsBetween(-(n - 1), 0)
    def ds(c: Column) = sum(c.cast("decimal(28,6)")).over(w).cast("double")
    val x = col(xCol); val y = col(yCol)
    val cnt = count(x).over(w).cast("double") // counts frames where BOTH present
    val sx = ds(x); val sy = ds(y)
    val sxx = ds(x * x); val syy = ds(y * y); val sxy = ds(x * y)
    val varX = cnt * sxx - sx * sx
    val varY = cnt * syy - sy * sy
    df.withColumn("roll_corr",
      when(cnt >= 2 && varX > 0 && varY > 0,
        (cnt * sxy - sx * sy) / (sqrt(varX) * sqrt(varY))))
  }

  /** Period-over-period change: exact-decimal revenue per (group, period)
    * with lag-1 absolute and relative deltas — the MoM/YoY reporting
    * staple. One aggregate + one O(1)-state lag window per group.
    */
  def periodChange(df: DataFrame, groupCol: String, periodCol: Column,
                   valueCol: Column): DataFrame = {
    val agg = df.groupBy(col(groupCol), periodCol.as("period"))
      .agg(Portable.decSum(valueCol).as("revenue"))
    val w = Window.partitionBy(groupCol).orderBy(col("period").asc)
    agg
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("abs_change", col("revenue") - col("prev_revenue"))
      .withColumn("pct_change",
        when(col("prev_revenue") =!= 0.0,
          round((col("revenue") - col("prev_revenue")) / col("prev_revenue"), 9)))
  }

  /** Per-series autocorrelation function: Pearson correlation between the
    * series and its own lag-L shift, for L = 1..maxLag — the periodicity
    * / persistence profile (machine-generated traffic shows flat-high
    * ACF, human activity decays; the temporal cousin of C143's
    * burstiness scalar). Sample form over the n−L overlapping pairs
    * (v_t, v_{t−L}), which matches the oracle-expressible definition
    * exactly; moment sums are exact decimals so the coefficient is
    * bit-stable at any partition count (the rollingCorr rationale).
    *
    * Scale shape: ONE series-key exchange — a single window pass emits
    * all maxLag lagged copies, a stack() fans them to (lag, v, v_lag)
    * rows (maxLag× the input, bounded by the small fixed lag count, all
    * row-local), and one hash aggregate per (key, lag) reduces to the
    * six sufficient moments. Degenerate series (under 2 pairs, zero
    * variance on either side) yield NULL, never NaN/Inf.
    */
  def acf(df: DataFrame, keyCol: String, orderCol: String,
          valueCol: String, maxLag: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol).asc)
    val lagged = (1 to maxLag).foldLeft(df.select(col(keyCol), col(orderCol), col(valueCol))) {
      (d, l) => d.withColumn(s"_lag$l", lag(col(valueCol), l).over(w))
    }
    val stackExpr = (1 to maxLag)
      .map(l => s"${l}L, `$valueCol`, `_lag$l`").mkString(", ")
    val pairs = lagged
      .select(col(keyCol),
        expr(s"stack($maxLag, $stackExpr) AS (lag, _x, _y)"))
      .where(col("_y").isNotNull)
    def ds(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
    val x = col("_x"); val y = col("_y")
    pairs.groupBy(col(keyCol), col("lag"))
      .agg(count(x).cast("long").as("n"),
        ds(x).as("_sx"), ds(y).as("_sy"),
        ds(x * x).as("_sxx"), ds(y * y).as("_syy"), ds(x * y).as("_sxy"))
      .select(col(keyCol), col("lag"), col("n"), {
        val c = col("n").cast("double")
        val varX = c * col("_sxx") - col("_sx") * col("_sx")
        val varY = c * col("_syy") - col("_sy") * col("_sy")
        when(col("n") >= 2 && varX > 0 && varY > 0,
          Portable.pround((c * col("_sxy") - col("_sx") * col("_sy")) /
            (sqrt(varX) * sqrt(varY)), 6)).as("acf")
      })
  }

  /** Running peak-to-trough drawdown per series: cumulative exact-decimal
    * sum of `valueCol` (the equity curve), its running maximum, and the
    * gap to that peak. Both are single-pass prefix windows over one
    * series-key exchange — O(1) state per row, no self-join; the decimal
    * cumsum makes every prefix exact, so the curve is reproducible at any
    * partition count (a double cumsum would drift with evaluation order).
    */
  def drawdown(df: DataFrame, keyCol: String, tsCol: String,
               orderCol: String, valueCol: String): DataFrame = {
    val wCum = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("equity",
        sum(col(valueCol).cast("decimal(28,4)")).over(wCum).cast("double"))
      .withColumn("peak", max(col("equity")).over(wCum))
      .withColumn("drawdown", col("peak") - col("equity"))
  }

  /** Holt double exponential smoothing per series (Holt 1957): level
    * and trend recurrences l_t = α·x_t + (1−α)·(l + b),
    * b_t = γ·(l_t − l) + (1−γ)·b, seeded l₀ = x₀, b₀ = 0 — the EWMA
    * that tracks a drifting series without lagging behind its slope
    * (and the one-step forecast l + b every monitoring dashboard plots).
    *
    * Like [[ewma]], the recursion depends on the previous OUTPUT, so
    * this is the sanctioned mapPartitions recurrence: repartition by the
    * series key, sort within partitions, constant state (two doubles)
    * per task. The fold is left-to-right over fixed IEEE shapes — the
    * DuckDB struct-accumulator list_reduce replays it bit-for-bit,
    * PROVIDED (1−α)/(1−γ) are literals that are exact in binary (pass
    * α, γ whose complements are representable, e.g. 0.5/0.25 — the
    * q_mmr constant rule).
    */
  def holt(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String,
           alpha: Double, gamma: Double): DataFrame = {
    val cAlpha = 1.0 - alpha
    val cGamma = 1.0 - gamma
    // NULL values would NPE inside the mapPartitions recurrence (ADVICE
    // r15); drop them up front — the expression-based operators (acf,
    // senSlope) NULL-propagate, and for a stateful recurrence "skip the
    // missing observation" is the standard, documented treatment.
    val in = df.where(col(valueCol).isNotNull)
      .select(col(seriesKey), col(orderCol), col(valueCol).cast("double"))
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "level", org.apache.spark.sql.types.DoubleType, nullable = false) :+
        org.apache.spark.sql.types.StructField(
          "trend", org.apache.spark.sql.types.DoubleType, nullable = false))
    in.repartition(col(seriesKey))
      .sortWithinPartitions(col(seriesKey), col(orderCol))
      .mapPartitions { rows =>
        var curKey: Any = null
        var haveKey = false
        var l = 0.0
        var b = 0.0
        rows.map { r =>
          val k = r.get(0)
          val x = r.getDouble(2)
          if (!haveKey || k != curKey) { curKey = k; haveKey = true; l = x; b = 0.0 }
          else {
            val l2 = alpha * x + cAlpha * (l + b)
            b = gamma * (l2 - l) + cGamma * b
            l = l2
          }
          org.apache.spark.sql.Row(r.get(0), r.get(1), x, l, b)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(seriesKey, orderCol, valueCol, "level", "trend")
  }

  /** Sen's slope per series (Sen 1968; Theil 1950): the median of all
    * pairwise slopes (v_j − v_i)/(o_j − o_i), i<j — the robust trend
    * MAGNITUDE that accompanies the Mann-Kendall trend TEST (MK says
    * whether a drift exists; Sen says how steep, immune to outliers a
    * least-squares slope would chase). The median is taken WITHOUT
    * percentile interpolation: rank the slopes, pick the middle row (or
    * the two straddling rows, averaged — a 2-term sum is order-free), so
    * both engines select the identical doubles (the r11 percentile-ulp
    * lesson, sidestepped instead of patched).
    *
    * Scale shape: the same bounded per-series self-join as mannKendall
    * (quadratic in series length only), then ONE series-key exchange
    * serves the count window, the rank window, and the final aggregate.
    * Series with < 2 points → no pairs → no output row (callers join
    * against mannKendall's n if they need the degenerate rows).
    */
  def senSlope(df: DataFrame, keyCol: String, orderCol: String,
               valueCol: String): DataFrame = {
    // r21: spread the compact input rows when the scan is under-split —
    // the broadcast self-join's PROBE side otherwise generates the
    // n²/2-per-series pair stream inside the single scan task
    // (structural no-op on real multi-split inputs)
    val base = Portable.spreadSmallScan(
      df.select(col(keyCol), col(orderCol).cast("double").as("_o"),
        col(valueCol).cast("double").as("_v")))
    // pair count from the series length (np = n(n−1)/2) instead of a
    // partition-wide count window: saves a second full window pass over
    // the pair frame (which is series-length² heavier than the input)
    val counts = base.groupBy(keyCol).agg(count(lit(1)).as("_n"))
      .select(col(keyCol),
        (col("_n") * (col("_n") - 1) / 2).cast("long").as("_np"))
      .where(col("_np") > 0)
    val pairs = base.as("a").join(base.as("b"),
      col(s"a.$keyCol") === col(s"b.$keyCol") && col("a._o") < col("b._o"))
      .select(col(s"a.$keyCol").as(keyCol),
        ((col("b._v") - col("a._v")) / (col("b._o") - col("a._o"))).as("_slope"))
      .repartition(col(keyCol))
    val wRank = Window.partitionBy(keyCol).orderBy("_slope")
    // integer middle ranks via floor: (np+1)/2 and (np+2)/2 straddle the
    // median for even np and coincide for odd np; the quotients are exact
    // doubles (integers < 2^53 divided by 2), so floor is portable
    pairs
      .withColumn("_rn", row_number().over(wRank))
      .join(counts, Seq(keyCol))
      .where(col("_rn") === floor((col("_np") + 1) / 2) ||
        col("_rn") === floor((col("_np") + 2) / 2))
      .groupBy(keyCol)
      .agg(max("_np").as("n_pairs"),
        Portable.canonZero(sum("_slope") / count(lit(1))).as("sen_slope"))
  }

  /** Two-sided CUSUM changepoint statistics per series (Page 1954): the
    * classic sequential drift detector — cusum_pos accumulates excess
    * above μ + k·σ, cusum_neg below μ − k·σ, each clamped at 0, alarm
    * when either clears h·σ. The complement of C184's retrospective
    * trend test: MK asks "did this series drift overall"; CUSUM marks
    * WHERE the shift happened, the shape a monitoring pipeline replays.
    * μ/σ are the series' own exact decimal moments (population form),
    * joined back per key — the in-sample-baseline convention (C159).
    *
    * The clamp max(0, S + c) depends on the previous OUTPUT, so this is
    * the sanctioned mapPartitions recurrence ([[ewma]], [[holt]]):
    * constant 2-double state per task; the oracle replays it via the
    * prepend-0 list_reduce (greatest is an exact IEEE op on identical
    * doubles, so parity is bit-for-bit).
    */
  def cusum(df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
            k: Double = 0.5, h: Double = 5.0): DataFrame = {
    val v = col(valueCol)
    // NULL observations would NPE in the recurrence below (ADVICE r15;
    // the holt() treatment): skip them up front. The filter must also
    // cover the mu/sigma aggregates — count(lit(1)) counts null-valued
    // rows that decSum ignores, which would deflate mu.
    val nn = df.where(v.isNotNull)
    val stats = nn.groupBy(keyCol).agg(
      count(lit(1)).as("_n"),
      Portable.decSum(v, 6).as("_s1"),
      Portable.decSum(v * v, 6).as("_s2"))
      .select(col(keyCol),
        (col("_s1") / col("_n")).as("_mu"),
        sqrt(greatest((col("_s2") - col("_s1") * col("_s1") / col("_n")) / col("_n"),
          lit(0.0))).as("_sigma"))
    val in = nn.select(col(keyCol), col(orderCol), v.cast("double"))
      .join(stats, Seq(keyCol))
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "cusum_pos", org.apache.spark.sql.types.DoubleType, nullable = false) :+
        org.apache.spark.sql.types.StructField(
          "cusum_neg", org.apache.spark.sql.types.DoubleType, nullable = false))
    in.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .mapPartitions { rows =>
        var curKey: Any = null
        var haveKey = false
        var pos = 0.0
        var neg = 0.0
        rows.map { r =>
          val kk = r.get(0)
          val x = r.getDouble(2)
          val mu = r.getDouble(3)
          val sigma = r.getDouble(4)
          if (!haveKey || kk != curKey) { curKey = kk; haveKey = true; pos = 0.0; neg = 0.0 }
          pos = math.max(0.0, pos + (x - (mu + k * sigma)))
          neg = math.max(0.0, neg + ((mu - k * sigma) - x))
          org.apache.spark.sql.Row(r.get(0), r.get(1), x, mu, sigma, pos, neg)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(keyCol, orderCol, valueCol, "_mu", "_sigma", "cusum_pos", "cusum_neg")
      .withColumn("alarm",
        col("cusum_pos") > lit(h) * col("_sigma") ||
          col("cusum_neg") > lit(h) * col("_sigma"))
      .drop("_mu", "_sigma")
  }

  /** Mann–Kendall trend test per series (Mann 1945; Kendall 1975): S =
    * Σ_{i<j} sign(v_j − v_i) over `orderCol` order, and Kendall's tau-a
    * = 2S / (n(n−1)) — the nonparametric "is this series drifting"
    * screen that needs no distributional assumption and shrugs off
    * outliers (only signs enter). S and n are integers; tau is the one
    * final division, so the output double is engine-exact unrounded.
    *
    * Scale shape: an equi-join on the series key with an order-column
    * inequality — quadratic IN THE SERIES LENGTH only, which for
    * per-entity behavioral streams is a bounded constant (the C142
    * blocking rationale); the key exchange itself is linear. Series of
    * length < 2 → NULL tau, never a division by zero.
    */
  def mannKendall(df: DataFrame, keyCol: String, orderCol: String,
                  valueCol: String): DataFrame = {
    val base = df.select(col(keyCol), col(orderCol).as("_o"), col(valueCol).as("_v"))
    val pairs = base.as("a").join(base.as("b"),
      col(s"a.$keyCol") === col(s"b.$keyCol") && col("a._o") < col("b._o"))
      .select(col(s"a.$keyCol").as(keyCol),
        signum(col("b._v") - col("a._v")).cast("long").as("_sgn"))
    val n = base.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val s = pairs.groupBy(keyCol).agg(sum("_sgn").as("s"))
    n.join(s, Seq(keyCol), "left")
      .na.fill(0L, Seq("s"))
      .select(col(keyCol), col("n"), col("s"),
        when(col("n") >= 2,
          (col("s") * 2).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")).as("tau"))
  }

  /** Classical additive seasonal decomposition per series (the
    * moving-average method of Macaulay 1931, the `decompose()` default in
    * every stats stack): value = trend + seasonal + residual, on a daily
    * grid with weekly period `period`.
    *
    *   trend_t    = centered `period`-point moving average (only where the
    *                full window exists — edge rows keep NULL trend);
    *   seasonal_p = mean of (value − trend) per phase p = epochDay mod
    *                period, re-centered so the phases sum to zero;
    *   residual_t = value − trend − seasonal.
    *
    * Engine parity: the daily value and every window/phase mean
    * decimal-accumulate; the phase index is epoch-day mod period (both
    * engines agree on epoch-day arithmetic; day-of-week builtins do NOT
    * agree on week start). Odd `period` only (the centered window is
    * symmetric; even periods need the 2×period double-MA variant).
    *
    * Scale shape: one (key, day) hash aggregate collapses the corpus to
    * series-length-sized rows; the trend window and the phase aggregate
    * both ride the key exchange; the phase means re-join as a broadcast
    * (keys × period rows). Nothing after the first aggregate is
    * corpus-sized.
    */
  def seasonalDecompose(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, period: Int = 7): DataFrame = {
    require(period % 2 == 1, "centered MA needs an odd period")
    val half = period / 2
    val daily = df
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        col(valueCol).cast("double").as("_v"))
      .groupBy(keyCol, "day")
      .agg(Portable.decSum(col("_v"), 6).as("value"))
      .withColumn("_phase",
        pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(period)))
    val wTrend = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(-half, half)
    // exact decimal window sum, then ONE double division — decimal
    // division result scales differ between engines, double / int does not
    val withTrend = daily.withColumn("trend",
      when(count(lit(1)).over(wTrend) === period,
        sum(col("value").cast("decimal(28,12)")).over(wTrend)
          .cast("double") / period))
    val phase = withTrend
      .where(col("trend").isNotNull)
      .groupBy(keyCol, "_phase")
      .agg((Portable.decSum(col("value") - col("trend"), 12) /
        count(lit(1))).cast("double").as("_praw"))
    val centered = phase
      .withColumn("_pmean",
        sum(col("_praw").cast("decimal(28,12)"))
          .over(Window.partitionBy(keyCol)).cast("double") /
          count(lit(1)).over(Window.partitionBy(keyCol)))
      .select(col(keyCol), col("_phase"),
        (col("_praw") - col("_pmean")).as("_seasonal"))
    withTrend.join(broadcast(centered), Seq(keyCol, "_phase"), "left")
      .select(col(keyCol), col("day"),
        Portable.pround(col("value"), 6).as("value"),
        Portable.pround(col("trend"), 6).as("trend"),
        Portable.pround(col("_seasonal"), 6).as("seasonal"),
        Portable.pround(col("value") - col("trend") - col("_seasonal"), 6)
          .as("residual"))
  }

  /** One-step-ahead forecast accuracy of the Holt smoother per series:
    * f_t = level_{t−1} + trend_{t−1} (the model's own next-step
    * prediction), scored with the three standard scale-aware metrics —
    * MAE, SMAPE (symmetric, zero-denominator terms contribute 0 by the
    * documented convention), and MASE (MAE over the naive-forecast MAE
    * |x_t − x_{t−1}| — the "is the model better than persistence"
    * number; NULL on constant series where the naive MAE is 0). The
    * measurement-layer closer for the forecasting family (C186/C252):
    * a smoother nobody scores is a prior, not a forecast.
    *
    * All numerators/denominators are decimal sums of fixed double terms
    * (the holt recurrence's own outputs), divisions fixed-shape,
    * round(6) — hash-checkable. One series-key exchange total: the
    * recurrence pass is reused for the lag window and the aggregate.
    */
  def forecastAccuracy(df: DataFrame, seriesKey: String, orderCol: String,
                       valueCol: String, alpha: Double, gamma: Double): DataFrame = {
    val h = holt(df, seriesKey, orderCol, valueCol, alpha, gamma)
    val w = Window.partitionBy(seriesKey).orderBy(orderCol)
    val f = lag(col("level"), 1).over(w) + lag(col("trend"), 1).over(w)
    val x = col(valueCol)
    // the naive baseline lag computes BEFORE the first-row filter — on
    // the filtered frame the first surviving row would lag to null and
    // desync the MASE denominator's term count from the MAE's
    val scored = h.withColumn("_f", f)
      .withColumn("_naive", abs(x - lag(x, 1).over(w)))
      .where(col("_f").isNotNull)
      .withColumn("_e", x - col("_f"))
    val denomS = abs(x) + abs(col("_f"))
    val agg = scored
      .withColumn("_smapeTerm",
        when(denomS > 0, lit(2.0) * abs(col("_e")) / denomS).otherwise(lit(0.0)))
      .groupBy(seriesKey)
      .agg(count(lit(1)).as("n_forecasts"),
        Portable.decSum(abs(col("_e")), 12).as("_sae"),
        Portable.decSum(col("_smapeTerm"), 12).as("_ssm"),
        Portable.decSum(col("_naive"), 12).as("_snv"))
    agg.select(col(seriesKey), col("n_forecasts"),
      Portable.pround(col("_sae") / col("n_forecasts").cast("double"), 6).as("mae"),
      Portable.pround(col("_ssm") / col("n_forecasts").cast("double"), 6).as("smape"),
      when(col("_snv") > 0,
        Portable.pround((col("_sae") / col("n_forecasts").cast("double")) /
          (col("_snv") / col("n_forecasts").cast("double")), 6)).as("mase"))
  }

  /** Cross-correlation function between two daily series at lags
    * −maxLag..+maxLag: does series A LEAD series B (positive-lag
    * correlation) or follow it — the lead/lag discovery primitive ACF
    * (C170) cannot see because it only correlates a series with itself.
    * Series are exact decimal daily sums over the DENSE shared day grid
    * (absent days are true zeros — the q_ffill densify convention, so a
    * quiet day is signal, not a dropped row); each lag's correlation is
    * [[Portable.decCorr]] over the grid join shifted by the lag.
    *
    * Scale shape: two daily aggregates (map-side combinable, day-catalog
    * sized), the dense grid via sequence+explode off the 1-row bounds
    * aggregate, one broadcast-joined frame per lag over the CATALOG —
    * never the raw events. n_days rides along so a reader can judge the
    * overlap each lag's coefficient rests on.
    */
  def crossCorrelation(df: DataFrame, tsCol: String, typeCol: String,
                       valueCol: String, typeA: String, typeB: String,
                       maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0 (got $maxLag)")
    val daily = df.where(col(typeCol).isin(typeA, typeB))
      .groupBy(to_date(col(tsCol)).as("_day"), col(typeCol).as("_t"))
      .agg(Portable.decSum(col(valueCol), 6).as("_s"))
    val bounds = daily.agg(min("_day").as("_lo"), max("_day").as("_hi"))
    val grid = bounds.select(explode(sequence(col("_lo"), col("_hi"))).as("_day"))
    def side(t: String, alias: String) = grid
      .join(daily.where(col("_t") === t).select(col("_day"), col("_s")), Seq("_day"), "left")
      .select(col("_day"), coalesce(col("_s"), lit(0.0)).as(alias))
    val a = side(typeA, "_va")
    val b = side(typeB, "_vb")
    (-maxLag to maxLag).map { lag =>
      // positive lag: A at day d vs B at day d + lag (A leads by `lag`)
      a.join(b.select(date_sub(col("_day"), lag).as("_day"), col("_vb")), Seq("_day"))
        .agg(count(lit(1)).as("n_days"),
          Portable.pround(Portable.decCorr(col("_va"), col("_vb"), 6), 6).as("ccf"))
        .select(lit(lag.toLong).as("lag"), col("n_days"), col("ccf"))
    }.reduce(_ unionAll _)
  }

  /** Single best change-point per series by binary segmentation: the
    * split k (1 ≤ k < n, in `orderCol` order) minimizing
    * SSE(1..k) + SSE(k+1..n) — the first step of the classic binary-
    * segmentation / PELT family, and the LOCALIZING complement of the
    * CUSUM detector (C191 says "a drift exists"; this says WHERE the
    * level shifted, with the variance explained by the split as the
    * effect size).
    *
    * Exactness: both range SSEs come from exact decimal prefix sums
    * (SSE(i..j) = Σx² − (Σx)²/n — the rollingVol identity on ranges), so
    * every candidate's cost is the same fixed double expression in both
    * engines and the argmin (ties → smallest k) picks identical rows.
    *
    * Scale shape: ONE series-key exchange serves the prefix windows, the
    * totals window, and the final argmin aggregate; per-row state is two
    * decimals. No driver loop — all candidate splits evaluate at once.
    */
  def binSegChangepoint(df: DataFrame, seriesKey: String, orderCol: String,
                        valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesKey).orderBy(orderCol)
    val wAll = Window.partitionBy(seriesKey)
    val v = col(valueCol).cast("double")
    val base = df.where(col(valueCol).isNotNull)
      .select(col(seriesKey), col(orderCol), v.as("_v"))
      .withColumn("_k", row_number().over(w).cast("long"))
      .withColumn("_s1", sum(col("_v").cast("decimal(28,6)")).over(w).cast("double"))
      .withColumn("_s2", sum((col("_v") * col("_v")).cast("decimal(28,6)")).over(w).cast("double"))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_t1", sum(col("_v").cast("decimal(28,6)")).over(wAll).cast("double"))
      .withColumn("_t2", sum((col("_v") * col("_v")).cast("decimal(28,6)")).over(wAll).cast("double"))
    val k = col("_k").cast("double")
    val nr = (col("_n") - col("_k")).cast("double")
    val sseL = col("_s2") - col("_s1") * col("_s1") / k
    val sseR = (col("_t2") - col("_s2")) -
      (col("_t1") - col("_s1")) * (col("_t1") - col("_s1")) / nr
    val cand = base.where(col("_k") < col("_n"))
      .withColumn("_cost", sseL + sseR)
      .withColumn("_total", col("_t2") - col("_t1") * col("_t1") / col("_n").cast("double"))
    cand.groupBy(seriesKey)
      .agg(
        min(struct(col("_cost"), col("_k"), col(orderCol).as("_o"), col("_total"))).as("_best"),
        max("_n").as("n"))
      .select(col(seriesKey), col("n"),
        col("_best._k").as("split_k"),
        col("_best._o").as("split_order"),
        Portable.pround(col("_best._cost"), 6).as("sse_split"),
        Portable.pround(col("_best._total"), 6).as("sse_total"),
        when(col("_best._total") > 0,
          Portable.pround((col("_best._total") - col("_best._cost")) / col("_best._total"), 6))
          .as("gain_ratio"))
  }

  /** Holt-Winters additive triple exponential smoothing per series —
    * [[holt]] plus a season-m additive component: with s̄ the seasonal
    * slot m observations back,
    *
    *   l_t = α(x_t − s̄) + (1−α)(l + b)
    *   b_t = γ(l_t − l) + (1−γ)b
    *   s_t = δ(x_t − l_t) + (1−δ)s̄
    *
    * Seeding convention (deterministic by design — the classical
    * first-season averages trade reproducibility for folklore): level
    * seeds at the first value, trend at 0, ALL seasonal slots at 0, so
    * the first season degrades exactly to [[holt]] and seasonals learn
    * from cycle two on. Each key's state is (l, b) + an m-slot ring
    * buffer in one mapPartitions pass; the oracle replays it as a
    * prefix fold over (m+2)-element arrays. NULLs skipped (r16 rule).
    */
  def holtWinters(df: DataFrame, seriesKey: String, orderCol: String,
                  valueCol: String, m: Int, alpha: Double, gamma: Double,
                  delta: Double): DataFrame = {
    require(m >= 1, s"season length must be >= 1 (got $m)")
    val cA = 1.0 - alpha; val cG = 1.0 - gamma; val cD = 1.0 - delta
    val in = df.where(col(valueCol).isNotNull)
      .select(col(seriesKey), col(orderCol), col(valueCol).cast("double"))
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields ++ Seq("level", "trend", "seasonal").map(
        org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    in.repartition(col(seriesKey))
      .sortWithinPartitions(col(seriesKey), col(orderCol))
      .mapPartitions { rows =>
        var curKey: Any = null
        var haveKey = false
        var l = 0.0; var b = 0.0
        var ring: Array[Double] = null
        var head = 0
        rows.map { r =>
          val k = r.get(0)
          val x = r.getDouble(2)
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true
            l = x; b = 0.0
            ring = new Array[Double](m); head = 0
            // first obs only initializes state (l = x, b = 0, fresh
            // all-zero ring; head stays 0) — the ring is first consumed
            // at the SECOND observation, which reads slot-0's 0.0
            // (ADVICE r16: the old comment misstated this as a slot-0
            // read+write on the first obs)
          } else {
            val sPrev = ring(head)
            val l2 = alpha * (x - sPrev) + cA * (l + b)
            b = gamma * (l2 - l) + cG * b
            l = l2
            ring(head) = delta * (x - l2) + cD * sPrev
            head = (head + 1) % m
          }
          val sNew = if (head == 0) ring(m - 1) else ring(head - 1)
          // for the first obs of a key head==0 and ring is all zeros
          org.apache.spark.sql.Row(r.get(0), r.get(1), x, l, b, sNew)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(seriesKey, orderCol, valueCol, "level", "trend", "seasonal")
  }

  /** MACD per series (Appel's moving-average convergence/divergence —
    * the standard momentum indicator of the reference's market-data
    * domain): fast and slow EWMAs of the value, macd = fast − slow, a
    * signal EWMA over the macd stream, hist = macd − signal. Smoothing
    * factors are the conventional α = 2/(n+1); every EWMA seeds at the
    * series' first value (the [[ewma]] convention), so macd/signal/hist
    * start at exactly 0.
    *
    * One mapPartitions recurrence pass carrying THREE accumulators —
    * the [[ewma]]/[[holt]] shape (each output depends on the previous
    * OUTPUT, inexpressible as a window): series-key repartition, sorted
    * within partitions, constant state per task. NULL observations are
    * skipped up front (the r16 holt/cusum treatment). Every step is a
    * fixed left-to-right double op, so an oracle can replay it with
    * prefix folds bit-for-bit.
    */
  def macd(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String,
           fastN: Int = 12, slowN: Int = 26, signalN: Int = 9): DataFrame = {
    val aF = 2.0 / (fastN + 1.0); val aS = 2.0 / (slowN + 1.0)
    val aG = 2.0 / (signalN + 1.0)
    val in = df.where(col(valueCol).isNotNull)
      .select(col(seriesKey), col(orderCol), col(valueCol).cast("double"))
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields ++ Seq("macd", "signal", "hist").map(
        org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    in.repartition(col(seriesKey))
      .sortWithinPartitions(col(seriesKey), col(orderCol))
      .mapPartitions { rows =>
        var curKey: Any = null
        var haveKey = false
        var fast = 0.0; var slow = 0.0; var sig = 0.0
        rows.map { r =>
          val k = r.get(0)
          val x = r.getDouble(2)
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; fast = x; slow = x; sig = 0.0
          } else {
            fast = aF * x + (1.0 - aF) * fast
            slow = aS * x + (1.0 - aS) * slow
            sig = aG * (fast - slow) + (1.0 - aG) * sig
          }
          val m = fast - slow
          org.apache.spark.sql.Row(r.get(0), r.get(1), x, m, sig, m - sig)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(seriesKey, orderCol, valueCol, "macd", "signal", "hist")
  }

  /** RSI per series (Wilder's relative strength index, EWMA-smoothed
    * variant): split each delta into gain/loss, smooth both with
    * α = 1/n seeded at the FIRST delta (the [[ewma]] seeding convention
    * — the classic n-bar arithmetic warm-up trades reproducibility for
    * folklore and is deliberately not used; documented deviation), then
    * RSI = 100 − 100/(1 + avgGain/avgLoss). Degenerate states are
    * pinned: no losses yet → 100 when gains exist; a flat series (no
    * gains AND no losses) → 50; the series' first row has no delta →
    * NULL. Same mapPartitions recurrence contract as [[macd]].
    */
  def rsi(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String,
          n: Int = 14): DataFrame = {
    val a = 1.0 / n
    val in = df.where(col(valueCol).isNotNull)
      .select(col(seriesKey), col(orderCol), col(valueCol).cast("double"))
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields :+ org.apache.spark.sql.types.StructField(
        "rsi", org.apache.spark.sql.types.DoubleType, nullable = true))
    in.repartition(col(seriesKey))
      .sortWithinPartitions(col(seriesKey), col(orderCol))
      .mapPartitions { rows =>
        var curKey: Any = null
        var haveKey = false
        var prev = 0.0
        var haveDelta = false
        var ag = 0.0; var al = 0.0
        rows.map { r =>
          val k = r.get(0)
          val x = r.getDouble(2)
          var out: Any = null
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; haveDelta = false; ag = 0.0; al = 0.0
          } else {
            val d = x - prev
            val g = if (d > 0) d else 0.0
            val l = if (d < 0) -d else 0.0
            if (!haveDelta) { ag = g; al = l; haveDelta = true }
            else { ag = a * g + (1.0 - a) * ag; al = a * l + (1.0 - a) * al }
            out =
              if (al == 0.0 && ag == 0.0) 50.0
              else if (al == 0.0) 100.0
              else 100.0 - 100.0 / (1.0 + ag / al)
          }
          prev = x
          org.apache.spark.sql.Row(r.get(0), r.get(1), x, out)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(seriesKey, orderCol, valueCol, "rsi")
  }

  /** Bollinger bands + %B per series: trailing-n mean and sample stddev
    * (the [[rollingVol]] exact-decimal recipe — var from decimal window
    * sums, so bits match across engines), bands at mid ± k·sd, and
    * %B = (x − lower)/(upper − lower) — the normalized band position
    * that feeds mean-reversion screens. NULL until the window holds ≥ 2
    * rows; %B NULL when the band has zero width (flat window).
    */
  def bollinger(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String,
                n: Int = 20, k: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(seriesKey).orderBy(orderCol).rowsBetween(-(n - 1), 0)
    val v = col(valueCol)
    val cnt = count(v).over(w).cast("double")
    val s1 = sum(v.cast("decimal(28,6)")).over(w).cast("double")
    val s2 = sum((v * v).cast("decimal(28,6)")).over(w).cast("double")
    val mid = s1 / cnt
    val sd = sqrt(greatest((s2 - s1 * s1 / cnt) / (cnt - lit(1.0)), lit(0.0)))
    val upper = mid + lit(k) * sd
    val lower = mid - lit(k) * sd
    df.withColumn("bb_mid", when(cnt > 1, Portable.pround(mid, 6)))
      .withColumn("bb_upper", when(cnt > 1, Portable.pround(upper, 6)))
      .withColumn("bb_lower", when(cnt > 1, Portable.pround(lower, 6)))
      .withColumn("pct_b",
        when(cnt > 1 && upper - lower > 0,
          Portable.pround((v - lower) / (upper - lower), 6)))
  }

  /** Fano factor / index-of-dispersion per series (r18b) — is the daily
    * arrival process BURSTY: Fano = var/mean of the daily counts over
    * the DENSE day grid (quiet days are true zeros — the C261 densify
    * convention; dropping them would fake regularity). Under a Poisson
    * stream Fano = 1 and D = Σ(x−x̄)²/x̄ = (n−1)·Fano ~ χ²_{n−1}, so
    * `overdispersed` compares D to a caller-passed χ² critical literal
    * (the C265 convention — the χ² CDF is a cross-engine transcendental;
    * the caller owns the df/α choice). Burstiness is the capacity read
    * UNDER the C266/C274 tail fits: a Fano of 30 means provisioning for
    * the MEAN is meaningless.
    *
    * Portability: daily counts are exact integers; Σx² goes through
    * decimal(38,0) (at 100 TB a 1e9-events day squares past 2⁶³); mean,
    * variance, Fano are fixed double shapes with the (n−1) division
    * NULL-guarded at the divisor (the ANSI lesson). One (key, day) hash
    * aggregate collapses the corpus; the grid is keys × bounded
    * calendar.
    */
  def fanoDispersion(df: DataFrame, keyCol: String, tsCol: String,
                     chi2Crit: Double): DataFrame =
    fanoFromDaily(
      df.where(col(tsCol).isNotNull)
        .groupBy(col(keyCol).as("_k"), to_date(col(tsCol)).as("_day"))
        .agg(count(lit(1)).as("_c")),
      keyCol, chi2Crit)

  /** [[fanoDispersion]] from an already-maintained (_k, _day, _c) daily
    * count table — the shared read path for the batch query and the
    * streaming twin (daily counts are an additive monoid, so a state
    * merged at any micro-batch boundary reads bit-identically).
    */
  def fanoFromDaily(daily: DataFrame, keyCol: String,
                    chi2Crit: Double): DataFrame = {
    val bounds = daily.agg(min("_day").as("_lo"), max("_day").as("_hi"))
    val keys = daily.select("_k").distinct()
    val grid = keys.crossJoin(broadcast(bounds))
      .select(col("_k"), explode(sequence(col("_lo"), col("_hi"))).as("_day"))
    val dense = grid.join(daily, Seq("_k", "_day"), "left")
      .select(col("_k"), coalesce(col("_c"), lit(0L)).as("_c"))
    val per = dense.groupBy("_k").agg(
      count(lit(1)).as("n_days"),
      sum("_c").as("n_events"),
      sum((col("_c") * col("_c")).cast("decimal(38,0)")).cast("double").as("_q"))
    val nD = col("n_days").cast("double")
    val sD = col("n_events").cast("double")
    val mean = sD / nD
    val variance = when(col("n_days") > 1,
      (col("_q") - sD * sD / nD) / (nD - 1.0))
    val fano = when(col("n_events") > 0, variance / mean)
    per.select(col("_k").as(keyCol), col("n_days"), col("n_events"),
      round(mean, 9).as("mean_daily"),
      Portable.pround(fano, 6).as("fano"),
      Portable.pround((nD - 1.0) * fano, 6).as("dispersion_chi2"),
      ((nD - 1.0) * fano > chi2Crit).as("overdispersed"))
  }
}
