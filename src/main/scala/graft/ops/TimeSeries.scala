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

  /** One-observation lag return per series: (x / lag(x)) - 1.
    * README.md:177: "shift df.end_price by one observation, grouped by isin".
    * `orderCol` must be unique within a series for determinism.
    */
  def lagReturns(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesKey).orderBy(orderCol)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn("prev_value", prev)
      .withColumn("ret", col(valueCol) / nullif(col("prev_value"), lit(0.0)) - lit(1.0))
  }

  /** Rolling sample volatility over the trailing `n` observations
    * (README.md:177). Emits null (not NaN) for windows with < 2 rows so the
    * result is portable across engines.
    */
  def rollingVol(df: DataFrame, seriesKey: String, orderCol: String, valueCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(seriesKey).orderBy(orderCol).rowsBetween(-(n - 1), 0)
    val sd = stddev_samp(col(valueCol)).over(w)
    val cnt = count(col(valueCol)).over(w)
    df.withColumn("roll_vol", when(cnt > 1, sd))
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
    * per-key minute grid with sequence()+explode (distributed — the grid for
    * each key is generated where the key's data lives), left-joins the
    * observations, and carries values forward. The full B7 operator.
    */
  def densifyAndFill(
      df: DataFrame,
      seriesKey: String,
      tsCol: String,
      valueCol: String,
      stepSeconds: Long): DataFrame = {
    val bounds = df.groupBy(seriesKey)
      .agg(min(col(tsCol)).as("_t0"), max(col(tsCol)).as("_t1"))
    val step = expr(s"interval $stepSeconds seconds")
    val grid = bounds
      .select(col(seriesKey), explode(sequence(col("_t0"), col("_t1"), step)).as(tsCol))
    val obs = df.select(col(seriesKey), col(tsCol), col(valueCol))
    val joined = grid.join(obs, Seq(seriesKey, tsCol), "left")
    forwardFill(joined, seriesKey, tsCol, valueCol)
  }

  /** OHLCV resample to a coarser time bucket (README.md:178). open/close
    * use min_by/max_by on a unique order column — deterministic under
    * parallel execution (never first()/last(), which are order-dependent).
    * Volume sums use the exact-decimal trick (Portable.decSum).
    */
  def resampleOhlc(
      df: DataFrame,
      seriesKey: String,
      tsCol: String,
      orderCol: String,
      valueCol: String,
      bucket: String): DataFrame = {
    val b = date_trunc(bucket, col(tsCol)).as("bucket_ts")
    df.groupBy(col(seriesKey), b)
      .agg(
        min_by(col(valueCol), col(orderCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(orderCol)).as("close"),
        Portable.decSum(col(valueCol)).as("volume"),
        count(lit(1)).as("n_obs"))
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
}
