package graft.etl

import graft.SparkSpec
import graft.ops.TimeSeries
import org.apache.spark.sql.functions._

/** The reference's *documented* analytical queries
  * (/root/reference/README.md:173-180 and :22-24) executed on the
  * reference's own sample data through this engine's operators — the
  * "a user of the reference could switch" test:
  *   - returns via lag of end_price per isin        (README.md:177)
  *   - rolling-window volatility                    (README.md:177)
  *   - OHLCV re-aggregation to coarser bars         (README.md:178)
  *   - cross-asset index from trading_ts groups     (README.md:179)
  *   - derivative↔underlying composite join         (README.md:175-176)
  *   - price inference for tradeless minutes        (README.md:22-24)
  */
class ReferenceAnalyticsSpec extends SparkSpec {

  private lazy val xetra = XetraPipeline.derive(XetraPipeline.read(
    spark, "/root/reference/sample-data/2020-11-24_BINS_XETR08.csv")).cache()
  private lazy val eurex = EurexPipeline.derive(EurexPipeline.read(
    spark, "/root/reference/sample-data/2020-11-24_BINS_XEUR08.csv")).cache()

  test("returns: lag(end_price) per isin over trading_ts (README.md:177)") {
    val rets = TimeSeries.lagReturns(xetra, "isin", "trading_ts", "end_price")
    val sant = rets.where(col("isin") === "AT0000A0E9W5")
      .orderBy("trading_ts").select("end_price", "ret").collect()
    assert(sant.length > 10)
    assert(sant.head.isNullAt(1))                      // first bar: no previous
    val r1 = sant(1)
    assert(math.abs(r1.getDouble(1) - (r1.getDouble(0) / sant.head.getDouble(0) - 1)) < 1e-12)
    // one return per input row, no fan-out
    assert(rets.count() === xetra.count())
  }

  test("rolling volatility over a 30-observation window (README.md:177)") {
    val withRets = TimeSeries.lagReturns(xetra, "isin", "trading_ts", "end_price")
      .where(col("ret").isNotNull)
    val vol = TimeSeries.rollingVol(withRets, "isin", "trading_ts", "ret", 30)
    val nonNull = vol.where(col("roll_vol").isNotNull)
    assert(nonNull.count() > 0)
    assert(nonNull.where(col("roll_vol") < 0).count() === 0)
  }

  test("OHLCV hourly resample conserves traded volume (README.md:178)") {
    val bars = TimeSeries.resampleOhlc(xetra, "isin", "trading_ts", "trading_ts",
      "end_price", "traded_volume", "hour")
    val rawVol = xetra.agg(sum("traded_volume")).head().getLong(0)
    val barVol = bars.agg(sum("volume")).head().getLong(0)
    assert(rawVol === barVol)
    // sample covers one hour → exactly one bar per traded isin
    assert(bars.count() === xetra.select("isin").distinct().count())
    val bad = bars.where(col("high") < col("low") ||
      col("open") > col("high") || col("close") < col("low")).count()
    assert(bad === 0)
  }

  test("cross-asset index: volume-weighted price per minute (README.md:179)") {
    val idx = TimeSeries.weightedIndex(
      xetra.where(col("traded_volume") > 0),
      col("trading_ts"), col("end_price"), col("traded_volume").cast("double"))
    assert(idx.count() === 60)                         // one per minute of the hour
    assert(idx.where(col("index_value") <= 0).count() === 0)
  }

  test("derivative↔underlying composite-key join (README.md:175-176)") {
    val derivs = eurex.where(col("underlying_isin").isNotNull)
      .select(col("isin").as("deriv_isin"), col("underlying_isin").as("u_isin"),
        col("trading_ts"), col("end_price").as("deriv_price"))
    val underl = xetra.select(col("isin").as("u_isin"), col("trading_ts"),
      col("end_price").as("underlying_price"))
    val joined = derivs.join(underl, Seq("u_isin", "trading_ts"))
    assert(joined.count() > 0)                         // sample hours overlap
    assert(joined.select("deriv_isin").distinct().count() > 0)
  }

  test("price inference for tradeless minutes: densify + forward-fill (README.md:22-24)") {
    val sant = xetra.where(col("isin") === "AT0000A0E9W5")
      .select("isin", "trading_ts", "end_price")
    val dense = TimeSeries.densifyAndFill(sant, "isin", "trading_ts", "end_price", 60L)
    val observed = sant.count()
    val densified = dense.count()
    assert(densified >= observed)                      // gaps now materialized
    assert(dense.where(col("filled_value").isNull).count() === 0) // all minutes priced
    // filled minutes carry the previous observation's price: total distinct
    // prices cannot exceed the observed distinct prices
    assert(dense.select("filled_value").distinct().count() <=
           sant.select("end_price").distinct().count())
  }
}
