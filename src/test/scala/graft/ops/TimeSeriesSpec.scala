package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Bar(isin: String, seq: Long, ts: java.sql.Timestamp, price: Double, vol: Long)

class TimeSeriesSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private def bars = df(Seq(
    Bar("A", 1, t("2024-01-01 09:00:00"), 100.0, 10),
    Bar("A", 2, t("2024-01-01 09:01:00"), 110.0, 20),
    Bar("A", 3, t("2024-01-01 09:03:00"), 99.0, 5),
    Bar("B", 4, t("2024-01-01 09:00:00"), 50.0, 7)))

  test("ewma matches the sequential recurrence at any parallelism") {
    val s = spark
    import s.implicits._
    val data = (0L until 4L).flatMap(k => (0L until 50L).map(i => (k, i, (i * 7 % 13).toDouble)))
    val in = data.toDF("user_id", "event_id", "value")
    val alpha = 0.3
    val expected = data.groupBy(_._1).flatMap { case (k, rows) =>
      var acc = 0.0
      rows.sortBy(_._2).zipWithIndex.map { case ((_, i, x), idx) =>
        acc = if (idx == 0) x else alpha * x + (1.0 - alpha) * acc
        (k, i) -> acc
      }
    }.toMap
    Seq(1, 3, 7).foreach { p =>
      val out = TimeSeries.ewma(in.repartition(p), "user_id", "event_id", "value", alpha)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
      assert(out === expected, s"mismatch at input parallelism $p")
    }
  }

  test("ewma preserves non-numeric key types (string series keys)") {
    val s = spark
    import s.implicits._
    val in = Seq(("DE0001", 0L, 10.0), ("DE0001", 1L, 20.0), ("FR0002", 0L, 5.0))
      .toDF("isin", "seq", "px")
    val out = TimeSeries.ewma(in, "isin", "seq", "px", 0.5)
      .orderBy("isin", "seq").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("DE0001", "DE0001", "FR0002"))
    assert(out.map(_.getDouble(3)).toSeq === Seq(10.0, 15.0, 5.0))
  }

  test("lagReturns: (x / prev) - 1 per series, null for first and zero-prev") {
    val r = TimeSeries.lagReturns(bars, "isin", "seq", "price")
      .orderBy("seq").select("ret").collect().map(x => Option(x.get(0)))
    assert(r(0).isEmpty)                                  // first in series A
    assert(math.abs(r(1).get.asInstanceOf[Double] - 0.10) < 1e-12)
    assert(math.abs(r(2).get.asInstanceOf[Double] - (99.0 / 110.0 - 1)) < 1e-12)
    assert(r(3).isEmpty)                                  // first in series B
    val z = df(Seq(Bar("Z", 1, t("2024-01-01 00:00:00"), 0.0, 1),
                   Bar("Z", 2, t("2024-01-01 00:01:00"), 5.0, 1)))
    val zr = TimeSeries.lagReturns(z, "isin", "seq", "price").orderBy("seq")
      .select("ret").collect()
    assert(zr(1).isNullAt(0))                             // divide-by-zero → null
  }

  test("rollingVol: matches sample stddev, null below 2 obs") {
    val r = TimeSeries.rollingVol(bars, "isin", "seq", "price", 3)
      .orderBy("seq").select("roll_vol").collect()
    assert(r(0).isNullAt(0))
    // window rows {100,110}: sample sd = sqrt(50) ≈ 7.071068
    assert(math.abs(r(1).getDouble(0) - math.sqrt(50.0)) < 1e-5)
    assert(r(3).isNullAt(0))                              // B has 1 row
  }

  test("forwardFill carries last non-null within series only") {
    val in = df(Seq(
      Bar("A", 1, t("2024-01-01 00:00:00"), 1.0, 0),
      Bar("A", 2, t("2024-01-01 00:01:00"), Double.NaN, 0),
      Bar("B", 3, t("2024-01-01 00:00:00"), 9.0, 0)))
      .withColumn("price", when(isnan(col("price")), lit(null)).otherwise(col("price")))
    val r = TimeSeries.forwardFill(in, "isin", "seq", "price")
      .orderBy("seq").select("filled_value").collect()
    assert(r(0).getDouble(0) === 1.0)
    assert(r(1).getDouble(0) === 1.0)                     // filled from prior A row
    assert(r(2).getDouble(0) === 9.0)                     // B unaffected by A
  }

  test("densifyAndFill: off-grid observations are snapped, gaps filled") {
    // obs at 09:00:30 (off a 60s grid) and 09:03:10 → buckets 09:00, 09:03
    val in = df(Seq(
      Bar("A", 1, t("2024-01-01 09:00:30"), 10.0, 0),
      Bar("A", 2, t("2024-01-01 09:03:10"), 40.0, 0)))
    val r = TimeSeries.densifyAndFill(in.select("isin", "ts", "price"), "isin", "ts", "price", 60L)
      .orderBy("ts").select(date_format(col("ts"), "HH:mm").as("m"), col("filled_value"))
      .collect().map(x => (x.getString(0), x.getDouble(1)))
    assert(r.toSeq === Seq(("09:00", 10.0), ("09:01", 10.0), ("09:02", 10.0), ("09:03", 40.0)))
  }

  test("densifyAndFill keeps the LAST observation per bucket") {
    val in = df(Seq(
      Bar("A", 1, t("2024-01-01 09:00:05"), 10.0, 0),
      Bar("A", 2, t("2024-01-01 09:00:55"), 11.0, 0)))
    val r = TimeSeries.densifyAndFill(in.select("isin", "ts", "price"), "isin", "ts", "price", 60L)
      .select("filled_value").collect()
    assert(r.map(_.getDouble(0)).toSeq === Seq(11.0))
  }

  test("resampleOhlc: open/close by order, volume summed from its own column") {
    val r = TimeSeries.resampleOhlc(bars, "isin", "ts", "seq", "price", "vol", "hour")
      .where(col("isin") === "A").head()
    assert(r.getAs[Double]("open") === 100.0)
    assert(r.getAs[Double]("high") === 110.0)
    assert(r.getAs[Double]("low") === 99.0)
    assert(r.getAs[Double]("close") === 99.0)
    assert(r.getAs[Long]("volume") === 35L)               // 10+20+5, NOT sum of prices
    assert(r.getAs[Long]("n_trades") === 3L)
  }

  test("resampleOhlc conserves total volume (property)") {
    val total = bars.agg(sum("vol")).head().getLong(0)
    val resampled = TimeSeries.resampleOhlc(bars, "isin", "ts", "seq", "price", "vol", "hour")
      .agg(sum("volume")).head().getLong(0)
    assert(total === resampled)
  }

  test("weightedIndex: sum(v*w)/sum(w)") {
    val r = TimeSeries.weightedIndex(bars, col("isin"), col("price"), col("vol").cast("double"))
      .where(col("bucket") === "A").head()
    val expected = (100.0 * 10 + 110.0 * 20 + 99.0 * 5) / 35.0
    assert(math.abs(r.getAs[Double]("index_value") - expected) < 1e-9)
    assert(r.getAs[Long]("n_assets") === 3L)
  }
}
