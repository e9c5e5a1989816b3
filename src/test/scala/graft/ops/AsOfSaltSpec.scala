package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Quote(sym: String, ts: java.sql.Timestamp, px: Double)
case class Trade(trade_id: Long, sym: String, ts: java.sql.Timestamp, qty: Long)

class AsOfSaltSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin attaches the latest left row at-or-before each right row") {
    val quotes = df(Seq(
      Quote("A", t("2024-01-01 09:00:00"), 100.0),
      Quote("A", t("2024-01-01 09:05:00"), 101.0),
      Quote("B", t("2024-01-01 09:00:00"), 50.0)))
    val trades = df(Seq(
      Trade(1, "A", t("2024-01-01 08:59:00"), 10),  // before any quote → null
      Trade(2, "A", t("2024-01-01 09:00:00"), 20),  // equal ts → inclusive match
      Trade(3, "A", t("2024-01-01 09:04:59"), 30),  // between → first quote
      Trade(4, "A", t("2024-01-01 09:30:00"), 40),  // after both → second quote
      Trade(5, "B", t("2024-01-01 10:00:00"), 50))) // other key
    val r = TimeSeries.asOfJoin(quotes.toDF(), trades.toDF(), "sym", "ts", Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "asof_px").collect()
      .map(x => x.getLong(0) -> Option(x.get(1)))
    assert(r.toSeq === Seq(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0), 4L -> Some(101.0), 5L -> Some(50.0)))
  }

  test("asOfJoin preserves right-side row count (left-join semantics)") {
    val quotes = df(Seq(Quote("A", t("2024-01-01 09:00:00"), 1.0)))
    val trades = df((1 to 50).map(i => Trade(i.toLong, if (i % 2 == 0) "A" else "ZZZ",
      t(f"2024-01-01 09:${i % 60}%02d:00"), i.toLong)))
    val out = TimeSeries.asOfJoin(quotes.toDF(), trades.toDF(), "sym", "ts", Seq("px"))
    assert(out.count() === 50)
    assert(out.where(col("sym") === "ZZZ").where(col("asof_px").isNotNull).count() === 0)
  }

  test("saltedJoin equals the plain join") {
    val left = df((1 to 1000).map(i => Trade(i.toLong, if (i <= 900) "HOT" else s"k$i",
      t("2024-01-01 00:00:00"), i.toLong)))
    val right = df(Seq(
      Quote("HOT", t("2024-01-01 00:00:00"), 1.0),
      Quote("k950", t("2024-01-01 00:00:00"), 2.0)))
      .select("sym", "px")
    val plain = left.join(right, Seq("sym")).select("trade_id", "px")
    val salted = Relational.saltedJoin(left.toDF(), right.toDF(), Seq("sym"), 8)
      .select("trade_id", "px")
    assert(plain.count() === 901)
    assert(salted.count() === 901)
    assert(plain.except(salted).count() === 0)
    assert(salted.except(plain).count() === 0)
  }
}
