package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-16b operators: the market-indicator family (MACD / RSI /
  * Bollinger — the reference's domain, README.md:173-180's designed
  * query surface) on hand-checkable fixtures.
  */
class Round16bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Double*): org.apache.spark.sql.DataFrame =
    vals.zipWithIndex.map { case (v, i) => ("s1", i.toLong, v) }
      .toDF("key", "t", "v")

  // ── macd ──────────────────────────────────────────────────────────────

  test("macd: first row is exactly zero; constant series stays zero") {
    val out = TimeSeries.macd(series(5.0, 5.0, 5.0, 5.0), "key", "t", "v")
      .orderBy("t").collect()
    out.foreach { r =>
      assert(r.getDouble(3) === 0.0) // macd
      assert(r.getDouble(4) === 0.0) // signal
      assert(r.getDouble(5) === 0.0) // hist
    }
  }

  test("macd: replays the three-accumulator recurrence exactly") {
    val vals = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 13.0, 18.0)
    val aF = 2.0 / 13.0; val aS = 2.0 / 27.0; val aG = 2.0 / 10.0
    var fast = vals.head; var slow = vals.head; var sig = 0.0
    val expect = vals.head +: vals.tail.map { x =>
      fast = aF * x + (1 - aF) * fast
      slow = aS * x + (1 - aS) * slow
      sig = aG * (fast - slow) + (1 - aG) * sig
      x
    }
    // recompute expected triples in a second pass (clearer than tuples above)
    fast = vals.head; slow = vals.head; sig = 0.0
    val triples = vals.zipWithIndex.map { case (x, i) =>
      if (i > 0) {
        fast = aF * x + (1 - aF) * fast
        slow = aS * x + (1 - aS) * slow
        sig = aG * (fast - slow) + (1 - aG) * sig
      }
      (fast - slow, sig, fast - slow - sig)
    }
    val out = TimeSeries.macd(series(vals: _*), "key", "t", "v")
      .orderBy("t").collect()
    out.zip(triples).foreach { case (r, (m, s, h)) =>
      assert(r.getDouble(3) === m)
      assert(r.getDouble(4) === s)
      assert(r.getDouble(5) === h)
    }
    assert(expect.size === vals.size) // silence the first-pass value
  }

  test("macd: a rising series turns macd positive; keys never bleed") {
    val up = (1 to 40).map(_.toDouble)
    val df = up.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) } ++
      Seq(("b", 0L, 100.0), ("b", 1L, 100.0))
    val out = TimeSeries.macd(df.toDF("key", "t", "v"), "key", "t", "v")
    val lastA = out.where(col("key") === "a").orderBy(col("t").desc).limit(1)
      .select("macd").head().getDouble(0)
    assert(lastA > 0.0, "sustained uptrend must push fast EWMA above slow")
    // key b restarts: its first row is zero, uninfluenced by key a
    val b0 = out.where(col("key") === "b" && col("t") === 0).select("macd").head().getDouble(0)
    assert(b0 === 0.0)
  }

  test("macd: NULL observations are skipped, not NPEd") {
    val df = Seq(("s", 0L, Some(1.0)), ("s", 1L, None), ("s", 2L, Some(2.0)))
      .toDF("key", "t", "v")
    val out = TimeSeries.macd(df, "key", "t", "v").orderBy("t").collect()
    assert(out.length === 2) // the null row is dropped
  }

  // ── rsi ───────────────────────────────────────────────────────────────

  test("rsi: first row NULL, flat series 50, pure uptrend 100, pure downtrend 0") {
    val flat = TimeSeries.rsi(series(3.0, 3.0, 3.0), "key", "t", "v")
      .orderBy("t").collect()
    assert(flat(0).isNullAt(3))
    assert(flat(1).getDouble(3) === 50.0 && flat(2).getDouble(3) === 50.0)

    val up = TimeSeries.rsi(series(1.0, 2.0, 3.0, 4.0), "key", "t", "v")
      .orderBy("t").collect()
    up.drop(1).foreach(r => assert(r.getDouble(3) === 100.0))

    val down = TimeSeries.rsi(series(4.0, 3.0, 2.0, 1.0), "key", "t", "v")
      .orderBy("t").collect()
    down.drop(1).foreach(r => assert(r.getDouble(3) === 0.0))
  }

  test("rsi: mixed series lands strictly between 0 and 100 and replays the fold") {
    val vals = Seq(10.0, 11.0, 10.5, 12.0, 11.0, 13.0)
    val a = 1.0 / 14.0
    var ag = 0.0; var al = 0.0; var have = false
    val expect = vals.sliding(2).map { case Seq(p, x) =>
      val d = x - p
      val g = if (d > 0) d else 0.0
      val l = if (d < 0) -d else 0.0
      if (!have) { ag = g; al = l; have = true }
      else { ag = a * g + (1 - a) * ag; al = a * l + (1 - a) * al }
      if (al == 0.0 && ag == 0.0) 50.0
      else if (al == 0.0) 100.0
      else 100.0 - 100.0 / (1.0 + ag / al)
    }.toSeq
    val out = TimeSeries.rsi(series(vals: _*), "key", "t", "v")
      .orderBy("t").collect().drop(1).map(_.getDouble(3))
    assert(out.toSeq === expect)
    // first delta is a pure gain (RSI pinned at 100); once both a gain
    // and a loss have been seen the index is strictly inside (0, 100)
    out.drop(1).foreach(v => assert(v > 0.0 && v < 100.0))
  }

  // ── bollinger ─────────────────────────────────────────────────────────

  test("bollinger: window under 2 rows NULL, flat window zero-width with NULL %B") {
    val out = TimeSeries.bollinger(series(7.0, 7.0, 7.0), "key", "t", "v", n = 3)
      .orderBy("t").collect()
    assert(out(0).isNullAt(3)) // bb_mid null at first row
    assert(out(1).getDouble(3) === 7.0 && out(1).getDouble(4) === 7.0)
    assert(out(1).isNullAt(6), "%B undefined on a zero-width band")
  }

  test("bollinger: hand-checked band on a 3-value window; %B at the band edges") {
    // window [1, 2, 3]: mean 2, sample sd 1 → upper 4, lower 0; x=3 → %B=0.75
    val out = TimeSeries.bollinger(series(1.0, 2.0, 3.0), "key", "t", "v", n = 3)
      .orderBy("t").collect()
    val last = out(2)
    assert(last.getDouble(3) === 2.0)
    assert(last.getDouble(4) === 4.0)
    assert(last.getDouble(5) === 0.0)
    assert(last.getDouble(6) === 0.75)
  }

  test("bollinger: trailing window only sees the last n rows") {
    // 10 constant rows then a jump: at the end, the window [.., 100] has
    // nonzero sd and the jump sits above mid
    val vals = Seq.fill(10)(5.0) :+ 100.0
    val out = TimeSeries.bollinger(series(vals: _*), "key", "t", "v", n = 5)
      .orderBy(col("t").desc).limit(1).collect()(0)
    assert(out.getDouble(3) > 5.0 && out.getDouble(3) < 100.0) // mid pulled up
    assert(out.getDouble(6) > 0.5, "the jump row sits in the upper band half")
  }
}
