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

  // ── bloomFprAudit ─────────────────────────────────────────────────────

  test("bloomFprAudit: no false negatives; saturated filter flags everything") {
    val members = (1 to 50).map(i => Tuple1(s"m$i")).toDF("v")
    // probing the members themselves: every probe must hit all k positions
    val self = Profiling.bloomFprAudit(members, members, col("v"), 4096L, 3).head()
    assert(self.getLong(6) === self.getLong(5),
      "members probed against their own filter must all flag (no false negatives)")
    // disjoint probes on a roomy filter: fpr well under 1
    val probes = (1 to 200).map(i => Tuple1(s"p$i")).toDF("v")
    val r = Profiling.bloomFprAudit(members, probes, col("v"), 4096L, 3).head()
    assert(r.getLong(0) === 50L && r.getLong(5) === 200L)
    assert(r.getDouble(7) < 0.05, s"4096 bits / 50 keys should be sparse (fpr=${r.getDouble(7)})")
    // a saturated filter (m=4) flags essentially everything
    val sat = Profiling.bloomFprAudit(members, probes, col("v"), 4L, 3).head()
    assert(sat.getDouble(7) > 0.9, "4-bit filter must be useless")
  }

  // ── harmonicCentrality ────────────────────────────────────────────────

  test("harmonicCentrality: hand-checked path graph; maxHops bounds the reach") {
    // path 1-2-3-4: H(1) = 1 + 1/2 + 1/3; H(2) = 1 + 1 + 1/2
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val h = Graph.harmonicCentrality(path, "a", "b", maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(h(1L) === ((3L, 1.833333)))
    assert(h(2L) === ((3L, 2.5)))
    assert(h(3L) === ((3L, 2.5)))
    // path 1-2-3-4-5 at maxHops=3: node 1 cannot see node 5
    val p5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val h5 = Graph.harmonicCentrality(p5, "a", "b", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h5(1L) === 3L, "distance-4 node must be outside the 3-hop horizon")
    assert(h5(3L) === 4L, "the center reaches everyone within 2")
  }

  test("truncatedBetweenness: path, star, and split-flow diamond are hand-exact") {
    // path 1-2-3-4: (1,3) and (1,4) route through 2; (2,4) and (1,4)
    // through 3 → both interiors score 2; endpoints never appear
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val hp = Graph.truncatedBetweenness(path, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hp === Map(2L -> 2.0, 3L -> 2.0))

    // star: all 6 leaf pairs route through the center, sigma = 1 each
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val hs = Graph.truncatedBetweenness(star, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hs === Map(0L -> 6.0))

    // diamond 1-2, 1-3, 2-4, 3-4: every distance-2 pair has sigma = 2,
    // so every vertex brokers exactly half a pair
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val hd = Graph.truncatedBetweenness(diamond, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hd === Map(1L -> 0.5, 2L -> 0.5, 3L -> 0.5, 4L -> 0.5))
  }

  test("truncatedBetweenness counts only SHORTEST paths") {
    // triangle plus a pendant: (1,2) are adjacent, so the 2-path through
    // 3 must NOT count; only (3,4)'s route through 1 (d=2) and nothing
    // else scores
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val h = Graph.truncatedBetweenness(g, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // pairs: (2,4): d=2 via 1 only (sigma 1); (3,4): d=2 via 1 (sigma 1)
    assert(h === Map(1L -> 2.0))
  }

  test("harmonicCentrality: disconnected components never leak across") {
    val twoComp = Seq((1L, 2L), (10L, 11L)).toDF("a", "b")
    val h = Graph.harmonicCentrality(twoComp, "a", "b", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(h === Map(1L -> 1.0, 2L -> 1.0, 10L -> 1.0, 11L -> 1.0))
  }

  // ── mannWhitneyU ──────────────────────────────────────────────────────

  test("mannWhitneyU: hand-checked U and z on a tiny two-sample fixture") {
    // group g: sample1 = {1, 3}, sample2 = {2, 4}; ranks 1..4, no ties
    // R1 = 1 + 3 = 4, U1 = 4 − 2·3/2 = 1; μ = 2, σ² = 4·5/12 = 5/3
    val df = Seq(("g", true, 1.0), ("g", false, 2.0), ("g", true, 3.0), ("g", false, 4.0))
      .toDF("grp", "in1", "v")
    val r = Profiling.mannWhitneyU(df, "grp", col("in1"), col("v")).head()
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 1.0)
    val z = (1.0 - 2.0) / math.sqrt(5.0 / 3.0)
    assert(math.abs(r.getDouble(4) - z) < 1e-6)
  }

  test("mannWhitneyU: ties get average ranks; all-tied group yields NULL z") {
    // values {5, 5} split across samples: avg ranks 1.5/1.5, U1 = 1.5−1 = 0.5
    val df = Seq(("g", true, 5.0), ("g", false, 5.0)).toDF("grp", "in1", "v")
    val r = Profiling.mannWhitneyU(df, "grp", col("in1"), col("v")).head()
    assert(r.getDouble(3) === 0.5)
    assert(r.isNullAt(4), "zero variance (all tied) must yield NULL z")
    // one-sided group: NULL z, U1 reported
    val df2 = Seq(("h", true, 1.0), ("h", true, 2.0)).toDF("grp", "in1", "v")
    assert(Profiling.mannWhitneyU(df2, "grp", col("in1"), col("v")).head().isNullAt(4))
  }

  test("mannWhitneyU: identical distributions give z near 0, shifted give large |z|") {
    val base = (1 to 50).map(i => ("g", i % 2 == 0, i.toDouble))
    val zSame = Profiling.mannWhitneyU(base.toDF("grp", "in1", "v"),
      "grp", col("in1"), col("v")).head().getDouble(4)
    assert(math.abs(zSame) < 1.0)
    val shifted = (1 to 50).map(i => ("g", i <= 25, i.toDouble))
    val zShift = Profiling.mannWhitneyU(shifted.toDF("grp", "in1", "v"),
      "grp", col("in1"), col("v")).head().getDouble(4)
    assert(math.abs(zShift) > 4.0)
  }

  // ── oddsRatio2x2 ──────────────────────────────────────────────────────

  test("oddsRatio2x2: hand-checked OR and the zero-cell correction") {
    // a=4 b=2 c=1 d=3 → OR = 12/2 = 6
    val rows = Seq.fill(4)(("g", true, true)) ++ Seq.fill(2)(("g", true, false)) ++
      Seq.fill(1)(("g", false, true)) ++ Seq.fill(3)(("g", false, false))
    val r = Profiling.oddsRatio2x2(rows.toDF("grp", "e", "o"), "grp", col("e"), col("o")).head()
    assert(r.getLong(1) === 4L && r.getLong(2) === 2L && r.getLong(3) === 1L && r.getLong(4) === 3L)
    assert(r.getDouble(5) === 6.0)
    assert(r.getDouble(6) < math.log(6.0) && r.getDouble(7) > math.log(6.0),
      "CI must bracket ln(OR)")
    // zero cell: correction keeps OR finite
    val z = Seq(("g", true, true), ("g", false, false))
    val rz = Profiling.oddsRatio2x2(z.toDF("grp", "e", "o"), "grp", col("e"), col("o")).head()
    assert(!rz.isNullAt(5) && rz.getDouble(5) === 9.0) // (1.5·1.5)/(0.5·0.5)
  }

  // ── holtWinters ───────────────────────────────────────────────────────

  test("holtWinters: first season degrades exactly to holt; seasonals kick in cycle two") {
    val vals = (1 to 20).map(i => (5.0 + (i % 4))).toSeq
    val df = series(vals: _*)
    val hw = TimeSeries.holtWinters(df, "key", "t", "v", m = 4,
      alpha = 0.5, gamma = 0.25, delta = 0.25).orderBy("t").collect()
    val h = TimeSeries.holt(df, "key", "t", "v", alpha = 0.5, gamma = 0.25)
      .orderBy("t").collect()
    // rows 0..3 (first cycle): seasonal slots are all zero, so level and
    // trend must equal plain Holt bit-for-bit
    (0 until 4).foreach { i =>
      assert(hw(i).getDouble(3) === h(i).getDouble(3), s"level row $i")
      assert(hw(i).getDouble(4) === h(i).getDouble(4), s"trend row $i")
      assert(hw(i).getDouble(5) === 0.0 || i > 0, "first seasonal is 0")
    }
    // cycle two on: the seasonal component is learning the period-4 wave
    assert(hw(19).getDouble(5) !== 0.0, "seasonals must activate after cycle 1")
  }

  test("holtWinters: replays the ring-buffer recurrence exactly") {
    val vals = Seq(10.0, 12.0, 8.0, 14.0, 11.0, 13.0, 9.0, 15.0)
    val (m, a, g, d) = (3, 0.5, 0.25, 0.25)
    var l = vals.head; var b = 0.0
    val ring = Array.fill(m)(0.0); var head = 0
    val expect = vals.zipWithIndex.map { case (x, i) =>
      if (i > 0) {
        val sPrev = ring(head)
        val l2 = a * (x - sPrev) + (1 - a) * (l + b)
        b = g * (l2 - l) + (1 - g) * b
        l = l2
        ring(head) = d * (x - l2) + (1 - d) * sPrev
        head = (head + 1) % m
      }
      (l, b, if (head == 0) ring(m - 1) else ring(head - 1))
    }
    val out = TimeSeries.holtWinters(series(vals: _*), "key", "t", "v",
      m, a, g, d).orderBy("t").collect()
    out.zip(expect).foreach { case (r, (el, eb, es)) =>
      assert(r.getDouble(3) === el && r.getDouble(4) === eb && r.getDouble(5) === es)
    }
  }

  // ── lorenzCurve ───────────────────────────────────────────────────────

  test("lorenzCurve: perfect equality is the diagonal; concentration bends the curve") {
    val equal = (1 to 100).map(_ => Tuple1(5.0)).toDF("v")
    val eq = Profiling.lorenzCurve(equal, col("v"), 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    eq.foreach { case (p, (pop, share)) =>
      assert(pop === share, s"equal values must put the curve on the diagonal at $p")
    }
    assert(eq(10L) === ((1.0, 1.0)))

    // one doc holds ~everything: bottom 90% of docs hold ~nothing
    val skewed = ((1 to 99).map(_ => Tuple1(1.0)) :+ Tuple1(10000.0)).toDF("v")
    val sk = Profiling.lorenzCurve(skewed, col("v"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sk(9L) < 0.01, "bottom 90% must hold under 1% of a near-degenerate corpus")
    assert(sk(10L) === 1.0)
  }

  test("lorenzCurve: the tie-class correction lands exact mid-class boundaries") {
    // 4 values of 2 and 4 of 6: idx at p=5 (of 10) is 4 → bottom half =
    // the four 2s = 8 of 32 total = 0.25
    val vals = (Seq.fill(4)(2.0) ++ Seq.fill(4)(6.0)).map(Tuple1(_)).toDF("v")
    val m = Profiling.lorenzCurve(vals, col("v"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(5L) === 0.25)
    // p=7 → idx 5: four 2s + one 6 = 14/32 = 0.4375 — mid-tie-class
    assert(m(7L) === 0.4375)
  }

  // ── forecastAccuracy ──────────────────────────────────────────────────

  test("forecastAccuracy: constant series forecasts perfectly; MASE is NULL (naive also perfect)") {
    val r = TimeSeries.forecastAccuracy(series(5.0, 5.0, 5.0, 5.0),
      "key", "t", "v", 0.5, 0.25).head()
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0)
    assert(r.isNullAt(4), "zero naive MAE has no MASE")
  }

  test("forecastAccuracy: a trending series beats persistence (MASE < 1)") {
    // linear trend: Holt's trend component learns the slope, so its
    // one-step error shrinks below the naive |x_t − x_{t−1}| = slope
    val vals = (1 to 30).map(i => 10.0 + 2.0 * i)
    val r = TimeSeries.forecastAccuracy(series(vals: _*), "key", "t", "v",
      0.5, 0.25).head()
    assert(!r.isNullAt(4) && r.getDouble(4) < 1.0,
      s"Holt must beat persistence on a linear trend (MASE=${r.getDouble(4)})")
    // and the metrics replay the recurrence exactly: MAE from a manual fold
    val (a, g) = (0.5, 0.25)
    var l = vals.head; var b = 0.0
    val errs = vals.tail.map { x =>
      val fHat = l + b
      val l2 = a * x + (1 - a) * (l + b)
      b = g * (l2 - l) + (1 - g) * b
      l = l2
      math.abs(x - fHat)
    }
    val mae = BigDecimal(errs.map(e => BigDecimal(e).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / errs.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - mae) < 1e-9)
  }

  test("forecastAccuracy: a single-point series emits nothing") {
    assert(TimeSeries.forecastAccuracy(series(7.0), "key", "t", "v", 0.5, 0.25)
      .count() === 0)
  }

  // ── crossCorrelation ──────────────────────────────────────────────────

  test("crossCorrelation: a planted 2-day lead shows up at exactly that lag") {
    // series B is series A shifted forward 2 days: ccf must peak at
    // lag +2 (A leads B) with coefficient 1
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-06-${d}%02d 09:00:00")
    val aVals = Seq(5.0, 9.0, 2.0, 7.0, 4.0, 8.0, 3.0, 6.0)
    val rows = aVals.zipWithIndex.flatMap { case (v, i) =>
      Seq((t(i + 1), "A", v), (t(i + 3), "B", v))
    }
    val out = TimeSeries.crossCorrelation(rows.toDF("ts", "t", "v"),
        "ts", "t", "v", "A", "B", maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) === 1.0, s"shifted-copy series must correlate perfectly at lag 2 (got $out)")
    assert(out(0L) < 1.0, "the unshifted alignment must NOT be the peak")
  }

  test("crossCorrelation: quiet days enter as zeros, not dropped rows") {
    // A has a gap day; the dense grid keeps it as 0, so n_days at lag 0
    // equals the full calendar span
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-06-${d}%02d 09:00:00")
    val rows = Seq((t(1), "A", 1.0), (t(5), "A", 2.0),
      (t(1), "B", 3.0), (t(5), "B", 1.0))
    val r0 = TimeSeries.crossCorrelation(rows.toDF("ts", "t", "v"),
        "ts", "t", "v", "A", "B", maxLag = 0).head()
    assert(r0.getLong(1) === 5L, "the 5-day calendar span must all be present")
  }

  // ── kmvJaccard ────────────────────────────────────────────────────────

  test("kmvJaccard: below-k sets are EXACT; estimate tracks planted overlap above k") {
    // two sets of 40 values with 20 shared: union 60 < k=64 → the union
    // sketch is complete, so the estimate IS the exact Jaccard 20/60
    val rows = ((1 to 40).map(i => ("a", s"v$i")) ++
      (21 to 60).map(i => ("b", s"v$i"))).toDF("g", "v")
    val r = Profiling.kmvJaccard(rows, "g", col("v"), 64).head()
    assert(r.getDouble(2) === r.getDouble(3), "below-k estimate must equal exact")
    assert(r.getDouble(3) === 0.333333)
    assert(r.getDouble(4) === 0.0)

    // large sets (600 per side, 300 shared → J = 1/3): estimate within
    // the KMV error envelope
    val big = ((1 to 600).map(i => ("a", s"x$i")) ++
      (301 to 900).map(i => ("b", s"x$i"))).toDF("g", "v")
    val rb = Profiling.kmvJaccard(big, "g", col("v"), 64).head()
    assert(math.abs(rb.getDouble(2) - rb.getDouble(3)) < 0.2,
      s"est ${rb.getDouble(2)} vs exact ${rb.getDouble(3)}")
  }

  test("kmvJaccard: disjoint sets estimate zero; identical sets estimate one") {
    val disjoint = ((1 to 100).map(i => ("a", s"p$i")) ++
      (1 to 100).map(i => ("b", s"q$i"))).toDF("g", "v")
    assert(Profiling.kmvJaccard(disjoint, "g", col("v"), 64).head().getDouble(2) === 0.0)
    val same = ((1 to 100) ++ (1 to 100)).zipWithIndex.map { case (i, idx) =>
      (if (idx < 100) "a" else "b", s"s$i") }.toDF("g", "v")
    assert(Profiling.kmvJaccard(same, "g", col("v"), 64).head().getDouble(2) === 1.0)
  }

  // ── qqDrift ───────────────────────────────────────────────────────────

  test("qqDrift: identical cohorts have zero drift; a shifted cohort shows it everywhere") {
    val same = (1 to 100).flatMap(i => Seq((true, i.toDouble), (false, i.toDouble)))
    val z = Profiling.qqDrift(same.toDF("a", "v"), col("a"), col("v"),
      Seq(0.25, 0.5, 0.75)).collect()
    assert(z.length === 3)
    z.foreach(r => assert(r.getDouble(3) === 0.0))

    val shifted = (1 to 100).flatMap(i => Seq((true, i.toDouble), (false, i + 10.0)))
    val d = Profiling.qqDrift(shifted.toDF("a", "v"), col("a"), col("v"),
      Seq(0.25, 0.5, 0.75)).collect()
    d.foreach(r => assert(r.getDouble(3) === 10.0, "constant shift appears at every quantile"))
  }

  test("qqDrift: the rank-pick rule selects the exact physical row (median of odd n)") {
    // cohort a = {1, 2, 30}: median must be the literal 2, not an
    // interpolation artifact
    val rows = Seq((true, 1.0), (true, 2.0), (true, 30.0),
      (false, 5.0), (false, 6.0), (false, 7.0))
    val r = Profiling.qqDrift(rows.toDF("a", "v"), col("a"), col("v"), Seq(0.5)).head()
    assert(r.getDouble(1) === 2.0 && r.getDouble(2) === 6.0)
  }

  // ── binSegChangepoint ─────────────────────────────────────────────────

  test("binSegChangepoint: a planted level shift is localized exactly") {
    val vals = Seq.fill(10)(5.0) ++ Seq.fill(10)(50.0)
    val r = TimeSeries.binSegChangepoint(series(vals: _*), "key", "t", "v").head()
    assert(r.getLong(1) === 20L)
    assert(r.getLong(2) === 10L, "split must land exactly at the shift")
    assert(r.getDouble(4) === 0.0, "two constant halves have zero split SSE")
    assert(r.getDouble(6) === 1.0, "the split explains ALL the variance")
    // with noise on both halves the split still lands at the shift
    val noisy = vals.zipWithIndex.map { case (v, i) => v + (i % 3) * 0.1 }
    val rn = TimeSeries.binSegChangepoint(series(noisy: _*), "key", "t", "v").head()
    assert(rn.getLong(2) === 10L)
    assert(rn.getDouble(6) > 0.99)
  }

  test("binSegChangepoint: constant series ties to the first split with NULL gain; n=1 drops") {
    val r = TimeSeries.binSegChangepoint(series(7.0, 7.0, 7.0, 7.0), "key", "t", "v").head()
    assert(r.getLong(2) === 1L, "all-zero costs tie to the smallest k")
    assert(r.isNullAt(6), "zero total variance has no gain ratio")
    assert(TimeSeries.binSegChangepoint(series(42.0), "key", "t", "v").count() === 0,
      "a 1-point series has no candidate split")
  }

  // ── decayedLeaderboard ────────────────────────────────────────────────

  test("decayedLeaderboard: yesterday counts half; ranking follows the decayed score") {
    val ts = (d: Int, k: String, n: Int) => Seq.fill(n)(
      (java.sql.Timestamp.valueOf(f"2024-02-${d}%02d 10:00:00"), k))
    // "old" has 8 events 2 days ago (decayed 2), "new" has 3 today (3)
    val df = (ts(1, "old", 8) ++ ts(3, "new", 3)).toDF("ts", "key")
    val out = EventOps.decayedLeaderboard(df, "ts", "key", 10)
      .orderBy("rank").collect()
    assert(out(0).getString(1) === "new" && out(0).getDouble(3) === 3.0)
    assert(out(1).getString(1) === "old" && out(1).getDouble(3) === 2.0)
    assert(out(1).getLong(2) === 8L, "raw_count keeps the undecayed total")
  }

  // ── noisyCounts ───────────────────────────────────────────────────────

  test("noisyCounts: deterministic across runs, noise scale tracks 1/epsilon") {
    val docs = (1 to 100).map(i => (s"g${i % 3}", i)).toDF("grp", "x")
    val r1 = Profiling.noisyCounts(docs, "grp", 0.5, "salt").orderBy("grp").collect()
    val r2 = Profiling.noisyCounts(docs, "grp", 0.5, "salt").orderBy("grp").collect()
    assert(r1.map(_.getDouble(4)).toSeq === r2.map(_.getDouble(4)).toSeq,
      "seeded noise must be reproducible")
    r1.foreach { r =>
      assert(r.getDouble(4) !== r.getLong(1).toDouble, "noise actually applied")
      assert(math.abs(r.getDouble(3)) < 80.0, "Laplace(2) tail sanity")
    }
    // a different salt draws different noise
    val r3 = Profiling.noisyCounts(docs, "grp", 0.5, "other").orderBy("grp").collect()
    assert(r1.map(_.getDouble(3)).toSeq !== r3.map(_.getDouble(3)).toSeq)
  }

  // ── tfidfCosineTopK ───────────────────────────────────────────────────

  test("tfidfCosineTopK: identical docs score 1.0; disjoint docs never pair") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana cherry"),
      (3L, "dog elephant fox"),
      (4L, "apple dog")).toDF("doc_id", "text")
    val out = TextOps.tfidfCosineTopK(docs, "doc_id", "text",
      col("doc_id") <= 4, k = 3, maxDf = 100)
    val m = out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 2L)) === 1.0, "identical tf-idf vectors must score exactly 1")
    assert(!m.contains((1L, 3L)), "no shared term → no pair (inverted-index join)")
    assert(m((4L, 1L)) > 0 && m((4L, 3L)) > 0, "partial overlap pairs exist")
  }

  test("tfidfCosineTopK: the DF cap removes ubiquitous terms from the space") {
    // "the" appears in all docs; with maxDf = 2 it vanishes, so docs
    // sharing ONLY "the" no longer pair
    val docs = Seq(
      (1L, "the apple"), (2L, "the banana"), (3L, "the apple crumble"))
      .toDF("doc_id", "text")
    val out = TextOps.tfidfCosineTopK(docs, "doc_id", "text",
      lit(true), k = 3, maxDf = 2)
    val pairs = out.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 2L)), "docs sharing only the capped term must not pair")
    assert(pairs.contains((1L, 3L)), "apple (df=2) stays in the space")
  }

  // ── kmvSlidingDistinct ────────────────────────────────────────────────

  test("kmvSlidingDistinct: merged sketch is exact below k; window slides correctly") {
    val ts = (d: Int, u: Long) =>
      (java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 12:00:00"), u)
    // day 1: users 1,2; day 2: users 2,3; day 9: user 9 (outside day 2's window)
    val df = Seq(ts(1, 1), ts(1, 2), ts(2, 2), ts(2, 3), ts(9, 9))
      .toDF("ts", "user_id")
    val out = Profiling.kmvSlidingDistinct(df, "ts", col("user_id"),
        k = 64, windowDays = 7)
      .orderBy("day").collect()
    assert(out.length === 3)
    // day 1: {1,2}; day 2: {1,2,3}; day 9: day-2 data still in (9-7, 9]? no: 2 <= 9-7 → out
    assert(out(0).getDouble(2) === 2.0 && out(0).getLong(3) === 2L)
    assert(out(1).getDouble(2) === 3.0 && out(1).getLong(3) === 3L)
    assert(out(2).getDouble(2) === 1.0 && out(2).getLong(3) === 1L)
    assert(out(0).getDouble(4) === 0.0, "below-k merge is exact → zero rel_err")
    assert(out(1).getLong(1) === 2L, "day 2 merges two day sketches")
  }

  test("kmvSlidingDistinct: estimate tracks a many-user day within KMV error bounds") {
    val df = (1L to 2000L).map(u =>
      (java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), u)).toDF("ts", "user_id")
    val out = Profiling.kmvSlidingDistinct(df, "ts", col("user_id"), k = 64, 7)
      .collect()(0)
    val est = out.getDouble(2)
    assert(math.abs(est - 2000.0) / 2000.0 < 4.0 / math.sqrt(64.0),
      s"KMV estimate $est outside the 4/sqrt(k) bound for 2000 true distinct")
  }

  // ── itemNeighbors ─────────────────────────────────────────────────────

  test("itemNeighbors: hand-checked cosine and symmetric ranking") {
    val pairs = Seq((1L, 2L, 4L), (1L, 3L, 1L)).toDF("item_a", "item_b", "support")
    val items = Seq((1L, 4L), (2L, 4L), (3L, 1L)).toDF("item", "basket_cnt")
    val out = Relational.itemNeighbors(pairs, "support", items, "item", "basket_cnt", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(3), r.getLong(4))).toMap
    // cos(1,2) = 4/(2*2) = 1.0; cos(1,3) = 1/(2*1) = 0.5
    assert(out((1L, 2L))._1 === 1.0 && out((1L, 2L))._2 === 1L)
    assert(out((1L, 3L))._1 === 0.5 && out((1L, 3L))._2 === 2L)
    // symmetrized: item 2 sees 1, item 3 sees 1
    assert(out((2L, 1L))._1 === 1.0 && out((3L, 1L))._1 === 0.5)
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
