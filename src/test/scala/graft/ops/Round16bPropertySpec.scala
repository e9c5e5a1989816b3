package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mathematical properties of the round-16b operators — invariants that
  * hold for ALL inputs, checked on seeded random data (the
  * Round14PropertySpec convention).
  */
class Round16bPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(1716)

  test("mannWhitneyU is EXACTLY invariant under strictly monotone transforms") {
    // the defining property of a rank test: z depends on values only
    // through their order, so any strictly increasing map leaves the
    // whole result row bit-identical
    val rows = (1 to 200).map(i => Mwu16("g", rnd.nextBoolean(), rnd.nextInt(40).toDouble))
    val base = Profiling.mannWhitneyU(df(rows), "grp", col("in1"), col("v"))
      .head()
    val mapped = Profiling.mannWhitneyU(
      df(rows).withColumn("v", exp(col("v") / 10.0) + col("v") * 3.0),
      "grp", col("in1"), col("v")).head()
    assert(base.getLong(1) === mapped.getLong(1))
    assert(base.getDouble(3) === mapped.getDouble(3), "U must be rank-only")
    assert(base.getDouble(4) === mapped.getDouble(4), "z must be rank-only")
  }

  test("mannWhitneyU: U1 + U2 = n1*n2 (the complementary-statistic identity)") {
    val rows = (1 to 150).map(i => Mwu16("g", rnd.nextBoolean(), rnd.nextInt(25).toDouble))
    val r1 = Profiling.mannWhitneyU(df(rows), "grp", col("in1"), col("v")).head()
    val r2 = Profiling.mannWhitneyU(df(rows), "grp", !col("in1"), col("v")).head()
    val (n1, n2) = (r1.getLong(1), r1.getLong(2))
    assert(r1.getDouble(3) + r2.getDouble(3) === (n1 * n2).toDouble)
    // and the z statistics are exact negations of each other
    assert(r1.getDouble(4) === -r2.getDouble(4) || r1.getDouble(4) === 0.0)
  }

  test("bollinger %B is invariant under positive affine transforms of the series") {
    val vals = (1 to 60).map(_ => rnd.nextDouble() * 50)
    val base = TimeSeries.bollinger(series(vals), "key", "t", "v", n = 10)
      .orderBy("t").collect().map(r => if (r.isNullAt(6)) None else Some(r.getDouble(6)))
    val mapped = TimeSeries.bollinger(
      series(vals).withColumn("v", col("v") * 3.0 + 100.0), "key", "t", "v", n = 10)
      .orderBy("t").collect().map(r => if (r.isNullAt(6)) None else Some(r.getDouble(6)))
    base.zip(mapped).zipWithIndex.foreach { case ((b, m), i) =>
      (b, m) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-4, s"row $i: $x vs $y")
        case (None, None) => ()
        case other => fail(s"row $i definedness diverged: $other")
      }
    }
  }

  test("harmonicCentrality is bounded by n_reached and monotone in maxHops") {
    // random sparse graph
    val edges = (1 to 60).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a < b }.distinct
    val g = df(edges.map { case (a, b) => Edge16(a, b) })
    val h2 = Graph.harmonicCentrality(g, "a", "b", maxHops = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val h3 = Graph.harmonicCentrality(g, "a", "b", maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    h3.foreach { case (v, (n, h)) =>
      assert(h <= n + 1e-9, "each reached node contributes at most 1")
      assert(h > 0)
      val (n2, s2) = h2(v)
      assert(n >= n2 && h >= s2 - 1e-9, "widening the horizon never loses score")
    }
  }

  test("decayedLeaderboard score is bounded by raw_count, equal only for max-day keys") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-05-${d}%02d 08:00:00")
    val rows = (1 to 300).map(_ => Decay16(ts(1 + rnd.nextInt(9)), s"k${rnd.nextInt(6)}"))
    val out = EventOps.decayedLeaderboard(df(rows), "ts", "key", 10).collect()
    val maxDay = rows.map(_.ts.toLocalDateTime.toLocalDate).max
    out.foreach { r =>
      val key = r.getString(1)
      assert(r.getDouble(3) <= r.getLong(2) + 1e-9, "decay never inflates")
      val allOnMax = rows.filter(_.key == key)
        .forall(_.ts.toLocalDateTime.toLocalDate == maxDay)
      if (r.getDouble(3) == r.getLong(2).toDouble)
        assert(allOnMax, s"$key scored undamped but has older events")
    }
  }

  test("truncatedBetweenness conserves pair dependency: total = n_d2 + 2*n_d3") {
    // every distance-2 pair distributes exactly 1 across interiors, every
    // distance-3 pair exactly 2 (two interior slots per shortest path,
    // weights summing to 1 per slot class) — so the SUM of betweenness
    // equals n_pairs(d=2) + 2·n_pairs(d=3), checkable against an
    // independent BFS distance census
    val edges = (1 to 70).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a < b }.distinct
    val g = df(edges.map { case (a, b) => Edge16(a, b) })
    val total = Graph.truncatedBetweenness(g, "a", "b")
      .agg(sum("betweenness")).head().getDouble(0)
    // distance census via adjacency sets (driver-side reference model)
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    var (d2, d3) = (0, 0)
    for (i <- nodes.indices; j <- i + 1 until nodes.size) {
      val (s, t) = (nodes(i), nodes(j))
      if (!adj(s).contains(t)) {
        if ((adj(s) & adj(t)).nonEmpty) d2 += 1
        else if (adj(s).exists(v => (adj(v) & adj(t)).nonEmpty)) d3 += 1
      }
    }
    assert(math.abs(total - (d2 + 2 * d3)) < 1e-6,
      s"dependency mass $total must equal $d2 + 2*$d3")
  }

  test("crossCorrelation is lag-symmetric: ccf_AB(lag) = ccf_BA(-lag)") {
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-07-${d}%02d 09:00:00")
    val rows = (1 to 12).flatMap { d =>
      Seq((t(d), "A", rnd.nextDouble() * 10), (t(d), "B", rnd.nextDouble() * 10))
    }
    val ab = TimeSeries.crossCorrelation(df(rows.map(r => Ccf16(r._1, r._2, r._3))),
        "ts", "t", "v", "A", "B", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ba = TimeSeries.crossCorrelation(df(rows.map(r => Ccf16(r._1, r._2, r._3))),
        "ts", "t", "v", "B", "A", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (-3 to 3).foreach { l =>
      assert(math.abs(ab(l.toLong) - ba(-l.toLong)) < 1e-9, s"lag $l")
    }
  }

  test("binSegChangepoint is shift-invariant in the split location") {
    val vals = (1 to 40).map(_ => rnd.nextInt(20).toDouble)
    val base = TimeSeries.binSegChangepoint(series(vals), "key", "t", "v").head()
    val shifted = TimeSeries.binSegChangepoint(
      series(vals.map(_ + 1000.0)), "key", "t", "v").head()
    assert(base.getLong(2) === shifted.getLong(2),
      "adding a constant must not move the split")
    assert(math.abs(base.getDouble(4) - shifted.getDouble(4)) < 1e-3,
      "split SSE is shift-invariant up to decimal-snapshot noise")
  }

  test("lorenzCurve is monotone non-decreasing and ends at exactly 1") {
    val vals = (1 to 200).map(_ => rnd.nextInt(1000).toDouble)
    val curve = Profiling.lorenzCurve(df(vals.map(v => Series16("s", 0L, v))),
        col("v"), 10)
      .orderBy("point").collect().map(_.getDouble(2))
    curve.zip(curve.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-9, "value share must not decrease")
    }
    assert(curve.last === 1.0)
    // convexity below the diagonal: bottom half never holds more than half
    assert(curve(4) <= 0.5 + 1e-9)
  }

  test("qqDrift per-cohort quantile values are monotone in q") {
    val rows = (1 to 300).map(_ => Mwu16("g", rnd.nextBoolean(), rnd.nextInt(500).toDouble))
    val out = Profiling.qqDrift(df(rows), col("in1"), col("v"),
        Seq(0.1, 0.25, 0.5, 0.75, 0.9))
      .orderBy("q").collect()
    val va = out.map(_.getDouble(1)); val vb = out.map(_.getDouble(2))
    va.zip(va.tail).foreach { case (a, b) => assert(b >= a) }
    vb.zip(vb.tail).foreach { case (a, b) => assert(b >= a) }
  }

  test("kmvJaccard estimate stays within the sketch error envelope on random sets") {
    val rows = (1 to 1200).map { i =>
      val g = if (rnd.nextBoolean()) "a" else "b"
      Kj16(g, s"v${rnd.nextInt(500)}")
    }
    val r = Profiling.kmvJaccard(df(rows), "g", col("v"), 64).head()
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 4.0 / math.sqrt(64.0),
      s"est ${r.getDouble(2)} vs exact ${r.getDouble(3)} outside the envelope")
  }

  private def series(vals: Seq[Double]) =
    df(vals.zipWithIndex.map { case (v, i) => Series16("s", i.toLong, v) })
}

case class Ccf16(ts: java.sql.Timestamp, t: String, v: Double)
case class Kj16(g: String, v: String)

case class Mwu16(grp: String, in1: Boolean, v: Double)
case class Edge16(a: Long, b: Long)
case class Decay16(ts: java.sql.Timestamp, key: String)
