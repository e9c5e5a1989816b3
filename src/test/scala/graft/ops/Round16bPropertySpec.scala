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

  private def series(vals: Seq[Double]) =
    df(vals.zipWithIndex.map { case (v, i) => Series16("s", i.toLong, v) })
}

case class Mwu16(grp: String, in1: Boolean, v: Double)
case class Edge16(a: Long, b: Long)
case class Decay16(ts: java.sql.Timestamp, key: String)
