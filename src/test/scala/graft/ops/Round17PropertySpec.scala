package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariance laws for the round-17 operators — each is a property the
  * STATISTIC must satisfy by construction, checked on the test corpus
  * (the conservation/symmetry convention of Round16bPropertySpec).
  * Dyadic scalings (×2) and integer translations are used throughout so
  * the transformed inputs stay EXACTLY representable and the laws hold
  * bit-for-bit, not merely approximately.
  */
class Round17PropertySpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  private def evs: Seq[R17Ev2] = (1L to 40L).map { i =>
    R17Ev2(i % 5, i, ts((i % 28 + 1).toInt), ((i * i) % 17).toDouble)
  }

  test("clusterNmi is symmetric in its two labelings") {
    val pairs = (1 to 60).map(i => R17Pair(s"a${i % 3}", s"b${i % 4}"))
    val d = df(pairs)
    val ab = Profiling.clusterNmi(d, col("a"), col("b")).collect().head
    val ba = Profiling.clusterNmi(d, col("b"), col("a")).collect().head
    assert(ab.getLong(0) === ba.getLong(0))
    assert(ab.getDouble(1) === ba.getDouble(2) && ab.getDouble(2) === ba.getDouble(1),
      "marginal entropies must swap")
    assert(ab.getDouble(3) === ba.getDouble(3), "MI must be symmetric")
    assert(ab.getDouble(4) === ba.getDouble(4), "NMI must be symmetric")
  }

  test("hillTail is exactly scale-invariant (the defining power-law property)") {
    val vals = Seq(1000L, 700L, 300L, 120L, 80L, 40L, 20L, 10L, 5L, 1L)
    val base = Profiling.hillTail(df(vals.map(R17Key)), col("k"), k = 4)
      .collect().head
    val scaled = Profiling.hillTail(df(vals.map(v => R17Key(v * 3))), col("k"), k = 4)
      .collect().head
    assert(scaled.getLong(2) === base.getLong(2) * 3, "the threshold scales")
    assert(scaled.getDouble(3) === base.getDouble(3),
      "alpha depends only on RATIOS — scaling all values must not move it")
  }

  test("gumbelTail is exactly translation-equivariant: +c shifts mu and levels, not beta") {
    val base = Profiling.gumbelTail(df(evs), "ts", col("value"), Seq(10, 100))
      .orderBy("return_period").collect()
    val shifted = Profiling.gumbelTail(
      df(evs.map(e => e.copy(value = e.value + 64.0))), "ts", col("value"), Seq(10, 100))
      .orderBy("return_period").collect()
    base.zip(shifted).foreach { case (b, s) =>
      assert(s.getDouble(2) === b.getDouble(2) + 64.0, "mu shifts by the constant")
      assert(s.getDouble(3) === b.getDouble(3), "beta is translation-invariant")
      assert(s.getDouble(4) === b.getDouble(4) + 64.0, "return levels shift")
    }
  }

  test("permutationTest p-value is exactly invariant under dyadic metric scaling") {
    val base = Profiling.permutationTest(df(evs), "user_id", col("value"), 32)
      .collect().head
    val scaled = Profiling.permutationTest(
      df(evs.map(e => e.copy(value = e.value * 2.0))), "user_id", col("value"), 32)
      .collect().head
    // the REPORTED diff is rounded at 6 dp, so doubling the rounded base
    // can differ from rounding the doubled raw value by one ulp of the
    // 6th decimal — the law holds on the raw statistic
    assert(math.abs(scaled.getDouble(3) - base.getDouble(3) * 2.0) <= 1e-5,
      "the observed diff scales")
    assert(scaled.getLong(4) === base.getLong(4) && scaled.getDouble(5) === base.getDouble(5),
      "every |d_r| >= |d_obs| comparison is scale-free — p must not move")
  }

  test("cuped variance-reduction percentage is exactly invariant under dyadic scaling") {
    val base = Profiling.cuped(df(evs), "user_id", "ts", col("value"), 16)
      .collect().head
    val scaled = Profiling.cuped(
      df(evs.map(e => e.copy(value = e.value * 2.0))), "user_id", "ts", col("value"), 16)
      .collect().head
    assert(scaled.getDouble(1) === base.getDouble(1),
      "theta = cov/var is invariant when both sides scale together")
    assert(scaled.getDouble(4) === base.getDouble(4),
      "the reduction percentage is a variance RATIO — scale-free")
  }

  test("conformalInterval scales: doubled values double q_hat, coverage unchanged") {
    val base = Profiling.conformalInterval(df(evs), "user_id", "event_id", "ts",
      col("value"), 16, 0.25).collect().head
    val scaled = Profiling.conformalInterval(
      df(evs.map(e => e.copy(value = e.value * 2.0))), "user_id", "event_id", "ts",
      col("value"), 16, 0.25).collect().head
    assert(scaled.getDouble(2) === base.getDouble(2) * 2.0, "q_hat scales with residuals")
    assert(scaled.getDouble(3) === base.getDouble(3),
      "coverage counts comparisons that scale on both sides — unchanged")
  }

  test("jackknifeInfluence is exactly translation-equivariant and influences stay opposed") {
    val rows = (1 to 30).map(i => R17Cnt(s"g${i % 3}", s"x$i", (i * 7 % 23).toLong))
    val base = Profiling.jackknifeInfluence(df(rows), "lab", col("c"))
      .orderBy("lab").collect()
    val shifted = Profiling.jackknifeInfluence(
      df(rows.map(r => r.copy(c = r.c + 100L))), "lab", col("c"))
      .orderBy("lab").collect()
    base.zip(shifted).foreach { case (b, s) =>
      assert(s.getDouble(3) === b.getDouble(3) + 100.0, "group means shift")
      assert(s.getDouble(5) === b.getDouble(5), "influence is translation-invariant")
    }
    // influences cannot all point the same way: removing SOME group must
    // lower the mean if removing another raises it (weighted opposition)
    val infl = base.map(_.getDouble(5))
    assert(infl.exists(_ > 0) === infl.exists(_ < 0) || infl.forall(_ == 0.0),
      "a nonzero influence in one direction requires an opposing one")
  }

  test("jamesStein shrinkage strictly contracts the spread of group means") {
    val rows = (1 to 40).map(i => R17Cnt(s"g${i % 5}", s"x$i", (i * i % 31).toLong))
    val out = Profiling.jamesStein(df(rows), "lab", col("c")).collect()
    val raw = out.map(_.getDouble(2))
    val shrunk = out.map(_.getDouble(4))
    val c = out.head.getDouble(3)
    assert(c >= 0.0 && c <= 1.0, "positive-part shrinkage stays in [0, 1]")
    def spread(xs: Seq[Double]): Double = xs.max - xs.min
    assert(spread(shrunk.toSeq) <= spread(raw.toSeq) + 1e-9,
      "shrinking toward the grand mean cannot widen the spread")
  }

  test("chao1 never estimates below the observed vocabulary") {
    val counts = (1 to 50).map(i => R17Cnt("_", s"t$i", (i % 7 + 1).toLong))
    val out = TextOps.chao1(df(counts), col("c")).collect().head
    assert(out.getDouble(4) >= out.getLong(0).toDouble,
      "the asymptotic estimate includes everything already seen")
    assert(out.getDouble(5) >= 0.0 && out.getDouble(5) <= 1.0)
  }

  test("simpsonsParadox slopes are exactly invariant under x- and y-translation") {
    val rows = (1 to 24).map(i => R17Xy(s"g${i % 3}", (i % 7).toLong, (i * 3 % 11).toDouble))
    val base = Profiling.simpsonsParadox(df(rows), "g", col("x"), col("y"))
      .orderBy("g").collect()
    val shifted = Profiling.simpsonsParadox(
      df(rows.map(r => r.copy(x = r.x + 50L, y = r.y + 100.0))), "g", col("x"), col("y"))
      .orderBy("g").collect()
    base.zip(shifted).foreach { case (b, s) =>
      assert(s.getDouble(2) === b.getDouble(2), "group slope is translation-invariant")
      assert(s.getDouble(3) === b.getDouble(3), "pooled slope is translation-invariant")
      assert(s.getBoolean(4) === b.getBoolean(4))
    }
  }

  test("sprt decisions are monotone in the evidence and symmetric under hit/miss swap") {
    def run(hits: Seq[Int], total: Int): Seq[String] = {
      val evs = hits.zipWithIndex.flatMap { case (h, d) =>
        (0 until total).map(i => R17Hit(ts(d + 1, i % 24), if (i < h) "purchase" else "view"))
      }
      EventOps.sprt(df(evs), "ts", col("et") === "purchase", 0.2, 0.8, 0.05, 0.05)
        .orderBy("day").collect().map(_.getString(4)).toSeq
    }
    // swapping every hit for a miss (rate p -> 1-p with symmetric
    // hypotheses) must mirror the decision
    val up = run(Seq(5, 5), total = 5)     // all hits
    val down = run(Seq(0, 0), total = 5)   // all misses
    assert(up.head === "accept_h1" && down.head === "accept_h0")
    // ambivalent evidence at the indifference rate keeps the monitor open
    // (p̂ = 0.5 between p0 = 0.2 and p1 = 0.8: increments cancel exactly
    // because ln(4) and ln(1/4) are the same 9-dp literal negated)
    val mid = run(Seq(2, 2), total = 4)
    assert(mid.forall(_ === "continue"))
  }

  test("jsDivergence stays within [0, ln 2] and a self-pair is 0") {
    val counts = (1 to 30).map(i => R17Cnt(s"s${i % 4}", s"t${i % 9}", (i % 5 + 1).toLong))
    val out = TextOps.jsDivergence(df(counts), "lab", "tok", "c").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 0.693148,
        s"JSD out of range for ${r.getString(0)}/${r.getString(1)}")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.000001)
    }
  }
}
