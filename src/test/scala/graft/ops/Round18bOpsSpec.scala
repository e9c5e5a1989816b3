package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R18bGv(g: String, v: java.lang.Double)
case class R18bUv(u: Long, v: java.lang.Double)
case class R18bOrd(o_custkey: Long, o_orderdate: java.sql.Date)

/** Hand-exact fixtures for the round-18b operators: one-way ANOVA F,
  * Brown–Forsythe variance homogeneity, MDE/power planning, and the
  * log-rank survival comparison.
  */
class Round18bOpsSpec extends SparkSpec {

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  private def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  private def d(day: Int): java.sql.Date =
    java.sql.Date.valueOf(f"2024-03-$day%02d")

  // ── one-way ANOVA ──────────────────────────────────────────────────

  test("anovaF: textbook two-group fixture") {
    // A = {1,2,3} (mean 2), B = {4,5,6} (mean 5), grand mean 3.5:
    // SSB = 3·(1.5² + 1.5²) = 13.5, SSW = 2 + 2 = 4, df = (1, 4),
    // F = 13.5 / (4/4) = 13.5, η² = 13.5/17.5
    val rows = Seq(R18bGv("a", 1.0), R18bGv("a", 2.0), R18bGv("a", 3.0),
      R18bGv("b", 4.0), R18bGv("b", 5.0), R18bGv("b", 6.0))
    val out = Profiling.anovaF(df(rows), "g", col("v")).head()
    assert(out.getLong(0) === 2L && out.getLong(1) === 6L)
    assert(out.getDouble(2) === 13.5 && out.getDouble(3) === 4.0)
    assert(out.getLong(4) === 1L && out.getLong(5) === 4L)
    assert(out.getDouble(6) === 13.5)
    assert(out.getDouble(7) === r6(13.5 / 17.5))
  }

  test("anovaF: identical group means give F = 0; constant data NULLs F") {
    val same = Seq(R18bGv("a", 1.0), R18bGv("a", 3.0),
      R18bGv("b", 3.0), R18bGv("b", 1.0))
    val o1 = Profiling.anovaF(df(same), "g", col("v")).head()
    assert(o1.getDouble(6) === 0.0 && o1.getDouble(7) === 0.0)
    // all values equal: SSW = 0 -> F undefined (NULL), eta NULL (0/0)
    val const = Seq(R18bGv("a", 2.0), R18bGv("a", 2.0), R18bGv("b", 2.0))
    val o2 = Profiling.anovaF(df(const), "g", col("v")).head()
    assert(o2.isNullAt(6) && o2.isNullAt(7))
  }

  // ── Brown–Forsythe ─────────────────────────────────────────────────

  test("brownForsythe: hand-exact medians, deviations, and W") {
    // A = {1,2,9}: lower median 2, |dev| = {1,0,7}, mean 8/3
    // B = {4,4,8}: lower median 4, |dev| = {0,0,4}, mean 4/3
    // ANOVA on devs: S_a=8,Q_a=50, S_b=4,Q_b=16 -> SSB=8/3, SSW=118/3,
    // W = (8/3) / ((118/3)/4) = 16/59
    val rows = Seq(R18bGv("a", 1.0), R18bGv("a", 2.0), R18bGv("a", 9.0),
      R18bGv("b", 4.0), R18bGv("b", 4.0), R18bGv("b", 8.0))
    val out = Profiling.brownForsythe(df(rows), "g", col("v"))
      .orderBy("g").collect()
    assert(out.length === 2)
    assert(out(0).getDouble(2) === 2.0 && out(1).getDouble(2) === 4.0)
    assert(out(0).getDouble(3) === r9(8.0 / 3.0))
    assert(out(1).getDouble(3) === r9(4.0 / 3.0))
    assert(out.forall(_.getDouble(4) === r6(16.0 / 59.0)))
  }

  test("brownForsythe: even-count group takes the LOWER median") {
    // {1,3}: threshold (2+1)//2 = 1 -> first value 1 is the median
    val rows = Seq(R18bGv("a", 1.0), R18bGv("a", 3.0),
      R18bGv("b", 5.0), R18bGv("b", 5.0))
    val out = Profiling.brownForsythe(df(rows), "g", col("v"))
      .orderBy("g").collect()
    assert(out(0).getDouble(2) === 1.0, "lower median, no interpolation")
    assert(out(1).getDouble(2) === 5.0)
  }

  // ── MDE / power ────────────────────────────────────────────────────

  test("mdePower: hand-exact moments, Cohen's d, and the MDE") {
    // explicit cohorts (even unit id = A): A units {2->1, 4->3},
    // B units {1->4, 3->8}; var_a = 2, var_b = 8, sp² = 5,
    // d = (2-6)/√5, se² = 2/2 + 8/2 = 5, mde = (z975+z80)·√5
    val rows = Seq(R18bUv(2, 1.0), R18bUv(4, 3.0), R18bUv(1, 4.0), R18bUv(3, 8.0))
    val out = EventOps.mdePower(df(rows), "u",
      u => pmod(u, lit(2L)) === 0, col("v")).head()
    val z = 1.959963985 + 0.841621234
    assert(out.getLong(0) === 2L && out.getLong(1) === 2L)
    assert(out.getDouble(2) === 2.0 && out.getDouble(3) === 6.0)
    assert(out.getDouble(4) === r6(-4.0 / math.sqrt(5.0)))
    assert(out.getDouble(5) === r9(math.sqrt(5.0)))
    assert(out.getDouble(6) === r6(z * math.sqrt(5.0)))
    assert(out.getDouble(7) === r6(z * math.sqrt(5.0) / 4.0))
  }

  test("mdePower: per-unit sums aggregate before cohorting; n=1 side NULLs") {
    // unit 2 appears twice (1+2=3): metric is the per-unit SUM
    val rows = Seq(R18bUv(2, 1.0), R18bUv(2, 2.0), R18bUv(4, 5.0),
      R18bUv(1, 7.0))
    val out = EventOps.mdePower(df(rows), "u",
      u => pmod(u, lit(2L)) === 0, col("v")).head()
    assert(out.getLong(0) === 2L && out.getLong(1) === 1L)
    assert(out.getDouble(2) === 4.0, "unit 2's two rows sum to 3, mean (3+5)/2")
    assert(out.isNullAt(4) && out.isNullAt(6), "one-unit cohort has no variance")
  }

  // ── log-rank ───────────────────────────────────────────────────────

  test("logRank: hand-computed O/E/V on a four-user fixture") {
    // unitDays=1, censorDays=0; gmax = day 4.
    // A1 (u=2): life 0 churn; A2 (u=4): life 1 churn;
    // B1 (u=1): life 1 churn; B2 (u=3): life 2, l = gmax -> censored.
    // risk sets (desc cum): life0 n1=2 n=4; life1 n1=1 n=3; life2 n1=0 n=1
    // terms: life0 d=1 e=2/4 v=1·(1/2)(1/2)(3/3)=1/4
    //        life1 d=2 e=2/3 v=2·(1/3)(2/3)(1/2)=2/9
    // O=2, E=7/6, V=17/36, z=(2-7/6)/√(17/36)
    val rows = Seq(
      R18bOrd(2, d(1)), R18bOrd(2, d(1)),
      R18bOrd(4, d(1)), R18bOrd(4, d(2)),
      R18bOrd(1, d(2)), R18bOrd(1, d(3)),
      R18bOrd(3, d(2)), R18bOrd(3, d(4)))
    val out = EventOps.logRank(df(rows), "o_custkey", "o_orderdate",
      u => pmod(u, lit(2L)) === 0, censorDays = 0, unitDays = 1).head()
    assert(out.getLong(0) === 2L && out.getLong(1) === 2L)
    assert(out.getLong(2) === 2L, "cohort A churn events")
    assert(out.getDouble(3) === r9(0.5 + 2.0 / 3.0))
    assert(out.getDouble(4) === r9(0.25 + 2.0 / 9.0))
    val e = 0.5 + 2.0 / 3.0
    val v = 0.25 + 2.0 / 9.0
    assert(out.getDouble(5) === r6((2.0 - e) / math.sqrt(v)))
  }

  test("nelsonAalen: hand-computed hazards on the log-rank fixture shape") {
    // lifetimes: life0 churn, life1 churn x2, life2 censored (l = gmax)
    // risk sets 4, 3, 1 -> hazards 1/4, 2/3, 0; H = 1/4, 1/4 + 2/3, same
    val rows = Seq(
      R18bOrd(1, d(1)), R18bOrd(1, d(1)),
      R18bOrd(2, d(1)), R18bOrd(2, d(2)),
      R18bOrd(3, d(2)), R18bOrd(3, d(3)),
      R18bOrd(4, d(2)), R18bOrd(4, d(4)))
    val out = EventOps.nelsonAalen(df(rows), "o_custkey", "o_orderdate",
      censorDays = 0, unitDays = 1).collect()
    assert(out.length === 3)
    assert(out(0).getLong(1) === 4L && out(0).getDouble(4) === 0.25)
    assert(out(0).getDouble(5) === 0.25)
    assert(out(1).getLong(1) === 3L && out(1).getDouble(4) === r9(2.0 / 3.0))
    assert(out(1).getDouble(5) === r9(0.25 + 2.0 / 3.0))
    assert(out(2).getLong(1) === 1L && out(2).getLong(3) === 1L)
    assert(out(2).getDouble(4) === 0.0, "a censor-only bucket adds no hazard")
    assert(out(2).getDouble(5) === out(1).getDouble(5), "H is flat there")
  }

  test("logRank: identical cohorts balance O against E") {
    // symmetric cohorts: one churner each at the same lifetime, so
    // O = 1, E = 2·(1/2)... per lifetime d=2,n1=2,n=4 -> e=1, O-E=0
    val rows = Seq(
      R18bOrd(2, d(1)), R18bOrd(2, d(2)),
      R18bOrd(1, d(1)), R18bOrd(1, d(2)),
      R18bOrd(4, d(2)), R18bOrd(4, d(5)),
      R18bOrd(3, d(2)), R18bOrd(3, d(5)))
    val out = EventOps.logRank(df(rows), "o_custkey", "o_orderdate",
      u => pmod(u, lit(2L)) === 0, censorDays = 0, unitDays = 1).head()
    assert(out.getLong(2) === 1L)
    assert(out.getDouble(3) === 1.0, "E = d·n1/n = 2·2/4")
    assert(out.getDouble(5) === 0.0, "balanced churn -> z = 0 exactly")
  }
}
