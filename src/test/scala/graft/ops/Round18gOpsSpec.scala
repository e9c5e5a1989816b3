package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R18gSv(g: String, in1: Boolean, v: java.lang.Double)
case class R18gUt(user_id: Long, event_type: String)

/** Hand-exact fixtures for the round-18g closers: Dunn's post-hoc rank
  * comparisons, Cliff's delta, and Cochran's Q.
  */
class Round18gOpsSpec extends SparkSpec {

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  // ── Dunn ───────────────────────────────────────────────────────────

  test("dunnPosthoc: hand-ranked three-group fixture") {
    // pooled values 1..5, no ties: mean ranks a=1.5, b=3.5, c=5;
    // s² = 5·6/12 = 2.5
    val rows = Seq(R18cGv("a", 1.0), R18cGv("a", 2.0),
      R18cGv("b", 3.0), R18cGv("b", 4.0), R18cGv("c", 5.0))
    val out = Profiling.dunnPosthoc(df(rows), "g", col("v"), zCrit = 1.0)
      .orderBy("g_a", "g_b").collect()
    assert(out.length === 3)
    assert(out(0).getDouble(4) === 1.5 && out(0).getDouble(5) === 3.5)
    assert(out(0).getDouble(6) === r6(-2.0 / math.sqrt(2.5)))
    assert(out(0).getBoolean(7), "a-b clears the loose critical 1.0")
    assert(out(1).getDouble(6) === r6(-3.5 / math.sqrt(2.5 * 1.5)))
    assert(out(2).getDouble(6) === r6(-1.5 / math.sqrt(2.5 * 1.5)))
    assert(!out(2).getBoolean(7), "b-c does not clear 1.0")
  }

  test("dunnPosthoc: midranks under ties match the doubled-rank identity") {
    // a = {2, 2}, b = {2, 5}: the three 2s share midrank 2; b's ranks
    // average (2 + 4)/2 = 3
    val rows = Seq(R18cGv("a", 2.0), R18cGv("a", 2.0),
      R18cGv("b", 2.0), R18cGv("b", 5.0))
    val out = Profiling.dunnPosthoc(df(rows), "g", col("v"), 10.0).head()
    assert(out.getDouble(4) === 2.0 && out.getDouble(5) === 3.0)
  }

  // ── Cliff's delta ──────────────────────────────────────────────────

  test("cliffsDelta: hand-counted pairs with a tie") {
    // side1 = {1, 3}, side2 = {2, 3}: concordant (3>2) = 1,
    // discordant (1<2, 1<3) = 2, tie (3=3) = 1 -> delta = -0.25
    val rows = Seq(R18gSv("g", true, 1.0), R18gSv("g", true, 3.0),
      R18gSv("g", false, 2.0), R18gSv("g", false, 3.0))
    val out = Profiling.cliffsDelta(df(rows), "g", col("in1"), col("v")).head()
    assert(out.getLong(1) === 2L && out.getLong(2) === 2L)
    assert(out.getLong(3) === 1L && out.getLong(4) === 2L && out.getLong(5) === 1L)
    assert(out.getDouble(6) === -0.25)
    assert(out.getDouble(7) === 0.375, "Vargha-Delaney A = (delta+1)/2")
  }

  test("cliffsDelta: full dominance pins delta = 1; one-sided group NULLs") {
    val rows = Seq(R18gSv("g", true, 5.0), R18gSv("g", true, 6.0),
      R18gSv("g", false, 1.0), R18gSv("g", false, 2.0),
      R18gSv("h", true, 1.0))
    val out = Profiling.cliffsDelta(df(rows), "g", col("in1"), col("v"))
      .orderBy("g").collect()
    assert(out(0).getDouble(6) === 1.0 && out(0).getDouble(7) === 1.0)
    assert(out(1).isNullAt(6), "no side-2 sample, no pairs")
  }

  // ── Cochran's Q ────────────────────────────────────────────────────

  test("cochranQ: hand-computed three-treatment fixture") {
    // engagement sets {t1}, {t1,t2}, {t1,t2,t3}, {t2}:
    // T = (3,3,1), u = (1,2,3,1) -> Q = 2·(3·19 − 49)/(21 − 15) = 8/3
    val rows = Seq(
      R18gUt(1, "t1"), R18gUt(1, "t1"), // duplicate event collapses
      R18gUt(2, "t1"), R18gUt(2, "t2"),
      R18gUt(3, "t1"), R18gUt(3, "t2"), R18gUt(3, "t3"),
      R18gUt(4, "t2"))
    val out = EventOps.cochranQ(df(rows), "user_id", "event_type").head()
    assert(out.getLong(0) === 4L && out.getLong(1) === 3L && out.getLong(2) === 2L)
    assert(out.getDouble(3) === r6(8.0 / 3.0))
  }

  test("cochranQ: k = 2 reduces to McNemar's chi-squared") {
    // 3 users t1-only (b), 1 user t2-only (c), 2 users both:
    // Q = (2·34 − 64)/(16 − 12) = 1 = (b−c)²/(b+c)
    val rows =
      (1L to 3L).map(u => R18gUt(u, "t1")) ++ Seq(R18gUt(4, "t2")) ++
        Seq(R18gUt(5, "t1"), R18gUt(5, "t2"), R18gUt(6, "t1"), R18gUt(6, "t2"))
    val out = EventOps.cochranQ(df(rows), "user_id", "event_type").head()
    assert(out.getLong(1) === 2L)
    assert(out.getDouble(3) === 1.0, "(3-1)^2/(3+1) — the McNemar identity")
  }

  test("cochranQ: an all-or-nothing design NULLs the statistic") {
    // every user engages every type: denominator k·Σu − Σu² = 0
    val rows = for (u <- 1L to 3L; t <- Seq("t1", "t2")) yield R18gUt(u, t)
    val out = EventOps.cochranQ(df(rows), "user_id", "event_type").head()
    assert(out.isNullAt(3))
  }
}
