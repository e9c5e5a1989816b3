package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R19Ord(o_custkey: Long, o_orderdate: java.sql.Date)

/** Hand-exact fixtures for the round-19 operators. */
class Round19OpsSpec extends SparkSpec {

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  private def d(day: Int): java.sql.Date =
    java.sql.Date.valueOf(f"2024-03-$day%02d")

  private def df(rows: Seq[R19Ord]) = {
    val s = spark; import s.implicits._
    rows.toDF()
  }

  // ── Cox proportional hazards (C311) ────────────────────────────────

  test("coxPh: closed-form MLE on a single-event-time fixture") {
    // unitDays=1, censorDays=0; gmax = day 3. Cohort A = even ids.
    // u2, u4 (A) and u1 (B) churn at life 0; u6 (A) and u3 (B) span to
    // day 3 = gmax -> censored at life 2. One event time: life 0 with
    // n1=3, n0=2 at risk, d=3 deaths, d1=2 in A. The partial-likelihood
    // score U(θ) = d1 − d·n1·θ/(n0+n1·θ) has the closed-form root
    // θ* = d1·n0/(n1·(d−d1)) = 4/3, so β = ln(4/3); the information is
    // I(β) = θ·J(θ) = (4/3)·(3·2·3/(2+4)²) = 2/3.
    val rows = Seq(
      R19Ord(2, d(1)), R19Ord(4, d(1)), R19Ord(1, d(1)),
      R19Ord(6, d(1)), R19Ord(6, d(3)),
      R19Ord(3, d(1)), R19Ord(3, d(3)))
    val out = EventOps.coxPh(df(rows), "o_custkey", "o_orderdate",
      u => pmod(u, lit(2L)) === 0, censorDays = 0, unitDays = 1).head()
    assert(out.getLong(0) === 3L && out.getLong(1) === 2L)
    assert(out.getLong(2) === 3L, "three churn events")
    assert(out.getDouble(3) === r6(4.0 / 3.0), "hazard ratio at the score root")
    assert(out.getDouble(4) === r6(math.log(4.0 / 3.0)))
    assert(out.getDouble(5) === r6(1.0 / math.sqrt(2.0 / 3.0)))
    assert(out.getDouble(6) === r6(math.log(4.0 / 3.0) * math.sqrt(2.0 / 3.0)))
  }

  test("coxPh: the Newton iteration has converged by the committed count") {
    // 12 vs 25 iterations must agree at the 6-dp read-out on real data —
    // the committed unroll depth is past the fixed point, not mid-flight.
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val isA = (u: org.apache.spark.sql.Column) =>
      pmod(Portable.hash32(u), lit(2L)) === 0
    val at12 = EventOps.coxPh(orders, "o_custkey", "o_orderdate", isA,
      censorDays = 180, unitDays = 30, iters = 12).head()
    val at25 = EventOps.coxPh(orders, "o_custkey", "o_orderdate", isA,
      censorDays = 180, unitDays = 30, iters = 25).head()
    assert(at12 === at25, "Newton must be at its fixed point by 12 iterations")
    assert(at12.getDouble(3) > 0, "hazard ratio is positive")
  }

  test("coxPh: no-effect covariate lands at hazard ratio 1 on a symmetric fixture") {
    // perfectly balanced churn: one A and one B die at life 0, one A and
    // one B censored at life 2 -> U(1) = d1 − d·n1/(n0+n1) = 1 − 2·2/4 = 0,
    // so θ stays at the 1.0 start and β = 0 exactly.
    val rows = Seq(
      R19Ord(2, d(1)), R19Ord(1, d(1)),
      R19Ord(4, d(1)), R19Ord(4, d(3)),
      R19Ord(3, d(1)), R19Ord(3, d(3)))
    val out = EventOps.coxPh(df(rows), "o_custkey", "o_orderdate",
      u => pmod(u, lit(2L)) === 0, censorDays = 0, unitDays = 1).head()
    assert(out.getDouble(3) === 1.0 && out.getDouble(4) === 0.0)
    assert(out.getDouble(6) === 0.0, "z is exactly zero under perfect balance")
  }
}
