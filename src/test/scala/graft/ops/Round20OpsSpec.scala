package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R20Ord(o_custkey: Long, o_orderdate: java.sql.Date)

/** Hand-exact fixtures for the round-20 operators. */
class Round20OpsSpec extends SparkSpec {

  private def d(day: Int): java.sql.Date =
    java.sql.Date.valueOf(f"2024-03-$day%02d")

  private def odf(rows: Seq[R20Ord]) = {
    val s = spark; import s.implicits._
    rows.toDF()
  }

  // ── Cox PH degenerate zero-event corpus (ADVICE r19 item 1) ────────

  test("coxPh: zero uncensored events freezes θ at 1.0 with NULL se/z") {
    // censorDays=5 over a 3-day span: NO user's last order predates
    // gmax−5, so the churn flag is false everywhere and the event-time
    // stats table is EMPTY. The Scala Newton must freeze θ at its seed
    // (hazard_ratio 1.0, beta 0.0) and NULL out se/z — and the oracle
    // now agrees: its carried θ is coalesce(min(th), 1.0) per round, so
    // the empty CROSS JOIN yields the same frozen read-out
    // (verified in DuckDB: (n_a, n_b, 0, 1.0, 0.0, NULL, NULL)).
    val rows = Seq(
      R20Ord(2, d(1)), R20Ord(2, d(3)),
      R20Ord(4, d(2)),
      R20Ord(1, d(1)), R20Ord(1, d(2)),
      R20Ord(3, d(3)))
    val out = EventOps.coxPh(odf(rows), "o_custkey", "o_orderdate",
      u => pmod(u, lit(2L)) === 0, censorDays = 5, unitDays = 1).head()
    assert(out.getLong(2) === 0L, "no churn events")
    assert(out.getDouble(3) === 1.0, "hazard ratio frozen at the θ seed")
    assert(out.getDouble(4) === 0.0, "beta = ln(1) = 0")
    assert(out.isNullAt(5) && out.isNullAt(6), "se/z NULL at zero information")
  }
}
