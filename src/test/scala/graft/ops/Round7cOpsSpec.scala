package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

case class Tick7(key: String, ts: java.sql.Timestamp, value: Double)
case class Ev7c(user_id: Long, ts: java.sql.Timestamp)

/** Round-7 batch-3 operators: forward as-of, cohort retention, DQ report,
  * approx-percentile error bound.
  */
class Round7cOpsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoinForward matches the NEXT left row at-or-after, per key") {
    val left = df(Seq(               // quotes
      Tick7("a", ts("2024-01-01 10:00:00"), 1.0),
      Tick7("a", ts("2024-01-01 12:00:00"), 2.0),
      Tick7("b", ts("2024-01-01 11:00:00"), 9.0)))
    val right = df(Seq(              // events
      Tick7("a", ts("2024-01-01 09:00:00"), 0.0),  // before both → 10:00 quote
      Tick7("a", ts("2024-01-01 10:00:00"), 0.0),  // exactly at → same-ts match
      Tick7("a", ts("2024-01-01 11:00:00"), 0.0),  // between → 12:00 quote
      Tick7("a", ts("2024-01-01 13:00:00"), 0.0),  // after all → null
      Tick7("b", ts("2024-01-01 10:30:00"), 0.0))) // other key → 11:00 quote
    val out = TimeSeries.asOfJoinForward(left, right, "key", "ts", Seq("value"))
      .orderBy("key", "ts").collect()
      .map(r => (r.getString(0), Option(r.getAs[java.sql.Timestamp]("asof_ts")).map(_.toString),
        Option(r.getAs[Any]("asof_value"))))
    assert(out.toSeq === Seq(
      ("a", Some("2024-01-01 10:00:00.0"), Some(1.0)),
      ("a", Some("2024-01-01 10:00:00.0"), Some(1.0)),
      ("a", Some("2024-01-01 12:00:00.0"), Some(2.0)),
      ("a", None, None),
      ("b", Some("2024-01-01 11:00:00.0"), Some(9.0))))
  }

  test("cohortRetention: cohort = first-seen week, offsets count distinct weekly actives") {
    // user 1: weeks 0 and 2 from 2024-01-01 (a Monday); user 2: weeks 0, 1
    // (cohort one week later); multiple events in one week count once
    val ev = df(Seq(
      Ev7c(1, ts("2024-01-01 10:00:00")), Ev7c(1, ts("2024-01-03 10:00:00")),
      Ev7c(1, ts("2024-01-16 10:00:00")),
      Ev7c(2, ts("2024-01-09 10:00:00")), Ev7c(2, ts("2024-01-15 10:00:00"))))
    val out = EventOps.cohortRetention(ev, "user_id", "ts")
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cw"),
        col("week_offset"), col("n_users"))
      .orderBy("cw", "week_offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("dqReport counts violations per rule; passing rules report zero") {
    val t = df(Seq(Tick7("a", ts("2024-01-01 00:00:00"), -1.0),
      Tick7("b", ts("2024-01-01 00:00:00"), 2.0)))
    val out = Profiling.dqReport(Seq(
        "negative_value" -> t.where(col("value") < 0),
        "null_key" -> t.where(col("key").isNull)))
      .orderBy("rule").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("negative_value", 1L), ("null_key", 0L)))
  }

  test("approx_percentile stays within the sketch's rank-error bound of the exact percentile") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val joined = ev.groupBy("event_type")
      .agg(expr("approx_percentile(value, array(0.5D, 0.95D), 1000)").as("ap"),
        expr("percentile(value, array(0.5D, 0.95D))").as("ep"),
        count(lit(1)).as("n"))
      .collect()
    joined.foreach { r =>
      val ap = r.getSeq[Double](1); val ep = r.getSeq[Double](2); val n = r.getLong(3)
      // accuracy=1000 → rank error <= n/1000; convert to a value bound by
      // checking the approx value's RANK against the exact distribution
      Seq(0, 1).foreach { i =>
        val vals = Tables.load(spark, "/root/testdata/sf0.001", "events")
          .where(col("event_type") === r.getString(0))
          .select("value").collect().map(_.getDouble(0)).sorted
        val rankOfApprox = vals.count(_ <= ap(i)).toDouble / n
        val target = if (i == 0) 0.5 else 0.95
        assert(math.abs(rankOfApprox - target) <= 1.0 / 1000 + 1.0 / n,
          s"type ${r.getString(0)} p$target: approx ${ap(i)} rank $rankOfApprox vs exact ${ep(i)}")
      }
    }
  }
}
