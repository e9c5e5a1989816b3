package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)
case class Kv(k: String, v: Long)
case class TypedEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)

class RelationalEventSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("semi/anti joins partition the left side") {
    val l = df(Seq(Kv("a", 1), Kv("b", 2), Kv("c", 3)))
    val r = df(Seq(Kv("a", 9), Kv("c", 9)))
    val semi = Relational.semiJoin(l, r.select("k"), Seq("k")).collect().map(_.getString(0)).sorted
    val anti = Relational.antiJoin(l, r.select("k"), Seq("k")).collect().map(_.getString(0)).sorted
    assert(semi.toSeq === Seq("a", "c"))
    assert(anti.toSeq === Seq("b"))
    assert(semi.length + anti.length === 3)
  }

  test("topKPerGroup returns exactly k per group, deterministically") {
    val in = df((1 to 20).map(i => Kv(if (i % 2 == 0) "even" else "odd", i.toLong)))
    val r = Relational.topKPerGroup(in, Seq("k"), Seq(col("v").desc), 3)
      .orderBy("k", "rn").collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq === Seq(("even", 20L), ("even", 18L), ("even", 16L),
                           ("odd", 19L), ("odd", 17L), ("odd", 15L)))
  }

  test("topKPerGroup salted two-phase (fanout > 1) equals the single-phase result") {
    val in = df((1 to 200).map(i => Kv(if (i % 2 == 0) "even" else "odd", i.toLong)))
    val one = Relational.topKPerGroup(in, Seq("k"), Seq(col("v").desc), 5)
      .orderBy("k", "rn").collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2)))
    val two = Relational.topKPerGroup(in, Seq("k"), Seq(col("v").desc), 5, fanout = 8)
      .orderBy("k", "rn").collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2)))
    assert(two.toSeq === one.toSeq)
  }

  test("upsertLatest keeps the highest version per key and passes through new keys") {
    val base = df(Seq(Kv("a", 1), Kv("b", 2))).withColumn("version", lit(1L))
    val updates = df(Seq(Kv("b", 20), Kv("c", 30))).withColumn("version", lit(2L))
    val out = Relational.upsertLatest(base, updates, Seq("k"), "version")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", 1L, 1L), ("b", 20L, 2L), ("c", 30L, 2L)))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = df(Seq(Kv("a", 1), Kv("b", 2), Kv("c", 3)))
    val neu = df(Seq(Kv("b", 2), Kv("c", 30), Kv("d", 4))) // a removed, c changed, d added
    val out = Relational.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getAs[String]("status")))
    assert(out.toSeq === Seq(("a", "removed"), ("c", "changed"), ("d", "added")))
  }

  test("funnel: steps only count at-or-after the previous step; dropoff keeps partial rows") {
    val ev = df(Seq(
      // user 1: full funnel in order
      TypedEv(1, t("2024-01-01 09:00:00"), "view"),
      TypedEv(1, t("2024-01-01 09:05:00"), "click"),
      TypedEv(1, t("2024-01-01 09:10:00"), "purchase"),
      // user 2: purchase BEFORE any view → only reaches step 1 (view)
      TypedEv(2, t("2024-01-01 08:00:00"), "purchase"),
      TypedEv(2, t("2024-01-01 09:00:00"), "view"),
      // user 3: view then click, click-before-view ignored, no purchase
      TypedEv(3, t("2024-01-01 07:00:00"), "click"),
      TypedEv(3, t("2024-01-01 08:00:00"), "view"),
      TypedEv(3, t("2024-01-01 08:30:00"), "click"),
      // user 4: never views → not in the funnel at all
      TypedEv(4, t("2024-01-01 10:00:00"), "click")))
    val out = EventOps.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), r.getLong(4))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L)._4 === 3L)
    assert(out(2L) === ((Some(t("2024-01-01 09:00:00")), None, None, 1L)))
    assert(out(3L) === ((Some(t("2024-01-01 08:00:00")), Some(t("2024-01-01 08:30:00")), None, 2L)))
  }

  test("sessionize: new session when gap exceeded, ordered by time") {
    val in = df(Seq(
      Ev(1, 7, t("2024-01-01 00:00:00"), 0),
      Ev(2, 7, t("2024-01-01 00:10:00"), 0),   // gap 600 ≤ 1800 → same session
      Ev(3, 7, t("2024-01-01 01:00:00"), 0),   // gap 3000 > 1800 → new session
      Ev(4, 8, t("2024-01-01 00:00:00"), 0)))  // other user
    val r = EventOps.sessionize(in, "user_id", "event_id", "ts", 1800L)
      .orderBy("event_id").select("session_seq").collect().map(_.getLong(0))
    assert(r.toSeq === Seq(1L, 1L, 2L, 1L))
  }

  test("sessionize orders by timestamp even when orderCol disagrees") {
    val in = df(Seq(
      Ev(2, 7, t("2024-01-01 00:00:00"), 0),   // ids reversed vs time
      Ev(1, 7, t("2024-01-01 02:00:00"), 0)))
    val r = EventOps.sessionize(in, "user_id", "event_id", "ts", 1800L)
      .orderBy("ts").select("session_seq").collect().map(_.getLong(0))
    assert(r.toSeq === Seq(1L, 2L))            // gap computed in time order
  }

  test("tumblingWindowStats: epoch-aligned windows") {
    val in = df(Seq(
      Ev(1, 7, t("2024-01-01 00:03:00"), 2.0),
      Ev(2, 7, t("2024-01-01 00:07:00"), 3.0),
      Ev(3, 7, t("2024-01-01 00:12:00"), 5.0)))
    val r = EventOps.tumblingWindowStats(in, "user_id", "ts", "value", "10 minutes")
      .orderBy("win_start").collect()
    assert(r.length === 2)
    assert(r(0).getAs[String]("win_start") === "2024-01-01 00:00:00")
    assert(r(0).getAs[Long]("n_events") === 2L)
    assert(r(0).getAs[Double]("sum_value") === 5.0)
    assert(r(1).getAs[String]("win_start") === "2024-01-01 00:10:00")
  }

  test("jsonField extracts typed values") {
    val in = spark.createDataFrame(Seq((1L, """{"k": 87}"""), (2L, """{"k": -3}""")))
      .toDF("id", "props")
    val r = EventOps.jsonField(in, "props", "$.k", "long")
      .orderBy("id").select("json_value").collect().map(_.getLong(0))
    assert(r.toSeq === Seq(87L, -3L))
  }

  test("portable hash32 and fingerprint are stable") {
    val in = df(Seq(Kv("x", 1)))
    val r = in.select(
      Portable.rowFingerprint(col("k"), col("v")).as("fp"),
      Portable.hash32(lit("hello")).as("h")).head()
    assert(r.getString(0) === r.getString(0))
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592 → first 8 hex as int
    assert(r.getLong(1) === java.lang.Long.parseLong("5d41402a", 16))
  }
}
