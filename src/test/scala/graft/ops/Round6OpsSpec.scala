package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Doc6(doc_id: Long, text: String, lang: String)
case class Ev6(event_id: Long, ts: java.sql.Timestamp, value: Double)

/** Round-6 operators: unigram-LM scoring, BM25, temperature resampling,
  * bucketed interval join, incremental partial-aggregate merge.
  */
class Round6OpsSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("unigramLogProb matches a hand-computed tiny corpus") {
    // model: a:2 b:2 c:1 -> T=5, V=3, denominator T+V=8
    val docs = df(Seq(Doc6(1, "a a b", "en"), Doc6(2, "b c", "en")))
    val out = TextOps.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val pA = math.log(3.0 / 8.0) // (2+1)/8, same for b
    val pC = math.log(2.0 / 8.0)
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_tokens") === 3)
    assert(math.abs(out(0).getAs[Double]("logprob") - pA) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("logprob") - (pA + pC) / 2.0) < 1e-6)
  }

  test("bm25 ranks term-dense documents higher; termless documents absent") {
    val docs = df(Seq(
      Doc6(1, "spark spark spark filler filler", "en"),
      Doc6(2, "spark filler filler filler filler", "en"),
      Doc6(3, "filler filler filler filler filler", "en")))
    val out = TextOps.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    val s1 = out(0).getAs[Double]("bm25")
    val s2 = out(1).getAs[Double]("bm25")
    assert(s1 > s2 && s2 > 0.0)
  }

  test("temperatureSample flattens skew: rare stratum capped at keep_rate 1") {
    val docs = df((1L to 90L).map(i => Doc6(i, "x", "en")) ++
      (91L to 100L).map(i => Doc6(i, "x", "fr")))
    val out = TextOps.temperatureSample(docs, "doc_id", "lang", targetFrac = 0.5)
    val rates = out.select("lang", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // sum_w = sqrt(90)+sqrt(10); mass = 0.5*100
    val sumW = math.sqrt(90.0) + math.sqrt(10.0)
    val expectEn = math.sqrt(90.0) / sumW * 50.0 / 90.0
    assert(math.abs(rates("en") - expectEn) < 1e-6)
    assert(rates("fr") === 1.0) // √-weight 1.25 > 1 -> capped: rare stratum kept whole
    assert(out.where(col("lang") === "fr").count() === 10)
    // deterministic: same input -> identical selection
    val again = TextOps.temperatureSample(docs, "doc_id", "lang", targetFrac = 0.5)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("intervalJoinBucketed equals the naive range join, boundaries included") {
    val events = df((0L until 200L).map(i =>
      Ev6(i, t(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), i.toDouble)))
    // intervals of varying length, some spanning many buckets, one empty range
    val iv = df(Seq(
      (1L, t("2024-01-01 00:10:00"), t("2024-01-01 00:20:00")),
      (2L, t("2024-01-01 00:59:30"), t("2024-01-01 01:02:00")), // spans hour + bucket edge
      (3L, t("2024-01-01 02:30:00"), t("2024-01-01 02:30:00")), // single instant, on an event
      (4L, t("2024-01-01 09:00:00"), t("2024-01-01 10:00:00")))) // beyond data: empty
      .toDF("window_id", "w_start", "w_end")
    val got = EventOps.intervalJoinBucketed(events.toDF(), "ts", iv, "w_start", "w_end", 300L)
      .select("event_id", "window_id")
    val want = events.toDF().crossJoin(iv)
      .where(col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("event_id", "window_id")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    assert(got.where(col("window_id") === 3).count() === 1) // inclusive bounds
  }

  test("mergePartialAggs of base+delta is exactly the one-pass aggregate") {
    val rows = df((1L to 500L).map(i => Ev6(i, t("2024-01-01 00:00:00"), i * 0.123)))
      .withColumn("k", (col("event_id") % 7).cast("string"))
    val base = Relational.partialAggs(rows.where(col("event_id") % 10 =!= 0), Seq("k"), "value")
    val delta = Relational.partialAggs(rows.where(col("event_id") % 10 === 0), Seq("k"), "value")
    val merged = Relational.mergePartialAggs(Seq(base, delta), Seq("k"))
    val full = Relational.mergePartialAggs(Seq(Relational.partialAggs(rows, Seq("k"), "value")), Seq("k"))
    // exact equality, doubles included: the partial state is (count, decimal sum)
    assert(merged.orderBy("k").collect().toSeq === full.orderBy("k").collect().toSeq)
  }

  test("dedupIncremental drops base dups and within-delta dups, first id wins") {
    val base = df(Seq(Doc6(1, "seen before", "en"), Doc6(2, "unique old", "en")))
    val delta = df(Seq(
      Doc6(10, "seen  BEFORE", "en"),  // dup of base (case/whitespace-normalized)
      Doc6(11, "brand new", "en"),
      Doc6(12, "brand new", "en"),     // within-delta dup: 11 wins
      Doc6(13, "also new", "en")))
    val kept = TextOps.dedupIncremental(base, delta, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(11L, 13L))
    // agreement with full re-dedup: incremental survivors = full-corpus
    // survivors restricted to the delta
    val full = TextOps.dedupExact(base.unionByName(delta), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ >= 10).sorted
    assert(kept.toSeq === full.toSeq)
  }

  test("interpolateLinear: time-weighted fill, boundary gaps clamp, all-null stays null") {
    val rows = df(Seq(
      Ev6(1, t("2024-01-01 00:00:00"), 10.0),
      Ev6(2, t("2024-01-01 00:00:30"), Double.NaN), // placeholder, nulled below
      Ev6(3, t("2024-01-01 00:02:00"), 40.0),
      Ev6(4, t("2024-01-01 00:03:00"), Double.NaN), // trailing gap
      Ev6(0, t("2023-12-31 23:59:00"), Double.NaN)  // leading gap
    )).withColumn("value", when(isnan(col("value")), lit(null)).otherwise(col("value")))
      .withColumn("user_id", lit(7L))
    val out = TimeSeries.interpolateLinear(rows, "user_id", "ts", "event_id", "value")
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("filled_value")).toMap
    assert(out(0) === 10.0)                         // leading -> next
    // 30s into a 120s gap from 10.0 to 40.0 -> 10 + 30*(30/120) = 17.5
    assert(math.abs(out(2) - 17.5) < 1e-9)
    assert(out(4) === 40.0)                         // trailing -> prev
    val allNull = rows.withColumn("value", lit(null).cast("double"))
    val fn = TimeSeries.interpolateLinear(allNull, "user_id", "ts", "event_id", "value")
    assert(fn.where(col("filled_value").isNotNull).count() === 0)
  }

  test("round-6 ops degrade to empty output on empty input") {
    val emptyDocs = df(Seq.empty[Doc6])
    assert(TextOps.unigramLogProb(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.bm25Scores(emptyDocs, "doc_id", "text", Seq("spark")).count() === 0)
    assert(TextOps.temperatureSample(emptyDocs, "doc_id", "lang", 0.5).count() === 0)
    val emptyEv = df(Seq.empty[Ev6]).toDF()
    val iv = df(Seq((1L, t("2024-01-01 00:00:00"), t("2024-01-01 01:00:00"))))
      .toDF("window_id", "w_start", "w_end")
    assert(EventOps.intervalJoinBucketed(emptyEv, "ts", iv, "w_start", "w_end", 300L).count() === 0)
    assert(Relational.mergePartialAggs(
      Seq(Relational.partialAggs(emptyEv.withColumn("k", lit("a")).withColumn("value", lit(1.0)),
        Seq("k"), "value")), Seq("k")).count() === 0)
  }
}
