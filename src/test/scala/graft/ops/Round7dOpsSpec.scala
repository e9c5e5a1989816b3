package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Snap7(k: Long, seg: String, bal: Double)
case class Ev7d(user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)
case class Doc7d(doc_id: Long, text: String)
case class Basket7(b: Long, i: Long)
case class Edge7(src: Long, dst: Long)

/** Round-7 batch-4 operators: SCD2, drawdown, streaks, vocabulary
  * coverage, co-occurrence, PageRank.
  */
class Round7dOpsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scdType2: unchanged stays open, change closes+reopens, insert opens, delete closes") {
    val cur = df(Seq(
      Snap7(1, "A", 10.0),   // unchanged
      Snap7(2, "B", 20.0),   // segment change
      Snap7(3, "C", 30.0)))  // deleted
    val nxt = df(Seq(
      Snap7(1, "A", 10.0),
      Snap7(2, "X", 20.0),
      Snap7(4, "D", 40.0)))  // inserted
    val out = Relational.scdType2(cur, nxt, "k", Seq("seg", "bal"), "d0", "d1")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3),
        Option(r.getString(4)), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, "A", "d0", None, true),            // unchanged: one open row
      (2L, "B", "d0", Some("d1"), false),     // old version closed
      (2L, "X", "d1", None, true),            // new version open
      (3L, "C", "d0", Some("d1"), false),     // deleted: closed, no successor
      (4L, "D", "d1", None, true)))           // insert: open from d1
  }

  test("drawdown: equity is the exact running sum, peak its running max") {
    val ev = df(Seq(
      Ev7d(1, ts("2024-01-01 10:00:00"), 1, 5.0),
      Ev7d(1, ts("2024-01-01 11:00:00"), 2, -3.0),
      Ev7d(1, ts("2024-01-01 12:00:00"), 3, 1.0),
      Ev7d(1, ts("2024-01-01 13:00:00"), 4, 4.0)))
    val out = TimeSeries.drawdown(ev, "user_id", "ts", "event_id", "value")
      .select("event_id", "equity", "peak", "drawdown")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 5.0, 5.0, 0.0),
      (2L, 2.0, 5.0, 3.0),   // trough 3 under the peak
      (3L, 3.0, 5.0, 2.0),
      (4L, 7.0, 7.0, 0.0)))  // new peak
  }

  test("activityStreaks: islands of consecutive days; duplicates within a day collapse") {
    val ev = df(Seq(
      // user 1: Jan 1,2,3 (streak 3) then Jan 6,7 (streak 2); two events Jan 2
      Ev7d(1, ts("2024-01-01 09:00:00"), 1, 0), Ev7d(1, ts("2024-01-02 09:00:00"), 2, 0),
      Ev7d(1, ts("2024-01-02 21:00:00"), 3, 0), Ev7d(1, ts("2024-01-03 09:00:00"), 4, 0),
      Ev7d(1, ts("2024-01-06 09:00:00"), 5, 0), Ev7d(1, ts("2024-01-07 09:00:00"), 6, 0),
      // user 2: one day
      Ev7d(2, ts("2024-01-05 09:00:00"), 7, 0)))
    val out = EventOps.activityStreaks(ev, "user_id", "ts")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 3L, 2L, 5L), (2L, 1L, 1L, 1L)))
  }

  test("vocabCoverage: rank by frequency, cumulative share of all tokens") {
    val docs = df(Seq(
      Doc7d(1, "a a a b b c"),
      Doc7d(2, "a b  c d")))  // 10 tokens total: a=4 b=3 c=2 d=1
    val out = TextOps.vocabCoverage(docs, "text", 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, "a", 4L, 0.4),
      (2L, "b", 3L, 0.7),
      (3L, "c", 2L, 0.9)))  // d cut by k=3
  }

  test("coOccurrence: within-basket pairs only, support across baskets, ordered ties") {
    val baskets = df(Seq(
      Basket7(1, 10), Basket7(1, 20), Basket7(1, 30),
      Basket7(2, 10), Basket7(2, 20),
      Basket7(3, 10), Basket7(3, 20), Basket7(3, 10)))  // dup item collapses
    val out = Relational.coOccurrence(baskets, "b", "i", 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 10L, 20L, 3L),
      (2L, 10L, 30L, 1L),
      (3L, 20L, 30L, 1L)))
  }

  test("basketPairs: matches the equi-self-join formulation on real data") {
    // The single-scan basket expansion (groupBy + collect_set + pair
    // explode) must yield the EXACT pair multiset of the reference
    // formulation (distinct items, within-basket self-join on a < b) —
    // support counts and the derived co-occurrence edge set both ride on
    // this equivalence.
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val viaBaskets = Relational.basketPairs(li, "l_orderkey", "l_partkey")
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n"))
    val items = li.select(col("l_orderkey").as("_b"), col("l_partkey").as("_i")).distinct()
    val viaJoin = items.as("l")
      .join(items.as("r"), col("l._b") === col("r._b") && col("l._i") < col("r._i"))
      .select(col("l._i").as("item_a"), col("r._i").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n"))
    assert(viaBaskets.except(viaJoin).count() === 0)
    assert(viaJoin.except(viaBaskets).count() === 0)
  }

  test("pageRank: symmetric 2-node graph converges to uniform; star concentrates rank") {
    // symmetric pair: ranks stay 0.5 each at every iteration
    val pair = df(Seq(Edge7(1, 2), Edge7(2, 1)))
    val pr2 = Graph.pageRank(pair, "src", "dst", iters = 2)
      .orderBy("id").collect().map(_.getDouble(1))
    assert(pr2.forall(r => math.abs(r - 0.5) < 1e-12))

    // symmetric star 1↔{2,3,4}: hub out-ranks leaves, ranks sum to 1
    val star = df(Seq(Edge7(1, 2), Edge7(2, 1), Edge7(1, 3), Edge7(3, 1),
      Edge7(1, 4), Edge7(4, 1)))
    val ranks = Graph.pageRank(star, "src", "dst", iters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val hub = ranks.head._2
    val leaves = ranks.tail.map(_._2)
    assert(hub > leaves.max)
    assert(leaves.distinct.length == 1) // symmetry: identical leaf ranks
    assert(math.abs(ranks.map(_._2).sum - 1.0) < 1e-9) // no dangling leak
  }
}
