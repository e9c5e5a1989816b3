package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Pair7e(k: String, o: Long, x: Double, y: Double)
case class Feat7e(g: String, id: Long, v: Double)
case class Cdc7e(k: Long, op: String, version: Long, name: String, bal: Double)
case class Base7e(k: Long, name: String, bal: Double)
case class Doc7e(doc_id: Long, text: String)
case class E7e(a: Long, b: Long)

/** Round-7 batch-5 operators: rolling correlation, min-max scaling, CDC
  * apply, feature hashing, bounded-hop BFS, degree distribution.
  */
class Round7eOpsSpec extends SparkSpec {

  test("rollingCorr: perfectly correlated series → 1, anti-correlated → -1, constant → null") {
    val rows = (1L to 5L).map(i => Pair7e("up", i, i.toDouble, 2.0 * i + 3)) ++
      (1L to 5L).map(i => Pair7e("down", i, i.toDouble, -i.toDouble)) ++
      (1L to 5L).map(i => Pair7e("flat", i, i.toDouble, 7.0))
    val out = TimeSeries.rollingCorr(df(rows), "k", "o", "x", "y", 3)
      .withColumn("roll_corr", round(col("roll_corr"), 6)) // the query-side rounding
      .where(col("o") === 5).orderBy("k").collect()
      .map(r => (r.getString(0), Option(r.getAs[Any]("roll_corr"))))
    assert(out.toSeq === Seq(
      ("down", Some(-1.0)),
      ("flat", None),          // zero variance in y
      ("up", Some(1.0))))
  }

  test("rollingCorr: frame shorter than 2 rows is null") {
    val out = TimeSeries.rollingCorr(
        df(Seq(Pair7e("a", 1, 1.0, 2.0))), "k", "o", "x", "y", 3)
      .collect()
    assert(out.head.isNullAt(out.head.fieldIndex("roll_corr")))
  }

  test("minMaxScale: 0 at min, 1 at max, null for degenerate groups") {
    val out = Profiling.minMaxScale(df(Seq(
        Feat7e("g", 1, 10.0), Feat7e("g", 2, 20.0), Feat7e("g", 3, 15.0),
        Feat7e("one", 4, 5.0), Feat7e("one", 5, 5.0))), Seq("g"), "v")
      .orderBy("id").collect()
      .map(r => Option(r.getAs[Any]("scaled")))
    assert(out.toSeq === Seq(Some(0.0), Some(1.0), Some(0.5), None, None))
  }

  test("cdcApply: latest version wins, D suppresses, I inserts, untouched rows pass through") {
    val base = df(Seq(Base7e(1, "a", 1.0), Base7e(2, "b", 2.0), Base7e(3, "c", 3.0),
      Base7e(4, "d", 4.0)))
    val changes = df(Seq(
      Cdc7e(2, "U", 1, "b1", 2.1),   // superseded update...
      Cdc7e(2, "U", 2, "b2", 2.2),   // ...latest version wins
      Cdc7e(3, "U", 1, "c1", 3.1),   // update then delete:
      Cdc7e(3, "D", 2, "c1", 3.1),   // delete wins → key gone
      Cdc7e(4, "U", 2, "d9", 4.9),   // EXACT (key, version) tie with a delete:
      Cdc7e(4, "D", 2, "d0", 4.0),   // explicit priority D > U → key gone
      Cdc7e(8, "I", 1, "i1", 8.1),   // I/U tie at the same version:
      Cdc7e(8, "U", 1, "u1", 8.2),   // U > I → the update's payload wins
      Cdc7e(9, "I", 1, "new", 9.0))) // insert of an unseen key
    val out = Relational.cdcApply(base, changes, "k", "op", "version", Seq("name", "bal"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, "a", 1.0), (2L, "b2", 2.2), (8L, "u1", 8.2), (9L, "new", 9.0)))
  }

  test("featureHash: bucketed counts serialize sorted; same text → same features") {
    val out = TextOps.featureHash(df(Seq(
        Doc7e(1, "x y x"), Doc7e(2, "x y x"), Doc7e(3, ""))), "doc_id", "text", 16)
      .orderBy("doc_id").collect()
    assert(out.length === 2) // empty doc has no tokens → no row
    assert(out(0).getString(1) === out(1).getString(1)) // deterministic featurization
    assert(out(0).getLong(2) <= 2)                      // ≤ 2 distinct buckets (x, y)
    val counts = out(0).getString(1).split(" ").map(_.split(":")(1).toInt).sorted
    assert(counts.toSeq === Seq(1, 2)) // tf of y and x
  }

  test("bfsWithinHops labels minimum hop; beyond-bound nodes are absent") {
    // path 1-2-3-4: from seed {1}, hop(1)=0, hop(2)=1, hop(3)=2, 4 unreachable in 2
    val edges = df(Seq(E7e(1, 2), E7e(2, 3), E7e(3, 4)))
    val seeds = df(Seq(E7e(1, 0))).select(col("a"))
    val out = Graph.bfsWithinHops(edges, "a", "b", seeds, "a", 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq === Seq((1L, 0), (2L, 1), (3L, 2)))
  }

  test("degreeDistribution: star graph → hub degree n, leaves degree 1; self-loops dropped") {
    val edges = df(Seq(E7e(1, 2), E7e(1, 3), E7e(1, 4), E7e(2, 2)))
    val out = Graph.degreeDistribution(edges, "a", "b")
      .orderBy("degree").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 3L), (3L, 1L))) // three degree-1 leaves, one degree-3 hub
  }

  test("periodChange: lag deltas per group; first period and zero-prev are null-safe") {
    val ev = df(Seq(
      Feat7e("p", 1, 10.0), Feat7e("p", 1, 10.0),  // period 1: 20
      Feat7e("p", 2, 30.0),                        // period 2: 30 → +50%
      Feat7e("q", 1, 5.0)))
    val out = TimeSeries.periodChange(ev, "g", col("id").as("period"), col("v"))
      .orderBy("g", "period").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), Option(r.getAs[Any]("pct_change"))))
    assert(out.toSeq === Seq(
      ("p", 1L, 20.0, None),
      ("p", 2L, 30.0, Some(0.5)),
      ("q", 1L, 5.0, None)))
  }
}
