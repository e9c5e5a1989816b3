package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Row7f(k: Long, name: String, bal: Double)
case class Ols7f(g: String, x: Double, y: Double)
case class Tok7f(id: Long, t: String)

/** Round-7 batch-6 operators: block-hash reconciliation and per-group OLS. */
class Round7fOpsSpec extends SparkSpec {

  private val base = Seq(
    Row7f(1, "a", 1.0), Row7f(2, "b", 2.0), Row7f(3, "c", 3.0),
    Row7f(4, "d", 4.0), Row7f(5, "e", 5.0), Row7f(6, "f", 6.0))

  test("blockDiff: reproduces the full snapshot diff exactly (digest pruning is lossless)") {
    // replica: key 3 deleted, key 5 changed, key 9 added
    val replica = Seq(
      Row7f(1, "a", 1.0), Row7f(2, "b", 2.0),
      Row7f(4, "d", 4.0), Row7f(5, "e", 5.5), Row7f(6, "f", 6.0),
      Row7f(9, "z", 9.0))
    val blocked = Relational.blockDiff(df(base), df(replica),
        Seq("k"), Seq("name", "bal"), nBlocks = 16)
      .drop("block")
    val full = Relational.snapshotDiff(df(base), df(replica),
      Seq("k"), Seq("name", "bal"))
    assert(blocked.unionByName(full).except(blocked.intersect(full)).count() === 0)
    assert(blocked.count() === 3)
    val statuses = blocked.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(r.fieldIndex("status")))).toSeq
    assert(statuses === Seq((3L, "removed"), (5L, "changed"), (9L, "added")))
  }

  test("blockDiff: identical snapshots produce no mismatched blocks and an empty diff") {
    val out = Relational.blockDiff(df(base), df(base), Seq("k"), Seq("name", "bal"), 16)
    assert(out.count() === 0)
  }

  test("blockDiff: every emitted row's block id is the portable key-hash block") {
    val replica = base.filterNot(_.k == 2) :+ Row7f(7, "g", 7.0)
    val out = Relational.blockDiff(df(base), df(replica), Seq("k"), Seq("name", "bal"), 16)
      .select(col("k"), col("block"),
        pmod(Portable.hash32(col("k")), lit(16L)).as("expected"))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  test("bpeMergeStep: greedy left-to-right with the overlap rule") {
    val out = df(Seq(Tok7f(1, "a a a"), Tok7f(2, "x a b y"), Tok7f(3, "a")))
      .select(col("id"), TextOps.bpeMergeStep(split(col("t"), "\\s+"), "a", "a").as("m"))
      .orderBy("id").collect().map(_.getSeq[String](1).toList)
    assert(out.toList === List(
      List("aa", "a"),          // "a a a" → merge first pair, carry the third
      List("x", "a", "b", "y"), // no adjacent (a, a) — untouched
      List("a")))               // single token — untouched
  }

  test("bpeMergeStep: merged pair spanning the tail is flushed") {
    val out = df(Seq(Tok7f(1, "x a b")))
      .select(TextOps.bpeMergeStep(split(col("t"), "\\s+"), "a", "b").as("m"))
      .head().getSeq[String](0).toList
    assert(out === List("x", "ab"))
  }

  test("bpeTopMerges: adopts top pair per round, rewrites, breaks ties lexicographically") {
    val corpus = df(Seq(Tok7f(1, "a a a b"), Tok7f(2, "a a")))
    val out = TextOps.bpeTopMerges(corpus, "t", 2).orderBy("iteration").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
    // round 1: (a,a)=3 beats (a,b)=1 → merge "aa"; corpus → [aa,a,b], [aa]
    // round 2: [aa] drops below 2 tokens; remaining pairs (aa,a)=1, (a,b)=1
    //          tie on support → lexicographic (a,b) wins
    assert(out.toSeq === Seq((1, "a", "a", 3L, "aa"), (2, "a", "b", 1L, "ab")))
  }

  test("bpeTopMerges: stops early when no pairs remain") {
    val out = TextOps.bpeTopMerges(df(Seq(Tok7f(1, "a b"))), "t", 5).collect()
    assert(out.length === 1) // (a,b) merges round 1; corpus is single tokens after
  }

  test("groupOls: recovers an exact linear relationship and nulls degenerate groups") {
    val rows =
      (1 to 5).map(i => Ols7f("fit", i.toDouble, 2.0 * i + 3.0)) ++      // y = 2x + 3
      (1 to 4).map(_ => Ols7f("constx", 7.0, 1.0)) ++                    // zero x-variance
      Seq(Ols7f("single", 1.0, 1.0))                                     // n = 1
    val out = Profiling.groupOls(df(rows), Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getAs[Any]("slope")), Option(r.getAs[Any]("intercept"))))
    assert(out.toSeq === Seq(
      ("constx", 4L, None, None),
      ("fit", 5L, Some(2.0), Some(3.0)),
      ("single", 1L, None, None)))
  }
}
