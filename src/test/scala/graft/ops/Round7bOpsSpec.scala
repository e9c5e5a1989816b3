package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Val7(id: Long, grp: String, value: Double)
case class Doc7b(doc_id: Long, text: String)

/** Round-7 batch-2 operators: winsorization, bigram surface, split
  * assignment.
  */
class Round7bOpsSpec extends SparkSpec {

  test("winsorize clips to the group's interpolated percentiles, other groups untouched") {
    // group a: values 0..10 → p10 = 1.0, p90 = 9.0 (exact interpolation
    // on 11 equally spaced points); 0 clips up, 10 clips down
    val rows = (0 to 10).map(i => Val7(i.toLong, "a", i.toDouble)) :+
      Val7(100, "b", 1000.0) // singleton group: percentiles = the value itself
    val out = Profiling.winsorize(df(rows), Seq("grp"), "value", 0.10, 0.90)
      .select("id", "value_w").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(0L) === 1.0)
    assert(out(10L) === 9.0)
    assert(out(5L) === 5.0)
    assert(out(100L) === 1000.0)
  }

  test("bigrams: fewer than 2 tokens yields empty, not a descending-sequence artifact") {
    val out = df(Seq(Doc7b(1, "solo"), Doc7b(2, "  "), Doc7b(3, "a b c")))
      .select(col("doc_id"), TextOps.bigrams(col("text")).as("bg"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    assert(out.toSeq === Seq((1L, Nil), (2L, Nil), (3L, List("a b", "b c"))))
  }

  test("topBigrams ranks by count desc then lexicographic, limited to k") {
    val docs = df(Seq(Doc7b(1, "x y x y z"), Doc7b(2, "x y q")))
    // bigrams: doc1: "x y","y x","x y","y z"; doc2: "x y","y q"
    val out = TextOps.topBigrams(docs, "text", 3).orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("x y", 3L, 1L), ("y q", 1L, 2L), ("y x", 1L, 3L)))
  }

  test("bigramLogProb: hand-computed add-1 value; short docs emit no row") {
    // corpus: doc1 "a b", doc2 "a". bigram model: {"a b": 1}; unigrams:
    // a=2, b=1; V=2. doc1 score = ln((1+1)/(2+2)) = ln(0.5); doc2 no row.
    val out = TextOps.bigramLogProb(df(Seq(Doc7b(1, "a b"), Doc7b(2, "a"))),
      "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 1L, math.rint(math.log(0.5) * 1e6) / 1e6)))
  }

  test("splitAssign is total, deterministic, and stable under corpus growth") {
    val small = df((0L until 100L).map(i => Doc7b(i, "t")))
    val big = df((0L until 1000L).map(i => Doc7b(i, "t")))
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def splits(d: org.apache.spark.sql.DataFrame) =
      Relational.splitAssign(d, "doc_id", fr).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
    val s1 = splits(small); val s2 = splits(big)
    assert(s1.size === 100 && s2.size === 1000)
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    // growth stability: every doc keeps its assignment when the corpus grows
    s1.foreach { case (k, v) => assert(s2(k) === v) }
    // all three splits are populated at n=1000
    assert(s2.values.toSet === Set("train", "val", "test"))
  }
}
