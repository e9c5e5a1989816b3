package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Tok7(doc_id: Long, text: String)

/** Misra-Gries heavy hitters: the candidate phase must be a lossless
  * superset even when the vocabulary is far larger than the counter
  * capacity, and the recount phase must make the final answer exact.
  */
class HeavyHitterSpec extends SparkSpec {

  test("exact at vocabulary >> 1/phi capacity, across multiple partitions") {
    // 50×hot + 30×warm + 100 singletons = 180 tokens; phi=0.1 → cap=10
    // counters per partition, vocabulary 102 — MG must evict constantly
    // and still never lose a true heavy hitter.
    val rows = (Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++
      (0 until 100).map(i => s"rare$i")).zipWithIndex
      .map { case (t, i) => Tok7(i.toLong, t) }
    val docs = df(new scala.util.Random(42).shuffle(rows)).repartition(7)
    val out = TextOps.heavyHitters(docs, "text", phi = 0.1)
      .orderBy("token").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("hot", 50L), ("warm", 30L)))
  }

  test("threshold is strict: a token at exactly phi*N is excluded") {
    // 20×a + 80 singletons = 100 tokens; phi=0.2 → threshold 20, 'a' has
    // exactly 20 → excluded (count must EXCEED phi*N)
    val rows = (Seq.fill(20)("a") ++ (0 until 80).map(i => s"r$i")).zipWithIndex
      .map { case (t, i) => Tok7(i.toLong, t) }
    val out = TextOps.heavyHitters(df(rows).repartition(3), "text", phi = 0.2).collect()
    assert(out.isEmpty)
  }

  test("multi-token documents tokenize before counting") {
    val docs = df(Seq(Tok7(1, "x x x y"), Tok7(2, "x y z")))
    val out = TextOps.heavyHitters(docs, "text", phi = 0.4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("x", 4L)))  // 4/7 > 0.4; y 2/7, z 1/7 below
  }
}
