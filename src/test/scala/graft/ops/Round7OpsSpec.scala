package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Doc7(doc_id: Long, text: String)
case class Ev7(id: Long, grp: String, value: Double)

/** Round-7 operators: paragraph(span)-level dedup. */
class Round7OpsSpec extends SparkSpec {

  // 5-token boilerplate blocks (span = 5 below keeps the fixture readable)
  private val boiler = "all rights reserved by corp"
  private val nav = "home about contact terms privacy"

  test("dedupParagraphs removes repeated boilerplate across distinct docs, keeps first occurrence") {
    val docs = df(Seq(
      Doc7(1, s"$boiler unique body one three"),        // span0 = boiler (first), span1 unique
      Doc7(2, s"$boiler other body two words"),         // span0 = boiler (dup of doc1)
      Doc7(3, s"$nav $boiler tail piece here extra")    // span0 = nav, span1 = boiler (dup)
    ))
    val out = TextOps.dedupParagraphs(docs, "doc_id", "text", span = 5)
      .orderBy("doc_id", "span_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0, 1L), (1L, 1, 1L),
      (2L, 0, 0L), (2L, 1, 1L),
      (3L, 0, 1L), (3L, 1, 0L), (3L, 2, 1L)))
  }

  test("dedupParagraphs removes within-document repeats (same span twice in one doc)") {
    val docs = df(Seq(Doc7(1, s"$boiler $boiler closing words still going")))
    val out = TextOps.dedupParagraphs(docs, "doc_id", "text", span = 5)
      .orderBy("span_idx").collect()
      .map(r => (r.getInt(1), r.getLong(3)))
    assert(out.toSeq === Seq((0, 1L), (1, 0L), (2, 1L)))
  }

  test("dedupParagraphs: short last span deduped like any other; empty docs emit no spans") {
    val docs = df(Seq(
      Doc7(1, "alpha beta gamma delta epsilon zeta eta"), // span1 = "zeta eta" (short)
      Doc7(2, "zeta eta"),                                // whole doc = that short span
      Doc7(3, "   ")                                      // whitespace only -> no spans
    ))
    val out = TextOps.dedupParagraphs(docs, "doc_id", "text", span = 5)
      .orderBy("doc_id", "span_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 0, 1L), (1L, 1, 1L), (2L, 0, 0L)))
  }

  test("madScore matches a hand-computed group; zero-MAD group scores null") {
    val rows = df(Seq(
      Ev7(1, "a", 1.0), Ev7(2, "a", 2.0), Ev7(3, "a", 3.0),
      Ev7(4, "a", 4.0), Ev7(5, "a", 100.0), // median 3, |dev| = {2,1,0,1,97} -> MAD 1
      Ev7(6, "b", 5.0), Ev7(7, "b", 5.0), Ev7(8, "b", 5.0))) // MAD 0 -> null score
    val out = Profiling.madScore(rows, Seq("grp"), "value")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), Option(r.getAs[Any]("mad_score"))))
    assert(out(4)._2.map(_.asInstanceOf[Double]).contains(97.0)) // (100-3)/1
    assert(out(0)._2.map(_.asInstanceOf[Double]).contains(-2.0))
    assert(out.drop(5).forall(_._2.isEmpty), "zero-MAD group must score null")
  }

  test("dedupParagraphs kept spans reassemble a boilerplate-free corpus") {
    // the end-to-end use: join the kept map back and check each retained
    // span text occurs exactly once corpus-wide
    val docs = df(Seq(
      Doc7(1, s"$boiler body one alpha beta"),
      Doc7(2, s"$boiler body two gamma delta"),
      Doc7(3, s"$boiler body one alpha beta") // exact dup of doc1 (both spans)
    ))
    val spans = TextOps.dedupParagraphs(docs, "doc_id", "text", span = 5)
    assert(spans.where(col("kept") === 1).groupBy("span_fp").count()
      .where(col("count") > 1).count() === 0)
    assert(spans.where(col("kept") === 1).count() === 3) // boiler + 2 distinct bodies
    assert(spans.where(col("doc_id") === 3 && col("kept") === 1).count() === 0)
  }
}
