package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests for the round-14 operators over
  * ScalaCheck-generated corpora with fixed seeds (deterministic CI).
  */
class Round14PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(10), Seed(i.toLong)))

  private val lineGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
      .map(_.mkString(" "))
  private val docGen: Gen[String] =
    Gen.nonEmptyListOf(lineGen).map(_.mkString("\n"))

  test("dedupLines invariants: counts, reconstruction, idempotence") {
    samples(Gen.nonEmptyListOf(docGen), 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => LineDoc(i.toLong, t) }
      val out = TextOps.dedupLines(df(docs), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.getString(3)))).sortBy(_._1)
      // counts: n_kept <= n_lines; n_lines matches the input split
      out.foreach { case (id, nLines, nKept, text) =>
        assert(nKept <= nLines)
        assert(nLines === texts(id.toInt).split("\n", -1).length.toLong)
        // reconstruction: text_dedup has exactly n_kept lines, all from the doc
        text match {
          case Some(t) =>
            val kept = t.split("\n", -1)
            assert(kept.length.toLong === nKept)
            val orig = texts(id.toInt).split("\n", -1).toSet
            assert(kept.forall(orig.contains))
          case None => assert(nKept === 0L)
        }
      }
      // global: every distinct line across the corpus is kept exactly once
      val distinctLines = texts.flatMap(_.split("\n", -1)).distinct.size.toLong
      assert(out.map(_._3).sum === distinctLines)
      // idempotence: dedup of the deduped corpus keeps everything
      val deduped = out.collect { case (id, _, nKept, Some(t)) => LineDoc(id, t) }
      if (deduped.nonEmpty) {
        val again = TextOps.dedupLines(df(deduped), "doc_id", "text")
          .collect().map(r => (r.getLong(1), r.getLong(2)))
        again.foreach { case (n, k) => assert(n === k, "second pass must keep all lines") }
      }
    }
  }

  test("ndcg bounds: always in [0, 1], and 1 exactly for the ideal ranking") {
    val relsGen = Gen.nonEmptyListOf(Gen.choose(0L, 4L)).map(_.zipWithIndex.map {
      case (rel, i) => (i.toLong + 1, rel)
    })
    samples(relsGen, 6).filter(_.exists(_._2 > 0)).foreach { judged =>
      val rels = df(judged.map(p => RelRow(p._1, p._2)))
      // ideal ranking: ids ordered by (rel desc, id asc)
      val ideal = judged.sortBy(p => (-p._2, p._1)).zipWithIndex
        .map { case ((id, _), pos) => RankRow(id, pos.toLong + 1) }
      val k = math.max(1, judged.size / 2)
      val perfect = Relational.ndcgAtK(df(ideal), rels, "doc_id", "rank", "rel", k)
        .collect().head.getDouble(3)
      assert(perfect === 1.0, s"ideal ranking must score exactly 1, got $perfect")
      // any other ranking (reversed) stays within [0, 1]
      val reversed = ideal.reverse.zipWithIndex.map { case (r, i) => RankRow(r.doc_id, i.toLong + 1) }
      val nd = Relational.ndcgAtK(df(reversed), rels, "doc_id", "rank", "rel", k)
        .collect().head.getDouble(3)
      assert(nd >= 0.0 && nd <= 1.0, s"ndcg out of bounds: $nd")
    }
  }

  test("labelPropagation: labels are node ids of the same component") {
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)).suchThat(e => e._1 != e._2))
    samples(edgeGen, 5).foreach { edges =>
      val in = df(edges.map(e => DirEdge(e._1, e._2)))
      val got = Graph.labelPropagation(in, "src", "dst", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet === nodes, "every edge-touched node gets a label")
      // a label is always some node's id in the SAME component
      val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
      def component(start: Long): Set[Long] = {
        var seen = Set(start); var frontier = Set(start)
        while (frontier.nonEmpty) {
          frontier = sym.filter(e => frontier(e._1)).map(_._2).toSet -- seen
          seen ++= frontier
        }
        seen
      }
      got.foreach { case (v, lbl) =>
        assert(component(v)(lbl), s"label $lbl of $v is outside its component")
      }
    }
  }

  test("gopherRules: measured values are bounded and keep implies every rule") {
    samples(Gen.nonEmptyListOf(docGen), 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => LineDoc(i.toLong, t) }
      val out = TextOps.gopherRules(df(docs), "doc_id", "text",
        stopwords = Seq("alpha", "beta"), minWords = 3L).collect()
      out.foreach { r =>
        val frac = r.getDouble(r.fieldIndex("frac_alpha"))
        val dup = r.getDouble(r.fieldIndex("dup_line_frac"))
        assert(frac >= 0.0 && frac <= 1.0)
        assert(dup >= 0.0 && dup < 1.0)
        if (r.getBoolean(r.fieldIndex("keep"))) {
          assert(r.getLong(r.fieldIndex("n_words")) >= 3L)
          assert(r.getLong(r.fieldIndex("n_stop")) >= 2L)
          assert(dup <= 0.3)
        }
      }
    }
  }
}
