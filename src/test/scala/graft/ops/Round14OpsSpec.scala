package graft.ops

import graft.SparkSpec

case class LineDoc(doc_id: Long, text: String)
case class RankRow(doc_id: Long, rank: Long)
case class RelRow(doc_id: Long, rel: Long)

/** Round-14 operators. Tests check against an independent in-memory
  * referee (plain Scala re-derivation), not the operator's own blocks.
  */
class Round14OpsSpec extends SparkSpec {

  /** Plain-Scala line-dedup referee: first (doc_id, line_no) occurrence
    * of each line wins corpus-wide; docs rebuilt from kept lines.
    */
  private def lineDedupReferee(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Option[String])] = {
    val all = docs.sortBy(_._1).flatMap { case (id, text) =>
      text.split("\n", -1).zipWithIndex.map { case (l, i) => (id, i.toLong, l) }
    }
    val seen = scala.collection.mutable.Set[String]()
    val kept = all.map { case (id, no, l) =>
      val k = seen.add(l); (id, no, l, k)
    }
    kept.groupBy(_._1).map { case (id, rows) =>
      val keptRows = rows.filter(_._4).sortBy(_._2)
      id -> (rows.size.toLong, keptRows.size.toLong,
        if (keptRows.isEmpty) None else Some(keptRows.map(_._3).mkString("\n")))
    }
  }

  test("dedupLines keeps first occurrence corpus-wide, rebuilds docs") {
    val docs = Seq(
      1L -> "header\nalpha beta\ngamma\nfooter",
      2L -> "header\ndelta\ngamma\nfooter",       // header/gamma/footer dup
      3L -> "header\nheader\nepsilon\nfooter",    // within-doc repeat too
      4L -> "header\nfooter")                     // nothing unique
    val out = TextOps.dedupLines(df(docs.map(d => LineDoc(d._1, d._2))), "doc_id", "text")
      .orderBy("doc_id").collect()
    val ref = lineDedupReferee(docs)
    assert(out.length === 4)
    out.foreach { r =>
      val (nLines, nKept, text) = ref(r.getLong(0))
      assert(r.getLong(1) === nLines, s"n_lines for doc ${r.getLong(0)}")
      assert(r.getLong(2) === nKept, s"n_kept for doc ${r.getLong(0)}")
      assert(Option(r.getString(3)) === text, s"text for doc ${r.getLong(0)}")
    }
    // doc 4 is all-duplicate: NULL text, zero kept
    val d4 = out.find(_.getLong(0) == 4L).get
    assert(d4.getLong(2) === 0L)
    assert(d4.isNullAt(3))
    // within-doc repeat: doc 3 keeps only ONE of its two header lines...
    // header was already taken by doc 1, so doc 3 keeps neither
    assert(ref(3L)._2 === 1L) // only epsilon survives
  }

  test("ndcgAtK matches the textbook hand computation") {
    val ranked = df(Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
      .map(p => RankRow(p._1, p._2)))
    // id 9 is judged but never retrieved; id 2 retrieved but unjudged
    val rels = df(Seq((1L, 3L), (3L, 2L), (9L, 1L)).map(p => RelRow(p._1, p._2)))
    val r = Relational.ndcgAtK(ranked, rels, "doc_id", "rank", "rel", k = 3)
      .collect().head
    def disc(pos: Long) = math.log(2.0) / math.log(pos + 1.0)
    def gain(rel: Long) = math.pow(2.0, rel.toDouble) - 1.0
    val dcg = gain(3) * disc(1) + gain(0) * disc(2) + gain(2) * disc(3)
    val idcg = gain(3) * disc(1) + gain(2) * disc(2) + gain(1) * disc(3)
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) - math.rint(dcg * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(2) - math.rint(idcg * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(3) - math.rint(dcg / idcg * 1e6) / 1e6) < 1e-9)
    // perfect ranking of its own judgments scores exactly 1
    val perfect = df(Seq((1L, 1L), (3L, 2L), (9L, 3L)).map(p => RankRow(p._1, p._2)))
    val p1 = Relational.ndcgAtK(perfect, rels, "doc_id", "rank", "rel", k = 3)
      .collect().head
    assert(p1.getDouble(3) === 1.0)
  }

  test("labelPropagation matches a plain-Scala synchronous referee") {
    // two dense 4-cliques joined by a single bridge edge
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((4L, 11L))
    def referee(iters: Int): Map[Long, Long] = {
      val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
      val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = nbrs.keys.map(v => v -> v).toMap
      for (_ <- 0 until iters) {
        lbl = nbrs.map { case (v, ns) =>
          val counts = ns.groupBy(lbl).view.mapValues(_.size).toMap
          v -> counts.toSeq.map { case (l, c) => (-c.toLong, l) }.min._2
        }
      }
      lbl
    }
    val got = Graph.labelPropagation(
        df(edges.map(e => DirEdge(e._1, e._2))), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referee(3))
    // communities must split along the bridge: clique interiors agree,
    // and the two interiors carry different labels
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(12L) === got(13L) && got(13L) === got(14L))
    assert(got(1L) !== got(14L))
  }

  test("gopherRules: each rule trips on its planted violator") {
    val goodBody = Seq.fill(12)("alpha beta gamma delta").mkString(" ")
    val docs = Seq(
      LineDoc(1L, s"the a $goodBody"),                         // passes all
      LineDoc(2L, "the a too short to pass"),                  // n_words < 50
      LineDoc(3L, s"the a ${Seq.fill(50)("#x").mkString(" ")}"), // hash ratio
      LineDoc(4L, "the a\n" + Seq.fill(20)("- bullet line item four words").mkString("\n")), // bullets
      LineDoc(5L, s"the a ${Seq.fill(60)("12345").mkString(" ")}"), // frac_alpha
      LineDoc(6L, s"a only one stopword $goodBody"),           // n_stop < 2
      LineDoc(7L, "the a intro\n" + Seq.fill(9)("same duplicated line content here").mkString("\n"))) // dup lines
    val out = TextOps.gopherRules(df(docs), "doc_id", "text",
        stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def keep(id: Long) = out(id).getBoolean(out(id).fieldIndex("keep"))
    assert(keep(1L), "clean long doc must pass every rule")
    assert(!keep(2L) && out(2L).getLong(out(2L).fieldIndex("n_words")) < 50)
    assert(!keep(3L) &&
      out(3L).getDouble(out(3L).fieldIndex("hash_ratio")) >= 0.1)
    assert(!keep(4L) &&
      out(4L).getDouble(out(4L).fieldIndex("bullet_frac")) >= 0.9)
    assert(!keep(5L) &&
      out(5L).getDouble(out(5L).fieldIndex("frac_alpha")) < 0.8)
    assert(!keep(6L) && out(6L).getLong(out(6L).fieldIndex("n_stop")) === 1L)
    assert(!keep(7L) &&
      out(7L).getDouble(out(7L).fieldIndex("dup_line_frac")) > 0.3)
    // measured values sanity: doc 1 mean word length over known words
    val toks = s"the a $goodBody".split("\\s+")
    val wantMean = toks.map(_.length).sum.toDouble / toks.length
    assert(math.abs(out(1L).getDouble(out(1L).fieldIndex("mean_word_len")) -
      math.rint(wantMean * 1e6) / 1e6) < 1e-9)
  }

  test("fused winnowFingerprints matches the expression-plan referee") {
    // multi-byte codepoints included: the fused pass steps UTF-8
    // boundaries by hand and must agree with Spark's substr/length
    // (codepoint) semantics the referee (and the DuckDB oracle) use
    val docs = Seq(
      LineDoc(1L, "the quick brown fox jumps over the lazy dog again and again"),
      LineDoc(2L, "unrelated preamble words the quick brown fox jumps closing here"),
      LineDoc(3L, "naïve café übermaß — ärgerlich große Straßenbahnhöfe führen überall hin"),
      LineDoc(4L, "short"), // below k + w - 1: filtered out
      LineDoc(5L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")) // degenerate repeats
    val d = df(docs)
    val fused = TextOps.winnowFingerprints(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = TextOps.winnowFingerprintsExpr(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fused === ref)
    assert(fused.exists(_._1 == 3L), "unicode doc must fingerprint")
    assert(!fused.exists(_._1 == 4L), "short doc must be filtered")
  }
}
