package graft.ops

import graft.SparkSpec

case class SkyPoint(doc_id: Long, source: String, x: Long, y: Long)
case class AcfRow(user_id: Long, event_id: Long, value: Double)
case class Affil(cust: Long, supp: Long)
case class LVec(vec_id: Long, embedding: Array[Float], label: Int)

/** Round-15 operators, each checked against an independent in-memory
  * referee (plain Scala re-derivation), not the operator's own blocks.
  */
class Round15OpsSpec extends SparkSpec {

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("retrievalMetrics matches the textbook hand computation") {
    // ranks 1..6; relevant = {B, D, E, Z}; Z never retrieved
    val ranked = df(Seq(("A", 1L), ("B", 2L), ("C", 3L), ("D", 4L), ("E", 5L), ("F", 6L))
      .map(p => RankRow2(p._1, p._2)))
    val rels = df(Seq("B", "D", "E", "Z", "B" /* dup must dedup */).map(RelId2))
    val r = Relational.retrievalMetrics(ranked, rels, "doc_id", "rank", k = 5)
      .collect().head
    assert(r.getLong(0) === 5L)              // k
    assert(r.getLong(1) === 4L)              // n_rel (dup B collapsed)
    assert(r.getDouble(2) === r6(1.0 / 2.0)) // mrr: first hit at rank 2
    assert(r.getDouble(3) === r6(3.0 / 5.0)) // p@5: B,D,E in top-5
    assert(r.getDouble(4) === r6(3.0 / 4.0)) // r@5
    // AP@5 = (1/2 + 2/4 + 3/5) / min(4, 5)
    assert(r.getDouble(5) === r6((1.0 / 2.0 + 2.0 / 4.0 + 3.0 / 5.0) / 4.0))
  }

  test("retrievalMetrics with no relevant retrieved, and empty judgments") {
    val ranked = df(Seq(("A", 1L), ("B", 2L)).map(p => RankRow2(p._1, p._2)))
    val none = Relational.retrievalMetrics(ranked,
      df(Seq("Z").map(RelId2)), "doc_id", "rank", k = 2).collect().head
    assert(none.isNullAt(2))                 // mrr: no hit anywhere
    assert(none.getDouble(3) === 0.0 && none.getDouble(4) === 0.0)
    assert(none.getDouble(5) === 0.0)        // ap: empty precision sum
    val empty = Relational.retrievalMetrics(ranked,
      df(Seq.empty[RelId2]), "doc_id", "rank", k = 2).collect().head
    assert(empty.getLong(1) === 0L)
    assert(empty.isNullAt(2) && empty.getDouble(3) === 0.0)
    assert(empty.isNullAt(4) && empty.isNullAt(5)) // 0-denominator guards
  }

  test("skyline2D equals the brute-force dominance referee") {
    // ties on x, ties on y, an exact duplicate pair, and two groups
    val pts = Seq(
      SkyPoint(1, "g1", 10, 1), SkyPoint(2, "g1", 8, 5), SkyPoint(3, "g1", 8, 5),
      SkyPoint(4, "g1", 8, 4), SkyPoint(5, "g1", 6, 7), SkyPoint(6, "g1", 10, 1),
      SkyPoint(7, "g1", 5, 7), SkyPoint(8, "g1", 1, 9),
      SkyPoint(9, "g2", 2, 2), SkyPoint(10, "g2", 2, 3), SkyPoint(11, "g2", 3, 1))
    def dominated(p: SkyPoint) = pts.exists(q => q.source == p.source &&
      q.x >= p.x && q.y >= p.y && (q.x > p.x || q.y > p.y))
    val want = pts.filterNot(dominated).map(_.doc_id).toSet
    val got = Relational.skyline2D(df(pts), "source", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got === want)
    // the referee keeps both coincident duplicates (2,3) and both
    // copies of the (10,1) corner — neither dominates its twin
    assert(Set(1L, 2L, 3L, 5L, 6L, 8L).subsetOf(got))
    // (5,7) loses to (6,7): >= on y, > on x — dominance needs only ONE strict
    assert(!got.contains(7L))
    assert(got.contains(11L), "(3,1) holds g2's max x — frontier corner")
    assert(!got.contains(4L) && !got.contains(9L))
  }

  test("acf: alternating series has lag-1 acf -1 and lag-2 acf +1") {
    val alt = (1L to 10L).map(i => AcfRow(1L, i, if (i % 2 == 0) 1.0 else -1.0))
    val const = (1L to 6L).map(i => AcfRow(2L, i, 3.5))   // zero variance
    val short = Seq(AcfRow(3L, 1L, 1.0), AcfRow(3L, 2L, 2.0)) // 1 pair at lag 1
    val out = TimeSeries.acf(df(alt ++ const ++ short), "user_id", "event_id", "value", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out((1L, 1L)).getDouble(3) === -1.0)
    assert(out((1L, 2L)).getDouble(3) === 1.0)
    assert(out((2L, 1L)).isNullAt(3), "constant series must yield NULL, not NaN")
    assert(out((3L, 1L)).isNullAt(3), "single pair has zero variance -> NULL")
    assert(out((1L, 1L)).getLong(2) === 9L) // n pairs at lag 1
  }

  test("acf matches a plain-Scala Pearson referee on an irregular series") {
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val rows = vals.zipWithIndex.map { case (v, i) => AcfRow(7L, i + 1L, v) }
    def ref(l: Int): Double = {
      val x = vals.drop(l); val y = vals.dropRight(l)
      val n = x.size.toDouble
      val (sx, sy) = (x.sum, y.sum)
      val sxx = x.map(v => v * v).sum; val syy = y.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val out = TimeSeries.acf(df(rows), "user_id", "event_id", "value", 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    (1 to 3).foreach { l =>
      assert(math.abs(out(l.toLong) - r6(ref(l))) < 1e-9, s"lag $l")
    }
  }

  test("adamicAdarBipartite matches the hand-computed wedge sum") {
    // suppliers: s1 shared by {1,2,3} (deg 3), s2 by {1,2} (deg 2),
    // s3 only by {4} (deg 1 — never a wedge)
    val edges = Seq(Affil(1, 101), Affil(2, 101), Affil(3, 101),
      Affil(1, 102), Affil(2, 102), Affil(4, 103))
    val out = Graph.adamicAdarBipartite(df(edges), "cust", "supp", topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val ln3 = 1.0 / math.log(3.0); val ln2 = 1.0 / math.log(2.0)
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((1L, 2L))._1 === 2L)                      // shares s1 AND s2
    assert(out((1L, 2L))._2 === r6(ln3 + ln2))
    assert(out((1L, 3L)) === ((1L, r6(ln3))))
    assert(out((2L, 3L)) === ((1L, r6(ln3))))
    // the rare shared supplier (deg 2) outweighs the popular one (deg 3)
    assert(ln2 > ln3)
  }

  test("deterministicWalks replays the hash-argmin referee hop by hop") {
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    // path + a triangle: every node has ≥ 1 neighbor
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L), (4L, 5L))
    val nbrs = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    def referee(seed: Long): Seq[(Long, Long)] = {
      var cur = seed
      (0 to 3).map { t =>
        if (t > 0) cur = nbrs(cur).minBy(v => (h32(s"${seed}_${t}_$v"), v))
        (t.toLong, cur)
      }
    }
    val seeds = df(Seq(1L, 3L).map(SeedId15))
    val got = Graph.deterministicWalks(
        df(edges.map(e => Affil(e._1, e._2))), "cust", "supp", seeds, "id", steps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq(1L, 3L).foreach { seed =>
      referee(seed).foreach { case (step, node) =>
        assert(got((seed, step)) === node, s"seed $seed step $step")
      }
    }
    assert(got.size === 8, "two seeds x steps 0..3")
  }

  test("negativeSamplingTable: weights are count^0.75, probs normalize over the vocab") {
    val docs = Seq(
      LineDoc(1L, "a a a a b b c"),
      LineDoc(2L, "a a b c d"))
    val out = TextOps.negativeSamplingTable(df(docs), "text", topK = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
    // counts: a=6 b=3 c=2 d=1; top-3 by count desc, token asc
    assert(out.map(_._1).toSeq === Seq("a", "b", "c"))
    def w(c: Double) = math.sqrt(c * math.sqrt(c))
    val tot = Seq(6.0, 3.0, 2.0, 1.0).map(w).sum
    val expect = Map("a" -> (6L, w(6)), "b" -> (3L, w(3)), "c" -> (2L, w(2)))
    out.foreach { case (tok, (cnt, weight, prob)) =>
      assert(cnt === expect(tok)._1)
      assert(math.abs(weight - r6(expect(tok)._2)) < 1e-9)
      assert(math.abs(prob - math.rint(expect(tok)._2 / tot * 1e9) / 1e9) < 1e-9)
    }
    // smoothing property: a has 6x d's count but < 6x its probability
    assert(w(6) / w(1) < 6.0)
  }

  test("mmrSelect diversifies: the near-dup twin of rank-1 is demoted below a diverse doc") {
    def unit(xs: Double*): Array[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat).toArray
    }
    // query 0 points at x; 1 and 2 are a near-dup pair hugging x (pure
    // relevance would rank them 1-2); 3 is less relevant but orthogonal
    // to the pair — MMR must pick it second.
    val vecs = Seq(
      LVec(0, unit(1, 0, 0), 0),
      LVec(1, unit(0.999, 0.04, 0), 0),
      LVec(2, unit(0.998, 0.06, 0), 0),
      LVec(3, unit(0.7, 0, 0.7), 0),
      LVec(4, unit(0, 0, 1), 0))
    val d = df(vecs)
    // lambda 0.5 weighs novelty as heavily as relevance — the twin's
    // ~0.9998 similarity to rank-1 then outweighs its relevance edge
    val out = VectorOps.mmrSelect(d, d.where(org.apache.spark.sql.functions.col("vec_id") === 0),
        "vec_id", "embedding", k = 3, lambda = 0.5, poolSize = 4)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 3L, 2L),
      "rank 2 must be the diverse doc, not the rank-1 twin")
    // rel column is pure relevance: doc 2 out-rels doc 3 even though ranked after
    val rels = out.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(rels(2L) > rels(3L))
    // mmr of a selected twin carries the similarity penalty: mmr << 0.5*rel
    val m2 = out.find(_.getLong(1) == 2L).get
    assert(m2.getDouble(3) < 0.5 * m2.getDouble(2) - 0.1)
  }

  test("dup-matrix composition: near-dup pairs roll up to unordered source pairs") {
    // two exact copies across sources + one within-source copy; the
    // unordered (least, greatest) key must merge (b,a) into (a,b)
    val docs = Seq(
      (1L, "srcB", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "srcA", "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "srcA", "totally different content words here nothing shared"),
      (4L, "srcA", "totally different content words here nothing shared"))
    val d = df(docs.map(x => Doc15(x._1, x._2, x._3)))
    val pairs = TextOps.simHashNearDup(d, "doc_id", "text", 3).select("id_a", "id_b")
    val src = d.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("source"))
    import org.apache.spark.sql.functions._
    val m = pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("_sa")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("_sb")), Seq("id_b"))
      .select(least(col("_sa"), col("_sb")).as("sa"), greatest(col("_sa"), col("_sb")).as("sb"))
      .groupBy("sa", "sb").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("srcA", "srcB")) === 1L, "cross-source copy lands in the unordered cell")
    assert(m(("srcA", "srcA")) === 1L, "within-source copy counts on the diagonal")
    assert(m.values.sum === 2L)
  }

  test("cdcChunks boundaries are insertion-robust where a fixed grid is not") {
    // deterministic 600-char pseudo-random text; doc 2 inserts a run in
    // the MIDDLE — content-defined boundaries must realign downstream
    val rnd = new scala.util.Random(7)
    def blob(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val s1 = blob(300); val s2 = blob(300)
    val docs = Seq(LineDoc(1L, s1 + s2), LineDoc(2L, s1 + "XXINSERTEDRUNXX" + s2))
    val chunks = TextOps.cdcChunks(df(docs), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    val f1 = chunks.filter(_._1 == 1L).map(_._2).toSet
    val f2 = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = f1 intersect f2
    // chunks strictly inside s1 AND chunks strictly inside s2 must both
    // survive the insertion (realignment), not just the prefix
    assert(shared.size >= 4, s"CDC must share several chunks, got ${shared.size}")
    val cum1 = chunks.filter(_._1 == 1L).scanLeft(0L)(_ + _._3).drop(1)
    val tailShared = chunks.filter(_._1 == 1L).zip(cum1)
      .filter { case (_, end) => end > s1.length + 50 }  // well past the insertion
      .map(_._1._2).toSet intersect f2
    assert(tailShared.nonEmpty, "chunks after the insertion point must realign")
    // fixed 64-char grid referee: insertion shifts every downstream
    // boundary -> zero shared grid chunks after the insertion point
    def grid(t: String) = t.grouped(64).toSeq
    val g1 = grid(docs.head.text); val g2 = grid(docs(1).text)
    val gridSharedTail = g1.zipWithIndex.filter(_._2 > (s1.length + 50) / 64)
      .map(_._1).toSet intersect g2.toSet
    assert(gridSharedTail.isEmpty, "the fixed grid must NOT realign — the contrast")
    // chunk lengths reassemble the doc exactly
    assert(chunks.filter(_._1 == 1L).map(_._3).sum === (s1 + s2).length.toLong)
  }

  test("naiveBayesConfusion matches a plain-Scala add-1 NB referee") {
    val docs = Seq(
      (1L, "A", "x x y"),
      (2L, "A", "x y y"),
      (3L, "B", "z z y"),
      (4L, "B", "z w"),
      (5L, "A", "z z z"))  // an A doc that looks like B: off-diagonal mass
    def referee(): Map[(String, String), Long] = {
      val tok = docs.flatMap { case (id, l, t) => t.split("\\s+").map(w => (id, l, w)) }
      val cnt = tok.groupBy(x => (x._2, x._3)).view.mapValues(_.size.toLong).toMap
      val ltot = tok.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val v = tok.map(_._3).distinct.size.toLong
      val nd = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val labels = nd.keys.toSeq.sorted
      val preds = docs.map { case (id, trueL, t) =>
        val tfs = t.split("\\s+").groupBy(identity).view.mapValues(_.length).toMap
        val best = labels.map { l =>
          val s = math.log(nd(l).toDouble / docs.size) + tfs.map { case (w, tf) =>
            tf * math.log((cnt.getOrElse((l, w), 0L) + 1.0) / (ltot(l) + v).toDouble)
          }.sum
          (-s, l)
        }.min._2
        (trueL, best)
      }
      preds.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val got = TextOps.naiveBayesConfusion(
        df(docs.map(d => Doc15Lang(d._1, d._2, d._3))), "lang", "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === referee())
    // the z-heavy A doc must be misclassified as B (off-diagonal cell)
    assert(got.contains(("A", "B")))
  }

  test("hardNegatives excludes same-label vectors and ranks by cosine") {
    def unit(xs: Double*): Array[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat).toArray
    }
    // query 1 (label 0) is closest to 2 (label 0, EXCLUDED), then 3, 4, 5
    val vecs = Seq(
      LVec(1, unit(1, 0, 0), 0),
      LVec(2, unit(0.99, 0.1, 0), 0),   // same label: must never appear
      LVec(3, unit(0.9, 0.3, 0.1), 1),
      LVec(4, unit(0.5, 0.8, 0), 1),
      LVec(5, unit(0, 1, 0), 2))
    val d = df(vecs)
    val out = VectorOps.hardNegatives(d, d.where(org.apache.spark.sql.functions.col("vec_id") === 1),
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("corpus_id")).toSeq === Seq(3L, 4L, 5L))
    assert(out.forall(_.getAs[Int]("corpus_label") != 0))
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
    // scores strictly decreasing for this construction
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall(p => p(0) > p(1)))
  }
}

case class RankRow2(doc_id: String, rank: Long)
case class RelId2(doc_id: String)
case class SeedId15(id: Long)
case class Doc15(doc_id: Long, source: String, text: String)
case class Doc15Lang(doc_id: Long, lang: String, text: String)
