package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class DirEdge(src: Long, dst: Long)
case class WEdge(a: Long, b: Long, w: Long)
case class Doc12(doc_id: Long, source: String, text: String)

/** Round-12 operators: HITS, weighted bounded SSSP, k-core, PMI
  * collocations, per-domain KL divergence, DSIR importance weights.
  * Every test checks against an INDEPENDENT in-memory referee (plain
  * Scala re-derivation), not against the operator's own building blocks.
  */
class Round12OpsSpec extends SparkSpec {

  // ── HITS ──────────────────────────────────────────────────────────────

  /** Plain-Scala HITS referee: same L1-normalized fixed iteration. */
  private def hitsReferee(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 0.0).toMap
    for (_ <- 0 until iters) {
      val aRaw = nodes.map(v => v -> edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap
      val aTot = aRaw.values.sum
      auth = aRaw.map { case (k, x) => k -> x / aTot }
      val hRaw = nodes.map(u => u -> edges.filter(_._1 == u).map(e => auth(e._2)).sum).toMap
      val hTot = hRaw.values.sum
      hub = hRaw.map { case (k, x) => k -> x / hTot }
    }
    nodes.map(v => v -> (auth(v), hub(v))).toMap
  }

  test("hits matches the plain-Scala referee on a small bipartite graph") {
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L), (1L, 12L), (4L, 10L))
    val got = Graph.hits(df(edges.map(e => DirEdge(e._1, e._2))), "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = hitsReferee(edges, 2)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (a, h)) =>
      assert(math.abs(a - want(id)._1) < 1e-9, s"auth($id)")
      assert(math.abs(h - want(id)._2) < 1e-9, s"hub($id)")
    }
  }

  test("hits scores are L1 distributions; roles separate on a bipartite graph") {
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L))
    val rows = Graph.hits(df(edges.map(e => DirEdge(e._1, e._2))), "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9) // Σ auth = 1
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9) // Σ hub = 1
    rows.foreach { case (id, a, h) =>
      if (id < 10) { assert(a == 0.0); assert(h > 0.0) } // source side: pure hub
      else { assert(a > 0.0); assert(h == 0.0) }          // sink side: pure authority
    }
  }

  // ── weighted bounded SSSP ─────────────────────────────────────────────

  test("ssspWithinHops prefers a cheaper two-hop path over a direct edge") {
    val edges = df(Seq(WEdge(0, 1, 10), WEdge(0, 2, 1), WEdge(2, 1, 2)))
    val seeds = df(Seq(Node(0L)))
    val twoHop = Graph.ssspWithinHops(edges, "a", "b", "w", seeds, "id", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoHop === Map(0L -> 0L, 1L -> 3L, 2L -> 1L))
    val oneHop = Graph.ssspWithinHops(edges, "a", "b", "w", seeds, "id", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneHop(1L) === 10L) // hop bound binds: the cheap detour needs 2 edges
  }

  test("ssspWithinHops keeps the cheapest parallel edge and is undirected") {
    val edges = df(Seq(WEdge(0, 1, 7), WEdge(1, 0, 3), WEdge(1, 2, 4)))
    val got = Graph.ssspWithinHops(edges, "a", "b", "w", df(Seq(Node(2L))), "id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2→1 costs 4 (traversed against its direction: symmetrized), 1→0 min(7,3)=3
    assert(got === Map(2L -> 0L, 1L -> 4L, 0L -> 7L))
  }

  // ── k-core ────────────────────────────────────────────────────────────

  /** Plain-Scala peel referee. */
  private def kCoreReferee(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val adj = scala.collection.mutable.HashMap.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      if (a != b) { adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    }
    var alive = adj.keySet.toSet
    var changed = true
    while (changed) {
      val drop = alive.filter(v => (adj(v) & alive).size < k)
      changed = drop.nonEmpty
      alive = alive -- drop
    }
    alive.map(v => v -> (adj(v) & alive).size).toMap
  }

  test("kCore matches the referee on a clique with a cascading tail") {
    // 4-clique {0,1,2,3} (its own 3-core) + chain 3-4-5-6 that must peel
    // one link per round (the cascade path)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    // distributed path forced: the multi-round cascade must be walked by
    // the peel LOOP here (the local finish gets its referee run in the
    // pseudo-random-graph test)
    val got = Graph.kCore(df(edges.map(e => Edge(e._1, e._2))), "id_a", "id_b", k = 3,
        localFinishEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got === kCoreReferee(edges, 3))
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got.values.forall(_ >= 3))
  }

  test("kCore removal cascades: breaking one clique edge empties the 3-core") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), // (2,3) missing
      (3L, 4L), (4L, 5L))
    val got = Graph.kCore(df(edges.map(e => Edge(e._1, e._2))), "id_a", "id_b", k = 3)
      .collect()
    assert(got.isEmpty)
    assert(kCoreReferee(edges, 3).isEmpty)
  }

  test("kCore matches the referee on a deterministic pseudo-random graph, both paths") {
    val edges = (0 until 120).map { i =>
      val a = (i * 37) % 24; val b = (i * 53 + 11) % 24
      (a.toLong, b.toLong)
    }.filter(e => e._1 != e._2)
    for (k <- Seq(2, 4, 6)) {
      // default: the local-finish fast path engages (tiny graph)
      val local = Graph.kCore(df(edges.map(e => Edge(e._1, e._2))), "id_a", "id_b", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      // localFinishEdges = 0 forces the pure-distributed peel loop
      val dist = Graph.kCore(df(edges.map(e => Edge(e._1, e._2))), "id_a", "id_b", k,
          localFinishEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(local === kCoreReferee(edges, k), s"local path, k=$k")
      assert(dist === local, s"distributed path must equal local finish, k=$k")
    }
  }

  // ── personalized PageRank ─────────────────────────────────────────────

  /** Plain-Scala PPR referee: same fixed-iteration loop. */
  private def pprReferee(edges: Seq[(Long, Long)], seeds: Set[Long],
                         iters: Int, d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val p = nodes.map(v => v -> (if (seeds(v)) 1.0 / seeds.size else 0.0)).toMap
    var r = p
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map(e => r(e._1) / outDeg(e._1)).sum).toMap
      r = nodes.map(v => v -> ((1.0 - d) * p(v) + d * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("personalizedPageRank matches the referee; rank is 0 beyond the hop horizon") {
    // chain 0-1-2-3-4 symmetrized; seed {0}: after 2 iters nodes 3,4 hold 0
    val dirEdges = (0L until 4L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val got = Graph.personalizedPageRank(df(dirEdges.map(e => DirEdge(e._1, e._2))),
        "src", "dst", df(Seq(Node(0L))), "id", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = pprReferee(dirEdges, Set(0L), 2, 0.85)
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12, s"node $id") }
    assert(got(3L) === 0.0 && got(4L) === 0.0) // unreachable in 2 hops from the seed
    // the seed dominates; note rank does NOT decay monotonically with
    // distance at a fixed small iteration count (node 1's round-1 mass
    // has already flowed on to 0 and 2 by round 2 — the oscillation any
    // power-iteration shows on a chain), so only the max is asserted
    assert(got.values.max === got(0L))
  }

  test("personalizedPageRank rejects an all-foreign seed set") {
    val e = df(Seq(DirEdge(1, 2), DirEdge(2, 1)))
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(e, "src", "dst", df(Seq(Node(99L))), "id", 1)
    }
  }

  // ── TextRank ──────────────────────────────────────────────────────────

  test("textRank ranks the co-occurrence hub above peripheral tokens; mass sums to 1") {
    // "hub" co-occurs with every spoke; spokes only with the hub
    val docs = df(Seq(
      Doc12(0, "s", "hub s1 hub s2"),
      Doc12(1, "s", "hub s3 hub s4"),
      Doc12(2, "s", "s1 hub s2 hub")))
    val got = TextOps.textRank(docs, "text", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // symmetric graph: no leaked mass
    val spokes = got.filter(_._1 != "hub").values
    assert(spokes.forall(got("hub") > _))
    // unweighted-distinct edges: all four spokes are structurally identical
    assert(spokes.toSeq.distinct.size === 1)
  }

  test("textRank drops self-adjacency and isolated tokens") {
    val docs = df(Seq(Doc12(0, "s", "a a b"), Doc12(1, "s", "lonely")))
    val got = TextOps.textRank(docs, "text", iters = 2)
      .collect().map(r => r.getString(0)).toSet
    assert(got === Set("a", "b")) // "a a" self-loop dropped; "lonely" has no edge
  }

  // ── PMI collocations ──────────────────────────────────────────────────

  test("pmiCollocations scores association, not frequency, and honors the floor") {
    // "a b" appears 3×; a and b appear ONLY together → strong association.
    // "x y" appears 3× but x and y are everywhere → weaker association.
    val res = TextOps.pmiCollocations(df(Seq(
        Doc12(0, "s", "a b x y x z y x"),
        Doc12(1, "s", "a b x y y z x y"),
        Doc12(2, "s", "a b x y z x y z"))), "text", minCount = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(res.contains("a b") && res.contains("x y"))
    assert(res("a b")._2 > res("x y")._2) // association beats frequency ties
    // floor: every emitted bigram carries cnt >= 3
    assert(res.values.forall(_._1 >= 3))
    // referee for one value: PMI(a b) = ln((c_ab/B)·(U/c_a)·(U/c_b))
    val allTokens = Seq("a b x y x z y x", "a b x y y z x y", "a b x y z x y z")
      .flatMap(_.split("\\s+"))
    val u = allTokens.size.toDouble
    val bigrams = Seq("a b x y x z y x", "a b x y y z x y", "a b x y z x y z")
      .flatMap(t => t.split("\\s+").sliding(2).map(_.mkString(" ")))
    val b = bigrams.size.toDouble
    val want = math.log((3.0 / b) * (u / 3.0) * (u / 3.0))
    assert(math.abs(res("a b")._2 - BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
  }

  // ── per-domain KL divergence ──────────────────────────────────────────

  /** Naive full-vocabulary referee: explicit domain×vocab expansion —
    * the closed-form absent-token folding must agree with it exactly.
    */
  private def klReferee(docs: Seq[Doc12]): Map[String, Double] = {
    val toks = docs.flatMap(d => d.text.split("\\s+").filter(_.nonEmpty).map(t => (d.source, t)))
    val uni = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum.toDouble
    val v = uni.size.toDouble
    toks.groupBy(_._1).map { case (dom, ts) =>
      val cdt = ts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nd = cdt.values.sum.toDouble
      val kl = uni.keys.toSeq.sorted.map { t =>
        val pd = (cdt.getOrElse(t, 0L) + 1.0) / (nd + v)
        val pc = (uni(t) + 1.0) / (n + v)
        pd * math.log(pd / pc)
      }.sum
      dom -> kl
    }
  }

  test("domainDivergence's closed form agrees with the naive full-vocab expansion") {
    val docs = Seq(
      Doc12(0, "tech", "code data code model train data"),
      Doc12(1, "tech", "model code gpu train"),
      Doc12(2, "news", "vote city vote mayor city rain"),
      Doc12(3, "news", "rain city storm"))
    val got = TextOps.domainDivergence(df(docs), "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val want = klReferee(docs)
    assert(got.keySet === want.keySet)
    got.foreach { case (d, kl) =>
      assert(math.abs(kl - want(d)) < 1e-6, s"kl($d): $kl vs ${want(d)}")
      assert(kl > 0.0) // disjoint-vocabulary domains diverge strictly
    }
  }

  test("domainDivergence is near zero for a domain that IS the corpus") {
    val docs = Seq(Doc12(0, "only", "a b c a b c"), Doc12(1, "only", "a b c"))
    val got = TextOps.domainDivergence(df(docs), "source", "text").collect()
    assert(got.length === 1)
    assert(math.abs(got.head.getDouble(3)) < 1e-9) // p_d == p_c exactly
  }

  // ── containment join ──────────────────────────────────────────────────

  test("containment catches a quoted sub-document that Jaccard misses") {
    // B fully contains A's text plus much more: containment(A⊆B) = 1,
    // Jaccard(A,B) low. C shares nothing.
    val inner = "alpha beta gamma delta epsilon zeta eta theta"
    val outer = inner + " " + (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val docs = df(Seq(
      Doc12(0, "s", inner), Doc12(1, "s", outer),
      Doc12(2, "s", "totally different content with other words entirely here now")))
    // annotate like the ShingleStore would: df + per-doc rarity rank
    val sh = TextOps.shingles(docs, "doc_id", "text", 3)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val ann = sh.join(dfreq, Seq("shingle"))
      .withColumn("rarity_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df").asc, col("shingle").asc)))
    val got = TextOps.containmentJoinFromShingles(ann, "doc_id", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.keySet === Set((0L, 1L))) // only A-contained-in-B; never the reverse
    assert(got((0L, 1L)) === 1.0)
    // referee: brute-force containment over the same shingle sets
    val sets = sh.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    for (a <- sets.keys; b <- sets.keys if a != b) {
      val c = (sets(a) & sets(b)).size
      val keep = c * 5 >= sets(a).size * 4
      assert(keep === got.contains((a, b)), s"pair ($a,$b)")
    }
  }

  // ── rank-biased overlap ───────────────────────────────────────────────

  private case class Ranked(doc_id: Long, rank: Long)

  /** Plain-Scala RBO referee (fixed-depth extrapolated form). */
  private def rboReferee(a: Seq[Long], b: Seq[Long], p: Double, d: Int): Double = {
    val xs = (1 to d).map(k => (a.take(k).toSet & b.take(k).toSet).size)
    (1 - p) * (1 to d).map(k => math.pow(p, k - 1) * xs(k - 1) / k).sum +
      math.pow(p, d) * xs(d - 1).toDouble / d
  }

  test("rankBiasedOverlap: identical lists score 1, disjoint 0, partial matches referee") {
    def ranked(ids: Seq[Long]) = df(ids.zipWithIndex.map { case (id, i) => Ranked(id, i + 1L) })
    def rbo(a: Seq[Long], b: Seq[Long], d: Int) =
      Relational.rankBiasedOverlap(ranked(a), ranked(b), "doc_id", "rank", 0.9, d)
        .head().getDouble(2)
    val l = (1L to 10L).toSeq
    assert(rbo(l, l, 10) === 1.0)                          // identical ⇒ exactly 1
    assert(rbo(l, (11L to 20L).toSeq, 10) === 0.0)         // disjoint ⇒ exactly 0
    val shuffled = Seq(1L, 3L, 2L, 5L, 4L, 7L, 6L, 9L, 8L, 10L)
    val want = BigDecimal(rboReferee(l, shuffled, 0.9, 10))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rbo(l, shuffled, 10) - want) < 1e-9)
    // top-weighting: disagreement AT THE TOP hurts more than at the tail
    val topSwap = Seq(2L, 1L) ++ (3L to 10L)
    val tailSwap = (1L to 8L) ++ Seq(10L, 9L)
    assert(rbo(l, topSwap, 10) < rbo(l, tailSwap, 10))
  }

  // ── embedding covariance + PCA ────────────────────────────────────────

  test("embeddingCovariance matches a hand-computed matrix") {
    val vecs = df(Seq(
      Vec(0, Array(1.0f, 2.0f, 0.0f)),
      Vec(1, Array(3.0f, 0.0f, 1.0f)),
      Vec(2, Array(2.0f, 1.0f, 2.0f))))
    val got = VectorOps.embeddingCovariance(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    // referee: population covariance E[xy] − E[x]E[y]
    val data = Seq(Seq(1.0, 2.0, 0.0), Seq(3.0, 0.0, 1.0), Seq(2.0, 1.0, 2.0))
    val n = data.size.toDouble
    def mean(i: Int) = data.map(_(i)).sum / n
    def cov(i: Int, j: Int) = data.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
    assert(got.size === 6) // upper triangle of 3x3
    got.foreach { case ((i, j), c) =>
      // the operator emits round(·, 6); round the referee the same way
      val want = BigDecimal(cov(i, j)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(c - want) < 1e-9, s"cov($i,$j): $c vs $want")
    }
  }

  test("pcaComponents recovers a planted dominant axis; projections are orthonormal") {
    // points spread along (0.6, 0.8) with small off-axis jitter
    val axis = Array(0.6, 0.8)
    val vecs = (0 until 40).map { t =>
      val s = (t - 20).toDouble          // on-axis spread, sd ~ 11.8
      val e = ((t * 7) % 5 - 2) * 0.05   // off-axis jitter, sd ~ 0.07
      Vec(t.toLong, Array((s * axis(0) - e * axis(1)).toFloat,
        (s * axis(1) + e * axis(0)).toFloat))
    }
    val cov = VectorOps.embeddingCovariance(df(vecs), "vec_id", "embedding")
    val comps = VectorOps.pcaComponents(cov, d = 2, k = 2)
    val align = math.abs(comps(0)(0) * axis(0) + comps(0)(1) * axis(1))
    assert(align > 0.999, s"pc1 must align with the planted axis (dot=$align)")
    // orthonormal basis
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    assert(math.abs(dot(comps(0), comps(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(comps(1), comps(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(comps(0), comps(1))) < 1e-9)
    // variance ordering of the projected scores; with k = d the squared
    // projections preserve total centered variance (Parseval)
    val means = Array(vecs.map(_.embedding(0).toDouble).sum / vecs.size,
      vecs.map(_.embedding(1).toDouble).sum / vecs.size)
    val proj = VectorOps.pcaProject(df(vecs), "vec_id", "embedding", comps, means)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val v1 = proj.map(p => p._1 * p._1).sum
    val v2 = proj.map(p => p._2 * p._2).sum
    assert(v1 > v2, "pc1 scores must carry more variance than pc2")
    val total = vecs.map { v =>
      val c0 = v.embedding(0) - means(0); val c1 = v.embedding(1) - means(1)
      c0 * c0 + c1 * c1
    }.sum
    assert(math.abs((v1 + v2) - total) / total < 1e-6, "Parseval at k = d")
  }

  // ── DSIR importance weights ───────────────────────────────────────────

  test("dsirWeights matches a naive referee and favors target-like documents") {
    val docs = Seq(
      Doc12(0, "tgt", "alpha beta alpha gamma"),
      Doc12(1, "tgt", "alpha beta beta"),
      Doc12(2, "web", "delta epsilon zeta delta"),
      Doc12(3, "web", "alpha beta alpha"), // looks like target
      Doc12(4, "web", "zeta zeta epsilon")) // looks unlike target
    val nB = 64
    val got = TextOps.dsirWeights(df(docs), "doc_id", "text", "source", "tgt", nB)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .map(t => t._1 -> (t._2, t._3)).toMap
    // referee: same md5 bucketing re-derived independently
    def bucket(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md, 16) % nB).toInt
    }
    val all = docs.flatMap(d => d.text.split("\\s+").map(t => (d, bucket(t))))
    val craw = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ctgt = all.filter(_._1.source == "tgt").groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nraw = craw.values.sum.toDouble
    val ntgt = ctgt.values.sum.toDouble
    docs.foreach { d =>
      val toks = d.text.split("\\s+").toSeq
      val want = toks.map { t =>
        val b = bucket(t)
        math.log((ctgt.getOrElse(b, 0L) + 1.0) / (ntgt + nB)) -
          math.log((craw(b) + 1.0) / (nraw + nB))
      }.sum
      assert(got(d.doc_id)._1 === toks.size.toLong)
      assert(math.abs(got(d.doc_id)._2 - want) < 1e-6, s"doc ${d.doc_id}")
    }
    // the target-like web doc outscores the target-unlike one
    assert(got(3L)._2 > got(4L)._2)
  }
}
