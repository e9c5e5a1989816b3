package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class ScoredDoc(source: String, score: Double, pos: Boolean)
case class BinVal(doc_id: Long, n_chars: Long, ref: Boolean)
case class KsRow(g: String, v: Long)
case class ModEdge(a: Long, b: Long)
case class ModLabel(id: Long, c: String)
case class MkRow(user_id: Long, event_id: Long, value: Double)
case class GainsRow(g: String, doc_id: Long, score: Double, pos: Boolean)
case class SeqEv(user_id: Long, event_id: Long, event_type: String)
case class ConfCell(t: String, p: String, n: Long)
case class LDoc(doc_id: Long, lang: String, text: String)
case class MkTypedEv(user_id: Long, event_id: Long, ts: java.sql.Timestamp, event_type: String)

/** Second-wave round-15 operators (AUC / PSI / KS / modularity /
  * Mann-Kendall), each checked against an independent plain-Scala
  * referee, not the operator's own formulation.
  */
class Round15bOpsSpec extends SparkSpec {

  // ---- ROC AUC -----------------------------------------------------------

  /** Referee: AUC = (#(s⁺>s⁻) + ½·#(s⁺=s⁻)) / (n⁺·n⁻) over all pairs. */
  private def aucReferee(rows: Seq[ScoredDoc]): Option[Double] = {
    val p = rows.filter(_.pos).map(_.score)
    val n = rows.filterNot(_.pos).map(_.score)
    if (p.isEmpty || n.isEmpty) None
    else Some(
      (for (x <- p; y <- n) yield
        if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum / (p.size.toDouble * n.size))
  }

  test("rocAuc equals the all-pairs referee, ties included") {
    val rows = Seq(
      ScoredDoc("g1", 0.9, true), ScoredDoc("g1", 0.8, true), ScoredDoc("g1", 0.8, false),
      ScoredDoc("g1", 0.5, false), ScoredDoc("g1", 0.5, true), ScoredDoc("g1", 0.5, false),
      ScoredDoc("g1", 0.1, false),
      ScoredDoc("g2", 0.3, true), ScoredDoc("g2", 0.7, false), ScoredDoc("g2", 0.7, false))
    val got = Profiling.rocAuc(df(rows), "source", col("score"), col("pos"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    for (g <- Seq("g1", "g2"))
      assert(got(g) === aucReferee(rows.filter(_.source == g)), s"group $g")
  }

  test("rocAuc perfect / inverted / degenerate groups") {
    val rows = Seq(
      ScoredDoc("perfect", 1.0, true), ScoredDoc("perfect", 0.9, true),
      ScoredDoc("perfect", 0.2, false), ScoredDoc("perfect", 0.1, false),
      ScoredDoc("inverted", 0.1, true), ScoredDoc("inverted", 0.9, false),
      ScoredDoc("onlyPos", 0.5, true), ScoredDoc("onlyNeg", 0.5, false))
    val got = Profiling.rocAuc(df(rows), "source", col("score"), col("pos"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got("perfect") === Some(1.0))
    assert(got("inverted") === Some(0.0))
    assert(got("onlyPos") === None && got("onlyNeg") === None)
  }

  test("rocAuc seeded random data matches the referee per group") {
    val rnd = new scala.util.Random(1715)
    val rows = (1 to 300).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      // quantized scores force plenty of cross-class ties
      ScoredDoc(g, rnd.nextInt(8) / 8.0, rnd.nextBoolean())
    }
    val got = Profiling.rocAuc(df(rows), "source", col("score"), col("pos"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    for ((g, sub) <- rows.groupBy(_.source))
      assert(got(g) === aucReferee(sub), s"group $g")
  }

  // ---- PSI ---------------------------------------------------------------

  private def bitLen(v: Long): Long = if (v > 0) 64 - java.lang.Long.numberOfLeadingZeros(v) else 0L

  test("psiReport matches the add-1 referee and rolls up contributions") {
    val rows = Seq(
      // ref cohort lengths: bins 3,3,4,6 ; cur cohort: bins 3,6,6
      BinVal(1, 5, true), BinVal(2, 7, true), BinVal(3, 12, true), BinVal(4, 40, true),
      BinVal(5, 6, false), BinVal(6, 33, false), BinVal(7, 60, false))
    val out = Profiling.psiReport(df(rows), col("ref"), col("n_chars")).collect()
    val bins = rows.map(r => bitLen(r.n_chars)).distinct.sorted
    assert(out.map(_.getLong(0)).toSeq === bins)
    val na = rows.count(_.ref); val nb = rows.size - na; val b = bins.size
    var wantPsi = 0.0
    for (row <- out) {
      val bin = row.getLong(0)
      val ca = rows.count(r => r.ref && bitLen(r.n_chars) == bin)
      val cb = rows.count(r => !r.ref && bitLen(r.n_chars) == bin)
      assert(row.getLong(1) === ca && row.getLong(2) === cb)
      val p = (ca + 1.0) / (na + b); val q = (cb + 1.0) / (nb + b)
      val contrib = (p - q) * math.log(p / q)
      assert(math.abs(row.getDouble(5) - contrib) < 1e-8, s"bin $bin contrib")
      wantPsi += contrib
    }
    for (row <- out) assert(math.abs(row.getDouble(6) - wantPsi) < 1e-8)
  }

  test("psiReport of an identically-distributed split is ~0 and empty-bin-safe") {
    val rows = (1L to 200L).map(i => BinVal(i, i % 37 + 1, i % 2 == 0))
    val psi = Profiling.psiReport(df(rows), col("ref"), col("n_chars"))
      .select("psi").distinct().collect().head.getDouble(0)
    assert(math.abs(psi) < 0.01)
    // one side entirely missing a bin must yield finite contributions
    val lop = Seq(BinVal(1, 3, true), BinVal(2, 300, false), BinVal(3, 300, false))
    val cs = Profiling.psiReport(df(lop), col("ref"), col("n_chars"))
      .collect().map(_.getDouble(5))
    assert(cs.forall(c => !c.isNaN && !c.isInfinite))
  }

  // ---- KS ----------------------------------------------------------------

  /** Referee: D = sup_t |F_g(t) − F_rest(t)| over every observed value. */
  private def ksReferee(rows: Seq[KsRow], g: String): Option[Double] = {
    val own = rows.filter(_.g == g).map(_.v)
    val rest = rows.filterNot(_.g == g).map(_.v)
    if (own.isEmpty || rest.isEmpty) None
    else Some(rows.map(_.v).distinct.map { t =>
      math.abs(own.count(_ <= t).toDouble / own.size -
        rest.count(_ <= t).toDouble / rest.size)
    }.max)
  }

  test("ksByGroup equals the ECDF referee, including gaps only one side has") {
    val rows = Seq(
      KsRow("a", 1), KsRow("a", 2), KsRow("a", 2), KsRow("a", 9),
      KsRow("b", 2), KsRow("b", 5), KsRow("b", 5), KsRow("b", 6),
      KsRow("c", 100))
    val got = Profiling.ksByGroup(df(rows), "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for (g <- Seq("a", "b", "c"))
      assert(math.abs(got(g) - ksReferee(rows, g).get) < 1e-12, s"group $g")
  }

  test("ksByGroup identical distributions give 0; disjoint give 1") {
    val same = (1L to 50L).flatMap(v => Seq(KsRow("x", v % 5), KsRow("y", v % 5)))
    val gotSame = Profiling.ksByGroup(df(same), "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(gotSame("x") === 0.0 && gotSame("y") === 0.0)
    val disj = Seq(KsRow("lo", 1), KsRow("lo", 2), KsRow("hi", 10), KsRow("hi", 11))
    val gotDisj = Profiling.ksByGroup(df(disj), "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(gotDisj("lo") === 1.0 && gotDisj("hi") === 1.0)
  }

  test("ksByGroup seeded random data matches the referee") {
    val rnd = new scala.util.Random(9415)
    val rows = (1 to 400).map(_ => KsRow(s"g${rnd.nextInt(4)}", rnd.nextInt(20).toLong))
    val got = Profiling.ksByGroup(df(rows), "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for (g <- rows.map(_.g).distinct)
      assert(math.abs(got(g) - ksReferee(rows, g).get) < 1e-12, s"group $g")
  }

  // ---- Modularity --------------------------------------------------------

  /** Referee: Q_c = e_c/m − (d_c/2m)² from first principles. */
  private def modReferee(edges: Seq[(Long, Long)], labels: Map[Long, String]): Map[String, Double] = {
    val e = edges.filter { case (a, b) => a != b }
      .filter { case (a, b) => labels.contains(a) && labels.contains(b) }
    val m = e.size.toDouble
    val comms = e.flatMap { case (a, b) => Seq(labels(a), labels(b)) }.distinct
    comms.map { c =>
      val ein = e.count { case (a, b) => labels(a) == c && labels(b) == c }
      val dc = e.count { case (a, _) => labels(a) == c } + e.count { case (_, b) => labels(b) == c }
      c -> (ein / m - (dc / (2 * m)) * (dc / (2 * m)))
    }.toMap
  }

  test("modularity: two triangles joined by a bridge, labeled by triangle") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val labels = Map(1L -> "A", 2L -> "A", 3L -> "A", 4L -> "B", 5L -> "B", 6L -> "B")
    val want = modReferee(edges, labels)
    val got = Graph.modularity(
      df(edges.map(p => ModEdge(p._1, p._2))), "a", "b",
      df(labels.toSeq.map(p => ModLabel(p._1, p._2))), "id", "c")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    for ((c, q) <- want) assert(math.abs(got(c) - q) < 1e-9, s"community $c")
    // Σ e_in = 6 of m = 7; modularity is high for this near-perfect split
    // (6/7 − 2·(7/14)² = 0.357…)
    assert(math.abs(want.values.sum - (6.0 / 7.0 - 0.5)) < 1e-9)
  }

  test("modularity: random labels score ~0, self-loops and NULLs drop") {
    val edges = Seq((1L, 2L), (2L, 2L), (2L, 3L), (3L, 7L))
    val labels = Seq(ModLabel(1, "X"), ModLabel(2, "X"), ModLabel(3, "Y"), ModLabel(7, null))
    val out = Graph.modularity(df(edges.map(p => ModEdge(p._1, p._2))), "a", "b",
      df(labels), "id", "c").collect()
    // surviving edges: (1,2) intra-X, (2,3) cross — (2,2) self-loop and
    // (3,7) NULL-labeled endpoint are gone → m=2
    assert(out.map(_.getLong(3)).distinct.toSeq === Seq(2L))
    val got = out.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("X") === ((1L, 3L)) && got("Y") === ((0L, 1L)))
    val want = modReferee(
      edges.filterNot(e => e == ((2L, 2L)) || e == ((3L, 7L))),
      Map(1L -> "X", 2L -> "X", 3L -> "Y"))
    val qc = out.map(r => r.getString(0) -> r.getDouble(4)).toMap
    for ((c, q) <- want) assert(math.abs(qc(c) - q) < 1e-9, s"community $c")
  }

  // ---- Spearman ----------------------------------------------------------

  /** Referee: Pearson on average ranks, computed naively. */
  private def spearmanRef(xs: Seq[Double], ys: Seq[Double]): Option[Double] = {
    def avgRanks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      v.map { x =>
        val lo = sorted.indexOf(x) + 1; val hi = sorted.lastIndexOf(x) + 1
        (lo + hi) / 2.0
      }
    }
    val rx = avgRanks(xs); val ry = avgRanks(ys)
    val n = xs.size.toDouble
    val mx = rx.sum / n; val my = ry.sum / n
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    if (vx > 0 && vy > 0) Some(cov / math.sqrt(vx * vy)) else None
  }

  case class XyRow(g: String, x: Double, y: Double)

  test("spearman: monotone, inverted, tied, and constant groups") {
    val rows =
      Seq(1, 2, 3, 4, 5).map(i => XyRow("mono", i, i * i * 10.0)) ++       // rho 1 (nonlinear!)
        Seq(1, 2, 3, 4).map(i => XyRow("inv", i, -math.exp(i))) ++         // rho -1
        Seq(XyRow("tied", 1, 2), XyRow("tied", 1, 2), XyRow("tied", 3, 1),
          XyRow("tied", 4, 5), XyRow("tied", 4, 4)) ++
        Seq(XyRow("const", 1, 7), XyRow("const", 2, 7))                    // NULL
    val got = Profiling.spearman(df(rows), "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for ((g, sub) <- rows.groupBy(_.g)) {
      val want = spearmanRef(sub.map(_.x), sub.map(_.y))
        .map(v => math.rint(v * 1e6) / 1e6)
      assert(got(g) === want, s"group $g")
    }
    assert(got("mono") === Some(1.0) && got("inv") === Some(-1.0))
    assert(got("const") === None)
  }

  test("spearman seeded random data matches the referee") {
    val rnd = new scala.util.Random(31337)
    val rows = (1 to 300).map(_ =>
      XyRow(s"g${rnd.nextInt(3)}", rnd.nextInt(12), rnd.nextInt(12)))
    val got = Profiling.spearman(df(rows), "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((g, sub) <- rows.groupBy(_.g)) {
      val want = spearmanRef(sub.map(_.x), sub.map(_.y)).get
      assert(math.abs(got(g) - want) < 1e-6, s"group $g")
    }
  }

  // ---- Chi-square --------------------------------------------------------

  case class AbRow(a: String, b: String)

  test("chiSquare matches the hand computation, zero cells included") {
    // 2×2: a1 strongly prefers b1
    val rows = Seq.fill(40)(AbRow("a1", "b1")) ++ Seq.fill(10)(AbRow("a1", "b2")) ++
      Seq.fill(10)(AbRow("a2", "b1")) ++ Seq.fill(40)(AbRow("a2", "b2")) ++
      Seq.fill(5)(AbRow("a3", "b1")) // a3 never sees b2 → zero cell
    val out = Profiling.chiSquare(df(rows), "a", "b").collect()
    assert(out.length === 6, "3×2 grid incl. the zero cell")
    val byCell = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byCell(("a3", "b2")).getLong(2) === 0L)
    // referee
    val n = rows.size.toDouble
    val rt = rows.groupBy(_.a).view.mapValues(_.size.toDouble).toMap
    val ct = rows.groupBy(_.b).view.mapValues(_.size.toDouble).toMap
    var chi2 = 0.0
    for (a <- rt.keys; b <- ct.keys) {
      val o = rows.count(r => r.a == a && r.b == b).toDouble
      val e = rt(a) * ct(b) / n
      chi2 += (o - e) * (o - e) / e
      assert(math.abs(byCell((a, b)).getDouble(3) - e) < 1e-6, s"expected($a,$b)")
    }
    for (r <- out) assert(math.abs(r.getDouble(5) - chi2) < 1e-5)
    val v = math.sqrt(chi2 / (n * 1)) // min(3,2)-1 = 1
    for (r <- out) assert(math.abs(r.getDouble(6) - v) < 1e-6)
  }

  test("chiSquare: independent margins give chi2 ~ 0; one category gives NULL V") {
    val indep = for (i <- 1 to 60) yield AbRow(s"a${i % 3}", s"b${i % 2}")
    val out = Profiling.chiSquare(df(indep), "a", "b").collect()
    assert(out.forall(r => math.abs(r.getDouble(5)) < 1e-9), "perfect independence")
    val oneCat = Seq.fill(10)(AbRow("only", "b1")) ++ Seq.fill(5)(AbRow("only", "b2"))
    val out1 = Profiling.chiSquare(df(oneCat), "a", "b").collect()
    assert(out1.forall(_.isNullAt(6)), "min(r,c)=1 must NULL cramers_v")
  }

  // ---- Silhouette --------------------------------------------------------

  /** Referee: cosine-distance simplified silhouette from first principles. */
  private def silRef(vecs: Seq[Array[Float]], cents: Array[Array[Float]]): Map[Int, (Long, Double)] = {
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def dd(v: Array[Float]) = v.map(_.toDouble).toSeq
    val rows = vecs.map { v =>
      val dots = cents.map(c => dot(dd(v), dd(c)))
      val own = dots.zipWithIndex.maxBy { case (d, i) => (d, -i) }._2
      val dist = cents.map(c =>
        1.0 - dot(dd(v), dd(c)) / (math.sqrt(dot(dd(v), dd(v))) * math.sqrt(dot(dd(c), dd(c)))))
      val a = dist(own)
      val b = dist.zipWithIndex.filter(_._2 != own).map(_._1).min
      (own, (b - a) / math.max(a, b))
    }
    rows.groupBy(_._1).map { case (cell, ss) =>
      cell -> (ss.size.toLong, ss.map(_._2).sum / ss.size)
    }
  }

  test("clusterSilhouette: tight clusters score high, referee agrees") {
    val rnd = new scala.util.Random(5150)
    val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 1f))
    def jitter(c: Array[Float]) = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
    val vecs = (1 to 60).map(i => LVec(i.toLong, jitter(cents(i % 3)), i % 3))
    val got = VectorOps.clusterSilhouette(df(vecs), "vec_id", "embedding", cents)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = silRef(vecs.map(_.embedding), cents)
    for ((cell, (n, m)) <- want) {
      assert(got(cell)._1 === n, s"cell $cell count")
      assert(math.abs(got(cell)._2 - m) < 1e-6, s"cell $cell mean")
      assert(got(cell)._2 > 0.5, s"cell $cell should be tight")
    }
  }

  test("clusterSilhouette flags a mis-partitioned cell as negative") {
    // centroid 1 sits inside cluster 0's cone; vectors forced to cell 1
    // by raw-dot argmax (longer centroid wins the dot) are closer in
    // ANGLE to centroid 0 → negative silhouette
    val cents = Array(Array(1f, 0f, 0f, 0f), Array(5f, 0.2f, 0f, 0f))
    val vecs = (1 to 20).map(i => LVec(i.toLong, Array(1f, -0.05f * (i % 5), 0f, 0f), 0))
    val out = VectorOps.clusterSilhouette(df(vecs), "vec_id", "embedding", cents)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val want = silRef(vecs.map(_.embedding), cents)
    for ((cell, (_, m)) <- want)
      assert(math.abs(out(cell) - m) < 1e-6, s"cell $cell")
    // raw-dot assignment sends everything to the long centroid (cell 1),
    // whose angular fit is worse than centroid 0's → the audit reads < 0
    assert(out.keySet === Set(1))
    assert(out(1) < 0, s"expected negative silhouette, got ${out(1)}")
  }

  // ---- CUSUM -------------------------------------------------------------

  private def cusumRef(vs: Seq[Double], k: Double, h: Double): Seq[(Double, Double, Boolean)] = {
    val n = vs.size
    val mu = vs.sum / n
    val sigma = math.sqrt(math.max(vs.map(x => x * x).sum / n - mu * mu, 0.0))
    var pos = 0.0; var neg = 0.0
    vs.map { x =>
      pos = math.max(0.0, pos + (x - (mu + k * sigma)))
      neg = math.max(0.0, neg + ((mu - k * sigma) - x))
      (pos, neg, pos > h * sigma || neg > h * sigma)
    }
  }

  test("cusum flags a planted level shift and matches the recurrence referee") {
    // user 1: level 10 for t≤20, then +8 shift — the IN-SAMPLE mean sits
    // between the levels, so the early segment drifts BELOW the band
    // (neg-side alarm) and the late segment ABOVE it (pos-side alarm);
    // user 2: stable, never alarms
    val rows =
      ((1 to 20).map(i => MkRow(1, i, 10.0 + (i % 3) * 0.5)) ++
        (21 to 40).map(i => MkRow(1, i, 18.0 + (i % 3) * 0.5))) ++
        (1 to 30).map(i => MkRow(2, i, 50.0 + (i % 5).toDouble))
    val got = TimeSeries.cusum(df(rows), "user_id", "event_id", "value", 0.5, 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    for ((u, sub) <- rows.groupBy(_.user_id)) {
      val ordered = sub.sortBy(_.event_id)
      val want = cusumRef(ordered.map(_.value), 0.5, 5.0)
      for ((row, (wp, wn, wa)) <- ordered.zip(want)) {
        val (gp, gn, ga) = got((u, row.event_id))
        assert(math.abs(gp - wp) < 1e-9 && math.abs(gn - wn) < 1e-9,
          s"user $u event ${row.event_id}")
        assert(ga === wa, s"user $u event ${row.event_id} alarm")
      }
    }
    // both sides of the shift alarm, each on its own statistic
    assert(got((1L, 20L))._3 && got((1L, 20L))._2 > got((1L, 20L))._1,
      "early segment alarms on the negative side")
    assert(got((1L, 40L))._3 && got((1L, 40L))._1 > got((1L, 40L))._2,
      "shifted tail alarms on the positive side")
    // the positive statistic stays clamped at ~0 until the shift arrives
    assert((1 to 20).forall(i => got((1L, i.toLong))._1 < 1.0),
      "pos-side statistic quiet before the shift")
    assert((1 to 30).forall(i => !got((2L, i.toLong))._3), "stable user never alarms")
  }

  // ---- Threshold pick ----------------------------------------------------

  test("thresholdPick takes the deepest cut meeting the exact precision bar") {
    // scores desc: pos pattern T T F T F F F F → cum precision
    // 1, 1, 2/3, 3/4, 3/5, 3/6, 3/7, 3/8; target 3/4 → deepest ok depth 4
    val rows = Seq(true, true, false, true, false, false, false, false)
      .zipWithIndex.map { case (p, i) => GainsRow("g", i.toLong, 1.0 - i * 0.1, p) }
    val out = Profiling.thresholdPick(df(rows), "g", col("score"), col("pos"), 3, 4)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(2) === 4L && r.getLong(3) === 3L)
    assert(math.abs(r.getDouble(1) - 0.7) < 1e-12, "threshold is the depth-4 score")
    assert(r.getDouble(4) === 0.75)
    assert(r.getDouble(5) === 1.0, "all positives captured at the cut")
    // unattainable bar → no row for the group
    val none = Profiling.thresholdPick(df(rows.map(_.copy(pos = false))), "g",
      col("score"), col("pos"), 1, 2).collect()
    assert(none.isEmpty)
  }

  // ---- Classification report ---------------------------------------------

  test("classificationReport matches the hand F1s, absent labels zeroed") {
    // label c never predicted (recall 0, precision NULL); label d only
    // predicted, never true (precision 0, recall NULL)
    val cells = Seq(ConfCell("a", "a", 8), ConfCell("a", "b", 2),
      ConfCell("b", "b", 6), ConfCell("b", "a", 1),
      ConfCell("c", "a", 3), ConfCell("b", "d", 1))
    val out = Profiling.classificationReport(df(cells), "t", "p", "n").collect()
    val by = out.map(r => r.getString(0) -> r).toMap
    assert(by.keySet === Set("a", "b", "c", "d"))
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    // a: tp=8, n_true=10, n_pred=12
    assert(by("a").getDouble(4) === r9(8.0 / 12) && by("a").getDouble(5) === 0.8)
    val f1a = 2 * (8.0 / 12) * 0.8 / (8.0 / 12 + 0.8)
    assert(math.abs(by("a").getDouble(6) - f1a) < 1e-9)
    // c: never predicted → precision NULL, recall 0, f1 NULL
    assert(by("c").isNullAt(4) && by("c").getDouble(5) === 0.0 && by("c").isNullAt(6))
    // d: never true → recall NULL
    assert(by("d").getDouble(4) === 0.0 && by("d").isNullAt(5) && by("d").isNullAt(6))
    // macro averages raw F1s with absents as 0, over all 4 labels
    val f1b = { val p = 6.0 / 8; val r = 6.0 / 8; 2 * p * r / (p + r) }
    val wantMacro = (f1a + f1b + 0.0 + 0.0) / 4
    for (r <- out) assert(math.abs(r.getDouble(7) - wantMacro) < 1e-8)
  }

  // ---- Rank-statistic invariance properties ------------------------------

  test("AUC, Spearman, and KS are invariant under monotone transforms") {
    val rnd = new scala.util.Random(424242)
    val scored = (1 to 200).map(_ =>
      ScoredDoc(s"g${rnd.nextInt(2)}", rnd.nextInt(10) / 10.0, rnd.nextBoolean()))
    def aucOf(d: org.apache.spark.sql.DataFrame) =
      Profiling.rocAuc(d, "source", col("score"), col("pos"))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val base = aucOf(df(scored))
    // exp is strictly monotone → identical rank statistic
    val mono = aucOf(df(scored).withColumn("score", exp(col("score"))))
    assert(base === mono, "AUC must be invariant under exp(score)")

    val xy = (1 to 200).map(_ => XyRow(s"g${rnd.nextInt(2)}", rnd.nextInt(9), rnd.nextInt(9)))
    def rhoOf(d: org.apache.spark.sql.DataFrame) =
      Profiling.spearman(d, "g", col("x"), col("y"))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val rho = rhoOf(df(xy))
    val rhoMono = rhoOf(df(xy)
      .withColumn("x", exp(col("x"))).withColumn("y", col("y") * 3 + 1))
    assert(rho === rhoMono, "Spearman must be invariant under monotone maps")

    val ks = (1 to 300).map(_ => KsRow(s"g${rnd.nextInt(3)}", rnd.nextInt(15).toLong))
    def ksOf(d: org.apache.spark.sql.DataFrame) =
      Profiling.ksByGroup(d, "g", col("v"))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val kd = ksOf(df(ks))
    val kdMono = ksOf(df(ks).withColumn("v", col("v") * 7 + 2))
    assert(kd === kdMono, "KS must be invariant under monotone maps")
  }

  // ---- Cohen's kappa -----------------------------------------------------

  private def kappaRef(cells: Seq[ConfCell]): (Double, Double, Option[Double]) = {
    val n = cells.map(_.n).sum.toDouble
    val po = cells.filter(c => c.t == c.p).map(_.n).sum / n
    val labels = (cells.map(_.t) ++ cells.map(_.p)).distinct
    val pe = labels.map { l =>
      cells.filter(_.t == l).map(_.n).sum.toDouble * cells.filter(_.p == l).map(_.n).sum
    }.sum / (n * n)
    (po, pe, if (1.0 - pe > 0) Some((po - pe) / (1.0 - pe)) else None)
  }

  test("cohensKappa: perfect, chance-level, and degenerate matrices") {
    def run(cells: Seq[ConfCell]) = Profiling.cohensKappa(df(cells), "t", "p", "n")
      .collect().head
    val perfect = Seq(ConfCell("a", "a", 30), ConfCell("b", "b", 70))
    assert(run(perfect).getDouble(3) === 1.0)
    // independent margins: po == pe → kappa 0
    val chance = Seq(ConfCell("a", "a", 9), ConfCell("a", "b", 21),
      ConfCell("b", "a", 21), ConfCell("b", "b", 49))
    assert(math.abs(run(chance).getDouble(3)) < 1e-9)
    // single-cell matrix: pe = 1 → NULL
    val degen = Seq(ConfCell("x", "x", 10))
    assert(run(degen).isNullAt(3))
    // referee on an asymmetric matrix incl. a never-predicted label
    val asym = Seq(ConfCell("a", "a", 40), ConfCell("a", "b", 5),
      ConfCell("b", "b", 30), ConfCell("c", "a", 3), ConfCell("c", "b", 2))
    val (po, pe, k) = kappaRef(asym)
    val got = run(asym)
    assert(math.abs(got.getDouble(1) - po) < 1e-9)
    assert(math.abs(got.getDouble(2) - pe) < 1e-9)
    assert(math.abs(got.getDouble(3) - k.get) < 1e-8)
  }

  // ---- Markov entropy rate -----------------------------------------------

  test("markovEntropyRate: deterministic chain 0, uniform chain ln k") {
    import java.sql.Timestamp
    // deterministic A→B→A→B... : every row entropy 0
    val det = (1L to 4L).flatMap(u => (1 to 20).map(i =>
      MkTypedEv(u, i, new Timestamp(i * 1000L), if (i % 2 == 0) "A" else "B")))
    val outDet = EventOps.markovEntropyRate(df(det), "user_id", "ts", "event_id", "event_type")
      .collect()
    assert(outDet.forall(r => r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0))
    // two states, each row uniform over {A, B} → rate = ln 2
    val uni = (0 until 64).map { i =>
      // one user; sequence AABB AABB... hits all 4 transitions equally
      val ty = if ((i / 2) % 2 == 0) "A" else "B"
      MkTypedEv(1L, i + 1, new Timestamp((i + 1) * 1000L), ty)
    }
    val outUni = EventOps.markovEntropyRate(df(uni), "user_id", "ts", "event_id", "event_type")
      .collect()
    // AABBAABB…: from A transitions are A,B alternating (≈ uniform), same
    // for B — each row entropy ~ln 2 up to the boundary transition
    for (r <- outUni) assert(math.abs(r.getDouble(3) - math.log(2)) < 0.02)
  }

  // ---- Label entropies ---------------------------------------------------

  test("labelEntropies satisfies the chain rule and MI identities") {
    val rnd = new scala.util.Random(271828)
    val rows = (1 to 500).map { _ =>
      val a = s"a${rnd.nextInt(4)}"
      // b correlated with a half the time → strictly positive MI
      val b = if (rnd.nextBoolean()) s"b${a.last}" else s"b${rnd.nextInt(4)}"
      AbRow(a, b)
    }
    val r = Profiling.labelEntropies(df(rows), "a", "b").collect().head
    val (ha, hb, hj) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val n = rows.size.toDouble
    def ent(groups: Map[_, Int]): Double =
      -groups.values.map(c => c / n * math.log(c / n)).sum
    assert(math.abs(ha - ent(rows.groupBy(_.a).view.mapValues(_.size).toMap)) < 1e-6)
    assert(math.abs(hb - ent(rows.groupBy(_.b).view.mapValues(_.size).toMap)) < 1e-6)
    assert(math.abs(hj - ent(rows.groupBy(x => (x.a, x.b)).view.mapValues(_.size).toMap)) < 1e-6)
    assert(math.abs(r.getDouble(4) - (hj - hb)) < 1e-8, "chain rule H(A|B)=H(AB)-H(B)")
    assert(math.abs(r.getDouble(5) - (ha + hb - hj)) < 1e-8, "MI identity")
    assert(r.getDouble(5) > 0.05, "correlated labels carry positive MI")
    // independent labels → MI ≈ 0 (and canonicalized, never -0.0)
    val indep = (0 until 400).map(i => AbRow(s"a${i % 4}", s"b${(i / 4) % 4}"))
    val ri = Profiling.labelEntropies(df(indep), "a", "b").collect().head
    assert(math.abs(ri.getDouble(5)) < 1e-9)
    assert(java.lang.Double.doubleToRawLongBits(ri.getDouble(5)) !=
      java.lang.Double.doubleToRawLongBits(-0.0d), "MI must canonicalize -0.0")
  }

  // ---- Block bootstrap SE ------------------------------------------------

  test("blockBootstrapSe: constant data has zero SE; referee matches") {
    val const = (1L to 200L).map(i => BinVal(i, 42L, ref = true))
    val rc = Profiling.blockBootstrapSe(df(const), col("doc_id"), col("n_chars"), 8)
      .collect().head
    assert(rc.getDouble(1) === 42.0 && rc.getDouble(2) === 0.0)
    // referee with the same md5-block rule
    val rows = (1L to 300L).map(i => BinVal(i, (i * 37 % 97) + 3, ref = true))
    val got = Profiling.blockBootstrapSe(df(rows), col("doc_id"), col("n_chars"), 8)
      .collect().head
    def blk(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 8
    }
    val means = rows.groupBy(r => blk(r.doc_id)).values
      .map(g => g.map(_.n_chars.toDouble).sum / g.size).toSeq
    val mbar = means.sum / means.size
    val se = math.sqrt(means.map(m => (m - mbar) * (m - mbar)).sum / (means.size - 1)) /
      math.sqrt(means.size)
    assert(got.getLong(0) === means.size.toLong)
    assert(math.abs(got.getDouble(1) - mbar) < 1e-6)
    assert(math.abs(got.getDouble(2) - se) < 1e-6)
  }

  // ---- Sequential patterns -----------------------------------------------

  /** Referee: brute-force subsequence existence ∃ i<j<k with the types. */
  private def seqSupport(rows: Seq[SeqEv]): Map[(String, String, String), Long] = {
    val types = rows.map(_.event_type).distinct
    val byUser = rows.groupBy(_.user_id).view.mapValues(_.sortBy(_.event_id).map(_.event_type)).toMap
    def has(s: Seq[String], p: (String, String, String)): Boolean = {
      val i = s.indexOf(p._1)
      if (i < 0) false else {
        val j = s.indexOf(p._2, i + 1)
        j >= 0 && s.indexOf(p._3, j + 1) >= 0
      }
    }
    (for (a <- types; b <- types; c <- types) yield {
      val p = (a, b, c)
      p -> byUser.values.count(has(_, p)).toLong
    }).toMap.filter(_._2 > 0)
  }

  test("sequencePatterns equals the brute-force subsequence referee") {
    val rnd = new scala.util.Random(60915)
    val types = Seq("A", "B", "C", "D")
    val rows = for (u <- 1L to 25L; i <- 1 to rnd.nextInt(10) + 1)
      yield SeqEv(u, i, types(rnd.nextInt(types.size)))
    val want = seqSupport(rows)
    val got = EventOps.sequencePatterns(df(rows), "user_id", "event_id",
      "event_type", topK = 1000)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(got === want, "span-collapse must equal brute-force subsequence support")
  }

  test("sequencePatterns: repeats of one type need three occurrences") {
    val rows = Seq(
      SeqEv(1, 1, "X"), SeqEv(1, 2, "X"),                    // only 2 X → no (X,X,X)
      SeqEv(2, 1, "X"), SeqEv(2, 2, "X"), SeqEv(2, 3, "X"))  // 3 X → (X,X,X)
    val got = EventOps.sequencePatterns(df(rows), "user_id", "event_id",
      "event_type", topK = 10).collect()
    assert(got.length === 1)
    assert((got.head.getString(0), got.head.getString(1), got.head.getString(2)) ===
      (("X", "X", "X")))
    assert(got.head.getLong(3) === 1L, "only the 3-occurrence user supports (X,X,X)")
  }

  // ---- Gains table -------------------------------------------------------

  test("gainsTable matches the hand ntile computation") {
    // 12 docs, one group: scores descending with doc_id tiebreaks;
    // positives concentrated at the top → first deciles capture most
    val rows = (1 to 12).map { i =>
      GainsRow("g", i.toLong, 1.0 - i * 0.05, i <= 4 || i == 7)
    }
    val out = Profiling.gainsTable(df(rows), "g", col("score"), col("pos"),
      col("doc_id"), 10).collect()
    // Spark/DuckDB ntile(10) over 12 rows: buckets 1,2 get 2 rows each
    val sizes = Seq(2, 2, 1, 1, 1, 1, 1, 1, 1, 1)
    assert(out.map(_.getLong(2)).toSeq === sizes.map(_.toLong))
    val ordered = rows.sortBy(r => (-r.score, r.doc_id))
    val bounds = sizes.scanLeft(0)(_ + _)
    val wantPos = sizes.indices.map(d =>
      ordered.slice(bounds(d), bounds(d + 1)).count(_.pos).toLong)
    assert(out.map(_.getLong(3)).toSeq === wantPos)
    val totPos = rows.count(_.pos).toDouble
    var cum = 0L
    for ((r, d) <- out.zipWithIndex) {
      cum += wantPos(d)
      assert(r.getLong(4) === cum)
      assert(math.abs(r.getDouble(5) - cum / totPos) < 1e-12, s"capture d$d")
      val lift = (cum.toDouble / bounds(d + 1)) / (totPos / 12)
      assert(math.abs(r.getDouble(6) - lift) < 1e-12, s"lift d$d")
    }
    // top-decile lift must beat 1 when positives concentrate at the top
    assert(out.head.getDouble(6) > 1.5)
  }

  test("gainsTable with zero positives NULLs capture and lift") {
    val rows = (1 to 8).map(i => GainsRow("g", i.toLong, i * 0.1, pos = false))
    val out = Profiling.gainsTable(df(rows), "g", col("score"), col("pos"),
      col("doc_id"), 4).collect()
    assert(out.forall(r => r.isNullAt(5) && r.isNullAt(6)))
  }

  // ---- Embedding drift ---------------------------------------------------

  test("embeddingDrift: identical cohorts cos 1 / L2 0; shifted cohorts read the shift") {
    val base = (1 to 40).map(i => LVec(i.toLong, Array(1f, 2f, 3f, 4f), i % 2))
    val same = VectorOps.embeddingDrift(df(base), col("label") === 1, "embedding")
      .collect().head
    assert(same.getDouble(2) === 1.0 && same.getDouble(3) === 0.0)
    // cohort B shifted by +10 on dim 1 only
    val shifted = (1 to 40).map { i =>
      val v = if (i % 2 == 1) Array(1f, 2f, 3f, 4f) else Array(11f, 2f, 3f, 4f)
      LVec(i.toLong, v, i % 2)
    }
    val out = VectorOps.embeddingDrift(df(shifted), col("label") === 1, "embedding")
      .collect().head
    assert(out.getLong(0) === 20L && out.getLong(1) === 20L)
    assert(math.abs(out.getDouble(3) - 10.0) < 1e-9, "L2 reads the planted shift")
    val ma = Seq(1.0, 2.0, 3.0, 4.0); val mb = Seq(11.0, 2.0, 3.0, 4.0)
    val cos = ma.zip(mb).map { case (x, y) => x * y }.sum /
      (math.sqrt(ma.map(x => x * x).sum) * math.sqrt(mb.map(x => x * x).sum))
    assert(math.abs(out.getDouble(2) - cos) < 1e-9)
  }

  // ---- NB label suspects -------------------------------------------------

  test("nbLabelSuspects surfaces a planted mislabeled document first") {
    // two clearly separated vocabularies; doc 99 carries B-vocabulary
    // but an A label — it must head the suspect queue with label B
    val aDocs = (1L to 10L).map(i => LDoc(i, "A", "alpha beta gamma delta alpha"))
    val bDocs = (11L to 20L).map(i => LDoc(i, "B", "omega psi chi phi omega"))
    val planted = LDoc(99, "A", "omega psi chi phi omega psi")
    val docs = aDocs ++ bDocs :+ planted
    val out = TextOps.nbLabelSuspects(df(docs), "lang", "text",
      "doc_id", topK = 5).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) === 99L)
    assert(out.head.getString(1) === "A" && out.head.getString(2) === "B")
    assert(out.head.getDouble(3) > 0)
    // the cleanly-labeled docs never appear
    assert(out.forall(_.getLong(0) === 99L))
  }

  // ---- k-truss -----------------------------------------------------------

  /** Referee: literal peel-to-fixpoint with brute-force support. */
  private def trussRef(edges: Set[(Long, Long)], k: Int): Map[(Long, Long), Int] = {
    var e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
    def sup(s: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      def nbrs(x: Long) = s.collect { case (a, b) if a == x => b; case (a, b) if b == x => a }
      s.map { case (a, b) => (a, b) -> (nbrs(a) & nbrs(b)).size }.toMap
    }
    var done = false
    while (!done) {
      val m = sup(e)
      val kept = e.filter(m(_) >= k - 2)
      done = kept == e
      e = kept
    }
    sup(e)
  }

  test("kTruss peels to the referee fixpoint, cascades included") {
    // two 4-cliques sharing one vertex, a pendant triangle hanging off a
    // clique edge (peeled by k=4 — a CASCADE: its edges have support 1),
    // and an isolated edge
    val c1 = for (Seq(a, b) <- Seq(1L, 2L, 3L, 4L).combinations(2).toSeq) yield (a, b)
    val c2 = for (Seq(a, b) <- Seq(4L, 5L, 6L, 7L).combinations(2).toSeq) yield (a, b)
    val extra = Seq((1L, 10L), (2L, 10L), (20L, 21L))
    val edges = (c1 ++ c2 ++ extra).toSet
    val want = trussRef(edges, 4)
    val got = Graph.kTruss(
      df(edges.toSeq.map(p => ModEdge(p._1, p._2))), "a", "b", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet === want.keySet)
    for ((e, s) <- want) assert(got(e) === s.toLong, s"support of $e")
    // both 4-cliques survive whole; triangle {1,2,10} and the isolated
    // edge are gone
    assert(got.keySet === (c1 ++ c2).toSet)
  }

  test("kTruss on seeded random graphs equals the referee") {
    val rnd = new scala.util.Random(5799)
    for (trial <- 1 to 3) {
      val edges = (1 to 60).map(_ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)).toSet
      val want = trussRef(edges, 4)
      val got = Graph.kTruss(
        df(edges.toSeq.map(p => ModEdge(p._1, p._2))), "a", "b", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === want.map { case (e, s) => e -> s.toLong }, s"trial $trial")
    }
  }

  // ---- Mann-Kendall ------------------------------------------------------

  private def mkReferee(vs: Seq[Double]): (Long, Option[Double]) = {
    val s = (for (i <- vs.indices; j <- i + 1 until vs.size)
      yield math.signum(vs(j) - vs(i)).toLong).sum
    val n = vs.size
    (s, if (n >= 2) Some(2.0 * s / (n.toLong * (n - 1))) else None)
  }

  test("mannKendall monotone, anti-monotone, tied, and short series") {
    val rows =
      (1 to 5).map(i => MkRow(1, i, i.toDouble)) ++            // rising: tau 1
        (1 to 5).map(i => MkRow(2, i, -i.toDouble)) ++         // falling: tau -1
        (1 to 4).map(i => MkRow(3, i, 7.0)) ++                 // all tied: tau 0
        Seq(MkRow(4, 1, 3.0)) ++                               // singleton: NULL
        Seq(MkRow(5, 1, 1.0), MkRow(5, 2, 3.0), MkRow(5, 3, 2.0), MkRow(5, 4, 3.0))
    val got = TimeSeries.mannKendall(df(rows), "user_id", "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    for ((u, sub) <- rows.groupBy(_.user_id)) {
      val vs = sub.sortBy(_.event_id).map(_.value)
      assert(got(u) === mkReferee(vs), s"user $u")
    }
    assert(got(1)._2 === Some(1.0) && got(2)._2 === Some(-1.0))
    assert(got(3)._2 === Some(0.0) && got(4)._2 === None)
  }

  // ---- Holt smoothing ----------------------------------------------------

  private def holtReferee(vs: Seq[Double], a: Double, g: Double): Seq[(Double, Double)] = {
    var l = 0.0; var b = 0.0
    vs.zipWithIndex.map { case (x, i) =>
      if (i == 0) { l = x; b = 0.0 }
      else { val l2 = a * x + (1.0 - a) * (l + b); b = g * (l2 - l) + (1.0 - g) * b; l = l2 }
      (l, b)
    }
  }

  test("holt matches the scalar recurrence referee across interleaved keys") {
    val rnd = new scala.util.Random(40415)
    val rows = for (u <- 1L to 7L; i <- 1 to rnd.nextInt(15) + 1)
      yield MkRow(u, i, math.rint(rnd.nextDouble() * 10000) / 100.0)
    val got = TimeSeries.holt(df(rows), "user_id", "event_id", "value", 0.5, 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(3), r.getDouble(4))))
      .toMap
    for ((u, sub) <- rows.groupBy(_.user_id)) {
      val ordered = sub.sortBy(_.event_id)
      val want = holtReferee(ordered.map(_.value), 0.5, 0.25)
      for ((row, w) <- ordered.zip(want))
        assert(got((u, row.event_id)) === w, s"user $u event ${row.event_id}")
    }
  }

  test("holt level equals ewma when gamma never engages (constant series)") {
    val rows = (1 to 6).map(i => MkRow(1, i, 42.5))
    val out = TimeSeries.holt(df(rows), "user_id", "event_id", "value", 0.5, 0.25)
      .collect()
    assert(out.forall(r => r.getDouble(3) === 42.5 && r.getDouble(4) === 0.0))
  }

  // ---- Sen's slope -------------------------------------------------------

  /** Referee: middle-rank median of pairwise slopes (average of the two
    * straddling ranks for even counts — the interpolation-free rule).
    */
  private def senReferee(pts: Seq[(Long, Double)]): Option[(Long, Double)] = {
    val slopes = (for {
      Seq((o1, v1), (o2, v2)) <- pts.sortBy(_._1).combinations(2).toSeq
    } yield (v2 - v1) / (o2 - o1).toDouble).sorted
    val np = slopes.size
    if (np == 0) None
    else {
      val lo = (np + 1) / 2; val hi = (np + 2) / 2
      Some((np.toLong, (slopes(lo - 1) + slopes(hi - 1)) / 2))
    }
  }

  test("senSlope matches the median referee for odd, even, and tied slopes") {
    val rows =
      Seq((1, 1.0), (2, 3.0), (3, 2.0)).map { case (o, v) => MkRow(1, o, v) } ++   // 3 pairs
        Seq((1, 0.0), (2, 2.0), (3, 4.0), (5, 4.0)).map { case (o, v) => MkRow(2, o, v) } ++ // 6 pairs
        Seq((1, 5.0)).map { case (o, v) => MkRow(3, o, v) }                        // no pairs
    val got = TimeSeries.senSlope(df(rows), "user_id", "event_id", "value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for ((u, sub) <- rows.groupBy(_.user_id)) {
      val want = senReferee(sub.map(r => r.event_id -> r.value))
      if (want.isEmpty) assert(!got.contains(u), s"user $u must emit no row")
      else {
        assert(got(u)._1 === want.get._1, s"user $u n_pairs")
        assert(math.abs(got(u)._2 - want.get._2) < 1e-12, s"user $u slope")
      }
    }
  }

  test("senSlope seeded random series match the referee") {
    val rnd = new scala.util.Random(881239)
    val rows = for (u <- 1L to 15L; i <- 1 to rnd.nextInt(9) + 2)
      yield MkRow(u, i, rnd.nextInt(40).toDouble)
    val got = TimeSeries.senSlope(df(rows), "user_id", "event_id", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for ((u, sub) <- rows.groupBy(_.user_id)) {
      val want = senReferee(sub.map(r => r.event_id -> r.value)).get._2
      assert(math.abs(got(u) - want) < 1e-12, s"user $u")
    }
  }

  // ---- Calibration -------------------------------------------------------

  test("calibrationReport matches the hand referee, ECE rolled up") {
    val rows = Seq(
      ScoredDoc("-", 0.05, false), ScoredDoc("-", 0.08, false), ScoredDoc("-", 0.09, true),
      ScoredDoc("-", 0.55, true), ScoredDoc("-", 0.58, false),
      ScoredDoc("-", 0.95, true), ScoredDoc("-", 1.0, true)) // 1.0 clamps to bin 9
    val out = Profiling.calibrationReport(df(rows), col("score"), col("pos"), 10)
      .collect()
    def binOf(s: Double) = math.min(math.floor(s * 10).toLong, 9L)
    val byBin = rows.groupBy(r => binOf(r.score))
    assert(out.map(_.getLong(0)).toSeq === byBin.keys.toSeq.sorted)
    var ece = 0.0
    for (r <- out) {
      val sub = byBin(r.getLong(0))
      assert(r.getLong(1) === sub.size)
      assert(r.getLong(2) === sub.count(_.pos))
      val conf = math.rint(sub.map(_.score).sum / sub.size * 1e9) / 1e9
      val acc = sub.count(_.pos).toDouble / sub.size
      assert(math.abs(r.getDouble(3) - conf) < 1e-9, s"bin ${r.getLong(0)} conf")
      assert(r.getDouble(4) === acc, s"bin ${r.getLong(0)} acc")
      ece += sub.size.toDouble / rows.size * math.abs(acc - conf)
    }
    for (r <- out) assert(math.abs(r.getDouble(5) - ece) < 1e-8)
  }

  test("mannKendall seeded random series match the referee") {
    val rnd = new scala.util.Random(77123)
    val rows = for (u <- 1L to 20L; i <- 1 to rnd.nextInt(12) + 1)
      yield MkRow(u, i, rnd.nextInt(6).toDouble)
    val got = TimeSeries.mannKendall(df(rows), "user_id", "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    for ((u, sub) <- rows.groupBy(_.user_id))
      assert(got(u) === mkReferee(sub.sortBy(_.event_id).map(_.value)), s"user $u")
  }
}
