package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class NamedRow(id: Long, name: String)
case class EvRow(user_id: Long, event_id: Long, ts: Timestamp)
case class ValRow(v: Double)
case class DomDoc(doc_id: Long, source: String, text: String)
case class ScoreRow(id: Long, grp: String, v: Long)
case class GroupVal(g: String, v: Long)

/** Round-12 late-batch operators: PassJoin bounded edit-distance join,
  * burstiness, Benford profile, Simpson diversity, Gini concentration,
  * Zipf slope. Referees are independent plain-Scala re-derivations.
  */
class Round12bOpsSpec extends SparkSpec {

  // ── PassJoin edit-distance self-join ──────────────────────────────────

  /** Plain-Scala Levenshtein referee. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brutePairs(rows: Seq[NamedRow], tau: Int): Set[(Long, Long, Long)] =
    (for {
      a <- rows; b <- rows if a.id < b.id
      d = lev(a.name, b.name) if d <= tau
    } yield (a.id, b.id, d.toLong)).toSet

  private def passJoin(rows: Seq[NamedRow], tau: Int): Set[(Long, Long, Long)] =
    Linkage.editDistSelfJoin(df(rows), "id", "name", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("editDistSelfJoin matches brute force on substitutions, deletions, insertions") {
    val rows = Seq(
      NamedRow(1, "abcdefghij"),   // base
      NamedRow(2, "abXdefghij"),   // 1 substitution
      NamedRow(3, "abXdeYghij"),   // 2 substitutions
      NamedRow(4, "abcdefghi"),    // 1 deletion (tail)
      NamedRow(5, "bcdefghij"),    // 1 deletion (head — max segment shift)
      NamedRow(6, "abcdeQfghij"),  // 1 insertion (middle)
      NamedRow(7, "abXdeYgZij"),   // 3 substitutions — must be excluded
      NamedRow(8, "zyxwvutsrq"))   // unrelated
    assert(passJoin(rows, 2) === brutePairs(rows, 2))
  }

  test("editDistSelfJoin is lossless on a digit-templated corpus (shared prefixes)") {
    val rows = (0L until 60L).map(i => NamedRow(i, f"Customer#$i%09d")) ++
      Seq(NamedRow(100, "Customer#00000012"))  // planted deletion, length 17
    assert(passJoin(rows, 2) === brutePairs(rows, 2))
  }

  test("editDistSelfJoin at tau=1 agrees with the FastSS lev<=1 join") {
    val rows = Seq(NamedRow(1, "kitten"), NamedRow(2, "mitten"), NamedRow(3, "kittens"),
      NamedRow(4, "sitten"), NamedRow(5, "bitten"), NamedRow(6, "smitten"))
    val fast = Linkage.fuzzySelfJoinLev1(df(rows), "id", "name")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist"))).toSet
    assert(passJoin(rows, 1) === fast)
  }

  // ── Burstiness ────────────────────────────────────────────────────────

  private def evs(user: Long, gapsUs: Seq[Long]): Seq[EvRow] = {
    var t = 1700000000000000L
    EvRow(user, 0, new Timestamp(t / 1000)) +: gapsUs.zipWithIndex.map { case (g, i) =>
      t += g
      val ts = new Timestamp(t / 1000)
      ts.setNanos(((t % 1000000) * 1000).toInt)
      EvRow(user, i + 1L, ts)
    }
  }

  private def referee(gaps: Seq[Long]): Double = {
    val n = gaps.size.toDouble
    val mu = gaps.sum.toDouble / n
    val sg2 = gaps.map(g => BigInt(g) * BigInt(g)).sum
    val sigma = math.sqrt(math.max(sg2.toDouble / n - mu * mu, 0.0))
    (sigma - mu) / (sigma + mu)
  }

  test("burstiness: constant gaps give exactly -1; referee parity; bursts push it up") {
    val constant = Seq.fill(9)(60000000L)
    val bursty = Seq.fill(8)(1000000L) :+ 3600000000L
    val rows = evs(1, constant) ++ evs(2, bursty)
    val got = EventOps.burstiness(df(rows), "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Double]("burstiness"))).toMap
    assert(got(1L)._1 === 9L)
    assert(got(1L)._2 === -1.0)
    val wantBursty = math.rint(referee(bursty) * 1e6) / 1e6
    assert(math.abs(got(2L)._2 - wantBursty) < 1e-9)
    assert(got(2L)._2 > 0.3, "heavy-tailed gaps should read as bursty")
  }

  test("burstiness drops users below the min-gap floor") {
    val rows = evs(1, Seq(1000000L)) ++ evs(2, Seq(1000000L, 2000000L))
    val got = EventOps.burstiness(df(rows), "user_id", "ts", "event_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  // ── Benford profile ───────────────────────────────────────────────────

  test("benfordProfile extracts leading digits symbolically and shares sum to 1") {
    val vals = Seq(1.5, 19.99, 123.0, 2.0, 29.0, 999.99, 9.01, 0.5, 31.7)
    val got = Profiling.benfordProfile(df(vals.map(ValRow)), col("v"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Double]("obs_share"),
        r.getAs[Double]("benford_share"))).toMap
    // 0.5 excluded; digits: 1,1,1,2,2,9,9,3
    assert(got.keySet === Set(1, 2, 3, 9))
    assert(got(1)._1 === 3L)
    assert(got(2)._1 === 2L)
    assert(got(3)._1 === 1L)
    assert(got(9)._1 === 2L)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-6)
    assert(math.abs(got(1)._3 - math.log10(2.0)) < 1e-6)
  }

  // ── Simpson diversity ─────────────────────────────────────────────────

  test("simpsonDiversity: single-type domain hits 1; referee parity on a mixed domain") {
    val docs = Seq(
      DomDoc(1, "mono", "spam spam spam spam"),
      DomDoc(2, "mixed", "a a a b b c"))
    val got = TextOps.simpsonDiversity(df(docs), "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("simpson"))).toMap
    assert(got("mono") === ((4L, 1L, 1.0)))
    // mixed: c = 3,2,1 -> sum c(c-1) = 6+2+0 = 8; N(N-1) = 30
    assert(got("mixed")._1 === 6L)
    assert(got("mixed")._2 === 3L)
    assert(math.abs(got("mixed")._3 - 8.0 / 30.0) < 1e-6)
  }

  // ── Gini concentration ────────────────────────────────────────────────

  /** Textbook referee: ascending sort, G = 2*sum(i*c_i)/(n*T) - (n+1)/n. */
  private def giniReferee(counts: Seq[Long]): Double = {
    val sorted = counts.sorted
    val n = sorted.size.toLong
    val t = sorted.sum
    val s = sorted.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    (2.0 * s - (n + 1).toDouble * t) / (n.toDouble * t)
  }

  private def giniOf(texts: Seq[String]): (Long, Long, Double) = {
    val rows = texts.zipWithIndex.map { case (t, i) => DomDoc(i.toLong, "d", t) }
    val r = TextOps.giniConcentration(df(rows), "text").collect().head
    (r.getLong(0), r.getLong(1), r.getAs[Double]("gini"))
  }

  test("giniConcentration: uniform counts give 0; grouped form matches the textbook referee") {
    val (nU, tU, gU) = giniOf(Seq("a b c d", "a b c d", "a b c d"))
    assert((nU, tU) === ((4L, 12L)))
    assert(gU === 0.0)
    // skewed corpus with TIES at several frequencies (the grouped-form risk)
    val texts = Seq("a a a a a a a b b b c c d d e f g h")
    val counts = Seq(7L, 3L, 2L, 2L, 1L, 1L, 1L, 1L)
    val (n, t, g) = giniOf(texts)
    assert((n, t) === ((8L, 18L)))
    assert(math.abs(g - math.rint(giniReferee(counts) * 1e6) / 1e6) < 1e-9)
  }

  // ── Zipf slope ────────────────────────────────────────────────────────

  test("zipfSlope recovers the exponent of an exact power-law corpus") {
    // counts c_r = 2^(10-r) for r = 1..8: ln c = 11*ln2 - r*ln2... not linear
    // in ln r — instead construct c_r = K / r exactly: c_r = 840/r for r in 1..8.
    val counts = (1 to 8).map(r => 840 / r) // 840,420,280,210,168,140,120,105
    val words = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(s"w${('a' + i).toChar}")
    }
    val text = scala.util.Random.shuffle(words.toList).mkString(" ") // layout noise only
    val r = TextOps.zipfSlope(df(Seq(DomDoc(1, "d", text))), "text", 8).collect().head
    assert(r.getLong(0) === 8L)
    assert(math.abs(r.getAs[Double]("slope") - (-1.0)) < 1e-6,
      s"exact 1/r law must fit slope -1, got ${r.getAs[Double]("slope")}")
  }

  // ── Quantile normalization ────────────────────────────────────────────

  test("quantileNormalize: ties share ranks, extremes hit 0 and 1, singletons land at 0") {
    val rows = Seq(ScoreRow(1, "a", 10), ScoreRow(2, "a", 20), ScoreRow(3, "a", 20),
      ScoreRow(4, "a", 40), ScoreRow(5, "solo", 99))
    val got = Profiling.quantileNormalize(df(rows), "id", "grp", "v")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("qnorm")).toMap
    assert(got(1L) === 0.0)
    assert(math.abs(got(2L) - 1.0 / 3.0) < 1e-8)
    assert(got(2L) === got(3L), "equal scores must normalize equally")
    assert(got(4L) === 1.0)
    assert(got(5L) === 0.0, "single-member group lands at 0 by (rank-1)/(n-1)")
  }

  // ── Domain-token mutual information ───────────────────────────────────

  test("domainTokenMI: identical domains give 0, disjoint equal domains give ln 2") {
    val same = Seq(DomDoc(1, "d1", "a b"), DomDoc(2, "d2", "a b"))
    val mi0 = TextOps.domainTokenMI(df(same), "source", "text").collect().head
    assert(mi0.getAs[Double]("mi") === 0.0)
    val split = Seq(DomDoc(1, "d1", "a a"), DomDoc(2, "d2", "b b"))
    val r = TextOps.domainTokenMI(df(split), "source", "text").collect().head
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_domains") === 2L)
    assert(r.getAs[Long]("n_types") === 2L)
    assert(math.abs(r.getAs[Double]("mi") - math.log(2.0)) < 1e-6,
      "perfectly separated domains carry H(D) = ln 2 of information")
  }

  // ── Domain vocabulary overlap ─────────────────────────────────────────

  test("domainVocabOverlap counts shared types and omits disjoint pairs") {
    val docs = Seq(DomDoc(1, "d1", "a b c"), DomDoc(2, "d2", "b c d"), DomDoc(3, "d3", "x"))
    val got = TextOps.domainVocabOverlap(df(docs), "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getAs[Double]("jaccard"))).toMap
    assert(got.keySet === Set(("d1", "d2")), "zero-overlap pairs must not appear")
    assert(got(("d1", "d2")) === ((3L, 3L, 2L, 0.5)))
  }

  // ── HLL overlap ───────────────────────────────────────────────────────

  test("hllOverlap: identical groups coincide, disjoint groups grow the union") {
    val a = (0L until 500L).map(GroupVal("A", _))
    val b = (0L until 500L).map(GroupVal("B", _))      // identical to A
    val c = (1000L until 1500L).map(GroupVal("C", _))  // disjoint from both
    val got = Profiling.hllOverlap(df(a ++ b ++ c), "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
          r.getAs[Double]("est_union"), r.getAs[Double]("est_intersect"))).toMap
    val ab = got(("A", "B"))
    assert(ab._1 === ab._2)
    assert(ab._3 === ab._1, "union of identical registers is the same sketch")
    assert(ab._4 === ab._1, "inclusion-exclusion recovers the full intersection")
    val ac = got(("A", "C"))
    assert(ac._3 > ac._1 && ac._3 > ac._2, "disjoint values must grow the union estimate")
    assert(ac._4 < ab._4, "disjoint intersection estimate must sit well below identical")
    // union never exceeds the sum (register max-merge is monotone)
    got.values.foreach(v => assert(v._3 <= v._1 + v._2 + 1e-9))
  }

  test("hllOverlap per-group estimates equal hllDistinct's own") {
    val rows = (0L until 300L).map(GroupVal("A", _)) ++ (100L until 600L).map(GroupVal("B", _))
    val per = Profiling.hllDistinct(df(rows), Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    val ov = Profiling.hllOverlap(df(rows), "g", "v").collect().head
    assert(ov.getAs[Double]("est_a") === per("A"))
    assert(ov.getAs[Double]("est_b") === per("B"))
  }

  // ── RFM segmentation ──────────────────────────────────────────────────

  case class RfmEv(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  test("rfmSegments: quintile scores are monotone in each metric and span 1..5") {
    // user u (1..10): u+1 events, last day 2024-01-u, value u per event —
    // all three metrics strictly increasing in u (recency DEcreasing).
    val rows = (1 to 10).flatMap { u =>
      (0 to u).map { i =>
        RfmEv(u.toLong, u * 100L + i,
          Timestamp.valueOf(f"2024-01-${u}%02d 0$i:00:00"), u.toDouble)
      }
    }
    val got = EventOps.rfmSegments(df(rows), "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getLong(7))).toMap
    got.values.foreach { case (_, _, rs, fs, ms, seg) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(seg === rs * 100L + fs * 10L + ms)
    }
    // monotone: higher u -> later last day -> smaller recency -> r_score falls;
    // frequency/monetary rise -> f/m scores rise
    val byU = (1 to 10).map(u => got(u.toLong))
    assert(byU.map(_._3).zip(byU.tail.map(_._3)).forall { case (a, b) => a >= b },
      "r_score must be non-increasing in u (ascending-value quintile of recency)")
    assert(byU.map(_._4).zip(byU.tail.map(_._4)).forall { case (a, b) => a <= b })
    assert(byU.map(_._5).zip(byU.tail.map(_._5)).forall { case (a, b) => a <= b })
    assert(got(10L)._3 === 1, "the most recent user sits in the first recency quintile")
    assert(got(1L)._3 === 5)
    assert(got(1L)._4 === 1)
    assert(got(10L)._4 === 5)
    assert(got(10L)._5 === 5)
  }

  // ── Touch attribution ─────────────────────────────────────────────────

  case class TouchEv(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  test("touchAttribution credits first and last preceding touch; cold conversions keep nulls") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      TouchEv(1, 1, t(1), "view"), TouchEv(1, 2, t(2), "click"),
      TouchEv(1, 3, t(3), "purchase"),
      TouchEv(1, 4, t(4), "error"), TouchEv(1, 5, t(5), "purchase"),
      TouchEv(2, 6, t(1), "purchase"),  // no prior touch
      TouchEv(2, 7, t(2), "signup"), TouchEv(2, 8, t(3), "purchase"))
    val got = EventOps.touchAttribution(df(rows), "user_id", "ts", "event_id",
        "event_type", "purchase")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(got(3L) === ((Some("view"), Some("click"))))
    assert(got(5L) === ((Some("view"), Some("error"))),
      "a prior purchase must not be credited as a touch")
    assert(got(6L) === ((None, None)))
    assert(got(8L) === ((Some("signup"), Some("signup"))))
    assert(got.keySet === Set(3L, 5L, 6L, 8L))
  }

  // ── Kneser-Ney bigram scoring ─────────────────────────────────────────

  /** Plain-Scala interpolated-KN referee over a token list corpus. */
  private def knReferee(docs: Seq[Seq[String]], d: Double)
      : (Map[(String, String), Double], Map[String, Double]) = {
    val bgs = docs.flatMap(ts => ts.zip(ts.tail))
    val cbg = bgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cu = cbg.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val n1f = cbg.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val n1p = cbg.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val b = cbg.size.toLong
    def p(v: String, w: String): Double =
      (math.max(cbg.getOrElse((v, w), 0L).toDouble - d, 0.0) +
        (d * n1f(v)) * (n1p.getOrElse(w, 0L).toDouble / b)) / cu(v)
    val vocab = docs.flatten.distinct
    val sums = cu.keys.map(v => v -> vocab.map(w => p(v, w)).sum).toMap
    (cbg.keys.map(k => k -> p(k._1, k._2)).toMap, sums)
  }

  test("knBigramLogProb: distribution sums to 1 per context; referee score parity") {
    val texts = Seq("the cat sat on the mat", "the dog sat on the rug",
      "a cat and a dog", "san francisco san francisco san jose")
    val docs = texts.map(_.split(" ").toSeq)
    val (probs, sums) = knReferee(docs, 0.75)
    sums.foreach { case (v, s) =>
      assert(math.abs(s - 1.0) < 1e-12, s"sum over vocab for context '$v'")
    }
    val rows = texts.zipWithIndex.map { case (t, i) => DomDoc(i.toLong, "d", t) }
    val got = TextOps.knBigramLogProb(df(rows), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Double]("kn_logprob"))).toMap
    docs.zipWithIndex.foreach { case (ts, i) =>
      val bgs = ts.zip(ts.tail)
      val want = bgs.map(bg => math.log(probs(bg))).sum / bgs.size
      assert(got(i.toLong)._1 === bgs.size.toLong)
      assert(math.abs(got(i.toLong)._2 - math.rint(want * 1e6) / 1e6) < 1e-6, s"doc $i")
    }
    // continuation semantics: "francisco" occurs 2x but follows ONLY
    // "san", so its continuation mass is low relative to its frequency —
    // KN must score (the unseen-context-diverse) "sat -> on" bigram above
    // a same-count bigram whose successor is context-poor; sanity-check
    // the ingredient directly
    assert(probs(("on", "the")) > 0.0)
  }

  // ── Markov top-1 baseline accuracy ────────────────────────────────────

  test("markovTopPredAccuracy: argmax prediction, deterministic ties, exact hit rate") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: a->b, b->a, a->b, b->c ; user 2: a->b, b->c
    // transitions from a: b,b,b (3x b -> predict b, acc 1.0)
    // transitions from b: a,c,c (predict c by count; acc 2/3)
    val rows = Seq(
      TouchEv(1, 1, t(1), "a"), TouchEv(1, 2, t(2), "b"), TouchEv(1, 3, t(3), "a"),
      TouchEv(1, 4, t(4), "b"), TouchEv(1, 5, t(5), "c"),
      TouchEv(2, 6, t(1), "a"), TouchEv(2, 7, t(2), "b"), TouchEv(2, 8, t(3), "c"))
    val got = EventOps.markovTopPredAccuracy(df(rows), "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getAs[Double]("accuracy"))).toMap
    assert(got("a") === (("b", 3L, 3L, 1.0)))
    assert(got("b")._1 === "c")
    assert(got("b")._2 === 3L)
    assert(got("b")._3 === 2L)
    assert(math.abs(got("b")._4 - 0.666667) < 1e-9)
    assert(!got.contains("c"), "terminal states carry no transitions")
    // tie determinism: equal counts must pick the lexicographically
    // smaller successor
    val tie = Seq(TouchEv(1, 1, t(1), "x"), TouchEv(1, 2, t(2), "b"),
      TouchEv(1, 3, t(3), "x"), TouchEv(1, 4, t(4), "a"))
    val tp = EventOps.markovTopPredAccuracy(df(tie), "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tp("x") === "a")
  }

  // ── Moments profile ───────────────────────────────────────────────────

  test("momentsProfile: exact values on {-1,1}, referee parity on a skewed group") {
    val rows = Seq(("sym", -1.0), ("sym", 1.0)) ++
      Seq(1.0, 1.0, 1.0, 1.0, 10.0).map(("skewed", _))
    val in = spark.createDataFrame(rows).toDF("g", "v")
    val got = Profiling.momentsProfile(in, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("mean"),
        r.getAs[Double]("stddev"), r.getAs[Double]("skewness"),
        r.getAs[Double]("kurtosis"))).toMap
    // {-1, 1}: mean 0, sd 1, skew 0, excess kurtosis E[x^4]/sd^4 - 3 = -2
    assert(got("sym") === ((2L, 0.0, 1.0, 0.0, -2.0)))
    // referee on the skewed group
    val vs = Seq(1.0, 1.0, 1.0, 1.0, 10.0)
    val n = vs.size.toDouble
    val m = vs.sum / n
    val e2 = vs.map(v => v * v).sum / n
    val e3 = vs.map(v => v * v * v).sum / n
    val e4 = vs.map(v => v * v * v * v).sum / n
    val va = e2 - m * m
    val sd = math.sqrt(va)
    val skew = (e3 - 3.0 * m * e2 + 2.0 * m * m * m) / (sd * sd * sd)
    val kurt = (e4 - 4.0 * m * e3 + 6.0 * m * m * e2 - 3.0 * m * m * m * m) / (va * va) - 3.0
    assert(got("skewed")._1 === 5L)
    assert(math.abs(got("skewed")._4 - math.rint(skew * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got("skewed")._5 - math.rint(kurt * 1e6) / 1e6) < 1e-9)
    assert(got("skewed")._4 > 1.0, "a single far outlier must read as strong right skew")
  }

  // ── Winnowing fingerprints ────────────────────────────────────────────

  test("winnowFingerprints: gap density <= w and shared substrings share a fingerprint") {
    val shared = "the quick brown fox jumps" // 25 chars >= w + k - 1 = 23
    val docs = Seq(
      DomDoc(1, "d", s"alpha beta gamma $shared delta epsilon"),
      DomDoc(2, "d", s"unrelated preamble words $shared closing words here"),
      DomDoc(3, "d", "completely different content with no overlap at all among these"))
    val rows = TextOps.winnowFingerprints(df(docs), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
    // density guarantee: first selection inside the first window, then
    // never a gap wider than w between consecutive selected positions
    byDoc.foreach { case (id, sels) =>
      val ps = sels.map(_._2).sorted
      assert(ps.head <= 16, s"doc $id first selection past the first window")
      ps.zip(ps.tail).foreach { case (a, b) =>
        assert(b - a <= 16, s"doc $id gap $a -> $b exceeds w")
      }
    }
    // detection guarantee: the planted >= w+k-1 shared substring forces
    // at least one common fingerprint hash between docs 1 and 2
    val f1 = byDoc(1L).map(_._3).toSet
    val f2 = byDoc(2L).map(_._3).toSet
    val f3 = byDoc(3L).map(_._3).toSet
    assert((f1 & f2).nonEmpty, "shared substring must share a fingerprint")
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty,
      "the disjoint doc must not collide on this corpus")
  }

  test("zipfSlope respects the top-k cut and deterministic tie order") {
    val text = "a a a b b c"
    val r = TextOps.zipfSlope(df(Seq(DomDoc(1, "d", text))), "text", 2).collect().head
    assert(r.getLong(0) === 2L)
    // ranks: a(3) then b(2); slope = (ln2-ln3)/(ln2-ln1)
    val want = (math.log(2.0) - math.log(3.0)) / math.log(2.0)
    assert(math.abs(r.getAs[Double]("slope") - want) < 1e-6)
  }
}
