package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class CohortVal(source: String, train: Boolean, v: Double)
case class KmvRow(lang: String, token: String)
case class GrowDoc(doc_id: Long, text: String)
case class DayVal(k: String, ts: java.sql.Timestamp, v: Double)
case class FdRow(a: String, b: String)
case class KeyRow(k: Long)
case class VecRow(vec_id: Long, embedding: Seq[Float])
case class WRow(g: String, v: Long, w: Long)
case class QiRow(qa: String, qb: String, s: Long)
case class TyEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                event_type: String)
case class KA(k: Long)
case class KB(k: Long)

/** Round-16 operators (Welch t / KMV sketch / Heaps' law / span
  * corruption), each checked against an independent plain-Scala referee
  * or an analytically-known fixture, not the operator's own formulation.
  */
class Round16OpsSpec extends SparkSpec {

  // ---- Welch's t ---------------------------------------------------------

  /** Referee: textbook Welch on plain doubles (the engine's decimal
    * accumulation agrees to well below the comparison tolerance). */
  private def welchReferee(rows: Seq[CohortVal])
      : (Option[Double], Option[Double], Option[Double]) = {
    val a = rows.filter(_.train).map(_.v)
    val b = rows.filterNot(_.train).map(_.v)
    def varOf(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    if (a.size < 2 || b.size < 2) (None, None, None)
    else {
      val (v1, v2) = (varOf(a), varOf(b))
      val se2 = v1 / a.size + v2 / b.size
      if (se2 <= 0) (None, None, None)
      else {
        val t = (a.sum / a.size - b.sum / b.size) / math.sqrt(se2)
        val df = se2 * se2 /
          (math.pow(v1 / a.size, 2) / (a.size - 1) +
            math.pow(v2 / b.size, 2) / (b.size - 1))
        val smd = if (v1 + v2 > 0)
          Some((a.sum / a.size - b.sum / b.size) / math.sqrt((v1 + v2) / 2))
        else None
        (Some(t), Some(df), smd)
      }
    }
  }

  private def runWelch(rows: Seq[CohortVal]) =
    Profiling.welchTTest(df(rows), "source", col("train"), col("v"))
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        r.getString(0) -> (opt(4), opt(5), opt(6))
      }.toMap

  test("welchTTest matches the plain-Scala referee on seeded cohorts") {
    val rnd = new scala.util.Random(1601)
    val rows = (1 to 400).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val tr = rnd.nextBoolean()
      // cohort means differ per group so t is material, not ~0
      CohortVal(g, tr, rnd.nextGaussian() * 4 + (if (tr) 10 else 8))
    }
    val got = runWelch(rows)
    for ((g, sub) <- rows.groupBy(_.source)) {
      val (t, wdf, smd) = welchReferee(sub)
      def close(a: Option[Double], b: Option[Double]) =
        (a, b) match {
          case (Some(x), Some(y)) => math.abs(x - y) < 1e-5
          case (None, None) => true
          case _ => false
        }
      assert(close(got(g)._1, t), s"t for $g: ${got(g)._1} vs $t")
      assert(close(got(g)._2, wdf), s"df for $g")
      assert(close(got(g)._3, smd), s"smd for $g")
    }
  }

  test("welchTTest degenerate cohorts emit NULL, never NaN") {
    val rows = Seq(
      CohortVal("tiny", true, 1.0),                       // cohort n=1
      CohortVal("tiny", false, 2.0), CohortVal("tiny", false, 3.0),
      CohortVal("const", true, 5.0), CohortVal("const", true, 5.0),
      CohortVal("const", false, 5.0), CohortVal("const", false, 5.0))
    val got = runWelch(rows)
    assert(got("tiny") === ((None, None, None)))
    assert(got("const") === ((None, None, None))) // both variances zero
    // and mean_diff stays defined (it needs no variance)
    val md = Profiling.welchTTest(df(rows), "source", col("train"), col("v"))
      .where(col("source") === "const").head.getDouble(3)
    assert(md === 0.0)
  }

  // ---- KMV distinct sketch -----------------------------------------------

  private def md5hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("kmvDistinct below k is the exact count with zero error") {
    val rows = (1 to 20).map(i => KmvRow("sparse", s"tok$i"))
    val r = Profiling.kmvDistinct(df(rows), "lang", col("token"), 64).head
    assert(r.getLong(1) === 20L)
    assert(r.getDouble(2) === 20.0)     // estimate falls back to exact
    assert(r.getDouble(3) === 0.0)      // rel_err
    assert(r.getBoolean(4))             // within_bounds
  }

  test("kmvDistinct above k matches the keep-smallest-k referee") {
    val k = 16
    val n = 3000
    val rows = (1 to n).map(i => KmvRow("dense", s"value-$i")) ++
      (1 to 500).map(i => KmvRow("dense", s"value-$i")) // duplicates ignored
    val r = Profiling.kmvDistinct(df(rows), "lang", col("token"), k).head
    val uk = (1 to n).map(i => md5hash32(s"value-$i")).distinct.sorted.apply(k - 1)
    val est = (k - 1).toDouble / (uk.toDouble / 4294967296.0d)
    assert(r.getLong(1) === n.toLong)
    assert(math.abs(r.getDouble(2) - est) < 1e-4,
      s"estimate ${r.getDouble(2)} vs referee $est")
    assert(math.abs(r.getDouble(3) - math.abs(est - n) / n) < 1e-4)
    assert(r.getBoolean(4) === (math.abs(est - n) / n <= 4.0 / math.sqrt(k)))
  }

  // ---- Heaps' law ----------------------------------------------------------

  test("heapsLaw: proportional vocabulary growth fits beta = 1") {
    // every doc contributes the same number of tokens AND all-novel
    // 3-shingles: V ∝ n, T ∝ n → exact log-log slope 1
    val docs = (0L until 200L).map(i =>
      GrowDoc(i, (0 to 6).map(j => s"w${i}_$j").mkString(" ")))
    val r = TextOps.heapsLaw(df(docs), "doc_id", "text").head
    assert(r.getLong(0) >= 4, "needs several checkpoints")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, s"beta ${r.getDouble(1)}")
  }

  test("heapsLaw: constant vocabulary fits beta = 0") {
    val docs = (0L until 200L).map(i => GrowDoc(i, "a b c d e f g"))
    val r = TextOps.heapsLaw(df(docs), "doc_id", "text").head
    assert(r.getDouble(1) === 0.0)
  }

  // ---- span corruption -----------------------------------------------------

  /** Plain-Scala referee: same mask rule, run collapse, sentinel
    * numbering and join as the operator claims. */
  private def corruptReferee(id: Long, text: String, block: Int, mod: Int)
      : (String, String, Long, Long) = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val masked = toks.indices.map(p => md5hash32(s"$id:${p / block}") % mod == 0)
    var sid = -1
    val corrupted = new StringBuilder
    val target = new StringBuilder
    for (p <- toks.indices) {
      val runStart = masked(p) && (p == 0 || !masked(p - 1))
      if (runStart) sid += 1
      val sentinel = s"<extra_id_$sid>"
      if (!masked(p)) {
        if (corrupted.nonEmpty) corrupted.append(' '); corrupted.append(toks(p))
      } else if (runStart) {
        if (corrupted.nonEmpty) corrupted.append(' '); corrupted.append(sentinel)
        if (target.nonEmpty) target.append(' ')
        target.append(sentinel).append(' ').append(toks(p))
      } else {
        if (target.nonEmpty) target.append(' '); target.append(toks(p))
      }
    }
    (corrupted.toString, target.toString,
      masked.count(identity).toLong, toks.length.toLong)
  }

  test("spanCorrupt matches the plain-Scala referee on seeded docs") {
    val rnd = new scala.util.Random(1607)
    val docs = (0L until 60L).map { i =>
      GrowDoc(i, (0 until 5 + rnd.nextInt(40)).map(j => s"t${rnd.nextInt(50)}").mkString(" "))
    }
    val got = TextOps.spanCorrupt(df(docs), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    for (d <- docs)
      assert(got(d.doc_id) === corruptReferee(d.doc_id, d.text, 3, 5),
        s"doc ${d.doc_id}")
  }

  // ---- classical seasonal decomposition ------------------------------------


  test("seasonalDecompose recovers a planted trend + weekly pattern exactly") {
    // value(day) = 10·day + pattern[day mod 7]; the pattern sums to 0, so
    // the centered 7-day MA of the signal IS the linear trend and the
    // phase means recover the pattern with residual 0 (no noise planted)
    val pattern = Array(3.0, -1.0, 2.0, -4.0, 0.0, 1.0, -1.0) // sums to 0
    val rows = (0 until 28).map { d =>
      DayVal("a", java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        10.0 * d + pattern(d % 7))
    }
    val got = TimeSeries.seasonalDecompose(df(rows), "k", "ts", "v", 7)
      .orderBy("day").collect()
    assert(got.length === 28)
    val inner = got.filter(!_.isNullAt(3)) // rows with a full MA window
    assert(inner.length === 22)
    for (r <- inner) {
      val day = r.getDate(1).toLocalDate.getDayOfMonth - 1
      assert(math.abs(r.getDouble(3) - 10.0 * day) < 1e-6, s"trend day $day")
      assert(math.abs(r.getDouble(5)) < 1e-6, s"residual day $day")
    }
    // seasonal components: zero-centered, equal for equal phases
    val sea = got.map(r => r.getDouble(4))
    assert(math.abs(got.take(7).map(_.getDouble(4)).sum) < 1e-6)
    for (d <- 0 until 21) assert(math.abs(sea(d) - sea(d + 7)) < 1e-9)
  }

  test("seasonalDecompose: series shorter than the period keeps NULL trend everywhere") {
    val rows = (0 until 5).map(d =>
      DayVal("s", java.sql.Timestamp.valueOf(f"2024-02-${d + 1}%02d 01:00:00"), d.toDouble))
    val got = TimeSeries.seasonalDecompose(df(rows), "k", "ts", "v", 7).collect()
    assert(got.length === 5)
    assert(got.forall(_.isNullAt(3)) && got.forall(_.isNullAt(4)))
  }

  // ---- approximate-FD profile ----------------------------------------------


  test("fdViolations: exact FD scores 0; known violations count g3 rows") {
    val rows = Seq(
      FdRow("x1", "p"), FdRow("x1", "p"), FdRow("x1", "q"), // x1: top=2, tot=3
      FdRow("x2", "p"), FdRow("x2", "p"),                   // x2: clean
      FdRow("x3", "r"))                                     // x3: clean
    val got = Profiling.fdViolations(df(rows),
        Seq("a" -> "b", "b" -> "b"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toList
    val byLhs = got.map(t => t._1 -> t).toMap
    // rate is rounded to 9 digits by the operator
    assert(byLhs("a") === (("a", 3L, 1L, 1L, 0.166666667)))  // one row to delete
    assert(byLhs("b") === (("b", 3L, 0L, 0L, 0.0)))      // trivially exact
  }

  test("freqSpectrum counts-of-counts and Good-Turing head match the referee") {
    // single-token docs → shingle = the whole doc; DF spectrum is exact
    val docs =
      (1 to 6).map(i => GrowDoc(i.toLong, "solo" + i)) ++          // 6 singletons
      (7 to 10).map(i => GrowDoc(i.toLong, "twice" + (i % 2))) ++  // 2 types, df=2
      (11 to 13).map(i => GrowDoc(i.toLong, "triple"))             // 1 type, df=3
    val got = TextOps.freqSpectrum(df(docs), "doc_id", "text", 3, 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(got(1L) === ((6L, Some(0.666667))))      // round6((1+1)·N2/N1)
    assert(got(2L) === ((2L, Some(1.5))))           // (2+1)·N3/N2
    assert(got(3L) === ((1L, None)))                // no N4 → no adjustment
  }

  test("dupRateCurve: unigram rate high, long-gram rate collapses, counts exact") {
    val docs = (1 to 10).map(i =>
      GrowDoc(i.toLong, s"the same lead always but tail$i differs here$i"))
    val got = TextOps.dupRateCurve(df(docs), "doc_id", "text", Seq(1, 3))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (i1, d1, r1) = got(1L)
    val (i3, d3, r3) = got(3L)
    assert(i1 === 80L)  // 8 tokens × 10 docs
    assert(d1 === 6 + 2 * 10L) // 6 shared types + 2 unique per doc
    assert(r1 > r3, "longer grams must deduplicate less")
    assert(i3 === 60L) // 6 trigrams × 10 docs
    // referee for n=3 distinct: 4 shared leading trigrams? compute directly
    val tri = docs.flatMap { d =>
      val t = d.text.split(" ")
      t.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }
    assert(d3 === tri.distinct.size.toLong)
    assert(math.abs(r3 - (1.0 - tri.distinct.size.toDouble / tri.size)) < 1e-6)
  }

  test("fdViolationDetail ranks violating groups by rows to repair") {
    val rows = Seq(
      FdRow("x1", "p"), FdRow("x1", "p"), FdRow("x1", "q"), FdRow("x1", "r"), // repair 2
      FdRow("x2", "p"), FdRow("x2", "q"),                                     // repair 1, tie p<q
      FdRow("x3", "p"), FdRow("x3", "p"))                                     // clean → absent
    val got = Profiling.fdViolationDetail(df(rows), "a", "b", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("x1", 4L, 3L, "p", 2L, 2L),
      ("x2", 2L, 2L, "p", 1L, 1L))) // dominant tie broken to the smaller rhs
  }

  // ---- AMS F2 ----------------------------------------------------------------


  test("amsF2 exact F2 is right and the estimate matches the hash referee") {
    // counts: value v appears v times, v = 1..12 → F2 = sum v^2 = 650
    val rows = (1 to 12).flatMap(v => Seq.fill(v)(KeyRow(v.toLong)))
    val r = Profiling.amsF2(df(rows), col("k"), groups = 5, perGroup = 16).head
    assert(r.getLong(0) === 78L)     // n_rows
    assert(r.getLong(1) === 12L)     // n_distinct
    assert(r.getLong(2) === 650L)    // exact_f2
    // referee: same seeded-sign estimators in plain Scala
    val zs = (0 until 80).map { seed =>
      (1 to 12).map { v =>
        val s = if (md5hash32(s"$seed:$v") % 2 == 0) 1L else -1L
        s * v
      }.sum
    }
    val means = (0 until 5).map(g =>
      (0 until 80).filter(_ % 5 == g).map(i => zs(i) * zs(i)).sum.toDouble / 16)
    val med = means.sorted.apply(2)
    assert(math.abs(r.getDouble(3) - med) < 1e-6)
  }

  // ---- JL distortion ----------------------------------------------------------


  test("jlDistortion matches a plain-Scala projection referee") {
    val dim = 8; val k = 4
    val rnd = new scala.util.Random(1613)
    val rows = (0L until 6L).map(i =>
      VecRow(i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val got = VectorOps.jlDistortion(df(rows), "vec_id", "embedding", dim, k, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val signs = VectorOps.jlSigns(k, dim)
    def proj(v: Seq[Float]) = (0 until k).map(j =>
      v.zipWithIndex.map { case (x, d) => x.toDouble * signs(j)(d) }.sum /
        math.sqrt(k))
    for (a <- rows; b <- rows if a.vec_id < b.vec_id) {
      val d2t = a.embedding.zip(b.embedding)
        .map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
      val d2p = proj(a.embedding).zip(proj(b.embedding))
        .map { case (x, y) => (x - y) * (x - y) }.sum
      val (gt, gp) = got((a.vec_id, b.vec_id))
      assert(math.abs(gt - d2t) < 1e-5, s"true d2 ${a.vec_id}-${b.vec_id}")
      assert(math.abs(gp - d2p) < 1e-5, s"proj d2 ${a.vec_id}-${b.vec_id}")
    }
  }

  test("jlSigns is balanced-ish and deterministic") {
    val s1 = VectorOps.jlSigns(16, 64)
    val s2 = VectorOps.jlSigns(16, 64)
    assert(s1.flatten.toSeq === s2.flatten.toSeq)
    val pos = s1.flatten.count(_ > 0)
    assert(pos > 400 && pos < 624) // 1024 fair coins, ±5σ band
  }

  // ---- MATTR ---------------------------------------------------------------

  test("mattr equals the sliding-window referee; short docs fall back to TTR") {
    val docs = Seq(
      GrowDoc(1L, (1 to 60).map(i => s"t${i % 9}").mkString(" ")), // repetitive
      GrowDoc(2L, (1 to 60).map(i => s"u$i").mkString(" ")),       // all-novel
      GrowDoc(3L, "a b a"))                                        // short
    val got = TextOps.mattr(df(docs), "doc_id", "text", 25)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    def ref(text: String, w: Int) = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      if (t.length < w) t.distinct.length.toDouble / t.length
      else (0 to t.length - w).map(i => t.slice(i, i + w).distinct.length).sum
        .toDouble / (w * (t.length - w + 1))
    }
    for (d <- docs) {
      val (n, ttr, m) = got(d.doc_id)
      val t = d.text.split("\\s+").filter(_.nonEmpty)
      assert(n === t.length.toLong)
      assert(math.abs(ttr - t.distinct.length.toDouble / t.length) < 1e-6)
      assert(math.abs(m - ref(d.text, 25)) < 1e-6, s"doc ${d.doc_id}")
    }
    assert(got(2L)._3 === 1.0)            // all-novel: every window is all types
    assert(got(1L)._3 < got(2L)._3)       // repetition scores lower
    assert(got(3L)._3 === got(3L)._2)     // short doc: mattr = ttr
  }

  // ---- FIM -----------------------------------------------------------------

  test("fimSplit cuts match the hash referee and the spans partition the doc") {
    val docs = (0L until 50L).map(i =>
      GrowDoc(i, (0 to 10 + (i % 20).toInt).map(j => s"w$j").mkString(" ")))
    val got = TextOps.fimSplit(df(docs), "doc_id", "text").collect()
    for (r <- got) {
      val id = r.getLong(0)
      val toks = docs.find(_.doc_id == id).get.text.split("\\s+")
      val n = toks.length
      val h1 = md5hash32(s"$id:fim1") % (n + 1)
      val h2 = md5hash32(s"$id:fim2") % (n + 1)
      assert(r.getLong(2) === math.min(h1, h2) && r.getLong(3) === math.max(h1, h2))
      val (p, m, s) = (r.getString(4), r.getString(5), r.getString(6))
      // spans partition the token sequence in order
      assert(Seq(p, m, s).filter(_.nonEmpty).mkString(" ") === toks.mkString(" "))
      assert(r.getString(7) === s"<fim_prefix> $p <fim_suffix> $s <fim_middle> $m")
    }
  }

  // ---- multi-touch attribution ----------------------------------------------


  private def ev(u: Long, sec: Int, id: Long, ty: String) =
    TyEv(u, java.sql.Timestamp.valueOf(f"2024-03-01 00:00:$sec%02d"), id, ty)

  test("multiTouchAttribution splits exactly one unit per converted segment") {
    val rows = Seq(
      // user 1: [a b c] -> buy (n=3: linear 1/3 each; U .4/.2/.4)
      ev(1, 1, 1, "a"), ev(1, 2, 2, "b"), ev(1, 3, 3, "c"), ev(1, 4, 4, "purchase"),
      // user 1 second segment: [b] -> buy (n=1: both models give 1.0)
      ev(1, 5, 5, "b"), ev(1, 6, 6, "purchase"),
      // user 2: [a b] -> buy (n=2: 0.5 each both models)
      ev(2, 1, 7, "a"), ev(2, 2, 8, "b"), ev(2, 3, 9, "purchase"),
      // user 2 trailing touches with NO conversion: zero credit
      ev(2, 4, 10, "c"), ev(2, 5, 11, "c"),
      // user 3: conversion with no preceding touches: no credit to give
      ev(3, 1, 12, "purchase"))
    val got = EventOps.multiTouchAttribution(df(rows), "user_id", "ts",
        "event_id", "event_type", "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // credits are rounded to 6 digits by the operator
    assert(got("a") === ((2L, 0.833333, 0.9)))   // 1/3 + 0.5 | 0.4 + 0.5
    assert(got("b") === ((3L, 1.833333, 1.7)))   // 1/3 + 1 + 0.5 | 0.2 + 1 + 0.5
    assert(got("c") === ((1L, 0.333333, 0.4)))
    // total credit = number of conversions that had >= 1 touch (3 here)
    assert(math.abs(got.values.map(_._2).sum - 3.0) < 1e-5)
    assert(math.abs(got.values.map(_._3).sum - 3.0) < 1e-5)
  }

  // ---- Kaplan-Meier -----------------------------------------------------------

  test("kaplanMeier matches the hand-computed curve with censoring") {
    // lifetimes (1-day units): churned at 0,0,1; censored at 1,2,2
    // (gmax = Apr 30; censor window 5 days → last < Apr 25 churns)
    def u(id: Long, first: String, last: String) = Seq(
      TyEv(id, java.sql.Timestamp.valueOf(s"2024-04-$first 00:00:00"), id * 2, "x"),
      TyEv(id, java.sql.Timestamp.valueOf(s"2024-04-$last 12:00:00"), id * 2 + 1, "x"))
    val rows =
      u(1, "01", "01") ++ u(2, "02", "02") ++ u(3, "03", "04") ++ // churned 0,0,1
      u(4, "28", "29") ++ u(5, "27", "29") ++ u(6, "28", "30")    // censored 1,2,2
    val got = EventOps.kaplanMeier(df(rows), "user_id", "ts",
        censorDays = 5, unitDays = 1)
      .orderBy("life").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // t=0: risk 6, d=2 → S = 4/6; t=1: risk 4, d=1 → S = (4/6)(3/4) = 0.5;
    // t=2: risk 2, d=0 → S stays 0.5
    assert(got.length === 3)
    assert(got(0) === ((0L, 6L, 2L, 0L, 0.666666667)))
    assert(got(1) === ((1L, 4L, 1L, 1L, 0.5)))
    assert(got(2) === ((2L, 2L, 0L, 2L, 0.5)))
  }

  test("kaplanMeier with no churns is a flat 1.0 curve") {
    val rows = (1L to 4L).flatMap(i => Seq(
      TyEv(i, java.sql.Timestamp.valueOf("2024-04-29 00:00:00"), i * 2, "x"),
      TyEv(i, java.sql.Timestamp.valueOf("2024-04-30 00:00:00"), i * 2 + 1, "x")))
    val got = EventOps.kaplanMeier(df(rows), "user_id", "ts", 5, 1).collect()
    assert(got.forall(_.getDouble(4) === 1.0))
    assert(got.map(_.getLong(3)).sum === 4L) // everyone censored
  }

  // ---- user growth -----------------------------------------------------------------

  test("userGrowth decomposes active into new + returning, cumulative is monotone") {
    val rows = Seq(
      TyEv(1, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), 10, "x"),
      TyEv(2, java.sql.Timestamp.valueOf("2024-05-01 11:00:00"), 11, "x"),
      TyEv(1, java.sql.Timestamp.valueOf("2024-05-02 10:00:00"), 12, "x"),
      TyEv(3, java.sql.Timestamp.valueOf("2024-05-02 11:00:00"), 13, "x"),
      TyEv(1, java.sql.Timestamp.valueOf("2024-05-03 10:00:00"), 14, "x"),
      TyEv(2, java.sql.Timestamp.valueOf("2024-05-03 11:00:00"), 15, "x"))
    val got = EventOps.userGrowth(df(rows), "user_id", "ts")
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((2L, 2L, 0L, 2L), (2L, 1L, 1L, 3L), (2L, 0L, 2L, 3L)))
  }

  // ---- A/B proportion test ------------------------------------------------------------

  test("abProportionTest matches the textbook two-proportion z") {
    // cohort A: 4 users, 3 convert; cohort B: 4 users, 1 converts —
    // cohort assignment passed directly as a parity flag for the fixture
    val rows = (1L to 8L).flatMap { u =>
      val conv = (u % 2 == 1 && u <= 6) || u == 2 // users 1,3,5 (A-ish) + 2
      Seq(TyEv(u, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), u * 10, "view")) ++
        (if (conv) Seq(TyEv(u, java.sql.Timestamp.valueOf("2024-06-01 01:00:00"),
          u * 10 + 1, "purchase")) else Nil)
    }
    val got = EventOps.abProportionTest(df(rows), "user_id",
      col("user_id") % 2 === 1, col("event_type") === "purchase").head
    val (na, ca2, nb, cb2) = (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    assert((na, ca2, nb, cb2) === ((4L, 3L, 4L, 1L)))
    val (pa, pb) = (3.0 / 4, 1.0 / 4)
    val pool = 4.0 / 8
    val z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(got.getDouble(6) - z) < 1e-6)
  }

  test("abProportionTest degenerate pools emit NULL z") {
    // nobody converts: pooled rate 0 → no variance → NULL, never NaN
    val rows = (1L to 4L).map(u =>
      TyEv(u, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), u, "view"))
    val got = EventOps.abProportionTest(df(rows), "user_id",
      col("user_id") % 2 === 1, col("event_type") === "purchase").head
    assert(got.isNullAt(6))
  }

  // ---- effective sample size -------------------------------------------------------------

  test("effectiveSampleSize: uniform weights give ESS = n; one dominant gives ~1") {
    val rows = (1 to 10).map(_ => WRow("uniform", 1, 7)) ++
      (Seq.fill(9)(WRow("skewed", 1, 1)) :+ WRow("skewed", 1, 1000))
    val got = Profiling.effectiveSampleSize(df(rows), "g", col("w"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got("uniform") === ((10L, 10.0)))
    val essSkew = got("skewed")._2
    val ref = math.pow(1009.0, 2) / (9 + 1000.0 * 1000)
    assert(math.abs(essSkew - ref) < 1e-4 && essSkew < 1.1)
  }

  // ---- AMS join-size estimate ----------------------------------------------------

  test("amsJoinSize exact size is right and the estimate matches the referee") {
    // A: key v appears v times (v=1..8); B: key v appears 2 times for even v
    val a = (1 to 8).flatMap(v => Seq.fill(v)(KA(v.toLong)))
    val b = (1 to 8).filter(_ % 2 == 0).flatMap(v => Seq.fill(2)(KB(v.toLong)))
    val r = Profiling.amsJoinSize(df(a), col("k"), df(b), col("k"),
      groups = 5, perGroup = 32).head
    assert(r.getLong(0) === (2 + 4 + 6 + 8) * 2L) // Σ cA·cB over shared keys
    val k = 160
    def z(counts: Map[Long, Long], seed: Int) = counts.map { case (v, c) =>
      (if (md5hash32(s"$seed:$v") % 2 == 0) 1L else -1L) * c
    }.sum
    val ca = a.groupBy(_.k).map { case (v, xs) => v -> xs.size.toLong }
    val cb = b.groupBy(_.k).map { case (v, xs) => v -> xs.size.toLong }
    val means = (0 until 5).map(g =>
      (0 until k).filter(_ % 5 == g).map(i => z(ca, i) * z(cb, i)).sum.toDouble / 32)
    assert(math.abs(r.getDouble(1) - means.sorted.apply(2)) < 1e-6)
  }

  test("amsJoinSize with disjoint keys reports exact 0 and NULL rel_err") {
    val a = (1 to 5).map(v => KA(v.toLong))
    val b = (11 to 15).map(v => KB(v.toLong))
    val r = Profiling.amsJoinSize(df(a), col("k"), df(b), col("k")).head
    assert(r.getLong(0) === 0L && r.isNullAt(2))
  }

  // ---- LSH cost plan ---------------------------------------------------------------

  test("lshCostPlan matches the hand-banded simhash buckets") {
    val rnd = new scala.util.Random(1627)
    val docs = (0L until 80L).map(i =>
      GrowDoc(i, (0 until 12).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")))
    val sigs = TextOps.simHash(df(docs), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TextOps.lshCostPlan(df(docs), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (band <- 0 to 3) {
      val buckets = sigs.values.groupBy(s => (s >> (band * 16)) & 0xFFFF)
        .view.mapValues(_.size.toLong).toMap
      val pairs = buckets.values.map(c => c * (c - 1) / 2).sum
      assert(got(band.toLong) ===
        ((80L, buckets.size.toLong, pairs, buckets.values.max)), s"band $band")
    }
  }

  // ---- weighted median ---------------------------------------------------------


  test("weightedMedian picks the exact half-weight boundary value") {
    val rows = Seq(
      // g1: values 1(w3), 2(w1), 10(w2): tot=6, cum at v=1 is 3 → 2*3>=6 → median 1
      WRow("g1", 1, 3), WRow("g1", 2, 1), WRow("g1", 10, 2),
      // g2: heavy tail dominates: 1(w1), 100(w9) → median 100
      WRow("g2", 1, 1), WRow("g2", 100, 9),
      // g3: duplicate values collapse: 5 appears twice w=2 each, 7 w=3 → tot 7, cum(5)=4 → 8>=7 → 5
      WRow("g3", 5, 2), WRow("g3", 5, 2), WRow("g3", 7, 3))
    val got = Profiling.weightedMedian(df(rows), "g", col("v"), col("w"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("g1") === ((1L, 6L)))
    assert(got("g2") === ((100L, 10L)))
    assert(got("g3") === ((5L, 7L)))
  }

  test("weightedMedian with unit weights equals the lower median") {
    val rnd = new scala.util.Random(1621)
    val rows = (1 to 201).map(_ => WRow("u", rnd.nextInt(1000).toLong, 1L))
    val got = Profiling.weightedMedian(df(rows), "g", col("v"), col("w")).head
    val sorted = rows.map(_.v).sorted
    assert(got.getLong(1) === sorted(100)) // odd n: the true median
  }

  // ---- k-anonymity -------------------------------------------------------------


  test("kAnonymity counts re-identifiable rows and minimum l-diversity") {
    val rows =
      Seq.fill(10)(QiRow("a", "x", 1L)) ++            // big group, l=1
      Seq(QiRow("a", "y", 1L), QiRow("a", "y", 2L)) ++ // size 2 < 3, l=2
      Seq(QiRow("b", "x", 3L))                          // size 1 < 3, l=1
    val r = Profiling.kAnonymity(df(rows), Seq("qa", "qb"), col("s"), 3).head
    assert(r.getLong(0) === 3L)     // k
    assert(r.getLong(1) === 3L)     // n_groups
    assert(r.getLong(2) === 13L)    // n_rows
    assert(r.getLong(3) === 3L)     // rows_below_k
    assert(r.getLong(4) === 2L)     // groups_below_k
    assert(r.getLong(5) === 1L)     // min_group_size
    assert(r.getLong(6) === 1L)     // min_l_diversity
    assert(math.abs(r.getDouble(7) - 3.0 / 13) < 1e-9)
  }

  // ---- int8 retrieval recall ----------------------------------------------------

  test("int8Recall matches a plain-Scala two-ranking referee") {
    val dim = 8
    val rnd = new scala.util.Random(1619)
    val rows = (0L until 30L).map(i =>
      VecRow(i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val k = 5
    val got = VectorOps.int8Recall(df(rows), "vec_id", "embedding", k, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def quant(v: Seq[Float]): (Double, Seq[Long]) = {
      val s = v.map(x => math.abs(x.toDouble)).max
      (s, v.map(x => if (s > 0) math.floor(x.toDouble * 127.0 / s + 0.5).toLong else 0L))
    }
    for (p <- rows.take(6)) {
      val others = rows.filter(_.vec_id != p.vec_id)
      def fdot(a: Seq[Float], b: Seq[Float]) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val topF = others.sortBy(c => (-fdot(p.embedding, c.embedding), c.vec_id))
        .take(k).map(_.vec_id).toSet
      val (ps, pq) = quant(p.embedding)
      val topQ = others.sortBy { c =>
        val (cs, cq) = quant(c.embedding)
        (-(ps * cs * pq.zip(cq).map { case (a, b) => a * b }.sum / 16129.0), c.vec_id)
      }.take(k).map(_.vec_id).toSet
      assert(got(p.vec_id) === (topF & topQ).size.toLong, s"probe ${p.vec_id}")
    }
  }

  test("spanCorrupt round-trip: splicing target spans back restores the doc") {
    val docs = (100L until 140L).map(i =>
      GrowDoc(i, (0 to 30).map(j => s"w$j").mkString(" ")))
    val rows = TextOps.spanCorrupt(df(docs), "doc_id", "text").collect()
    val sentinel = "<extra_id_\\d+>".r
    for (r <- rows) {
      val spans = sentinel.split(r.getString(2)).map(_.trim).filter(_.nonEmpty)
      var i = 0
      val rebuilt = r.getString(1).split("\\s+").filter(_.nonEmpty).flatMap { t =>
        if (sentinel.pattern.matcher(t).matches()) {
          val s = spans(i).split("\\s+"); i += 1; s
        } else Array(t)
      }.mkString(" ")
      assert(rebuilt === docs.find(_.doc_id == r.getLong(0)).get.text)
      assert(i === spans.length) // every span consumed exactly once
    }
  }
}
