package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R18Ev(user_id: Long, ts: java.sql.Timestamp, value: java.lang.Double,
                 event_type: String)
case class BhP(g: String, p: java.lang.Double)
case class R18Cell(s: String, expo: Boolean, hit: Boolean)
case class R18Doc(doc_id: Long, lang: String, text: String)
case class R18Gv(g: String, v: java.lang.Long)

/** Hand-exact fixtures for the round-18 operators: the e-process
  * anytime-valid monitor, the stratified permutation test, Kendall τ-b,
  * Kruskal–Wallis, Cochran–Armitage, Mantel–Haenszel, and the trigram
  * language identifier.
  */
class Round18OpsSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  // ── e-process ──────────────────────────────────────────────────────

  test("eProcess: walk, anytime-valid p, and a sticky rejection") {
    // p0=0.2, p1=0.8: per-hit increment ln4 = 1.386294361 (9dp), per-miss
    // ln(1/4) = -1.386294361; alpha=0.05 gate ln20 = 2.995732274.
    // day1: 2 hits -> log_e 2.772588722 (continue)
    // day2: 1 hit  -> log_e 4.158883083 (>= gate: reject)
    // day3: 3 misses -> log_e exactly 0, decision STAYS rejected (the
    //       running max never decreases), log_avp stays at -max
    val evs = Seq(
      R18Ev(1, ts(1), 1.0, "hit"), R18Ev(2, ts(1), 1.0, "hit"),
      R18Ev(3, ts(2), 1.0, "hit"),
      R18Ev(4, ts(3), 1.0, "miss"), R18Ev(5, ts(3), 1.0, "miss"),
      R18Ev(6, ts(3), 1.0, "miss"))
    val out = EventOps.eProcess(df(evs), "ts", col("event_type") === "hit",
      p0 = 0.2, p1 = 0.8, alpha = 0.05).orderBy("day").collect()
    assert(out.length === 3)
    assert(out(0).getDouble(3) === r6(2 * 1.386294361) &&
      out(0).getString(5) === "continue")
    assert(out(0).getDouble(4) === r6(-2 * 1.386294361), "avp = -max so far")
    assert(out(1).getDouble(3) === r6(3 * 1.386294361) &&
      out(1).getString(5) === "reject_h0")
    assert(out(2).getDouble(3) === 0.0, "three misses cancel three hits exactly")
    assert(out(2).getString(5) === "reject_h0", "rejection must be sticky")
    assert(out(2).getDouble(4) === r6(-3 * 1.386294361),
      "log_avp reads the running MAX, not the current walk")
  }

  test("eProcess: never accepts H0 and clamps log_avp at 0") {
    // all misses: walk only falls; log p stays clamped at 0 (p = 1)
    val evs = Seq(R18Ev(1, ts(1), 1.0, "miss"), R18Ev(2, ts(2), 1.0, "miss"))
    val out = EventOps.eProcess(df(evs), "ts", col("event_type") === "hit",
      p0 = 0.2, p1 = 0.8, alpha = 0.05).orderBy("day").collect()
    assert(out.forall(_.getString(5) === "continue"))
    assert(out.forall(_.getDouble(4) === 0.0),
      "a below-1 e-value is p = 1: log_avp clamps at 0")
  }

  // ── stratified permutation ─────────────────────────────────────────

  test("permutationTestStratified: within-stratum-constant values make every replica tie") {
    // two activity strata (1 event -> bin length 1; 2 events -> length 2),
    // unit totals CONSTANT within each stratum (10 and 50). A size-
    // preserving within-stratum permutation can never change either
    // cohort mean, so every replica reproduces d_obs exactly:
    // n_extreme = R and p = 1 — the defining invariant stratification
    // buys (an unstratified permutation mixes the strata and loses it).
    val evs = (1L to 6L).map(u => R18Ev(u, ts(5), 10.0, "e")) ++
      (11L to 16L).flatMap(u => Seq(R18Ev(u, ts(6), 25.0, "e"),
        R18Ev(u, ts(7), 25.0, "e")))
    val out = Profiling.permutationTestStratified(df(evs), "user_id",
      col("value"), replicas = 16).head()
    assert(out.getLong(0) === 12L, "n_units")
    assert(out.getLong(1) === 2L, "n_strata")
    assert(out.getLong(2) > 0 && out.getLong(3) > 0, "both cohorts nonempty")
    assert(out.getLong(5) === 16L, "every replica must tie d_obs")
    assert(out.getDouble(6) === 1.0, "p = (16+1)/(16+1)")
  }

  test("permutationTestStratified: replica labelings preserve per-stratum cohort sizes") {
    // direct check of the size-preservation mechanism on a spread of
    // values: the pooled diff varies by replica, but p stays a valid
    // add-one rational and the observed diff matches the plain C268
    // observed diff (same md5-even observed split)
    val evs = (1L to 20L).map(u => R18Ev(u, ts(5), u.toDouble, "e"))
    val strat = Profiling.permutationTestStratified(df(evs), "user_id",
      col("value"), replicas = 32).head()
    val plain = Profiling.permutationTest(df(evs), "user_id",
      col("value"), replicas = 32).head()
    assert(strat.getDouble(4) === plain.getDouble(3),
      "observed diff is the same statistic; only the null differs")
    val p = strat.getDouble(6)
    assert(p >= 1.0 / 33.0 - 1e-9 && p <= 1.0)
  }

  // ── Kendall τ-b ────────────────────────────────────────────────────

  test("kendallTau: hand-counted concordances with ties in one margin") {
    // daily (x=count, y=sum): d1 (1,10), d2 (2,5), d3 (2,7), d4 (3,1)
    // pairs: 12 D, 13 D, 14 D, 23 tie_x, 24 D, 34 D
    //  -> C=0, D=5, tx=1, ty=0, tau_b = -5/sqrt(5*6)
    val evs = Seq(
      R18Ev(1, ts(1), 10.0, "a"),
      R18Ev(2, ts(2), 2.0, "a"), R18Ev(3, ts(2), 3.0, "a"),
      R18Ev(4, ts(3), 3.0, "a"), R18Ev(5, ts(3), 4.0, "a"),
      R18Ev(6, ts(4), 0.5, "a"), R18Ev(7, ts(4), 0.25, "a"),
      R18Ev(8, ts(4), 0.25, "a"))
    val out = Profiling.kendallTau(df(evs), "event_type", "ts", col("value"))
      .head()
    assert(out.getLong(1) === 6L)
    assert(out.getLong(2) === 0L && out.getLong(3) === 5L)
    assert(out.getDouble(4) === r6(-5.0 / math.sqrt(30.0)))
  }

  test("kendallTau: perfect concordance and perfect discordance") {
    val up = Seq(R18Ev(1, ts(1), 1.0, "u"), R18Ev(2, ts(2), 2.0, "u"),
      R18Ev(3, ts(2), 2.0, "u"), R18Ev(4, ts(3), 9.0, "u"),
      R18Ev(5, ts(3), 9.0, "u"), R18Ev(6, ts(3), 9.0, "u"))
    val out = Profiling.kendallTau(df(up), "event_type", "ts", col("value")).head()
    // counts 1<2<3 and sums 1<4<27: all 3 pairs concordant, tau = 1
    assert(out.getLong(2) === 3L && out.getLong(3) === 0L)
    assert(out.getDouble(4) === 1.0)
  }

  // ── Kruskal–Wallis ─────────────────────────────────────────────────

  test("kruskalWallis: textbook two-group values, no ties") {
    // a = {1,2}, b = {3,4}: ranks 1..4, R_a=3, R_b=7
    // H = 12/20 * (9/2 + 49/2) - 15 = 2.4; no ties -> h_adj = h
    val rows = Seq(R18Gv("a", 1L), R18Gv("a", 2L), R18Gv("b", 3L), R18Gv("b", 4L))
    val out = Profiling.kruskalWallis(df(rows), "g", col("v")).head()
    assert(out.getLong(0) === 4L && out.getLong(1) === 2L && out.getLong(2) === 1L)
    assert(out.getDouble(3) === 2.4 && out.getDouble(4) === 2.4)
  }

  test("kruskalWallis: tie correction with a three-way tie") {
    // a = {1,1}, b = {1,2}: the three 1s midrank 2 -> R_a=4, R_b=6
    // H = 12/20 * (8 + 18) - 15 = 0.6; ties: t=3 -> C = 1 - 24/60 = 0.6
    // h_adj = 1.0
    val rows = Seq(R18Gv("a", 1L), R18Gv("a", 1L), R18Gv("b", 1L), R18Gv("b", 2L))
    val out = Profiling.kruskalWallis(df(rows), "g", col("v")).head()
    assert(out.getDouble(3) === 0.6)
    assert(out.getDouble(4) === 1.0)
  }

  test("kruskalWallis: one group or one row NULLs the statistic") {
    val one = Profiling.kruskalWallis(
      df(Seq(R18Gv("a", 1L), R18Gv("a", 2L))), "g", col("v")).head()
    assert(one.isNullAt(3) && one.isNullAt(4))
  }

  // ── Cochran–Armitage ───────────────────────────────────────────────

  test("cochranArmitage: hand-computed monotone trend") {
    // days 1..3 with (n,h) = (2,0), (2,1), (2,2): pbar = 1/2
    // T = 8 - 0.5*12 = 2; Var = 0.25*(28 - 144/6) = 1 -> z = 2
    val evs = Seq(
      R18Ev(1, ts(1), 1.0, "miss"), R18Ev(2, ts(1), 1.0, "miss"),
      R18Ev(3, ts(2), 1.0, "hit"), R18Ev(4, ts(2), 1.0, "miss"),
      R18Ev(5, ts(3), 1.0, "hit"), R18Ev(6, ts(3), 1.0, "hit"))
    val out = Profiling.cochranArmitage(df(evs), "ts",
      col("event_type") === "hit").head()
    assert(out.getLong(0) === 3L && out.getLong(1) === 6L && out.getLong(2) === 3L)
    assert(out.getDouble(3) === 2.0)
    assert(out.getDouble(4) === 2.0)
  }

  test("cochranArmitage: degenerate rates yield NULL z") {
    // all hits: pbar = 1 -> variance 0 -> NULL z, finite trend_stat
    val evs = Seq(R18Ev(1, ts(1), 1.0, "hit"), R18Ev(2, ts(2), 1.0, "hit"))
    val out = Profiling.cochranArmitage(df(evs), "ts",
      col("event_type") === "hit").head()
    assert(out.isNullAt(4))
    assert(out.getDouble(3) === 0.0)
  }

  // ── Mantel–Haenszel ────────────────────────────────────────────────

  test("mantelHaenszel: exact-decimal strata pool to OR = 0.5") {
    // s1: a=3 b=2 c=2 d=1 (n=8): ad/n = 0.375, bc/n = 0.5
    // s2: a=2 b=1 c=1 d=0 (n=4): ad/n = 0,     bc/n = 0.25
    // num = 0.375, den = 0.75 -> OR_MH = 0.5 (every term an exact decimal)
    def rows(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)(R18Cell(s, true, true)) ++ Seq.fill(b)(R18Cell(s, true, false)) ++
        Seq.fill(c)(R18Cell(s, false, true)) ++ Seq.fill(d)(R18Cell(s, false, false))
    val cells = rows("s1", 3, 2, 2, 1) ++ rows("s2", 2, 1, 1, 0)
    val out = Profiling.mantelHaenszel(df(cells), col("s"), col("expo"), col("hit"))
      .head()
    assert(out.getLong(0) === 2L && out.getLong(1) === 12L)
    assert(out.getDouble(2) === 0.375 && out.getDouble(3) === 0.75)
    assert(out.getDouble(4) === 0.5)
  }

  test("mantelHaenszel: a Simpson reversal pools to the within-stratum direction") {
    // within both strata exposure HELPS (OR > 1), but stratum sizes are
    // arranged so the MARGINAL table says exposure hurts — MH must read
    // the within-stratum truth (the C276 screen flags this shape; MH
    // fixes it)
    def rows(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)(R18Cell(s, true, true)) ++ Seq.fill(b)(R18Cell(s, true, false)) ++
        Seq.fill(c)(R18Cell(s, false, true)) ++ Seq.fill(d)(R18Cell(s, false, false))
    // s1 (exposure rare, outcome common): a=18 b=2 c=64 d=16: OR=2.25
    // s2 (exposure common, outcome rare): a=16 b=64 c=2 d=18: OR=2.25
    // marginal: a=34 b=66 c=66 d=34 -> OR ≈ 0.265 (reversed)
    val cells = rows("s1", 18, 2, 64, 16) ++ rows("s2", 16, 64, 2, 18)
    val out = Profiling.mantelHaenszel(df(cells), col("s"), col("expo"), col("hit"))
      .head()
    assert(out.getDouble(4) > 1.0, "MH must recover the within-stratum OR > 1")
    val marginal = Profiling.mantelHaenszel(df(cells), lit("all"),
      col("expo"), col("hit")).head()
    assert(marginal.getDouble(4) < 1.0, "the marginal table reverses")
  }

  // ── language ID ────────────────────────────────────────────────────

  test("langIdTrigram: distinct scripts classify perfectly; no-overlap docs report unknown") {
    val docs = Seq(
      R18Doc(0, "aa", "aaa bbb aaa bbb"),   // train
      R18Doc(2, "aa", "aab bba aab"),       // train
      R18Doc(1, "aa", "aaa bbb"),           // test -> aa
      R18Doc(4, "zz", "zzz yyy zzz yyy"),   // train
      R18Doc(3, "zz", "zzz yyy"),           // test -> zz
      R18Doc(5, "qq", "qqq www"))           // test, no qq profile -> unknown
    val out = TextOps.langIdTrigram(df(docs), "doc_id", "lang", "text", k = 16)
      .orderBy("lang", "predicted").collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("aa", "aa") -> 1L, ("qq", "unknown") -> 1L, ("zz", "zz") -> 1L))
  }

  // ── BH FDR ─────────────────────────────────────────────────────────

  test("bhAdjust: textbook step-up with a clean cut") {
    // p = .01 .02 .03 .2 .9, alpha = .1, m = 5: thresholds i/50 admit
    // ranks 1..3; raw m·p/i = .05 .05 .05 .25 .9 and the reversed
    // cumulative min leaves them unchanged
    val ps = Seq(BhP("g1", 0.01), BhP("g2", 0.02), BhP("g3", 0.03),
      BhP("g4", 0.2), BhP("g5", 0.9))
    val out = Profiling.bhAdjust(df(ps), "g", "p", alpha = 0.1)
      .orderBy("p_rank").collect()
    assert(out.map(_.getBoolean(4)).toSeq ===
      Seq(true, true, true, false, false))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.05, 0.05, 0.05, 0.25, 0.9))
  }

  test("bhAdjust: the step-up rescues a straggler below the cut rank") {
    // p = .02 .03 .04 .05 with alpha .2, m = 4: thresholds .05 .10 .15
    // .20 — EVERY rank passes because the largest passing rank is 4,
    // even though nothing but rank 1 would pass Bonferroni
    val ps = Seq(BhP("a", 0.02), BhP("b", 0.03), BhP("c", 0.04), BhP("d", 0.05))
    val out = Profiling.bhAdjust(df(ps), "g", "p", alpha = 0.2)
      .orderBy("p_rank").collect()
    assert(out.forall(_.getBoolean(4)), "step-up admits everything under the cut")
    // adjusted p is monotone nondecreasing in rank
    val adj = out.map(_.getDouble(3)).toSeq
    assert(adj === adj.sorted)
  }

  test("permutationTestPerGroup on one group equals the plain C268 test") {
    val evs = (1L to 15L).map(u => R18Ev(u, ts(5), u.toDouble * 1.5, "only"))
    val grouped = Profiling.permutationTestPerGroup(df(evs), "event_type",
      "user_id", col("value"), replicas = 16).head()
    val plain = Profiling.permutationTest(df(evs), "user_id",
      col("value"), replicas = 16).head()
    assert(grouped.getString(0) === "only")
    assert(grouped.getLong(1) === plain.getLong(0))
    assert(grouped.getDouble(2) === plain.getDouble(3), "same observed diff")
    assert(grouped.getDouble(3) === plain.getDouble(5), "same p")
  }

  // ── Cramér–von Mises ───────────────────────────────────────────────

  test("cvmDrift: identical distributions score zero; full separation hits the closed form") {
    // parity of each unit under the engine's md5 split, read through the
    // same Portable.hash32 the operator uses
    val ids = (1L to 40L)
    val parity = df(ids.map(u => R18Gv("x", u)))
      .select(col("v"), (pmod(Portable.hash32(col("v")), lit(2L)) === 0).as("a"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // all-equal values: the one catalog point has F = G = 1, stat = 0
    val flat = ids.map(u => R18Ev(u, ts(5), 7.0, "e"))
    val z = Profiling.cvmDrift(df(flat), "event_type", "user_id", col("value")).head()
    assert(z.getDouble(3) === 0.0)
    // full separation: cohort A all 0, cohort B all 1 ->
    // stat = n²m/(n+m)² at the catalog point v=0
    val sep = ids.map(u => R18Ev(u, ts(5), if (parity(u)) 0.0 else 1.0, "e"))
    val out = Profiling.cvmDrift(df(sep), "event_type", "user_id", col("value")).head()
    val n = out.getLong(1).toDouble; val m = out.getLong(2).toDouble
    assert(n > 0 && m > 0)
    assert(out.getDouble(3) === r6(n * n * m / ((n + m) * (n + m))))
  }

  // ── Friedman ───────────────────────────────────────────────────────

  test("friedman: a perfectly consistent ordering maxes Q, incomplete blocks drop") {
    // 4 complete days with per-day means a < b < c -> ranks 1,2,3 every
    // day: Q = 12/(4·3·4)·(16+64+144) − 3·4·4 = 8 = n(k−1), the maximum.
    // Day 5 has only 'a' (incomplete) and must not enter.
    val evs = (1 to 4).flatMap { d =>
      Seq(R18Ev(d * 10L, ts(d), 1.0, "a"),
          R18Ev(d * 10L + 1, ts(d), 2.0, "b"),
          R18Ev(d * 10L + 2, ts(d), 3.0, "c"))
    } :+ R18Ev(99L, ts(5), 9.0, "a")
    val out = Profiling.friedman(df(evs), "ts", "event_type", col("value")).head()
    assert(out.getLong(0) === 4L, "the incomplete day must be excluded")
    assert(out.getLong(1) === 3L && out.getLong(2) === 2L)
    assert(out.getDouble(3) === 8.0)
  }

  test("friedman: all-tied blocks have zero rank variance and NULL Q") {
    val evs = (1 to 3).flatMap { d =>
      Seq(R18Ev(d * 10L, ts(d), 5.0, "a"), R18Ev(d * 10L + 1, ts(d), 5.0, "b"))
    }
    val out = Profiling.friedman(df(evs), "ts", "event_type", col("value")).head()
    assert(out.isNullAt(3), "A = C when every block is fully tied")
  }

  // ── McNemar ────────────────────────────────────────────────────────

  test("mcnemar: only the discordant cells drive the statistic") {
    // u1 converts only pre, u2 and u3 only post, u4 both, u5 never
    // -> b=1, c=2, chi2 = 1/3; concordant cells don't move it
    val evs = Seq(
      R18Ev(1, ts(5), 1.0, "purchase"), R18Ev(1, ts(20), 1.0, "view"),
      R18Ev(2, ts(5), 1.0, "view"), R18Ev(2, ts(20), 1.0, "purchase"),
      R18Ev(3, ts(5), 1.0, "view"), R18Ev(3, ts(20), 1.0, "purchase"),
      R18Ev(4, ts(5), 1.0, "purchase"), R18Ev(4, ts(20), 1.0, "purchase"),
      R18Ev(5, ts(5), 1.0, "view"), R18Ev(5, ts(20), 1.0, "view"))
    val out = Profiling.mcnemar(df(evs), "user_id", "ts",
      col("event_type") === "purchase", splitDay = 16).head()
    assert(out.getLong(0) === 5L)
    assert(out.getLong(1) === 1L && out.getLong(2) === 1L &&
      out.getLong(3) === 2L && out.getLong(4) === 1L)
    assert(out.getDouble(5) === r6(1.0 / 3.0))
  }

  test("mcnemar: no discordance yields NULL chi2") {
    val evs = Seq(
      R18Ev(1, ts(5), 1.0, "purchase"), R18Ev(1, ts(20), 1.0, "purchase"),
      R18Ev(2, ts(5), 1.0, "view"), R18Ev(2, ts(20), 1.0, "view"))
    val out = Profiling.mcnemar(df(evs), "user_id", "ts",
      col("event_type") === "purchase", splitDay = 16).head()
    assert(out.isNullAt(5))
  }

  test("langIdTrigram: ties break to the lexicographically first language") {
    // the test doc's trigrams overlap BOTH profiles equally -> 'aa' wins
    val docs = Seq(
      R18Doc(0, "aa", "mmm nnn"),
      R18Doc(2, "bb", "mmm nnn"),
      R18Doc(1, "cc", "mmm nnn"))
    val out = TextOps.langIdTrigram(df(docs), "doc_id", "lang", "text", k = 4)
      .collect()
    assert(out.length === 1 &&
      out.head.getString(0) === "cc" && out.head.getString(1) === "aa")
  }
}
