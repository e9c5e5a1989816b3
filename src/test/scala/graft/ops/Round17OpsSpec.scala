package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R17Ev(user_id: Long, ts: java.sql.Timestamp, value: java.lang.Double)
case class R17Key(k: Long)

/** Hand-exact fixtures for the round-17 operators: CUPED variance
  * reduction, the md5-bucket χ² uniformity audit, and the Gumbel
  * block-maxima tail fit.
  */
class Round17OpsSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  test("cuped: a perfectly predictive covariate removes all variance") {
    // y = 2x exactly per unit -> theta = cov/var = 2, var_adj = 0,
    // reduction = 100%
    val evs = (1 to 4).flatMap { u =>
      Seq(R17Ev(u, ts(5), u.toDouble),        // pre (day < 16): x = u
          R17Ev(u, ts(20), 2.0 * u))          // post: y = 2u
    }
    val out = Profiling.cuped(df(evs), "user_id", "ts", col("value"), 16)
      .collect().head
    assert(out.getLong(0) === 4L)
    assert(out.getDouble(1) === 2.0, "theta")
    // var(y) over y=[2,4,6,8], population: mean 5, var = (9+1+1+9)/4 = 5
    assert(out.getDouble(2) === 5.0, "var_raw")
    assert(out.getDouble(3) === 0.0, "var_adj")
    assert(out.getDouble(4) === 100.0, "var_reduction_pct")
  }

  test("cuped: constant covariate NULLs theta and the adjustment, keeps var_raw") {
    val evs = (1 to 3).flatMap { u =>
      Seq(R17Ev(u, ts(5), 7.0),               // x = 7 for everyone
          R17Ev(u, ts(20), u.toDouble))       // y = 1, 2, 3
    }
    val out = Profiling.cuped(df(evs), "user_id", "ts", col("value"), 16)
      .collect().head
    assert(out.getLong(0) === 3L)
    assert(out.isNullAt(1) && out.isNullAt(3) && out.isNullAt(4))
    // var(y): mean 2, var = (1+0+1)/3
    assert(out.getDouble(2) === r6(2.0 / 3.0))
  }

  test("cuped: a unit missing one period contributes an exact zero to it") {
    // u1 has only pre, u2 only post — both still count as units
    val evs = Seq(R17Ev(1, ts(5), 4.0), R17Ev(2, ts(20), 4.0))
    val out = Profiling.cuped(df(evs), "user_id", "ts", col("value"), 16)
      .collect().head
    assert(out.getLong(0) === 2L)
    // x = [4, 0], y = [0, 4]: var_x = 4, cov = -4 -> theta = -1;
    // var_y = 4, var_adj = 4 - 16/4 = 0
    assert(out.getDouble(1) === -1.0)
    assert(out.getDouble(2) === 4.0 && out.getDouble(3) === 0.0)
  }

  test("hashUniformity: matches the driver-side recomputation, counts empty buckets") {
    val keys = (1L to 37L).map(R17Key)
    val out = Profiling.hashUniformity(df(keys), col("k"), buckets = 16,
      crit = 24.996).collect().head
    assert(out.getLong(0) === 37L)
    assert(out.getLong(1) === 16L)
    // referee: the same md5-prefix bucketing computed driver-side
    val counts = Array.fill(16)(0L)
    keys.foreach { k =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(k.k.toString).take(8), 16)
      counts((h % 16).toInt) += 1
    }
    assert(out.getLong(2) === counts.min, "min_bucket (37 keys in 16 buckets: empties possible)")
    assert(out.getLong(3) === counts.max)
    val num = counts.map(c => { val d = 16L * c - 37L; d * d }).sum
    assert(out.getDouble(4) === r6(num.toDouble / (16.0 * 37.0)))
    assert(!out.isNullAt(5))
  }

  test("hashUniformity: a planted non-uniform key population fails the gate") {
    // every key identical -> one bucket holds everything; chi2 = B - 1
    // per key... chi2 = (B-1)·n (maximal concentration)
    val keys = Seq.fill(100)(R17Key(42L))
    val out = Profiling.hashUniformity(df(keys), col("k"), buckets = 16,
      crit = 24.996).collect().head
    assert(out.getLong(0) === 100L)
    assert(out.getLong(2) === 0L && out.getLong(3) === 100L)
    assert(out.getDouble(4) === 1500.0, "chi2 = (B-1)·n at full concentration")
    assert(!out.getBoolean(5), "concentrated keys must fail the uniformity gate")
  }

  test("gumbelTail: moment fit matches hand math on two known daily maxima") {
    val evs = Seq(
      R17Ev(1, ts(1, 1), 3.0), R17Ev(2, ts(1, 2), 10.0), // day 1 max 10
      R17Ev(3, ts(2, 1), 20.0), R17Ev(4, ts(2, 2), 5.0)) // day 2 max 20
    val rows = Profiling.gumbelTail(df(evs), "ts", col("value"), Seq(10, 100))
      .orderBy("return_period").collect()
    assert(rows.length === 2)
    val mean = 15.0
    val sd = math.sqrt(50.0) // (100+400 - 2*225)/(2-1)
    val b9 = 0.779696801; val g9 = 0.577215664
    val beta = sd * b9
    val mu = mean - g9 * beta
    def c9(t: Int): Double = java.math.BigDecimal.valueOf(
      -math.log(-math.log(1.0 - 1.0 / t)))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    rows.zip(Seq(10, 100)).foreach { case (r, t) =>
      assert(r.getLong(0) === t.toLong)
      assert(r.getLong(1) === 2L, "n_blocks")
      assert(r.getDouble(2) === r6(mu))
      assert(r.getDouble(3) === r6(beta))
      assert(r.getDouble(4) === r6(mu + beta * c9(t)))
    }
    // monotone: a rarer event has a higher return level
    assert(rows(1).getDouble(4) > rows(0).getDouble(4))
  }

  test("gumbelTail: a single block yields NULL fit, never a throw") {
    val evs = Seq(R17Ev(1, ts(1), 5.0), R17Ev(2, ts(1, 3), 9.0))
    val rows = Profiling.gumbelTail(df(evs), "ts", col("value"), Seq(10))
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(1) === 1L)
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3) && rows.head.isNullAt(4))
  }

  private def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  test("jsDivergence: identical distributions at 0, disjoint at exactly ln 2") {
    val counts = Seq(
      R17Cnt("a", "w", 3L), R17Cnt("a", "v", 1L),
      R17Cnt("b", "w", 3L), R17Cnt("b", "v", 1L), // b identical to a
      R17Cnt("c", "z", 5L))                       // c disjoint from both
    val out = TextOps.jsDivergence(df(counts), "lab", "tok", "c")
      .orderBy("label_a", "label_b").collect()
    assert(out.length === 3) // (a,b) (a,c) (b,c)
    val ab = out(0)
    assert(ab.getDouble(4) === 0.0 && ab.getDouble(5) === 0.0,
      "identical distributions must sit at JSD 0")
    Seq(out(1), out(2)).foreach { r =>
      assert(r.getDouble(4) === r6(0.5 * (0.693147181 + 0.693147181)),
        "disjoint vocabularies must sit at exactly ln 2")
      assert(r.getDouble(5) === 1.0)
    }
  }

  test("jsDivergence: hand-exact asymmetric-support pair") {
    // A = {w:1} (n=1), B = {w:1, v:1} (n=2); shared token w only:
    // P/M = 2·1·2/(1·2 + 1·1) = 4/3, Q/M = 2·1·1/3 = 2/3
    val counts = Seq(R17Cnt("A", "w", 1L), R17Cnt("B", "w", 1L), R17Cnt("B", "v", 1L))
    val out = TextOps.jsDivergence(df(counts), "lab", "tok", "c").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(2) === 1L && r.getLong(3) === 2L)
    val ln2 = 0.693147181
    val expected = 0.5 * (
      1.0 * r9(math.log(4.0 / 3.0)) / 1.0 +
      1.0 * r9(math.log(2.0 / 3.0)) / 2.0 +
      (1.0 - 1.0 / 1.0) * ln2 +
      (1.0 - 1.0 / 2.0) * ln2)
    assert(r.getDouble(4) === r6(expected))
    assert(r.getDouble(5) === r6(expected / ln2))
  }

  test("permutationTest: constant metric gives p = 1, and the referee agrees") {
    // every unit's metric is 7 -> every mean difference is exactly 0,
    // all 64 replicas tie the observed split -> p = 65/65 = 1
    val evs = (1L to 20L).map(u => R17Ev(u, ts(5), 7.0))
    val out = Profiling.permutationTest(df(evs), "user_id", col("value"), 64)
      .collect().head
    assert(out.getLong(0) === 20L)
    assert(out.getDouble(3) === 0.0)
    assert(out.getLong(4) === 64L && out.getDouble(5) === 1.0)
  }

  test("jamesStein: hand-exact shrinkage on four balanced groups") {
    // groups i = 1..4, values {i-1, i+1}: means m_i = i exactly,
    // pooled SSE = 4 groups x 2·1² = 8 over n-k = 4 dof -> σ̂² = 2,
    // v̂ = σ̂²/n̄ = 1, m̄ = 2.5, S = 1.5²+0.5²+0.5²+1.5² = 5,
    // c = 1 - (k-3)·v̂/S = 0.8, shrunk_i = 2.5 + 0.8(i - 2.5)
    val vals = (1 to 4).flatMap(i => Seq(
      R17Cnt(s"g$i", "x", (i - 1).toLong), R17Cnt(s"g$i", "y", (i + 1).toLong)))
    val out = Profiling.jamesStein(df(vals), "lab", col("c"))
      .orderBy("lab").collect()
    assert(out.length === 4)
    out.zipWithIndex.foreach { case (r, i0) =>
      val i = i0 + 1
      assert(r.getLong(1) === 2L)
      assert(r.getDouble(2) === i.toDouble, "mean_raw")
      assert(r.getDouble(3) === 0.8, "shrink_c")
      assert(r.getDouble(4) === r6(2.5 + 0.8 * (i - 2.5)), "mean_shrunk")
    }
  }

  test("jamesStein: k <= 3 passes raw means with NULL shrinkage; equal means shrink fully") {
    val three = (1 to 3).flatMap(i => Seq(
      R17Cnt(s"g$i", "x", i.toLong), R17Cnt(s"g$i", "y", (i + 2).toLong)))
    val o3 = Profiling.jamesStein(df(three), "lab", col("c")).collect()
    assert(o3.length === 3 && o3.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    // identical group means -> S = 0 -> c = 0 exactly, full shrink to m̄
    val same = (1 to 4).flatMap(i => Seq(
      R17Cnt(s"g$i", "x", 4L), R17Cnt(s"g$i", "y", 6L)))
    val oS = Profiling.jamesStein(df(same), "lab", col("c")).collect()
    assert(oS.forall(r => r.getDouble(3) === 0.0 && r.getDouble(4) === 5.0))
  }

  test("conformalInterval: hand-exact quantile pick and held-out coverage") {
    // one user; calibration residuals {1,2,3,4} (days < 16), eval
    // residuals {2,5} (day 20). alpha = 0.5: idx = ceil(0.5·5) = 3 ->
    // q̂ = 3rd smallest = 3.0; coverage = 1/2
    val vs = Seq(0.0, 1.0, 3.0, 6.0, 10.0, 12.0, 17.0)
    val evs = vs.zipWithIndex.map { case (v, i) =>
      R17Ev2(1L, i.toLong, ts(if (i <= 4) 5 else 20), v)
    }
    val out = Profiling.conformalInterval(df(evs), "user_id", "event_id",
      "ts", col("value"), splitDay = 16, alpha = 0.5).collect().head
    assert(out.getLong(0) === 4L && out.getLong(1) === 2L)
    assert(out.getDouble(2) === 3.0, "q_hat")
    assert(out.getDouble(3) === 0.5, "coverage")
    assert(out.getDouble(4) === 0.5, "target")
  }

  test("conformalInterval: empty calibration yields NULL q_hat, never a throw") {
    val evs = Seq(R17Ev2(1L, 1L, ts(20), 1.0), R17Ev2(1L, 2L, ts(21), 5.0))
    val out = Profiling.conformalInterval(df(evs), "user_id", "event_id",
      "ts", col("value"), splitDay = 16, alpha = 0.1).collect().head
    assert(out.getLong(0) === 0L)
    assert(out.getLong(1) === 1L) // one eval residual (the lag pair)
    assert(out.isNullAt(2) && out.isNullAt(3))
  }

  test("chao1: hand-exact spectrum on four known frequencies") {
    // counts {1, 1, 2, 5}: V = 4, N = 9, N1 = 2, N2 = 1 ->
    // chao1 = 4 + 2·1/(2·2) = 4.5, coverage = 1 - 2/9
    val counts = Seq(R17Cnt("_", "a", 1L), R17Cnt("_", "b", 1L),
      R17Cnt("_", "c", 2L), R17Cnt("_", "d", 5L))
    val out = TextOps.chao1(df(counts), col("c")).collect().head
    assert(out.getLong(0) === 4L && out.getLong(1) === 9L)
    assert(out.getLong(2) === 2L && out.getLong(3) === 1L)
    assert(out.getDouble(4) === 4.5)
    assert(out.getDouble(5) === r6(1.0 - 2.0 / 9.0))
    // no singletons -> the estimator says the vocabulary is complete
    val full = Seq(R17Cnt("_", "a", 3L), R17Cnt("_", "b", 2L))
    val o2 = TextOps.chao1(df(full), col("c")).collect().head
    assert(o2.getDouble(4) === 2.0 && o2.getDouble(5) === 1.0)
  }

  test("bradleyTerry: matches a driver-side MM referee bit for bit") {
    // A beats B twice, B beats C twice, A and C split two games
    val comp = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("C", "A")).map { case (w, l) => R17Comp(w, l) }
    val out = Relational.bradleyTerry(df(comp), "winner", "loser", iters = 5)
      .orderBy("p").collect()
    assert(out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toSeq ===
      Seq("A" -> (3L, 1L), "B" -> (2L, 2L), "C" -> (1L, 3L)))
    // referee: the same MM recursion with decimal-12 partial sums
    def dec12(xs: Seq[Double]): Double =
      xs.map(java.math.BigDecimal.valueOf(_).setScale(12, java.math.RoundingMode.HALF_UP))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue
    val players = Seq("A", "B", "C")
    val m = Map(("A", "B") -> 2L, ("B", "A") -> 2L, ("B", "C") -> 2L,
      ("C", "B") -> 2L, ("A", "C") -> 2L, ("C", "A") -> 2L)
    val wins = Map("A" -> 3L, "B" -> 2L, "C" -> 1L)
    var pi = players.map(_ -> 1.0).toMap
    (1 to 5).foreach { _ =>
      val pi2 = players.map { i =>
        val den = dec12(players.filter(j => m.contains((i, j)))
          .map(j => m((i, j)).toDouble / (pi(i) + pi(j))))
        i -> wins(i).toDouble / den
      }.toMap
      val norm = dec12(players.map(pi2))
      pi = players.map(i => i -> pi2(i) / norm).toMap
    }
    out.foreach { r =>
      assert(r.getDouble(3) === r6(pi(r.getString(0))), s"strength of ${r.getString(0)}")
    }
    // more wins against the same field -> strictly higher strength
    assert(pi("A") > pi("B") && pi("B") > pi("C"))
  }

  test("clusterNmi: identical partitions at exactly 1, independent at exactly 0") {
    // identical 2-cluster labelings: MI = H = ln 2 -> NMI = 1
    val same = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .map { case (a, b) => R17Pair(a, b) }
    val o1 = Profiling.clusterNmi(df(same), col("a"), col("b")).collect().head
    assert(o1.getLong(0) === 4L)
    assert(o1.getDouble(4) === 1.0, "identical partitions must score NMI 1")
    // uniform independent 2x2 contingency: MI = ln4 - 2ln2 = 0 in IEEE too
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .map { case (a, b) => R17Pair(a, b) }
    val o2 = Profiling.clusterNmi(df(indep), col("a"), col("b")).collect().head
    assert(o2.getDouble(3) === 0.0, "independent labels must score MI 0")
    assert(o2.getDouble(4) === 0.0)
    // a single-cluster side has zero entropy: nothing to normalize by
    val degen = Seq(("x", "p"), ("x", "q")).map { case (a, b) => R17Pair(a, b) }
    val o3 = Profiling.clusterNmi(df(degen), col("a"), col("b")).collect().head
    assert(o3.getDouble(1) === 0.0 && o3.isNullAt(4))
  }

  test("hillTail: hand-exact index on a dyadic tail; all-tied top is NULL") {
    // values {8,4,2,1}, k=2: top = {8,4}, x_(3) = 2 ->
    // alpha = 2 / (r9(ln 4) + r9(ln 2))
    val vals = Seq(8L, 4L, 2L, 1L).map(v => R17Key(v))
    val out = Profiling.hillTail(df(vals), col("k"), k = 2).collect().head
    assert(out.getLong(0) === 4L && out.getLong(1) === 2L && out.getLong(2) === 2L)
    val expected = 2.0 / (r9(math.log(4.0)) + r9(math.log(2.0)))
    assert(out.getDouble(3) === r6(expected))
    // all-tied top: every ratio is 1, sum 0 -> NULL (not a divide error)
    val tied = Seq(4L, 4L, 4L).map(R17Key)
    val o2 = Profiling.hillTail(df(tied), col("k"), k = 2).collect().head
    assert(o2.getLong(2) === 4L && o2.isNullAt(3))
    // heavier tail -> smaller alpha (the diagnostic direction)
    val heavy = Seq(1000L, 100L, 10L, 1L).map(R17Key)
    val oH = Profiling.hillTail(df(heavy), col("k"), k = 2).collect().head
    assert(oH.getDouble(3) < out.getDouble(3))
  }

  test("jackknifeInfluence: hand-exact leave-one-out means; influences offset") {
    // g1 = {10, 20} (mean 15), g2 = {30} (mean 30): mean_all = 20;
    // loo(g1) = 30 -> influence -10; loo(g2) = 15 -> influence +5
    val rows = Seq(R17Cnt("g1", "a", 10L), R17Cnt("g1", "b", 20L),
      R17Cnt("g2", "c", 30L))
    val out = Profiling.jackknifeInfluence(df(rows), "lab", col("c"))
      .orderBy("lab").collect()
    assert(out.length === 2)
    assert(out(0).getDouble(3) === 15.0 && out(0).getDouble(4) === 20.0)
    assert(out(0).getDouble(5) === -10.0, "removing the light group raises the mean")
    assert(out(1).getDouble(5) === 5.0, "removing the heavy group lowers the mean")
    // one group = the whole corpus: nothing left out -> NULL influence
    val solo = Seq(R17Cnt("g1", "a", 10L))
    val oS = Profiling.jackknifeInfluence(df(solo), "lab", col("c")).collect().head
    assert(oS.isNullAt(5) && oS.getDouble(2) === 1.0)
  }

  test("simpsonsParadox: a planted reversal flags, aligned groups don't") {
    // A: (1,9),(2,8) and B: (8,12),(9,11) — slope −1 INSIDE each group,
    // but B sits higher on both axes so the pooled slope is positive
    val rows = Seq(("A", 1L, 9.0), ("A", 2L, 8.0), ("B", 8L, 12.0), ("B", 9L, 11.0))
      .map { case (g, x, y) => R17Xy(g, x, y) }
    val out = Profiling.simpsonsParadox(df(rows), "g", col("x"), col("y"))
      .orderBy("g").collect()
    out.foreach { r =>
      assert(r.getDouble(2) === -1.0, "within-group slope")
      assert(r.getDouble(3) > 0, "pooled slope reverses")
      assert(r.getBoolean(4), "the reversal must flag")
    }
    // aligned data: same slope everywhere -> no flag
    val aligned = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("B", 3L, 3.0), ("B", 4L, 4.0))
      .map { case (g, x, y) => R17Xy(g, x, y) }
    val o2 = Profiling.simpsonsParadox(df(aligned), "g", col("x"), col("y")).collect()
    assert(o2.forall(r => !r.getBoolean(4)))
    // a constant-x group NULLs its slope and never flags
    val degen = Seq(("A", 5L, 1.0), ("A", 5L, 2.0), ("B", 1L, 1.0), ("B", 2L, 2.0))
      .map { case (g, x, y) => R17Xy(g, x, y) }
    val o3 = Profiling.simpsonsParadox(df(degen), "g", col("x"), col("y"))
      .orderBy("g").collect()
    assert(o3.head.isNullAt(2) && o3.head.isNullAt(4))
  }

  test("sprt: hand-exact walk, boundary decisions, and first-crossing persistence") {
    // p0=0.2 vs p1=0.8: per-hit +ln4, per-miss −ln4 (9-dp rounded);
    // boundaries ±ln19 ≈ ±2.944. Day 1: 3/3 hits -> llr ≈ 4.159 crosses
    // H1. Day 2: 0/6 drives the walk below the H0 boundary — but the
    // monitor ALREADY stopped at H1, so the decision must persist.
    val evs = Seq.fill(3)(1).zipWithIndex.map { case (_, i) =>
      R17Hit(ts(1, i), "purchase")
    } ++ (0 until 6).map(i => R17Hit(ts(2, i), "view"))
    val out = EventOps.sprt(df(evs), "ts", col("et") === "purchase",
      0.2, 0.8, 0.05, 0.05).orderBy("day").collect()
    assert(out.length === 2)
    val a9 = r9(math.log(4.0))
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) === 3L)
    assert(out(0).getDouble(3) === r6(3 * a9))
    assert(out(0).getString(4) === "accept_h1")
    assert(out(1).getDouble(3) === r6(3 * a9 - 6 * a9))
    assert(out(1).getString(4) === "accept_h1",
      "a sequential monitor stops at the FIRST boundary; later data cannot flip it")
    // the symmetric all-miss stream accepts H0
    val misses = (0 until 3).map(i => R17Hit(ts(1, i), "view"))
    val o2 = EventOps.sprt(df(misses), "ts", col("et") === "purchase",
      0.2, 0.8, 0.05, 0.05).collect()
    assert(o2.head.getString(4) === "accept_h0")
  }

  test("permutationTest: matches a driver-side md5 referee bit for bit") {
    val evs = (1L to 30L).map(u => R17Ev(u, ts(5), (u * u % 13).toDouble))
    val out = Profiling.permutationTest(df(evs), "user_id", col("value"), 64)
      .collect().head
    // referee: same hashes, same fixed-shape arithmetic
    def h(s: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)
    val x = (1L to 30L).map(u => u -> (u * u % 13).toDouble).toMap
    def diff(flag: Long => Boolean): Double = {
      val (a, b) = x.keys.toSeq.partition(flag)
      a.map(x).sum / a.size - b.map(x).sum / b.size
    }
    val dObs = diff(u => h(u.toString) % 2 == 0)
    val extreme = (1 to 64).count { r =>
      math.abs(diff(u => h(s"$u#$r") % 2 == 0)) >= math.abs(dObs)
    }
    assert(out.getDouble(3) === r6(dObs))
    assert(out.getLong(4) === extreme.toLong)
    assert(out.getDouble(5) === r6((extreme + 1.0) / 65.0))
    assert(out.getDouble(5) > 0.0 && out.getDouble(5) <= 1.0)
  }
}

case class R17Cnt(lab: String, tok: String, c: Long)
case class R17Ev2(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                  value: java.lang.Double)
case class R17Comp(winner: String, loser: String)
case class R17Pair(a: String, b: String)
case class R17Xy(g: String, x: Long, y: Double)
case class R17Hit(ts: java.sql.Timestamp, et: String)
