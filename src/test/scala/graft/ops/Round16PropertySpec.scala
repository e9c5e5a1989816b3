package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mathematical properties of the round-16 operators — invariants that
  * hold for ALL inputs, checked on seeded random data (the
  * Round14PropertySpec convention): not "matches a fixture" but "has the
  * defining property of the statistic it claims to be".
  */
class Round16PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(1631)

  test("weighted median minimizes the weighted absolute deviation") {
    // the defining property: m = argmin_v Σ w·|x − v| (over observed values)
    val rows = (1 to 120).map(_ =>
      WRow("g", rnd.nextInt(50).toLong, 1L + rnd.nextInt(9)))
    val m = Profiling.weightedMedian(df(rows), "g", col("v"), col("w"))
      .head.getLong(1)
    def cost(c: Long) = rows.map(r => r.w * math.abs(r.v - c)).sum
    val best = rows.map(_.v).distinct.minBy(cost)
    assert(cost(m) === cost(best),
      s"median $m cost ${cost(m)} vs argmin $best cost ${cost(best)}")
  }

  test("kaplanMeier with NO censoring equals the empirical survivor function") {
    // when everyone churns, S(t) must be exactly P(lifetime > t)
    val lifetimes = (1 to 60).map(_ => rnd.nextInt(10))
    val rows = lifetimes.zipWithIndex.flatMap { case (life, u) =>
      Seq(TyEv(u.toLong, java.sql.Timestamp.valueOf("2024-04-01 00:00:00"), u * 2L, "x"),
        TyEv(u.toLong, java.sql.Timestamp.valueOf(f"2024-04-${1 + life}%02d 00:00:00"),
          u * 2L + 1, "x"))
    } ++ Seq( // one far-future sentinel user pushes gmax out so nobody censors
      TyEv(9999L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 99998L, "x"),
      TyEv(9999L, java.sql.Timestamp.valueOf("2024-06-30 00:00:00"), 99999L, "x"))
    val got = EventOps.kaplanMeier(df(rows), "user_id", "ts",
        censorDays = 1, unitDays = 1)
      .orderBy("life").collect()
    val n = lifetimes.size + 1 // sentinel included
    val all = lifetimes.map(_.toLong) :+ 29L
    // at every EVENT time (the sentinel's own censored row moves nothing,
    // but its longer lifetime keeps it in every at-risk set, so KM equals
    // the plain empirical survivor function there)
    for (r <- got if r.getLong(2) > 0) {
      val t = r.getLong(0)
      val survivors = all.count(_ > t).toDouble / n
      assert(math.abs(r.getDouble(4) - survivors) < 1e-6,
        s"S($t) = ${r.getDouble(4)} vs empirical $survivors")
    }
    // and the curve is non-increasing in t (holds censored or not)
    val s = got.map(_.getDouble(4))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("kmv smallest-k union is associative, commutative and idempotent") {
    // smallest-k(A ∪ B) = smallest-k(smallest-k(A) ∪ smallest-k(B)) — the
    // monoid law kmvMergeProof and the streaming KmvState rely on
    val rows = (1 to 400).map(_ => KmvRow(s"g${rnd.nextInt(2)}", s"t${rnd.nextInt(150)}"))
    val (a, b) = rows.splitAt(170)
    val k = 12
    def sk(xs: Seq[KmvRow]) =
      Profiling.kmvSmallestK(Profiling.kmvHashes(df(xs), "lang", col("token")), "lang", k)
    val direct = sk(rows).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val merged = Profiling.kmvSmallestK(sk(a).unionByName(sk(b)), "lang", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val swapped = Profiling.kmvSmallestK(sk(b).unionByName(sk(a)), "lang", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val idem = Profiling.kmvSmallestK(sk(rows).unionByName(sk(rows)), "lang", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged === direct && swapped === direct && idem === direct)
  }

  test("spanCorrupt conserves tokens and masks at ~1/mod rate") {
    val docs = (0L until 80L).map(i =>
      GrowDoc(i, (0 until 30 + rnd.nextInt(40)).map(j => s"t$j").mkString(" ")))
    val got = TextOps.spanCorrupt(df(docs), "doc_id", "text").collect()
    val sentinel = "<extra_id_\\d+>".r
    var masked = 0L; var total = 0L
    for (r <- got) {
      val corrTokens = r.getString(1).split("\\s+").filter(_.nonEmpty)
      val plainCorr = corrTokens.count(t => !sentinel.pattern.matcher(t).matches())
      // conservation: unmasked tokens in corrupted + masked count = doc tokens
      assert(plainCorr + r.getLong(3) === r.getLong(4), s"doc ${r.getLong(0)}")
      masked += r.getLong(3); total += r.getLong(4)
    }
    val rate = masked.toDouble / total
    assert(rate > 0.12 && rate < 0.28, s"mask rate $rate should be ~0.2")
  }

  test("seasonalDecompose reconstructs: value = trend + seasonal + residual") {
    val rows = (0 until 56).map { d =>
      DayVal("s", java.sql.Timestamp.valueOf(f"2024-01-${d % 28 + 1}%02d 0${d % 9}:00:00"),
        rnd.nextDouble() * 100 - 50)
    }
    val got = TimeSeries.seasonalDecompose(df(rows), "k", "ts", "v", 7).collect()
    for (r <- got if !r.isNullAt(3)) {
      val recon = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      assert(math.abs(recon - r.getDouble(2)) < 2e-6,
        s"day ${r.getDate(1)}: $recon vs ${r.getDouble(2)}")
    }
    // per-series seasonal components sum to ~0 over one period's phases
    val sea = got.filter(!_.isNullAt(4)).map(r =>
      (r.getDate(1).toLocalDate.toEpochDay % 7) -> r.getDouble(4)).toMap
    assert(math.abs(sea.values.sum) < 1e-6)
  }

  test("amsJoinSize is symmetric in its arguments") {
    val a = (1 to 200).map(_ => KA(rnd.nextInt(30).toLong))
    val b = (1 to 150).map(_ => KB(rnd.nextInt(40).toLong))
    val ab = Profiling.amsJoinSize(df(a), col("k"), df(b), col("k")).head
    val ba = Profiling.amsJoinSize(df(b), col("k"), df(a), col("k")).head
    assert(ab.getLong(0) === ba.getLong(0))
    assert(ab.getDouble(1) === ba.getDouble(1))
  }

  test("jl distortion concentrates around 1 (mean within the JL envelope)") {
    val dim = 32; val k = 16
    val rows = (0L until 24L).map(i =>
      VecRow(i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val d = VectorOps.jlDistortion(df(rows), "vec_id", "embedding", dim, k, 24)
      .agg(avg("distortion")).head.getDouble(0)
    // E[ratio] = 1, se of the mean over 276 pairs ≪ 0.2
    assert(math.abs(d - 1.0) < 0.2, s"mean distortion $d")
  }
}
