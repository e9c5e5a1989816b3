package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariance laws for the round-18 operators — each is a property the
  * STATISTIC must satisfy by construction, checked on synthetic corpora
  * (the Round16b/17 convention). Dyadic scalings and integer
  * translations keep the transformed inputs exactly representable, so
  * the laws hold bit-for-bit, not merely approximately.
  */
class Round18PropertySpec extends SparkSpec {

  private def gvs: Seq[R18bGv] = (1 to 60).map { i =>
    R18bGv(s"g${i % 4}", ((i * i) % 23).toDouble)
  }

  private def uvs: Seq[R18bUv] = (1L to 40L).map { i =>
    R18bUv(i % 10, ((i * 3) % 13).toDouble)
  }

  test("anovaF's F and eta-squared are exactly affine-invariant") {
    // x -> 2x + 16: both SSB and SSW scale by 4, so F and eta cancel it
    val base = Profiling.anovaF(df(gvs), "g", col("v")).head()
    val affine = Profiling.anovaF(
      df(gvs.map(r => r.copy(v = r.v * 2.0 + 16.0))), "g", col("v")).head()
    assert(affine.getDouble(6) === base.getDouble(6), "F is affine-invariant")
    assert(affine.getDouble(7) === base.getDouble(7), "eta² too")
    // rounding does not commute with the a² scaling, so the SSB check is
    // a tolerance, not bit-equality
    assert(math.abs(affine.getDouble(2) - base.getDouble(2) * 4.0) < 2e-6,
      "SSB scales by a²")
  }

  test("brownForsythe's W is exactly scale-equivariant in the deviations") {
    // x -> 2x: medians and |dev| double, W (a ratio of dev moments) holds
    val base = Profiling.brownForsythe(df(gvs), "g", col("v"))
      .orderBy("g").collect()
    val scaled = Profiling.brownForsythe(
      df(gvs.map(r => r.copy(v = r.v * 2.0))), "g", col("v"))
      .orderBy("g").collect()
    base.zip(scaled).foreach { case (b, s) =>
      assert(s.getDouble(2) === b.getDouble(2) * 2.0, "median doubles")
      assert(s.getDouble(4) === b.getDouble(4), "W is scale-invariant")
    }
  }

  test("mdePower: Cohen's d is affine-invariant; the MDE scales with the data") {
    val base = EventOps.mdePower(df(uvs), "u",
      u => pmod(u, lit(2L)) === 0, col("v")).head()
    val scaled = EventOps.mdePower(df(uvs.map(r => r.copy(v = r.v * 2.0))), "u",
      u => pmod(u, lit(2L)) === 0, col("v")).head()
    assert(scaled.getDouble(4) === base.getDouble(4),
      "d is standardized — dyadic scaling must not move it")
    assert(math.abs(scaled.getDouble(6) - base.getDouble(6) * 2.0) < 2e-6,
      "the absolute MDE doubles with the metric (up to the 6-dp round)")
    assert(scaled.getDouble(7) === base.getDouble(7),
      "the relative MDE cancels the scale bit-for-bit")
  }

  test("theilIndex is exactly scale-invariant (the defining inequality property)") {
    // x -> 2x: every ratio x/mu is unchanged, so all three Theil columns
    // hold bit-for-bit while means and shares stay consistent
    val base = Profiling.theilIndex(df(gvs.map(r => r.copy(v = r.v + 1.0))),
      "g", col("v")).orderBy("g").collect()
    val scaled = Profiling.theilIndex(
      df(gvs.map(r => r.copy(v = (r.v + 1.0) * 2.0))), "g", col("v"))
      .orderBy("g").collect()
    base.zip(scaled).foreach { case (b, s) =>
      assert(s.getDouble(3) === b.getDouble(3), "shares are scale-free")
      assert(s.getDouble(4) === b.getDouble(4), "T_within")
      assert(s.getDouble(5) === b.getDouble(5), "T_between")
      assert(s.getDouble(6) === b.getDouble(6), "T_total")
    }
  }

  test("hhiConcentration is exactly scale-invariant") {
    val base = Profiling.hhiConcentration(df(gvs.map(r => r.copy(v = r.v + 1.0))),
      "g", col("v")).head()
    val scaled = Profiling.hhiConcentration(
      df(gvs.map(r => r.copy(v = (r.v + 1.0) * 4.0))), "g", col("v")).head()
    assert(scaled.getDouble(1) === base.getDouble(1) &&
      scaled.getDouble(2) === base.getDouble(2),
      "shares cancel any common weight scale")
  }

  test("cliffsDelta is exactly invariant under a monotone (dyadic affine) transform") {
    val rows = (1 to 40).map(i =>
      R18gSv("g", i % 3 == 0, ((i * 7) % 19).toDouble))
    val base = Profiling.cliffsDelta(df(rows), "g", col("in1"), col("v")).head()
    val mono = Profiling.cliffsDelta(
      df(rows.map(r => r.copy(v = r.v * 8.0 + 3.0))), "g", col("in1"), col("v")).head()
    assert(mono.getLong(3) === base.getLong(3) && mono.getLong(4) === base.getLong(4),
      "pair orientations only depend on order")
    assert(mono.getDouble(6) === base.getDouble(6) && mono.getDouble(7) === base.getDouble(7))
  }

  test("dunnPosthoc is exactly invariant under a monotone transform (it's rank-based)") {
    val base = Profiling.dunnPosthoc(df(gvs), "g", col("v"), 1.0)
      .orderBy("g_a", "g_b").collect()
    val mono = Profiling.dunnPosthoc(
      df(gvs.map(r => r.copy(v = r.v * 4.0 + 1.0))), "g", col("v"), 1.0)
      .orderBy("g_a", "g_b").collect()
    base.zip(mono).foreach { case (b, m) =>
      assert(m.getDouble(4) === b.getDouble(4) && m.getDouble(5) === b.getDouble(5),
        "mean ranks see only the order")
      assert((m.isNullAt(6) && b.isNullAt(6)) || m.getDouble(6) === b.getDouble(6))
    }
  }

  test("covariateBalance: SMD is exactly invariant under dyadic covariate scaling") {
    def ts(day: Int, h: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")
    val rows = (1L to 30L).map(i =>
      R18fEv(i % 6, ts((i % 5 + 1).toInt, (i % 4).toInt), ((i * i) % 11).toDouble))
    def run(scale: Double) = EventOps.covariateBalance(
      df(rows.map(r => r.copy(value = r.value * scale))), "user_id",
      u => pmod(u, lit(2L)) === 0,
      Seq("total_value" ->
        sum(col("value").cast("decimal(28,6)")).cast("double"))).head()
    val (b, s) = (run(1.0), run(4.0))
    assert(s.getDouble(5) === b.getDouble(5), "standardization cancels the units")
    assert((s.isNullAt(6) && b.isNullAt(6)) || s.getBoolean(6) === b.getBoolean(6))
  }

  test("secondMomentDrift's cosine is exactly invariant under a common dyadic scale") {
    val rows = (0L to 19L).map(i =>
      Vec(i, Array.tabulate(8)(j => (((i + j) % 5) - 2).toFloat)))
    val isA = pmod(col("vec_id"), lit(2L)) === 0
    val base = VectorOps.secondMomentDrift(df(rows), isA, "embedding").head()
    val scaled = VectorOps.secondMomentDrift(
      df(rows.map(v => v.copy(embedding = v.embedding.map(_ * 2f)))),
      isA, "embedding").head()
    assert(scaled.getDouble(5) === base.getDouble(5),
      "the moment cosine is scale-free")
    assert(math.abs(scaled.getDouble(2) - base.getDouble(2) * 4.0) < 1e-8,
      "the Frobenius norms scale by the squared factor (up to snapping)")
  }

  test("cochranQ is invariant under treatment relabeling") {
    val rows = (1L to 30L).flatMap { u =>
      Seq.tabulate((u % 3).toInt + 1)(t => R18gUt(u, s"t$t"))
    }
    val base = EventOps.cochranQ(df(rows), "user_id", "event_type").head()
    val relab = EventOps.cochranQ(
      df(rows.map(r => r.copy(event_type = "zz_" + r.event_type))),
      "user_id", "event_type").head()
    assert(relab.getDouble(3) === base.getDouble(3),
      "Q sees only the engagement pattern, not the names")
  }
}
