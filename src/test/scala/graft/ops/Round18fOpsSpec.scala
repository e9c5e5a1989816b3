package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R18fDoc(doc_id: Long, text: String)
case class R18fEv(user_id: Long, ts: java.sql.Timestamp, value: java.lang.Double)

/** Hand-exact fixtures for the round-18f wave: the context-window
  * packing audit, rank-biased overlap of the projected ranking, and the
  * covariate-balance SMD table.
  */
class Round18fOpsSpec extends SparkSpec {

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  private def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  // ── packing audit ──────────────────────────────────────────────────

  private val packDocs = Seq(
    R18fDoc(1, "a b c"), R18fDoc(2, "a b c d"),
    R18fDoc(3, "a b"), R18fDoc(4, "a b c d e"))

  test("packingAudit: hand-laid stream at context 4") {
    // token counts 3,4,2,5 -> starts 0,3,7,9; total 14; cuts at 4,8,12:
    // doc1 spans win0 only; docs 2,3,4 each straddle one cut
    val out = TextOps.packingAudit(df(packDocs), "doc_id", col("text"),
      contexts = Seq(4)).head()
    assert(out.getLong(0) === 4L && out.getLong(1) === 4L)
    assert(out.getLong(2) === 14L && out.getLong(3) === 4L)
    assert(out.getLong(4) === 3L, "three documents straddle a cut")
    assert(out.getDouble(5) === 0.75)
    assert(out.getDouble(6) === 1.75, "(1+2+2+2) doc-window incidences / 4")
    assert(out.getLong(7) === 2L, "the last window holds 2 tokens of padding")
  }

  test("packingAudit: the two-phase prefix sum is bucket-invariant") {
    // bucketSize 2 splits the ids across three buckets; offsets must
    // reproduce the exact same global layout as one big bucket
    val one = TextOps.packingAudit(df(packDocs), "doc_id", col("text"),
      Seq(4, 8), bucketSize = 1024).orderBy("context").collect()
    val many = TextOps.packingAudit(df(packDocs), "doc_id", col("text"),
      Seq(4, 8), bucketSize = 2).orderBy("context").collect()
    assert(one.toSeq === many.toSeq,
      "bucketed prefix offsets must equal the single-bucket layout")
  }

  // ── RBO ────────────────────────────────────────────────────────────

  test("rboProjection: identical rankings saturate the truncated bound") {
    // identical vectors: every pairwise cosine is the SAME computed
    // value in both representations, so both rankings fall back to the
    // id tie-break and agree exactly; with 5 corpus ids per probe every
    // match sits at (d, d), so rbo_min = sum_{d<=5} tail(d)
    val rows = (0L to 5L).map(i =>
      Vec(i, Array.tabulate(64)(j => ((j % 3) + 1).toFloat)))
    val out = VectorOps.rboProjection(df(rows), "vec_id", "embedding",
      dim = 64, kProj = 16, probeLimit = 2, depth = 10)
      .orderBy("query_id").collect()
    assert(out.length === 2)
    val tails = VectorOps.rboTails(10)
    val expected = r9((0 until 5).map(tails).sum)
    out.foreach { r =>
      assert(r.getLong(1) === 5L, "all five corpus ids overlap")
      assert(r.getDouble(2) === expected)
    }
  }

  test("rboTails: the full-agreement sum telescopes to 1 - 2^-depth") {
    // sum_d tail(d) = sum_j 2^-j = 1 - 2^-D — the identity that makes
    // rbo_min = ~1 a meaningful "rankings agree" reading
    val tails = VectorOps.rboTails(10)
    assert(math.abs(tails.sum - (1.0 - math.pow(2.0, -10))) < 1e-9)
    assert(tails.zip(tails.tail).forall { case (a, b) => a > b },
      "tail weights decrease in the starting depth")
  }

  // ── covariate balance ──────────────────────────────────────────────

  test("covariateBalance: balanced, shifted, and degenerate covariates") {
    def ts(day: Int, h: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")
    // A = even units {2, 4}, B = odd {1, 3}; event counts 2/4 per side
    // (n_events SMD = 0); values give total_value means 5 vs 11 with
    // pooled var 34; active_days is 1 for every unit (pooled var 0)
    val rows =
      Seq.fill(2)(0).zipWithIndex.map { case (_, i) => R18fEv(2, ts(1, i), 1.0) } ++
        (0 until 4).map(i => R18fEv(4, ts(1, i), 2.0)) ++
        (0 until 2).map(i => R18fEv(1, ts(1, i), 3.0)) ++
        (0 until 4).map(i => R18fEv(3, ts(1, i), 4.0))
    val out = EventOps.covariateBalance(df(rows), "user_id",
      u => pmod(u, lit(2L)) === 0,
      Seq("n_events" -> count(lit(1)),
        "total_value" -> sum(col("value").cast("decimal(28,6)")).cast("double"),
        "active_days" -> countDistinct(to_date(col("ts")))))
      .orderBy("covariate").collect()
    assert(out.length === 3)
    val byName = out.map(r => r.getString(0) -> r).toMap
    val ne = byName("n_events")
    assert(ne.getDouble(3) === 3.0 && ne.getDouble(4) === 3.0)
    assert(ne.getDouble(5) === 0.0 && ne.getBoolean(6), "identical counts balance")
    val tv = byName("total_value")
    assert(tv.getDouble(3) === 5.0 && tv.getDouble(4) === 11.0)
    assert(tv.getDouble(5) === r6(-6.0 / math.sqrt(34.0)))
    assert(!tv.getBoolean(6), "a 1-sigma shift is nowhere near |SMD| < 0.1")
    val ad = byName("active_days")
    assert(ad.isNullAt(5) && ad.isNullAt(6),
      "zero pooled variance cannot standardize")
  }
}
