package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R18cGv(g: String, v: java.lang.Double)
case class R18cEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)
case class R18cSy(s: java.lang.Double, y: Boolean)

/** Hand-exact fixtures for the round-18c operators: the Theil
  * between/within decomposition, the Fano dispersion monitor, the
  * Brier/Murphy decomposition, and the decision-stump threshold
  * learner.
  */
class Round18cOpsSpec extends SparkSpec {

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  private def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  private def ts(day: Int, hour: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  // ── Theil index ────────────────────────────────────────────────────

  test("theilIndex: equal values give zero everywhere") {
    val rows = Seq(R18cGv("a", 4.0), R18cGv("a", 4.0),
      R18cGv("b", 4.0), R18cGv("b", 4.0))
    val out = Profiling.theilIndex(df(rows), "g", col("v"))
      .orderBy("g").collect()
    assert(out.forall(_.getDouble(4) === 0.0), "within: all ratios are 1")
    assert(out.forall(_.getDouble(5) === 0.0), "between: group means = grand")
    assert(out.forall(_.getDouble(6) === 0.0), "total")
  }

  test("theilIndex: pure between-group inequality, within stays zero") {
    // a = {1,1}, b = {3,3}: inside each group every ratio is 1 -> T_g=0;
    // T_total = T_between = (1/4)·[2·(1/2)ln(1/2) + 2·(3/2)ln(3/2)]
    // with 9-dp ln rounding on both terms
    val rows = Seq(R18cGv("a", 1.0), R18cGv("a", 1.0),
      R18cGv("b", 3.0), R18cGv("b", 3.0))
    val out = Profiling.theilIndex(df(rows), "g", col("v"))
      .orderBy("g").collect()
    assert(out.forall(_.getDouble(4) === 0.0), "within-group ratios are 1")
    val lnHalf = r9(math.log(0.5))
    val ln32 = r9(math.log(1.5))
    // total: Σ c·r·ln(r)/N over catalog {(a,1,c2),(b,3,c2)}:
    // r(1)=1·4/8=0.5, r(3)=3·4/8=1.5 -> (2·0.5·ln.5 + 2·1.5·ln1.5)/4
    val t = r6((2 * 0.5 * lnHalf + 2 * 1.5 * ln32) / 4.0)
    assert(out.forall(_.getDouble(6) === t))
    // between: share_a=2/8, share_b=6/8; ln args: (2·4)/(8·2)=0.5,
    // (6·4)/(8·2)=1.5 -> 0.25·ln.5 + 0.75·ln1.5
    val tb = r6(0.25 * lnHalf + 0.75 * ln32)
    assert(out.forall(_.getDouble(5) === tb))
    assert(tb === t, "with zero within, T_between IS T_total")
  }

  test("theilIndex: shares and means are exact; zeros are excluded") {
    val rows = Seq(R18cGv("a", 2.0), R18cGv("a", 0.0), R18cGv("b", 6.0))
    val out = Profiling.theilIndex(df(rows), "g", col("v"))
      .orderBy("g").collect()
    assert(out(0).getLong(1) === 1L, "the zero row is out of Theil's domain")
    assert(out(0).getDouble(2) === 2.0 && out(1).getDouble(2) === 6.0)
    assert(out(0).getDouble(3) === 0.25 && out(1).getDouble(3) === 0.75)
  }

  // ── Fano dispersion ────────────────────────────────────────────────

  test("fanoDispersion: Poisson-flat counts pin Fano near its floor") {
    // key a: 2 events/day over 3 days -> var 0, fano 0
    val rows = (1 to 3).flatMap(d0 => Seq(
      R18cEv(1, ts(d0, 1), "a"), R18cEv(2, ts(d0, 2), "a")))
    val out = TimeSeries.fanoDispersion(df(rows), "event_type", "ts", 5.0).head()
    assert(out.getLong(1) === 3L && out.getLong(2) === 6L)
    assert(out.getDouble(3) === 2.0)
    assert(out.getDouble(4) === 0.0 && !out.getBoolean(6))
  }

  test("fanoDispersion: a burst day overdisperses; quiet days count as zeros") {
    // key a: day1 6 events, day3 0 (dense grid!), day2 0 -> counts {6,0,0}
    // mean 2, var = (36 - 12)/2 = 12, fano 6, D = 12
    val rows = (1 to 6).map(i => R18cEv(i, ts(1, i), "a")) :+
      R18cEv(9, ts(3, 1), "b") // key b stretches the grid to day 3
    val out = TimeSeries.fanoDispersion(df(rows), "event_type", "ts", 5.0)
      .orderBy("event_type").collect()
    val a = out(0)
    assert(a.getLong(1) === 3L, "grid spans day1..day3 for every key")
    assert(a.getDouble(3) === 2.0)
    assert(a.getDouble(4) === 6.0, "fano = var/mean = 12/2")
    assert(a.getDouble(5) === 12.0 && a.getBoolean(6))
    val b = out(1)
    assert(b.getLong(2) === 1L && b.getDouble(4) === 1.0,
      "one event over {0,0,1}: mean 1/3, var 1/3, fano 1")
  }

  // ── Brier / Murphy ─────────────────────────────────────────────────

  test("brierDecomposition: hand-exact two-bin fixture and the identity") {
    // scores .1,.1 (bin1: y=0,0) and .9,.9 (bin9: y=1,0)
    // obar=.25; conf1=.1 acc1=0; conf9=.9 acc9=.5
    // REL = (2·.01 + 2·.16)/4 = .085
    // RES = (2·.0625 + 2·.0625)/4 = .0625
    // UNC = .25·.75 = .1875
    // binned = .085 - .0625 + .1875 = .21
    // raw = (.01+.01+.01+.81)/4 = .21 (scores constant in bin -> equal)
    val rows = Seq(R18cSy(0.1, false), R18cSy(0.1, false),
      R18cSy(0.9, true), R18cSy(0.9, false))
    val out = Profiling.brierDecomposition(df(rows), col("s"), col("y"), 10).head()
    assert(out.getLong(0) === 4L && out.getLong(1) === 1L)
    assert(out.getDouble(2) === 0.21)
    assert(out.getDouble(3) === 0.085)
    assert(out.getDouble(4) === 0.0625)
    assert(out.getDouble(5) === 0.1875)
    assert(out.getDouble(6) === 0.21, "Murphy identity, exact on binned scores")
  }

  test("brierDecomposition: a perfectly calibrated uninformative score") {
    // all scores = base rate .5, labels split: REL=0, RES=0, UNC=.25
    val rows = Seq(R18cSy(0.5, true), R18cSy(0.5, false))
    val out = Profiling.brierDecomposition(df(rows), col("s"), col("y"), 10).head()
    assert(out.getDouble(3) === 0.0 && out.getDouble(4) === 0.0)
    assert(out.getDouble(5) === 0.25 && out.getDouble(6) === 0.25)
    assert(out.getDouble(2) === 0.25)
  }

  // ── decision stump ─────────────────────────────────────────────────

  test("decisionStump: a clean split is found with full gain") {
    // v<=0.2 all negative (2), v>=0.8 all positive (2): perfect split
    // H_parent = ln2 (balanced), gain = ln2, threshold = 0.2
    val rows = Seq(R18cSy(0.1, false), R18cSy(0.2, false),
      R18cSy(0.8, true), R18cSy(0.9, true))
    val out = Profiling.decisionStump(df(rows), col("s"), col("y")).head()
    assert(out.getLong(0) === 4L && out.getLong(1) === 2L)
    assert(out.getDouble(2) === r6(math.log(2.0)))
    assert(out.getDouble(3) === 0.2, "the split keeps <= threshold left")
    assert(out.getLong(4) === 2L && out.getLong(5) === 0L)
    assert(out.getDouble(6) === r6(math.log(2.0)), "all entropy removed")
  }

  test("decisionStump: equal-gain ties break to the smallest threshold") {
    // alternating labels: splits at .1 and .3 tie on gain
    // (ln2 − (3/4)(ln3 − (2/3)ln2) each); the argmax picks .1
    val rows = Seq(R18cSy(0.1, true), R18cSy(0.2, false),
      R18cSy(0.3, true), R18cSy(0.4, false))
    val out = Profiling.decisionStump(df(rows), col("s"), col("y")).head()
    assert(out.getDouble(3) === 0.1)
    assert(out.getDouble(6) <= r6(math.log(2.0)) * 0.4,
      "an alternating label leaves most of the entropy in place")
  }
}
