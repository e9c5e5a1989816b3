package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R18eDoc(source: String, text: String)

/** Hand-exact fixtures for the round-18e closers: post-hoc pairwise
  * Welch comparisons, Flesch–Kincaid readability, and HHI concentration.
  */
class Round18eOpsSpec extends SparkSpec {

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  private def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  // ── post-hoc pairwise ──────────────────────────────────────────────

  test("posthocPairwise: hand-exact Welch z and the Bonferroni flag") {
    // a = {1,3} (mean 2, var 2), b = {4,8} (mean 6, var 8):
    // se² = 2/2 + 8/2 = 5, z = -4/√5 ≈ -1.789
    val rows = Seq(R18cGv("a", 1.0), R18cGv("a", 3.0),
      R18cGv("b", 4.0), R18cGv("b", 8.0))
    val loose = Profiling.posthocPairwise(df(rows), "g", col("v"), zCrit = 1.0)
      .head()
    assert(loose.getString(0) === "a" && loose.getString(1) === "b")
    assert(loose.getDouble(4) === 2.0 && loose.getDouble(5) === 6.0)
    assert(loose.getDouble(6) === r6(-4.0 / math.sqrt(5.0)))
    assert(loose.getBoolean(7), "|z| = 1.79 clears a loose critical 1.0")
    val strict = Profiling.posthocPairwise(df(rows), "g", col("v"), zCrit = 3.651)
      .head()
    assert(!strict.getBoolean(7), "the Bonferroni literal kills the same pair")
  }

  test("posthocPairwise: three groups fan to three ordered pairs; " +
    "a one-row group NULLs its comparisons") {
    val rows = Seq(R18cGv("a", 1.0), R18cGv("a", 2.0),
      R18cGv("b", 3.0), R18cGv("b", 5.0), R18cGv("c", 9.0))
    val out = Profiling.posthocPairwise(df(rows), "g", col("v"), 1.0)
      .orderBy("g_a", "g_b").collect()
    assert(out.length === 3)
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(!out(0).isNullAt(6), "two proper groups compare")
    assert(out(1).isNullAt(6) && out(2).isNullAt(6),
      "a one-row group has no variance, so no z")
  }

  // ── readability ────────────────────────────────────────────────────

  test("readability: hand-counted grade on a two-sentence doc") {
    // "see the cat. it runs!" -> words 5, sentences 2,
    // syllables: ee, e, a, i, u = 5 vowel groups
    // grade = 0.39·(5/2) + 11.8·(5/5) − 15.59 = 0.975 + 11.8 − 15.59
    val rows = Seq(R18eDoc("s1", "see the cat. it runs!"))
    val out = TextOps.readability(df(rows), "source", col("text")).head()
    assert(out.getLong(1) === 1L && out.getLong(2) === 5L)
    assert(out.getDouble(3) === 2.5)
    assert(out.getDouble(4) === 1.0)
    assert(out.getDouble(5) === r6(0.39 * 2.5 + 11.8 * 1.0 - 15.59))
  }

  test("readability: sentence clamp, zero-word exclusion, per-source rows") {
    // no punctuation -> sentences clamp to 1; the empty doc drops
    val rows = Seq(R18eDoc("s1", "a bb ccc"), R18eDoc("s1", "   "),
      R18eDoc("s2", "go. stop! ok?"))
    val out = TextOps.readability(df(rows), "source", col("text"))
      .orderBy("source").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 1L, "whitespace-only doc has no words")
    assert(out(0).getDouble(3) === 3.0, "unpunctuated doc counts one sentence")
    assert(out(1).getDouble(3) === 1.0, "three sentences, three words")
  }

  // ── HHI ────────────────────────────────────────────────────────────

  test("hhiConcentration: uniform sources pin HHI = 1/k") {
    val rows = Seq(R18cGv("a", 5.0), R18cGv("b", 5.0),
      R18cGv("c", 5.0), R18cGv("d", 5.0))
    val out = Profiling.hhiConcentration(df(rows), "g", col("v")).head()
    assert(out.getLong(0) === 4L)
    assert(out.getDouble(1) === 0.25)
    assert(out.getDouble(2) === 4.0, "effective sources = k when uniform")
  }

  test("hhiConcentration: a dominant source collapses the effective count") {
    // shares .9/.05/.05: HHI = .81 + .0025 + .0025 = .815
    val rows = Seq(R18cGv("a", 90.0), R18cGv("b", 5.0), R18cGv("c", 5.0))
    val out = Profiling.hhiConcentration(df(rows), "g", col("v")).head()
    assert(out.getDouble(1) === 0.815)
    assert(out.getDouble(2) === r6(1.0 / 0.815),
      "one heavy domain ~ 1.2 effective sources")
  }
}
