package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class ZcVal(grp: String, value: Double)
case class ZcEvt(user_id: Long, ts: Timestamp, event_id: Long)

/** Negative-zero canonicalization + zero-variance guard properties.
  *
  * The r12 `q_embed_cov` failure mode: DuckDB's `round` preserves `-0.0`
  * while Spark's emits `+0.0` — numerically equal, but one bit apart under
  * the driver's bit-sensitive hash compare. The class fix is TWO-sided:
  * the engine rounds signed outputs through [[Portable.pround]] (defensive
  * no-op — Spark already emits `+0.0`) and every signed oracle `round`
  * carries a trailing `+ 0` (the actual fix — IEEE `x + 0.0` maps
  * `-0.0 → +0.0` and is the identity elsewhere). This spec pins both
  * sides: the Spark bit pattern directly, and the oracle side textually
  * (every double-typed `round(` in `SparkEntry.oracleSql` must be followed
  * by ` + 0`), so a future oracle with a bare signed round fails here
  * before it can fail in the driver.
  */
class ZeroCanonSpec extends SparkSpec {

  private def bitsOf(c: org.apache.spark.sql.Column): Long = {
    val v = spark.range(1).select(c.as("v")).head.getDouble(0)
    java.lang.Double.doubleToRawLongBits(v)
  }

  test("Spark round and pround both emit +0.0 for round(-eps)") {
    val plusZero = java.lang.Double.doubleToRawLongBits(0.0d)
    assert(bitsOf(round(lit(-1e-9), 6)) === plusZero)
    assert(bitsOf(Portable.pround(lit(-1e-9), 6)) === plusZero)
    assert(bitsOf(Portable.canonZero(lit(-0.0d))) === plusZero)
    // identity elsewhere: sign and value preserved for a real negative
    assert(bitsOf(Portable.pround(lit(-1.5d), 6)) ===
      java.lang.Double.doubleToRawLongBits(-1.5d))
  }

  /** Scan an oracle SQL string for `round(` occurrences that need the
    * `+ 0` canonicalizer. Skipped contexts (cannot produce a double
    * `-0.0`): SQL comment lines, identifier-suffix matches, integer
    * comparisons (`< round(...)`), integer casts (`CAST(round(...) AS
    * BIGINT)`), and DECIMAL-typed rounds (`round(...)::DECIMAL...` —
    * decimals have no signed zero).
    */
  private def bareSignedRounds(sql: String): Seq[String] = {
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while ({ i = sql.indexOf("round(", i); i >= 0 }) {
      val lineStart = sql.lastIndexOf('\n', i) + 1
      val lineEnd = { val e = sql.indexOf('\n', i); if (e < 0) sql.length else e }
      val line = sql.substring(lineStart, lineEnd)
      val identPrefixed = i > 0 && (sql(i - 1).isLetterOrDigit || sql(i - 1) == '_')
      val comment = line.trim.startsWith("--")
      val compareCtx = sql.substring(math.max(0, i - 2), i) == "< "
      val castCtx = i >= 5 && sql.substring(i - 5, i) == "CAST("
      if (!identPrefixed && !comment && !compareCtx && !castCtx) {
        // match the round's closing paren
        var depth = 0; var k = i + 5; var close = -1
        while (k < sql.length && close < 0) {
          sql(k) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = k
            case _ =>
          }
          k += 1
        }
        assert(close > 0, s"unbalanced parens after round( in: $line")
        val after = sql.substring(close + 1, math.min(sql.length, close + 5))
        val decimalTyped = after.startsWith("::")
        if (!decimalTyped && !after.startsWith(" + 0"))
          bad += line.trim.take(100)
      }
      i += 6
    }
    bad.toSeq
  }

  test("every double-typed oracle round carries the + 0 canonicalizer") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => bareSignedRounds(sql).map(l => s"$name: $l")
    }
    assert(offenders.isEmpty,
      s"oracle rounds missing ' + 0':\n${offenders.mkString("\n")}")
  }

  // ── zero-variance guard paths (constant-valued group) ────────────────

  test("momentsProfile emits NULL skew/kurt for a constant-valued group") {
    val rows = Seq.tabulate(5)(i => ZcVal("const", 7.25)) ++
      Seq(ZcVal("var", 1.0), ZcVal("var", 2.0), ZcVal("var", 4.0))
    val out = Profiling.momentsProfile(df(rows), "grp", "value")
      .orderBy("grp").collect()
    val const = out(0)
    assert(const.getString(0) === "const")
    assert(const.getDouble(out.head.fieldIndex("stddev")) === 0.0)
    assert(const.isNullAt(const.fieldIndex("skewness")))
    assert(const.isNullAt(const.fieldIndex("kurtosis")))
    val varied = out(1)
    assert(!varied.isNullAt(varied.fieldIndex("skewness")))
    assert(!varied.isNullAt(varied.fieldIndex("kurtosis")))
  }

  test("burstiness emits NULL for the all-zero-gap group") {
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows =
      // user 1: three events at the SAME timestamp -> gaps all zero
      Seq.tabulate(3)(i => ZcEvt(1L, t0, i.toLong)) ++
      // user 2: distinct timestamps -> defined burstiness
      Seq.tabulate(3)(i => ZcEvt(2L, new Timestamp(t0.getTime + i * i * 1000L), i.toLong))
    val out = EventOps.burstiness(df(rows), "user_id", "ts", "event_id")
      .orderBy("user_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(0) === 1L)
    assert(out(0).isNullAt(out(0).fieldIndex("burstiness")))
    assert(out(1).getLong(0) === 2L)
    assert(!out(1).isNullAt(out(1).fieldIndex("burstiness")))
  }
}
