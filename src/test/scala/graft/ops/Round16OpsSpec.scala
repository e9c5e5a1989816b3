package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class CohortVal(source: String, train: Boolean, v: Double)
case class KmvRow(lang: String, token: String)
case class GrowDoc(doc_id: Long, text: String)

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
