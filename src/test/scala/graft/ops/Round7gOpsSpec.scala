package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Edge7g(a: Long, b: Long)
case class Doc7g(id: Long, text: String)
case class Wt7g(id: Long, grp: String, w: Double)
case class Vec7g(id: Long, v: Array[Float])
case class Dim7g(did: Long, text: String)
case class Kv7g(k: Long, v: Long)

/** Round-7 batch-7 operators: triangle counting, token entropy, weighted
  * sampling, matryoshka truncation.
  */
class Round7gOpsSpec extends SparkSpec {

  // ── triangleCounts ──────────────────────────────────────────────────

  test("triangleCounts: K4 — every node on 3 triangles") {
    // complete graph on {1,2,3,4}: C(4,3) = 4 triangles, each node on 3
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield Edge7g(a, b)
    val out = Graph.triangleCounts(df(k4.toSeq), "a", "b")
      .orderBy("node_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("triangleCounts: triangle-free graphs emit nothing") {
    // path 1-2-3-4 and star 10-{11,12,13}: wedges everywhere, no closures
    val pathStar = Seq(Edge7g(1, 2), Edge7g(2, 3), Edge7g(3, 4),
      Edge7g(10, 11), Edge7g(10, 12), Edge7g(10, 13))
    assert(Graph.triangleCounts(df(pathStar), "a", "b").count() === 0)
  }

  test("triangleCounts: hub sharing one triangle counts it once") {
    // hub 1 connected to 2..6; extra edge (2,3) closes exactly one
    // triangle {1,2,3}; the hub's high degree must not multiply it
    val hub = (2L to 6L).map(Edge7g(1, _)) :+ Edge7g(2, 3)
    val out = Graph.triangleCounts(df(hub), "a", "b")
      .orderBy("node_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("triangleCounts: ids beyond 2^32 fall back off the packed closing key") {
    // the packed (v << 32 | w) closing key is injective only for ids in
    // [0, 2^32); wide ids must take the two-column fallback and count
    // identically — K4 shifted by 2^33
    val base = 1L << 33
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield Edge7g(base + a, base + b)
    val out = Graph.triangleCounts(df(k4.toSeq), "a", "b")
      .orderBy("node_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === (1L to 4L).map(i => (base + i, 3L)))
  }

  // ── tokenEntropy ────────────────────────────────────────────────────

  test("tokenEntropy: uniform, constant, and skewed distributions") {
    val docs = Seq(
      Doc7g(1, "a b c"),       // uniform over 3 → ln 3
      Doc7g(2, "a a a a"),     // constant → 0
      Doc7g(3, "a a b b"),     // uniform over 2 → ln 2
      Doc7g(4, "a a a b"))     // skewed: ln 4 − (3 ln 3)/4
    val out = TextOps.tokenEntropy(df(docs), "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1L, 3L, 3L), (2L, 4L, 1L), (3L, 4L, 2L), (4L, 4L, 2L)))
    val expected = Seq(math.log(3), 0.0, math.log(2),
      math.log(4) - 3 * math.log(3) / 4)
    out.map(_._4).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"entropy $got vs $want")
    }
  }

  test("tokenEntropy: token-less documents emit no row") {
    val out = TextOps.tokenEntropy(df(Seq(Doc7g(1, "  "), Doc7g(2, "x"))), "id", "text")
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  // ── weightedSample ──────────────────────────────────────────────────

  private val wtRows = (1L to 30L).map(i =>
    Wt7g(i, if (i % 2 == 0) "even" else "odd", 1.0 + (i % 5)))

  test("weightedSample: exactly k per stratum, ranks 1..k, priorities sorted") {
    val out = Relational.weightedSample(df(wtRows), "id", "grp", "w", 5)
      .orderBy("grp", "sample_rank").collect()
    assert(out.length === 10)
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).toSeq === (1 to 5))
      val ps = rows.map(_.getDouble(4))
      assert(ps.zip(ps.tail).forall { case (x, y) => x <= y })
      assert(ps.forall(_ > 0))
    }
  }

  test("weightedSample: k >= stratum size keeps every row") {
    val out = Relational.weightedSample(df(wtRows), "id", "grp", "w", 100)
    assert(out.count() === 30)
  }

  test("weightedSample: an overwhelming weight wins its stratum") {
    // w = 1e12 drives priority −ln(u)/w to ~0 — rank 1 regardless of u
    val rows = wtRows :+ Wt7g(999, "even", 1e12)
    val top = Relational.weightedSample(df(rows), "id", "grp", "w", 1)
      .where(col("grp") === "even").select("id").head().getLong(0)
    assert(top === 999L)
  }

  test("weightedSample: deterministic across partitionings") {
    val a = Relational.weightedSample(df(wtRows), "id", "grp", "w", 5)
      .select("grp", "sample_rank", "id").orderBy("grp", "sample_rank").collect().toSeq
    val b = Relational.weightedSample(df(wtRows).repartition(7), "id", "grp", "w", 5)
      .select("grp", "sample_rank", "id").orderBy("grp", "sample_rank").collect().toSeq
    assert(a === b)
  }

  // ── jaccardPrefixJoin ───────────────────────────────────────────────

  test("jaccardPrefixJoin: agrees exactly with the unpruned shared-shingle join") {
    // near-dup twins (1,2) and (5,6), plus dissimilar docs sharing the
    // hot shingle "the common phrase" that fans out the naive join
    val docs = Seq(
      Doc7g(1, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc7g(2, "alpha beta gamma delta epsilon zeta eta iota"),
      Doc7g(3, "the common phrase one two three four five six"),
      Doc7g(4, "the common phrase six five four three two one"),
      Doc7g(5, "red orange yellow green blue indigo violet"),
      Doc7g(6, "red orange yellow green blue indigo purple"),
      Doc7g(7, "completely different text with nothing shared at all"))
    val pruned = TextOps.jaccardPrefixJoin(df(docs), "id", "text", 3, 0.4)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = TextOps.ngramJaccardPairs(df(docs), "id", "text", 3)
      .where(col("jaccard") >= 0.4)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pruned.toSeq === brute.toSeq)
    assert(pruned.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L), (5L, 6L)))
  }

  test("jaccardPrefixJoin: threshold 1.0 finds exact-duplicate shingle sets only") {
    val docs = Seq(
      Doc7g(1, "a b c d e"), Doc7g(2, "a b c d e"),
      Doc7g(3, "a b c d f"))
    val out = TextOps.jaccardPrefixJoin(df(docs), "id", "text", 3, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  // ── incrementalJoinDelta ────────────────────────────────────────────

  test("incrementalJoinDelta: base join + increment equals the full recompute") {
    val l = (1L to 20L).map(i => Wt7g(i, s"k${i % 6}", i.toDouble))
    val r = (0L to 5L).map(i => Dim7g(i, s"k$i"))
    val (lB, lD) = (l.filter(_.id % 3 != 0), l.filter(_.id % 3 == 0))
    val (rB, rD) = (r.filter(_.did % 2 != 0), r.filter(_.did % 2 == 0))
    val lbDf = df(lB); val ldDf = df(lD); val rbDf = df(rB); val rdDf = df(rD)
    val assembled = lbDf.join(rbDf, col("grp") === col("text"))
      .unionByName(Relational.incrementalJoinDelta(lbDf, ldDf, rbDf, rdDf, "grp", "text"))
    val full = df(l).join(df(r), col("grp") === col("text"))
    assert(assembled.count() === full.count())
    assert(assembled.except(full).count() === 0)
    assert(full.except(assembled).count() === 0)
  }

  test("incrementalJoinDelta: empty deltas produce an empty increment") {
    val l = df(Seq(Wt7g(1, "a", 1.0))); val r = df(Seq(Dim7g(1, "a")))
    val out = Relational.incrementalJoinDelta(
      l, l.limit(0), r, r.limit(0), "grp", "text")
    assert(out.count() === 0)
  }

  // ── rrfFuse ─────────────────────────────────────────────────────────

  test("rrfFuse: both-list documents outrank single-list, ties break by id") {
    val la = df(Seq(Kv7g(10, 1), Kv7g(20, 2), Kv7g(30, 3)))
      .select(col("k").as("doc"), col("v").cast("int").as("rank"))
    val lb = df(Seq(Kv7g(20, 1), Kv7g(40, 2)))
      .select(col("k").as("doc"), col("v").cast("int").as("rank"))
    val out = Relational.rrfFuse(Seq(la, lb), "doc", 60, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // 20 is on both lists (1/61 + 1/62) — clear winner; then 10 (1/61),
    // 40 (1/62), 30 (1/63)
    assert(out.toSeq === Seq((1L, 20L, 2L), (2L, 10L, 1L), (3L, 40L, 1L), (4L, 30L, 1L)))
  }

  test("rrfFuse: fused score is the reciprocal-rank sum") {
    val la = df(Seq(Kv7g(1, 1))).select(col("k").as("doc"), col("v").cast("int").as("rank"))
    val lb = df(Seq(Kv7g(1, 3))).select(col("k").as("doc"), col("v").cast("int").as("rank"))
    val rrf = Relational.rrfFuse(Seq(la, lb), "doc", 60, 5)
      .head().getDouble(2)
    assert(math.abs(rrf - (1.0 / 61 + 1.0 / 63)) < 1e-9)
  }

  // ── countMinSketch ──────────────────────────────────────────────────

  private val cmDocs = (1L to 40L).map(i =>
    Doc7g(i, (1L to i).map(k => s"tok${k % 13}").mkString(" ")))

  test("countMinSketch: shard sketches merge by element-wise sum into the whole-corpus sketch") {
    val whole = TextOps.countMinSketch(df(cmDocs), "text", 4, 64)
    val sa = TextOps.countMinSketch(df(cmDocs.filter(_.id % 2 == 0)), "text", 4, 64)
    val sb = TextOps.countMinSketch(df(cmDocs.filter(_.id % 2 != 0)), "text", 4, 64)
    val merged = sa.unionByName(sb).groupBy("j", "bucket")
      .agg(sum("cnt").as("cnt"))
    val key = (r: org.apache.spark.sql.Row) => (r.getInt(0), r.getLong(1), r.getLong(2))
    assert(merged.orderBy("j", "bucket").collect().map(key).toSeq ===
      whole.orderBy("j", "bucket").collect().map(key).toSeq)
  }

  test("countMinSketch: every hash row partitions the full occurrence count") {
    val n = df(cmDocs).select(explode(split(col("text"), " "))).count()
    val perRow = TextOps.countMinSketch(df(cmDocs), "text", 4, 64)
      .groupBy("j").agg(sum("cnt").as("total")).collect()
    assert(perRow.length === 4)
    perRow.foreach(r => assert(r.getLong(1) === n))
  }

  test("countMinEstimate: never underestimates, and is exact sans collisions") {
    val sketch = TextOps.countMinSketch(df(cmDocs), "text", 4, 64)
    val truth = TextOps.wordCount(df(cmDocs), "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = TextOps.countMinEstimate(sketch, truth.keys.toSeq, 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t: est ${est(t)} < true $c")
    }
    // 13 tokens into 64 buckets × 4 independent rows: the min over rows
    // is exact for at least one token on this deterministic hash layout
    assert(truth.exists { case (t, c) => est(t) == c })
  }

  // ── matryoshka ──────────────────────────────────────────────────────

  test("matryoshka: 3-4-5 prefix renormalizes to 0.6 / 0.8") {
    // dims beyond the cut must not contribute to the norm
    val v = Vec7g(1, Array(3f, 4f, 100f, 100f))
    val out = VectorOps.matryoshka(df(Seq(v)), "id", "v", 2)
      .orderBy("dim").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 0.6), (2L, 0.8)))
  }

  test("matryoshka: truncated vectors have unit L2 norm") {
    val vecs = (1L to 20L).map(i =>
      Vec7g(i, Array.tabulate(16)(d => (1 + (i * 7 + d * 3) % 11).toFloat)))
    val out = VectorOps.matryoshka(df(vecs), "id", "v", 8)
      .groupBy("id").agg(sum(col("value") * col("value")).as("ss"))
      .collect().map(_.getDouble(1))
    assert(out.length === 20)
    // components are rounded to 6 dp on output, so ‖v‖² carries up to
    // ~2·Σ|x_d|·5e-7 ≈ 1e-5 of rounding slack
    out.foreach(ss => assert(math.abs(ss - 1.0) < 1e-4))
  }
}
