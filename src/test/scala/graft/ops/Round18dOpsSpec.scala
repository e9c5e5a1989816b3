package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class R18hDoc(doc_id: Long, source: String)

/** Hand-exact fixtures for the round-18d representation audits: the
  * covariance participation ratio, linear CKA vs the JL projection,
  * the second-moment drift, and the source centroid-similarity map.
  */
class Round18dOpsSpec extends SparkSpec {

  private def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue + 0.0

  // ── participation ratio ────────────────────────────────────────────

  test("participationRatio: an isotropic cloud uses every dimension") {
    // (±1,0),(0,±1): zero means, cov = diag(.5,.5) -> trace 1,
    // frob² = .25+.25 = .5, PR = 1/.5 = 2 = d
    val rows = Seq(
      Vec(1, Array(1f, 0f)), Vec(2, Array(-1f, 0f)),
      Vec(3, Array(0f, 1f)), Vec(4, Array(0f, -1f)))
    val out = VectorOps.participationRatio(df(rows), "vec_id", "embedding").head()
    assert(out.getLong(0) === 2L)
    assert(out.getDouble(1) === 1.0 && out.getDouble(2) === 0.5)
    assert(out.getDouble(3) === 2.0, "PR = d on an isotropic cloud")
    assert(out.getDouble(4) === 1.0)
  }

  test("participationRatio: a rank-1 cloud collapses to PR = 1") {
    // multiples of (1,1): cov = [[2.5,2.5],[2.5,2.5]], trace 5,
    // frob² = 4·6.25 = 25, PR = 25/25 = 1
    val rows = Seq(
      Vec(1, Array(1f, 1f)), Vec(2, Array(-1f, -1f)),
      Vec(3, Array(2f, 2f)), Vec(4, Array(-2f, -2f)))
    val out = VectorOps.participationRatio(df(rows), "vec_id", "embedding").head()
    assert(out.getDouble(1) === 5.0)
    assert(out.getDouble(2) === 25.0)
    assert(out.getDouble(3) === 1.0, "one direction carries all the variance")
    assert(out.getDouble(4) === 0.5)
  }

  // ── linear CKA ─────────────────────────────────────────────────────

  private def mkVec(id: Long, scale: Float): Vec =
    Vec(id, Array.tabulate(64)(i => scale * (1f + (i % 3))))

  test("linearCka: a rank-1 corpus projects with CKA = 1") {
    // every vector a multiple of one base direction: X and Y = XR share
    // the identical (rank-1) correlation structure, so CKA = 1 up to
    // the 6-dp entry rounding
    val rows = Seq(mkVec(1, 1f), mkVec(2, 2f), mkVec(3, 3f), mkVec(4, -1f))
    val out = VectorOps.linearCka(df(rows), "embedding", dim = 64, k = 16).head()
    assert(out.getLong(0) === 4L)
    assert(out.getLong(1) === 64L && out.getLong(2) === 16L)
    val cka = out.getDouble(6)
    assert(math.abs(cka - 1.0) < 1e-3,
      s"rank-1 structure must survive any linear projection (got $cka)")
  }

  test("linearCka: invariant under a global sign flip of the corpus") {
    val rows = Seq(
      Vec(1, Array.tabulate(64)(i => (i % 5).toFloat)),
      Vec(2, Array.tabulate(64)(i => ((i + 2) % 7).toFloat)),
      Vec(3, Array.tabulate(64)(i => ((i * 3) % 11).toFloat)),
      Vec(4, Array.tabulate(64)(i => 1f - (i % 2))))
    val flipped = rows.map(v => v.copy(embedding = v.embedding.map(-_)))
    val a = VectorOps.linearCka(df(rows), "embedding", dim = 64, k = 16).head()
    val b = VectorOps.linearCka(df(flipped), "embedding", dim = 64, k = 16).head()
    assert(a.getDouble(6) === b.getDouble(6), "covariances are sign-blind")
    assert(a.getDouble(6) > 0.0 && a.getDouble(6) <= 1.0)
    assert(a.getDouble(3) === b.getDouble(3), "cross-Frobenius too")
  }

  test("secondMomentDrift: catches a variance expansion the mean drift cannot see") {
    // A = {(1,0),(-1,0)}, B = {(2,0),(-2,0)}: both centroids are the
    // origin (embeddingDrift reads 0 distance), but S_A = diag(1,0) vs
    // S_B = diag(4,0) -> Frobenius distance exactly 3, same direction
    val rows = Seq(
      Vec(2, Array(1f, 0f)), Vec(4, Array(-1f, 0f)),
      Vec(1, Array(2f, 0f)), Vec(3, Array(-2f, 0f)))
    val isA = pmod(col("vec_id"), lit(2L)) === 0
    val mean = VectorOps.embeddingDrift(df(rows), isA, "embedding").head()
    assert(mean.getDouble(3) === 0.0, "centroids agree — mean drift is blind here")
    val out = VectorOps.secondMomentDrift(df(rows), isA, "embedding").head()
    assert(out.getLong(0) === 2L && out.getLong(1) === 2L)
    assert(out.getDouble(2) === 1.0 && out.getDouble(3) === 4.0)
    assert(out.getDouble(4) === 3.0, "||diag(1,0) - diag(4,0)||_F = 3")
    assert(out.getDouble(5) === 1.0, "same moment direction, different scale")
  }

  test("secondMomentDrift: identical cohorts sit at distance 0, cosine 1") {
    val rows = Seq(
      Vec(2, Array(1f, 2f)), Vec(4, Array(3f, -1f)),
      Vec(1, Array(1f, 2f)), Vec(3, Array(3f, -1f)))
    val out = VectorOps.secondMomentDrift(df(rows),
      pmod(col("vec_id"), lit(2L)) === 0, "embedding").head()
    assert(out.getDouble(4) === 0.0 && out.getDouble(5) === 1.0)
  }

  test("sourceCentroidSimilarity: hand-placed centroids") {
    // source a: (1,0),(3,0) -> centroid (2,0); b: (0,2) -> (0,2);
    // c: (4,0),(4,0) -> (4,0). cos(a,b)=0, l2(a,b)=sqrt(8);
    // cos(a,c)=1 (same direction), l2(a,c)=2
    val emb = Seq(
      Vec(1, Array(1f, 0f)), Vec(2, Array(3f, 0f)),
      Vec(3, Array(0f, 2f)),
      Vec(4, Array(4f, 0f)), Vec(5, Array(4f, 0f)))
    val docs = Seq(R18hDoc(1, "a"), R18hDoc(2, "a"), R18hDoc(3, "b"),
      R18hDoc(4, "c"), R18hDoc(5, "c"))
    val out = VectorOps.sourceCentroidSimilarity(df(emb), df(docs),
      "vec_id", "embedding", "doc_id", "source")
      .orderBy("g_a", "g_b").collect()
    assert(out.length === 3)
    val byPair = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = byPair(("a", "b"))
    assert(ab.getLong(2) === 2L && ab.getLong(3) === 1L)
    assert(ab.getDouble(4) === 0.0, "orthogonal centroids")
    assert(ab.getDouble(5) === r9(math.sqrt(8.0)))
    val ac = byPair(("a", "c"))
    assert(ac.getDouble(4) === 1.0, "same direction, different norm")
    assert(ac.getDouble(5) === 2.0)
    val bc = byPair(("b", "c"))
    assert(bc.getDouble(4) === 0.0)
  }

  test("linearCka and participationRatio: empty input") {
    val empty = df(Seq.empty[Vec])
    val pr = VectorOps.participationRatio(empty, "vec_id", "embedding").head()
    assert(pr.getLong(0) === 0L && pr.isNullAt(3))
    val ck = VectorOps.linearCka(empty, "embedding", dim = 64, k = 16).head()
    assert(ck.isNullAt(6))
  }
}
