package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Vec(vec_id: Long, embedding: Array[Float])

class VectorOpsSpec extends SparkSpec {

  private val dim = 8
  private def unit(xs: Double*): Array[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat).toArray
  }

  private def vecs = df(Seq(
    Vec(0, unit(1, 0, 0, 0, 0, 0, 0, 0)),
    Vec(1, unit(0.99, 0.1, 0, 0, 0, 0, 0, 0)),  // near 0
    Vec(2, unit(0, 1, 0, 0, 0, 0, 0, 0)),       // orthogonal to 0
    Vec(3, unit(-1, 0, 0, 0, 0, 0, 0, 0)),      // opposite of 0
    Vec(4, unit(0.98, 0.15, 0.1, 0, 0, 0, 0, 0))))

  test("dot: sequential fold in double precision") {
    val r = VectorOps.selfDot(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(_.getDouble(1))
    r.foreach(d => assert(math.abs(d - 1.0) < 1e-6))      // unit vectors
  }

  test("cosineTopK ranks by similarity with deterministic ties") {
    val top = VectorOps.cosineTopK(vecs, vecs.where(col("vec_id") === 0), "vec_id", "embedding", 4)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("corpus_id")).toSeq === Seq(1L, 4L, 2L, 3L))
    assert(top.head.getAs[Double]("score") > 0.99)
    assert(top.last.getAs[Double]("score") < -0.99)
  }

  test("LSH top-k is a subset of brute-force candidates with exact scores") {
    val brute = VectorOps.cosineTopK(vecs, vecs.where(col("vec_id") === 0), "vec_id", "embedding", 4)
      .collect().map(r => r.getAs[Long]("corpus_id") -> r.getAs[Double]("score")).toMap
    val lsh = VectorOps.cosineTopKLsh(vecs, vecs.where(col("vec_id") === 0), "vec_id", "embedding",
      k = 4, bands = 2, planesPerBand = 2, dim = dim).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val id = r.getAs[Long]("corpus_id")
      assert(math.abs(brute(id) - r.getAs[Double]("score")) < 1e-12) // same exact re-score
    }
    // near-neighbors share sign patterns: vec 1 must be in vec 0's bucket
    assert(lsh.exists(_.getAs[Long]("corpus_id") == 1L))
  }

  test("native FloatDotProduct is bit-identical to the fold form") {
    val both = vecs.select(
      VectorOps.dot(col("embedding"), col("embedding")).as("fold"),
      VectorOps.dotNative(col("embedding"), col("embedding")).as("native"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native FloatDotProduct null semantics: null array, length mismatch") {
    val s = spark
    import s.implicits._
    val in = Seq(
      (1L, Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),   // 1*3 + 2*4 = 11
      (2L, None, Some(Seq(1f, 2f))),                 // null array
      (3L, Some(Seq(1f)), Some(Seq(1f, 2f))))        // length mismatch
      .toDF("id", "a", "b")
    val r = in.select(col("id"), VectorOps.dotNative(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) === 11.0)
    assert(r(1).isNullAt(1))
    assert(r(2).isNullAt(1))
  }

  test("fused CosineSimilarity is bit-identical to the composed form") {
    val pairs = vecs.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(vecs.select(col("embedding").as("b")))
    val both = pairs.select(
      (VectorOps.dot(col("a"), col("b")) /
        (sqrt(VectorOps.dot(col("a"), col("a"))) * sqrt(VectorOps.dot(col("b"), col("b"))))).as("composed"),
      VectorOps.cosineNative(col("a"), col("b")).as("fused"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native cosineTopK equals fold cosineTopK exactly") {
    val fold = VectorOps.cosineTopK(vecs, vecs.where(col("vec_id") < 2), "vec_id", "embedding", 3)
      .select("query_id", "corpus_id", "score", "rank").collect()
    val nat = VectorOps.cosineTopK(vecs, vecs.where(col("vec_id") < 2), "vec_id", "embedding", 3,
      nativeDot = true)
      .select("query_id", "corpus_id", "score", "rank").collect()
    assert(fold.map(_.toSeq).toSeq === nat.map(_.toSeq).toSeq)
  }

  test("quantizeInt8 round-trips within scale/254 per element") {
    val original = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val out = VectorOps.quantizeInt8(vecs, "vec_id", "embedding").collect()
    assert(out.length === original.size)
    out.foreach { r =>
      val (id, s, q) = (r.getLong(0), r.getDouble(1), r.getSeq[Byte](2))
      assert(q.forall(b => b >= -127 && b <= 127))
      original(id).zip(q).foreach { case (x, b) =>
        assert(math.abs(x.toDouble - b.toDouble * s / 127.0) <= s / 254.0 + 1e-9)
      }
    }
  }

  test("hyperplanes are deterministic across calls") {
    val a = VectorOps.hyperplanes(4, dim)
    val b = VectorOps.hyperplanes(4, dim)
    assert(a.flatten.toSeq === b.flatten.toSeq)
  }

  test("ivfAssign puts each vector in its nearest centroid cell") {
    val cents = spark.createDataFrame(Seq(
      (0L, unit(1, 0, 0, 0, 0, 0, 0, 0).toSeq),
      (1L, unit(0, 1, 0, 0, 0, 0, 0, 0).toSeq)))
      .toDF("centroid_id", "cvec")
    val cells = VectorOps.ivfAssign(vecs, "vec_id", "embedding", cents, "centroid_id", "cvec")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(cells(0) === 0L && cells(1) === 0L && cells(4) === 0L)
    assert(cells(2) === 1L)
  }
}
