package graft.sources

import graft.SparkSpec
import graft.ops.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The second-moment artifact (r19, VERDICT r18 item 1): write-once
  * semantics, and — the load-bearing property — artifact ≡ recompute
  * BIT parity for every consumer it serves: covariance (C138),
  * participation ratio (C297), second-moment drift (C308), linear CKA
  * (C298), and the source-centroid similarity matrix (C309). Decimal
  * partial sums merge exactly, so the derived frames must equal the
  * direct corpus fans row for row, bit for bit — that is what lets the
  * five DuckDB oracles stay unchanged while the corpus is never
  * re-scanned per audit.
  */
class MomentStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def bitEqual(a: DataFrame, b: DataFrame, clue: String): Unit = {
    val as = a.collect().map(_.toString).sorted.toSeq
    val bs = b.collect().map(_.toString).sorted.toSeq
    withClue(s"$clue: ")(assert(as === bs))
  }

  test("store writes once, committed per table, and re-ensure does not rewrite") {
    val path = new org.apache.hadoop.fs.Path(
      MomentStore.storePath(spark, sfDir)).toUri.getPath
    val frames = MomentStore.ensure(spark, sfDir)
    val d = MomentStore.Dim + MomentStore.K
    assert(frames.cells.count() === d.toLong * (d + 1) / 2,
      "one row per upper-triangular (i,j) of the concatenated vector")
    assert(frames.dims.select("i").distinct().count() === d.toLong)
    val success = new java.io.File(s"$path/cells", "_SUCCESS")
    assert(success.exists())
    val stamp = success.lastModified()
    MomentStore.forgetForTest(spark, sfDir)
    MomentStore.ensure(spark, sfDir)
    assert(success.lastModified() === stamp,
      "re-ensuring must not rewrite the committed artifact")
  }

  test("covariance from the store equals the direct corpus fan, bit for bit") {
    val m = MomentStore.ensure(spark, sfDir)
    bitEqual(
      VectorOps.covarianceFromMoments(m.cells, m.dims, MomentStore.Dim),
      VectorOps.embeddingCovariance(emb, "vec_id", "embedding"),
      "covariance")
  }

  test("participation ratio from the store equals the direct recompute") {
    val m = MomentStore.ensure(spark, sfDir)
    bitEqual(
      VectorOps.participationRatioFromMoments(m.cells, m.dims, MomentStore.Dim),
      VectorOps.participationRatio(emb, "vec_id", "embedding"),
      "participation ratio")
  }

  test("second-moment drift from the store equals the direct cohort fan") {
    val m = MomentStore.ensure(spark, sfDir)
    bitEqual(
      VectorOps.secondMomentDriftFromMoments(m.cells, MomentStore.Dim),
      VectorOps.secondMomentDrift(emb,
        MomentStore.refCohort(col("vec_id")), "embedding"),
      "second-moment drift")
  }

  test("linear CKA from the store equals the direct [x‖y] fan") {
    val m = MomentStore.ensure(spark, sfDir)
    bitEqual(
      VectorOps.ckaFromMoments(m.cells, m.dims, MomentStore.Dim, MomentStore.K),
      VectorOps.linearCka(emb, "embedding", MomentStore.Dim, MomentStore.K),
      "linear CKA")
  }

  test("source-centroid similarity from the store equals the direct doc-join fan") {
    val m = MomentStore.ensure(spark, sfDir)
    bitEqual(
      VectorOps.sourceCentroidSimilarityFromMoments(m.dims, MomentStore.Dim),
      VectorOps.sourceCentroidSimilarity(emb, docs,
        "vec_id", "embedding", "doc_id", "source"),
      "source-centroid similarity")
  }
}
