package graft.sources

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** The persisted token-count artifact (r16b — the tokenize-once-at-ingest
  * lifecycle): write-once semantics, exact recipe parity with the direct
  * TextOps.tokens derivation, and the tf-idf consumers producing
  * identical results over either path.
  */
class TokenStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ensureTokens writes once and reuses the committed layout") {
    val path = new org.apache.hadoop.fs.Path(
      TokenStore.tokenPath(spark, sfDir)).toUri.getPath
    val first = TokenStore.ensureTokens(spark, sfDir)
    assert(first.count() > 0)
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val stamp = success.lastModified()
    val second = TokenStore.ensureTokens(spark, sfDir)
    assert(second.count() === first.count())
    assert(success.lastModified() === stamp,
      "second ensureTokens call must not rewrite the committed artifact")
  }

  test("artifact content equals the direct tokens() term-frequency rollup") {
    val art = TokenStore.ensureTokens(spark, sfDir)
    assert(art.columns.toSeq === Seq("doc_id", "token", "tf"))
    val direct = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    assert(art.except(direct).count() === 0 && direct.except(art).count() === 0)
  }

  test("tf-idf consumers produce identical results over either path") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val art = TokenStore.ensureTokens(spark, sfDir)
      .select(col("doc_id"), col("token"), col("tf").as("_cnt"))
    val n = docs.select("doc_id").distinct().agg(count(lit(1)).as("_n"))
    val viaArtifact = TextOps.tfIdfTopTermsFromCounts(art, n, "doc_id", 5)
    val viaText = TextOps.tfIdfTopTerms(docs, "doc_id", "text", 5)
    assert(viaArtifact.except(viaText).count() === 0 &&
      viaText.except(viaArtifact).count() === 0)
    val simArtifact = TextOps.tfidfCosineTopKFromCounts(art, n, "doc_id",
      col("doc_id") < 10, 3, 500)
    val simText = TextOps.tfidfCosineTopK(docs, "doc_id", "text",
      col("doc_id") < 10, 3, 500)
    assert(simArtifact.except(simText).count() === 0 &&
      simText.except(simArtifact).count() === 0)
  }
}
