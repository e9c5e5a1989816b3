package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once persisted per-document token-count table — the
  * tokenize-once-at-ingest artifact of a text pipeline (the ShingleStore
  * lifecycle applied to unigram term frequencies).
  *
  * At 100 TB every tf/idf-family query that re-tokenizes the corpus pays
  * the explode + hash-aggregate again; the (doc_id, token, tf) rollup is
  * the table a production pipeline materializes once when documents land
  * (it is also strictly smaller than the corpus for any non-trivial
  * document length). Committed `_SUCCESS` marker, ensure-once per
  * session, same contract as [[ShingleStore.ensureShingles]].
  *
  * The recipe is EXACTLY `TextOps.tokens` (\s+ split, empties dropped)
  * counted per (doc_id, token) — any consumer's oracle keeps using the
  * text-derived SQL because the sets are identical by construction.
  */
object TokenStore {

  private val ensured = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]

  /** Test-only: forget the ensure so a spec can exercise the build path. */
  private[graft] def forgetForTest(spark: SparkSession, sfDir: String): Unit =
    ensured.remove((spark.sparkContext.applicationId, tokenPath(spark, sfDir)))

  def tokenPath(spark: SparkSession, sfDir: String): String = {
    val abs = java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"graft_tokens_v1_$dirHash").toString
  }

  /** Ensure the token-count table of `sfDir`'s `documents` exists and
    * return it. Columns: (doc_id, token, tf).
    */
  def ensureTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val loc = tokenPath(spark, sfDir)
    ensured.getOrElseUpdate((spark.sparkContext.applicationId, loc), {
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) {
        if (fs.exists(p)) fs.delete(p, true)
        import org.apache.spark.sql.functions._
        graft.Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
          .write.mode("overwrite").parquet(loc)
      }
    })
    spark.read.parquet(loc)
  }
}
