package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located-join primitive for repeated
  * large×large joins at 100 TB. Writing both fact tables bucketed by the
  * join key (same bucket count) lets every subsequent join/aggregation on
  * that key run with ZERO shuffle — Spark reads matching buckets
  * pairwise. Bucketing metadata lives in the session catalog, so these
  * write through `saveAsTable` (hive-style layout under
  * spark.sql.warehouse.dir).
  */
object BucketedTables {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata applies automatically). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  private val ensured = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]

  /** Write-once bucketed copy of a test table: materializes
    * `sfDir/<table>.parquet` as a managed table bucketed on `bucketCols`
    * and returns its catalog name; subsequent calls in the same
    * SparkContext reuse it. This is the bucketing LIFECYCLE at 100 TB —
    * the fact table is written bucketed ONCE (by its producer), and every
    * downstream join/aggregation on the bucket key runs shuffle-free — so
    * the one-time write here plays the producer's role, and the queries
    * over it demonstrate the steady state.
    */
  def ensureBucketed(spark: SparkSession, sfDir: String, table: String,
                     bucketCols: Seq[String], numBuckets: Int,
                     selectCols: Seq[String]): String = {
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    val name = s"graft_bkt_${table}_$dirHash"
    ensured.getOrElseUpdate((spark.sparkContext.applicationId, name), {
      import org.apache.spark.sql.functions.col
      // The in-memory catalog is per-JVM but the warehouse directory is
      // not. A COMPLETE layout left by a previous process (committed
      // _SUCCESS marker) is the persisted artifact of the one-time
      // producer write — re-register the bucketed table over it instead
      // of rewriting (the IvfIndex lifecycle applied to table layout);
      // anything else at the location is a partial write: delete and
      // rebuild.
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val src = graft.Tables.load(spark, sfDir, table).select(selectCols.map(col): _*)
      if (fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS"))) {
        val keys = bucketCols.mkString(", ")
        spark.sql(
          s"""CREATE TABLE $name (${src.schema.toDDL}) USING PARQUET
             |CLUSTERED BY ($keys) SORTED BY ($keys) INTO $numBuckets BUCKETS
             |LOCATION '$loc'""".stripMargin)
      } else {
        if (fs.exists(loc)) fs.delete(loc, true)
        writeBucketed(src, name, bucketCols, numBuckets, sortCols = bucketCols)
      }
    })
    name
  }
}
