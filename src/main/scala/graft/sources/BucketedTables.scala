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
}
