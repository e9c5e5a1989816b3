package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV ingestion with malformed-row capture: PERMISSIVE parsing plus a
  * `_corrupt_record` column holding the raw line for any row that failed
  * the schema, so bad input is quarantined instead of silently nulled —
  * the ingestion-side complement of the reference's post-hoc quality
  * checks (etl.py:166-175). At 100 TB: corrupt rows are a tiny filtered
  * branch of the same single scan, written to a quarantine sink.
  */
object CsvQuality {

  val CorruptCol = "_corrupt_record"

  /** Read with the given schema, capturing unparseable lines. */
  def readWithCorruptCapture(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .csv(path)

  /** The quarantine branch: raw lines that failed the schema. */
  def corruptRows(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNotNull).select(CorruptCol)

  /** The clean branch, with the capture column dropped. */
  def cleanRows(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNull).drop(CorruptCol)
}
