package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution on a growing parquet table — the drift every 100 TB
  * ingest eventually faces: new batches gain columns old files lack.
  * Three contracts: (1) mergeSchema unions the schemas and back-fills
  * nulls for old files; (2) an EXPLICIT read schema (the production
  * pattern — cheaper than footer-merging every file and stable under
  * column renames elsewhere) projects both generations identically;
  * (3) column pruning still reaches the scan when only old columns are
  * selected, so the new column's existence costs nothing to readers that
  * ignore it.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def writeGenerations(): String = {
    val dir = Files.createTempDirectory("schema-evo").toFile.getAbsolutePath
    spark.range(0, 5).select(col("id"), (col("id") * 10).as("a"))
      .write.parquet(s"$dir/batch=1")
    spark.range(5, 8).select(col("id"), (col("id") * 10).as("a"),
        concat(lit("v"), col("id")).as("b"))
      .write.parquet(s"$dir/batch=2")
    dir
  }

  test("mergeSchema unions generations and null-fills the old files") {
    val dir = writeGenerations()
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.schema.fieldNames.sorted.toSeq === Seq("a", "b", "batch", "id"))
    assert(df.count() === 8)
    assert(df.where(col("b").isNull).count() === 5)  // generation-1 rows
    assert(df.where(col("b") === "v7").count() === 1)
  }

  test("explicit read schema projects both generations without footer merging") {
    val dir = writeGenerations()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("a", LongType),
      StructField("b", StringType)))
    val df = spark.read.schema(schema).parquet(dir)
    val rows = df.orderBy("id").collect()
    assert(rows.length === 8)
    assert(rows.take(5).forall(_.isNullAt(2)))       // old files: b absent → null
    assert(rows.last.getString(2) === "v7")
  }

  test("readers selecting only old columns prune the new column at the scan") {
    val dir = writeGenerations()
    val df = spark.read.option("mergeSchema", "true").parquet(dir).select("id", "a")
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach(s => assert(!s.requiredSchema.fieldNames.contains("b")))
    assert(df.count() === 8)
  }
}
