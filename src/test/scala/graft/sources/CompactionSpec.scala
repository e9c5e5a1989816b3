package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Small-file compaction: the rewrite must shrink the file count to the
  * byte-target prediction while preserving rows exactly, and the sorted
  * variant must additionally leave non-overlapping per-file min/max
  * ranges on the sort key (1-D data skipping after the rewrite).
  */
class CompactionSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("compactParquet: 64 small files merge to the byte-target count, rows preserved") {
    val in = tmp("compact-in")
    val out = tmp("compact-out")
    val src = spark.range(10000)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
    src.repartition(64).write.mode("overwrite").parquet(in)
    assert(Compaction.dataFileCount(spark, in) === 64)

    val bytes = Compaction.dataBytes(spark, in)
    // target half the table per file → exactly 2 files predicted
    val written = Compaction.compactParquet(spark, in, out, (bytes + 1) / 2)
    assert(written === 2)
    assert(Compaction.dataFileCount(spark, out) === 2)

    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(b.count() === 10000L)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("compactParquet: oversized target collapses to a single file") {
    val in = tmp("compact-one-in")
    val out = tmp("compact-one-out")
    spark.range(100).repartition(8).write.mode("overwrite").parquet(in)
    assert(Compaction.compactParquet(spark, in, out, Long.MaxValue / 2) === 1)
    assert(spark.read.parquet(out).count() === 100L)
  }

  test("sorted compaction leaves non-overlapping per-file key ranges (skippable layout)") {
    val in = tmp("compact-sort-in")
    val out = tmp("compact-sort-out")
    spark.range(10000)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
      .orderBy(md5(col("id").cast("string"))) // scatter ids across input files
      .write.mode("overwrite").parquet(in)
    val bytes = Compaction.dataBytes(spark, in)
    val written = Compaction.compactParquet(spark, in, out, (bytes + 3) / 4, sortCols = Seq("id"))
    assert(written >= 2) // range-partitioned: several files, each a tight id range

    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    assert(spark.read.parquet(out).count() === 10000L)
  }

  test("dataBytes recurses into hive partition directories; compactParquet fails fast on them") {
    val in = tmp("compact-part-in")
    val out = tmp("compact-part-out")
    spark.range(1000)
      .select(col("id"), (col("id") % 4).as("p"), md5(col("id").cast("string")).as("payload"))
      .write.mode("overwrite").partitionBy("p").parquet(in)
    // Data lives only in p=*/ subdirectories: the byte count must see it.
    assert(Compaction.hasPartitionDirs(spark, in))
    assert(Compaction.dataBytes(spark, in) > 0L,
      "partitioned layout must not compute 0 input bytes")
    // A flat rewrite would drop the partition column's values (they live
    // in directory names) — refuse rather than corrupt.
    val e = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, in, out, 1L << 20)
    }
    assert(e.getMessage.contains("partition"))
    // Per-leaf compaction (the documented path) still works.
    val leaf = in + "/p=0"
    assert(!Compaction.hasPartitionDirs(spark, leaf))
    val written = Compaction.compactParquet(spark, leaf, out, Long.MaxValue / 2)
    assert(written === 1)
    assert(spark.read.parquet(out).count() === 250L)
  }
}
