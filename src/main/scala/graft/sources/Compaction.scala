package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the lakehouse maintenance primitive.
  *
  * Streaming sinks, frequent CDC merges, and over-partitioned writes leave
  * tables as thousands of KB-sized parquet files; at 100 TB that means a
  * scheduler drowning in tasks, a NameNode/object-store drowning in
  * listings, and scans paying per-file open cost instead of streaming
  * MB-sized row groups. Compaction rewrites a table into files sized near
  * a target, after which every scan is cheaper forever — the same
  * pay-once/benefit-always economics as bucketing and z-ordering
  * (OPTIMIZE / bin-packing in lakehouse engines).
  *
  * Sizing is computed from the input's actual on-disk (compressed) bytes,
  * not a row-count guess, so the output lands near the target regardless
  * of schema width or codec ratio.
  */
object Compaction {

  /** Total on-disk bytes of the data files under `dir`, RECURSIVE (skips
    * _SUCCESS/. metadata side files at any depth): a hive-partitioned
    * table keeps its data in partition subdirectories, and the previous
    * non-recursive listing computed 0 input bytes for exactly that layout
    * — silently sizing every compaction to one file (ADVICE r7).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) total += st.getLen
    }
    total
  }

  /** True when `dir` holds data in subdirectories (hive partition layout). */
  def hasPartitionDirs(spark: SparkSession, dir: String): Boolean = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).exists(st => st.isDirectory &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
  }

  /** Data file count under `dir` — the metric compaction shrinks. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).count(st => st.isFile && !st.getPath.getName.startsWith("_"))
  }

  /** Rewrite the parquet table at `inDir` to `outDir` with ceil(bytes /
    * targetFileBytes) output files. Plain bin-packing uses `coalesce`
    * (no shuffle — merging small files needs no data movement, only
    * fewer write tasks); passing `sortCols` upgrades the rewrite to a
    * clustered compaction — a range repartition + within-partition sort —
    * so the merged files also carry tight min/max footer stats on the
    * sort key (1-D data skipping, see ZOrder for the 2-D version).
    * Returns the number of files written.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long, sortCols: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive (got $targetFileBytes)")
    // Fail fast on hive-partitioned input: a flat rewrite would silently
    // DROP the partition-column layout (and the columns' values, which
    // live only in the directory names). Partition-preserving compaction
    // is a per-partition rewrite — run this on each leaf directory.
    require(!hasPartitionDirs(spark, inDir),
      s"$inDir holds a hive-partitioned layout; compact each leaf partition " +
        "directory instead — a flat rewrite would drop the partition columns")
    val nFiles = math.max(1L,
      (dataBytes(spark, inDir) + targetFileBytes - 1) / targetFileBytes).toInt
    val in = spark.read.parquet(inDir)
    val packed =
      if (sortCols.isEmpty) in.coalesce(nFiles)
      else in.repartitionByRange(nFiles, sortCols.map(in.col): _*)
        .sortWithinPartitions(sortCols.map(in.col): _*)
    packed.write.mode("overwrite").parquet(outDir)
    dataFileCount(spark, outDir)
  }
}
