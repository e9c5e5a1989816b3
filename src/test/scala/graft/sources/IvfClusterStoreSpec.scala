package graft.sources

import graft.SparkSpec
import graft.ops.{IvfIndex, VectorOps}
import org.apache.spark.sql.functions._

/** The cell-partitioned embeddings artifact (r17): write-once semantics,
  * exact assignment parity with the direct nearestCell derivation, the
  * IVF consumer producing identical results over either path, and the
  * layout actually materializing as hive cell partitions (the property
  * that turns the probe restriction into partition pruning at scale).
  */
class IvfClusterStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private lazy val cents = IvfIndex.loadIfPresent(sfDir, 64, 4)
    .getOrElse(fail("committed k=64 IVF artifact missing for sf0.001"))

  test("ensureClustered writes once, as hive cell partitions") {
    val path = new org.apache.hadoop.fs.Path(
      IvfClusterStore.clusterPath(spark, sfDir, cents, 64, 4)).toUri.getPath
    val first = IvfClusterStore.ensureClustered(spark, sfDir, cents, 64, 4)
    assert(first.count() === emb.count())
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val cellDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1,
      "the layout must be hive-partitioned by cell — that IS the pruning story")
    val stamp = success.lastModified()
    IvfClusterStore.forgetForTest(spark, sfDir, cents, 64, 4)
    val second = IvfClusterStore.ensureClustered(spark, sfDir, cents, 64, 4)
    assert(second.count() === first.count())
    assert(success.lastModified() === stamp,
      "re-ensuring must not rewrite the committed artifact")
  }

  test("artifact assignment equals the direct nearestCell recompute, bit for bit") {
    val art = IvfClusterStore.ensureClustered(spark, sfDir, cents, 64, 4)
      .select("vec_id", "cell")
    val direct = emb.select(col("vec_id"),
      VectorOps.nearestCell(col("embedding"), cents).as("cell"))
    assert(art.except(direct).count() === 0 && direct.except(art).count() === 0)
  }

  test("ivfTopKClustered produces identical results to the re-assigning ivfTopK") {
    val queries = emb.where(col("vec_id") < 8)
    val clustered = IvfClusterStore.ensureClustered(spark, sfDir, cents, 64, 4)
    val viaStore = VectorOps.ivfTopKClustered(clustered, queries,
      "vec_id", "embedding", 5, cents, nProbe = 16)
    val direct = VectorOps.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      cents, nProbe = 16)
    assert(viaStore.except(direct).count() === 0 && direct.except(viaStore).count() === 0)
  }

  test("semanticDedupClustered over the store + planted delta equals the full recompute") {
    // the r18 serving path: corpus cells from the at-rest layout, only the
    // planted (not-in-store) rows assigned on the fly — must be
    // bit-identical to semanticDedup over the recomputed union
    val base = emb.select("vec_id", "embedding")
    val planted = base.where(col("vec_id") < 50)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") +
            ((col("vec_id") * 64 + i) % 7 - 3).cast("double") * lit(0.001)).cast("float"))
          .as("embedding"))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val clustered = IvfClusterStore.ensureClustered(spark, sfDir, cents, 64, 4)
    val viaStore = VectorOps.semanticDedupClustered(clustered, planted,
      "vec_id", "embedding", cents, threshold = 0.9)
    val direct = VectorOps.semanticDedup(base.unionByName(planted),
      "vec_id", "embedding", cents, threshold = 0.9)
    assert(viaStore.except(direct).count() === 0 && direct.except(viaStore).count() === 0)
    assert(viaStore.where(!col("kept")).count() > 0,
      "the planted twins must give the dedup real positives")
  }

  test("a literal probe-cell filter prunes the partitioned scan") {
    // the partition-pruning mechanism itself (static form; the declared
    // query's broadcast probe join goes through DPP, same reader path):
    // a 2-cell filter must reach the scan as a partition filter and read
    // strictly fewer files than the full layout
    val clustered = IvfClusterStore.ensureClustered(spark, sfDir, cents, 64, 4)
    val pruned = clustered.where(col("cell").isin(0, 1))
    pruned.collect()
    val scans = graft.plans.PlanAudit.flatten(pruned.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "the cell filter must reach the scan as a partition filter")
  }
}
