package graft.sources

import graft.SparkSpec
import graft.ops.Relational
import org.apache.spark.sql.functions._

/** The persisted basket-pair support artifact (the ShingleStore lifecycle
  * on the market-basket pair table): write-once semantics, content parity
  * with the direct basketPairs aggregation, and consumers reading the
  * committed parquet rather than re-deriving per run.
  */
class PairStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ensurePairs writes once and reuses the committed layout") {
    PairStore.forgetForTest(spark, sfDir)
    val path = new org.apache.hadoop.fs.Path(
      PairStore.pairPath(spark, sfDir)).toUri.getPath
    val first = PairStore.ensurePairs(spark, sfDir)
    assert(first.count() > 0)
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val stamp = success.lastModified()
    val second = PairStore.ensurePairs(spark, sfDir)
    assert(second.count() === first.count())
    assert(success.lastModified() === stamp,
      "second ensurePairs call must not rewrite the committed artifact")
  }

  test("artifact content equals the direct basketPairs support aggregation") {
    val art = PairStore.ensurePairs(spark, sfDir)
    val direct = Relational
      .basketPairs(graft.Tables.load(spark, sfDir, "lineitem"), "l_orderkey", "l_partkey")
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
    assert(art.columns.toSeq === Seq("item_a", "item_b", "support"))
    assert(art.except(direct).count() === 0)
    assert(direct.except(art).count() === 0)
    // one row per unordered pair, a < b
    assert(art.where(col("item_a") >= col("item_b")).count() === 0)
    assert(art.count() === art.select("item_a", "item_b").distinct().count())
  }

  test("q_cooccur reads the artifact as a parquet scan (q_triangles checkpoints it)") {
    // q_triangles' edge list is eagerly localCheckpoint'ed inside
    // triangleCounts, so its FINAL plan shows the checkpoint RDD, not the
    // artifact scan — its artifact read is proven by hash-identical
    // results + the ensurePairs call in its definition. q_cooccur's plan
    // scans the artifact directly.
    val plan = graft.SparkEntry.queries("q_cooccur")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_pairs_v1"),
      "q_cooccur must scan the persisted pair artifact")
  }
}
