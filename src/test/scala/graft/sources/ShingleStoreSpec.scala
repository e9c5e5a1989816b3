package graft.sources

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** The persisted shingle-table artifact (VERDICT r7 item 2): write-once
  * semantics, result parity with the direct (recompute) path, and the
  * artifact actually feeding consumers as a parquet re-read rather than a
  * localCheckpoint pin.
  */
class ShingleStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ensureShingles writes once and reuses the committed layout") {
    val path = new org.apache.hadoop.fs.Path(
      ShingleStore.shinglePath(spark, sfDir, 3)).toUri.getPath
    val first = ShingleStore.ensureShingles(spark, sfDir, 3)
    assert(first.count() > 0)
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val stamp = success.lastModified()
    val second = ShingleStore.ensureShingles(spark, sfDir, 3)
    assert(second.count() === first.count())
    assert(success.lastModified() === stamp,
      "second ensureShingles call must not rewrite the committed artifact")
  }

  test("artifact content equals a direct shingles() computation, df/rank annotations correct") {
    val art = ShingleStore.ensureShingles(spark, sfDir, 3)
    val direct = TextOps.shingles(
      graft.Tables.load(spark, sfDir, "documents"), "doc_id", "text", 3)
    assert(art.columns.toSeq === Seq("doc_id", "shingle", "df", "rarity_rank"))
    assert(art.select("doc_id", "shingle").except(direct).count() === 0)
    assert(direct.except(art.select("doc_id", "shingle")).count() === 0)
    // df annotation = recomputed document frequency on every row
    val recomputed = direct.groupBy("shingle").agg(count(lit(1)).as("df2"))
    assert(art.join(recomputed, Seq("shingle"))
      .where(col("df") =!= col("df2")).count() === 0)
    // rarity_rank is a per-doc permutation 1..n_sh in (df asc, shingle asc) order
    val badRank = art.withColumn("expected", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df").asc, col("shingle").asc)))
      .where(col("rarity_rank") =!= col("expected")).count()
    assert(badRank === 0)
  }

  test("jaccardPrefixJoinAnnotated over the artifact matches the direct recompute path") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val viaArtifact = TextOps.jaccardPrefixJoinAnnotated(
        ShingleStore.ensureShingles(spark, sfDir, 3), "doc_id", 0.5)
      .orderBy("id_a", "id_b").collect().toSeq
    val direct = TextOps.jaccardPrefixJoin(docs, "doc_id", "text", 3, 0.5)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(viaArtifact === direct)
  }

  test("shingleNoveltyAnnotated over the artifact matches the raw-table recompute") {
    val art = ShingleStore.ensureShingles(spark, sfDir, 3)
    val viaAnnotation = TextOps.shingleNoveltyAnnotated(art, "doc_id")
      .orderBy("doc_id").collect().toSeq
    val recomputed = TextOps.shingleNovelty(art.select("doc_id", "shingle"), "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(viaAnnotation === recomputed)
  }

  test("ensuring the v2 layout garbage-collects a stale v1 sibling") {
    // Reset the ensure memo for this (sfDir, n) so the GC branch runs in
    // THIS test whatever other suites ensured first in the shared session
    // (ADVICE r10 item 2 — previously the test leaned on n=4 being fresh).
    ShingleStore.forgetForTest(spark, sfDir, 4)
    val v2 = new org.apache.hadoop.fs.Path(ShingleStore.shinglePath(spark, sfDir, 4))
    val v1 = new org.apache.hadoop.fs.Path(
      v2.getParent, v2.getName.replaceFirst("^graft_shingles_v2_", "graft_shingles_"))
    val fs = v2.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(v1)
    fs.create(new org.apache.hadoop.fs.Path(v1, "part-00000.parquet")).close()
    assert(fs.exists(v1))
    assert(ShingleStore.ensureShingles(spark, sfDir, 4).count() > 0)
    assert(!fs.exists(v1),
      "orphaned pre-annotation v1 artifact must be deleted when v2 is ensured")
  }

  test("v1 GC is gated on a committed v2 layout: a failed build leaves v1 intact") {
    // ADVICE r10 item 3: if the v2 build dies before `_SUCCESS`, the
    // stale-but-readable v1 copy must survive. Simulate with a doomed
    // ensure over a nonexistent sfDir whose v1 sibling exists.
    val badSf = "/root/testdata/graft_no_such_sf"
    val v2 = new org.apache.hadoop.fs.Path(ShingleStore.shinglePath(spark, badSf, 3))
    val v1 = new org.apache.hadoop.fs.Path(
      v2.getParent, v2.getName.replaceFirst("^graft_shingles_v2_", "graft_shingles_"))
    val fs = v2.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(v1)
    fs.create(new org.apache.hadoop.fs.Path(v1, "part-00000.parquet")).close()
    try {
      ShingleStore.forgetForTest(spark, badSf, 3)
      intercept[Exception] { ShingleStore.ensureShingles(spark, badSf, 3) }
      assert(fs.exists(v1),
        "a failed v2 build must not delete the surviving v1 artifact")
    } finally { fs.delete(v1, true); fs.delete(v2, true) }
  }

  test("consumers read the artifact as a parquet scan (no checkpoint pin)") {
    val plan = TextOps.jaccardPrefixJoinAnnotated(
        ShingleStore.ensureShingles(spark, sfDir, 3), "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_shingles_v2_n3"),
      "plan must scan the persisted shingle artifact")
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan rdd"),
      "no localCheckpoint/RDD scan may remain on the shingle path")
  }
}
