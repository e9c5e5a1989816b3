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

  // Directory fingerprint for the write-once assertions: _SUCCESS mtime
  // alone has 1 s granularity on some filesystems (ADVICE r11 item 4 — a
  // spurious same-second rewrite would pass undetected), so also pin the
  // data-file listing (names + lengths) and a survives-rewrite sentinel.
  private def listing(path: String): Seq[(String, Long)] =
    new java.io.File(path).listFiles().toSeq
      .map(f => (f.getName, f.length())).sortBy(_._1)

  private def assertWriteOnce(path: String, ensure: () => Long): Unit = {
    val firstCount = ensure()
    assert(firstCount > 0)
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val stamp = success.lastModified()
    val files = listing(path)
    val sentinel = new java.io.File(path, "_graft_write_once_sentinel")
    assert(sentinel.createNewFile())
    try {
      assert(ensure() === firstCount)
      assert(success.lastModified() === stamp,
        "second ensure call must not rewrite the committed artifact")
      assert(listing(path).filterNot(_._1 == sentinel.getName) === files,
        "second ensure call must leave the data-file listing unchanged")
      assert(sentinel.exists(),
        "second ensure call must not clear the artifact directory")
    } finally sentinel.delete()
  }

  test("ensurePairs writes once and reuses the committed layout") {
    PairStore.forgetForTest(spark, sfDir)
    assertWriteOnce(
      new org.apache.hadoop.fs.Path(PairStore.pairPath(spark, sfDir)).toUri.getPath,
      () => PairStore.ensurePairs(spark, sfDir).count())
  }

  test("ensureItems writes once and reuses the committed layout") {
    PairStore.forgetForTest(spark, sfDir)
    assertWriteOnce(
      new org.apache.hadoop.fs.Path(PairStore.itemPath(spark, sfDir)).toUri.getPath,
      () => PairStore.ensureItems(spark, sfDir).count())
  }

  test("ensureBaskets writes once and reuses the committed layout") {
    PairStore.forgetForTest(spark, sfDir)
    assertWriteOnce(
      new org.apache.hadoop.fs.Path(PairStore.basketPath(spark, sfDir)).toUri.getPath,
      () => PairStore.ensureBaskets(spark, sfDir).count())
  }

  test("triples from the basket artifact equal triples from the fact table") {
    val fromArtifact = Relational.frequentTriplesFromBaskets(
      PairStore.ensureBaskets(spark, sfDir), "items", 25)
    val fromFacts = Relational.frequentTriples(
      graft.Tables.load(spark, sfDir, "lineitem"), "l_orderkey", "l_partkey", 25)
    assert(fromArtifact.collect().toSeq === fromFacts.collect().toSeq)
    // artifact invariants: sorted distinct multi-item baskets only
    val art = PairStore.ensureBaskets(spark, sfDir)
    assert(art.columns.toSeq === Seq("basket", "items"))
    assert(art.where(size(col("items")) < 2).count() === 0)
    assert(art.where(col("items") =!= array_sort(col("items"))).count() === 0)
    assert(art.where(size(col("items")) =!= size(array_distinct(col("items")))).count() === 0)
  }

  test("item-count artifact equals the direct per-item basket aggregation") {
    val art = PairStore.ensureItems(spark, sfDir)
    assert(art.columns.toSeq === Seq("item", "basket_cnt", "n_baskets"))
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val direct = li.select(col("l_orderkey").as("b"), col("l_partkey").as("item"))
      .distinct().groupBy("item").agg(count(lit(1)).as("basket_cnt"))
    assert(art.select("item", "basket_cnt").except(direct).count() === 0)
    assert(direct.except(art.select("item", "basket_cnt")).count() === 0)
    // n_baskets is the corpus basket total, denormalized identically on
    // every row
    val n = li.select("l_orderkey").distinct().count()
    assert(art.select("n_baskets").distinct().collect().map(_.getLong(0)).toSeq === Seq(n))
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

  test("bt-wins artifact equals the direct winner-window aggregation (r17)") {
    val art = PairStore.ensureBtWins(spark, sfDir)
    assert(art.columns.toSeq === Seq("winner", "loser", "n"))
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_suppkey").asc)
    val direct = li.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("l_orderkey"), col("l_suppkey").as("_winner"))
      .join(li.select("l_orderkey", "l_suppkey").distinct(), Seq("l_orderkey"))
      .where(col("l_suppkey") =!= col("_winner"))
      .groupBy(col("_winner").as("winner"), col("l_suppkey").as("loser"))
      .agg(count(lit(1)).as("n"))
    assert(art.except(direct).count() === 0 && direct.except(art).count() === 0)
    // a supplier never beats itself
    assert(art.where(col("winner") === col("loser")).count() === 0)
  }

  test("incremental pair-support merge equals the full rebuild") {
    // The C45/C113 delta-merge identity on the pair table: split the
    // fact table so many baskets SPAN base and delta (the case the
    // verdict flagged — spanning baskets must re-derive pairs from the
    // union of their rows, not the delta alone), merge the delta into
    // the base supports, and demand row-identical equality with the
    // from-scratch build over all facts.
    val baseRows = graft.Tables.load(spark, sfDir, "lineitem")
      .where(col("l_linenumber") <= 3).select(col("l_orderkey"), col("l_partkey"))
    val deltaRows = graft.Tables.load(spark, sfDir, "lineitem")
      .where(col("l_linenumber") > 3).select(col("l_orderkey"), col("l_partkey"))
    assert(deltaRows.count() > 0 && baseRows.count() > 0)
    // sanity: the split really produces spanning baskets
    val spanning = baseRows.select("l_orderkey").distinct()
      .join(deltaRows.select("l_orderkey").distinct(), Seq("l_orderkey"), "left_semi")
      .count()
    assert(spanning > 0, "test split must produce baskets spanning base and delta")

    def support(df: org.apache.spark.sql.DataFrame) = Relational
      .basketPairs(df, "l_orderkey", "l_partkey")
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
    val basePairs = support(baseRows)
    val merged = Relational.mergeBasketPairSupports(
      basePairs, baseRows, deltaRows, "l_orderkey", "l_partkey")
    val full = support(baseRows.unionByName(deltaRows))
    assert(merged.except(full).count() === 0)
    assert(full.except(merged).count() === 0)
    assert(merged.count() === full.count())
  }

  test("basketTriples enumerates exactly the C(k,3) ordered triples of a basket") {
    val in = df(Seq((1L, 30L), (1L, 10L), (1L, 20L), (1L, 10L), (1L, 40L),
        (2L, 7L), (2L, 8L), (3L, 5L)))
      .toDF("b", "i")
    val got = Relational.basketTriples(in, "b", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // basket 1 = {10,20,30,40} → 4 sorted triples; baskets 2 (pairs
    // only) and 3 (singleton) contribute none
    assert(got === Set((10L, 20L, 30L), (10L, 20L, 40L), (10L, 30L, 40L), (20L, 30L, 40L)))
  }

  test("frequent triples are anti-monotone against the pair artifact") {
    // The A-priori property that makes lattice mining prunable: every
    // frequent triple's three constituent pairs must each have support
    // ≥ the triple's support. Checked for the full triple-support table
    // against the committed pair artifact.
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val triples = Relational.basketTriples(li, "l_orderkey", "l_partkey")
      .groupBy("item_a", "item_b", "item_c").agg(count(lit(1)).as("t_sup"))
    assert(triples.count() > 0)
    val pairs = PairStore.ensurePairs(spark, sfDir)
    def pairSup(a: String, c: String) = pairs.select(
      col("item_a").as(a), col("item_b").as(c), col("support"))
    val violations = triples
      .join(pairSup("item_a", "item_b").withColumnRenamed("support", "s_ab"),
        Seq("item_a", "item_b"))
      .join(pairSup("item_a", "item_c").withColumnRenamed("support", "s_ac"),
        Seq("item_a", "item_c"))
      .join(pairSup("item_b", "item_c").withColumnRenamed("support", "s_bc"),
        Seq("item_b", "item_c"))
      .where(col("t_sup") > col("s_ab") || col("t_sup") > col("s_ac") ||
        col("t_sup") > col("s_bc"))
      .count()
    assert(violations === 0L)
    // and every triple HAS its three pairs in the artifact (the joins
    // above dropped nothing)
    val joined = triples
      .join(pairSup("item_a", "item_b").drop("support"), Seq("item_a", "item_b"))
      .join(pairSup("item_a", "item_c").drop("support"), Seq("item_a", "item_c"))
      .join(pairSup("item_b", "item_c").drop("support"), Seq("item_b", "item_c"))
      .count()
    assert(joined === triples.count())
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
