package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once persisted basket-pair support table — the market-basket
  * sibling of [[ShingleStore]] (same VERDICT-r7 lifecycle rationale: a
  * corpus-sized derived table every co-occurrence analysis needs is
  * written ONCE as committed parquet and re-read by consumers, not
  * recomputed per query).
  *
  * At 100 TB the (item_a, item_b, support) table is the expensive product
  * of the single fact scan + basket explode ([[graft.ops.Relational
  * .basketPairs]]); top-k co-occurrence, the co-occurrence edge graph
  * (triangles), and any association-rule mining all read the SAME table.
  * Columns: item_a < item_b, one row per unordered pair, `support` =
  * number of baskets containing both (counted over distinct per-basket
  * items). Committed `_SUCCESS` layouts are reused as-is; anything else
  * at the location is a partial write — deleted and rebuilt.
  */
object PairStore {

  private val ensured = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]

  /** Test-only: forget that (app, location) was ensured, so a spec can
    * exercise the ensure path deterministically (the ShingleStore
    * forgetForTest rationale).
    */
  private[graft] def forgetForTest(spark: SparkSession, sfDir: String): Unit = {
    ensured.remove((spark.sparkContext.applicationId, pairPath(spark, sfDir)))
    ensured.remove((spark.sparkContext.applicationId, itemPath(spark, sfDir)))
    ensured.remove((spark.sparkContext.applicationId, basketPath(spark, sfDir)))
    ensured.remove((spark.sparkContext.applicationId, btWinPath(spark, sfDir)))
  }

  private def artifactPath(spark: SparkSession, sfDir: String, prefix: String): String = {
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${prefix}_$dirHash").toString
  }

  /** Artifact location for sfDir's lineitem basket pairs under the
    * session warehouse dir.
    */
  def pairPath(spark: SparkSession, sfDir: String): String =
    artifactPath(spark, sfDir, "graft_pairs_v1")

  /** Artifact location for sfDir's per-item basket counts under the
    * session warehouse dir.
    */
  def itemPath(spark: SparkSession, sfDir: String): String =
    artifactPath(spark, sfDir, "graft_items_v1")

  /** Artifact location for sfDir's per-basket item arrays under the
    * session warehouse dir.
    */
  def basketPath(spark: SparkSession, sfDir: String): String =
    artifactPath(spark, sfDir, "graft_baskets_v1")

  private def ensureArtifact(spark: SparkSession, loc: String)(build: String => Unit): DataFrame = {
    ensured.getOrElseUpdate((spark.sparkContext.applicationId, loc), {
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) {
        if (fs.exists(p)) fs.delete(p, true)
        build(loc)
      }
    })
    spark.read.parquet(loc)
  }

  /** Ensure the (item_a, item_b, support) pair table of `sfDir`'s
    * lineitem orders exists as a committed parquet artifact and return a
    * reader over it.
    */
  def ensurePairs(spark: SparkSession, sfDir: String): DataFrame =
    ensureArtifact(spark, pairPath(spark, sfDir)) { loc =>
      import org.apache.spark.sql.functions._
      graft.ops.Relational
        .basketPairs(graft.Tables.load(spark, sfDir, "lineitem"), "l_orderkey", "l_partkey")
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
        .write.mode("overwrite").parquet(loc)
    }

  /** Ensure the per-item basket-count table (item, basket_cnt,
    * n_baskets) of `sfDir`'s lineitem orders exists as a committed
    * parquet artifact and return a reader over it. `basket_cnt` counts
    * the distinct baskets containing the item; `n_baskets` — the corpus
    * basket total every rule-probability denominator needs — is
    * denormalized onto each of the catalog-sized rows so consumers read
    * ONE artifact (the alternative, a second 1-row stats parquet, costs
    * an extra listing+scan per query for a single long). Association
    * rules (confidence = support/cnt(antecedent), lift =
    * N·support/(cnt·cnt)) join this table against [[ensurePairs]]'s pair
    * supports; neither consumer touches the fact table at query time.
    */
  def ensureItems(spark: SparkSession, sfDir: String): DataFrame =
    ensureArtifact(spark, itemPath(spark, sfDir)) { loc =>
      import org.apache.spark.sql.functions._
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val perItem = li.select(col("l_orderkey").as("b"), col("l_partkey").as("item"))
        .distinct()
        .groupBy("item").agg(count(lit(1)).as("basket_cnt"))
      val total = li.agg(count_distinct(col("l_orderkey")).as("n_baskets"))
      // 1-row aggregate broadcast onto the catalog-sized count table —
      // the repo's sanctioned crossJoin shape.
      perItem.crossJoin(broadcast(total))
        .write.mode("overwrite").parquet(loc)
    }

  /** Ensure the per-basket SORTED DISTINCT item-array table (basket,
    * items) of `sfDir`'s lineitem orders exists as a committed parquet
    * artifact and return a reader over it. This is the intermediate the
    * pair AND triple expansions both flatten from — persisting it moves
    * the fact scan + per-basket set aggregation (the corpus-sized stage)
    * into the artifact lifecycle, so lattice levels beyond pairs
    * (3-itemsets today, any k tomorrow) explode a basket-count-sized
    * parquet instead of rescanning the fact table per query. Only
    * multi-item baskets are stored (singletons generate no pair or
    * triple).
    */
  def ensureBaskets(spark: SparkSession, sfDir: String): DataFrame =
    ensureArtifact(spark, basketPath(spark, sfDir)) { loc =>
      import org.apache.spark.sql.functions._
      graft.Tables.load(spark, sfDir, "lineitem")
        .groupBy(col("l_orderkey").as("basket"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
        .where(size(col("items")) > 1)
        .write.mode("overwrite").parquet(loc)
    }

  /** Artifact location for sfDir's supplier head-to-head win counts. */
  def btWinPath(spark: SparkSession, sfDir: String): String =
    artifactPath(spark, sfDir, "graft_btwins_v1")

  /** Ensure the (winner, loser, n) supplier head-to-head table of
    * `sfDir`'s lineitem orders exists as a committed parquet artifact
    * and return a reader over it. One comparison per (order, losing
    * supplier): the supplier of the order's max-extendedprice lineitem
    * (ties to the lowest suppkey) beats each other distinct supplier in
    * the order. Corpus-static like every other derived table here, so
    * the Bradley–Terry fit (C272) reads a catalog²-bounded parquet
    * instead of re-running the winner window over the fact table per
    * query (r17: the window + pair aggregate was ~3 s of every
    * q_bradley_terry run at sf0.1).
    */
  def ensureBtWins(spark: SparkSession, sfDir: String): DataFrame =
    ensureArtifact(spark, btWinPath(spark, sfDir)) { loc =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = graft.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_suppkey").asc)
      val winner = li.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(col("l_orderkey"), col("l_suppkey").as("_winner"))
      winner.join(li.select("l_orderkey", "l_suppkey").distinct(), Seq("l_orderkey"))
        .where(col("l_suppkey") =!= col("_winner"))
        .groupBy(col("_winner").as("winner"), col("l_suppkey").as("loser"))
        .agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(loc)
    }
}
