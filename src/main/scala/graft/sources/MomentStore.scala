package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-once second-moment artifact over the embeddings table (VERDICT
  * r18 item 1): the four representation audits — covariance (C138),
  * participation ratio (C297), second-moment drift (C308), linear CKA
  * (C298) — plus the source-centroid similarity matrix (C309) each used
  * to re-scan the corpus and re-run a d²-cell (i,j) moment fan per
  * execution (~13 s of the r18 sf0.1 tail between them). Every one of
  * those reads is a pure function of the SAME mergeable sufficient
  * statistics, so at 100 TB the production design is "never re-scan the
  * corpus per audit": maintain the decimal moment partials once, as a
  * write-once store, and derive all five audits from kilobytes.
  *
  * Contents (z = [x ‖ y]: the 64-dim embedding as doubles concatenated
  * with its 16-dim JL sign projection — exactly C298's construction, so
  * the store serves the compression audit too; the xx block i,j < dim
  * serves the raw-embedding audits):
  *
  *  - `cells/`: one row per upper-triangular (i, j) of z — cohort-split
  *    counts and exact decimal Σ z_i·z_j partials (`n_a`, `n_b`,
  *    `sxy_a`, `sxy_b`), cohort a = C308's md5(vec_id) 80 % split.
  *    (dim+k)(dim+k+1)/2 = 3,240 rows regardless of corpus size.
  *  - `dims/`: one row per (source, cohort, i) — count and exact
  *    decimal Σ z_i first-moment partials, `src` attached by the
  *    broadcast doc join (null for unlabeled rows) so C309's per-source
  *    centroids fall out of the same artifact. ≤ sources·2·(dim+k) rows.
  *
  * Bit-parity contract: every addend casts to decimal(28,12) exactly as
  * `Portable.decSum` does, partial sums carry decimal(38,12), and
  * decimal addition is EXACT — so any grouping of the partials re-sums
  * to the very bits the single-pass corpus fan produces, and every
  * derived read ([[graft.ops.VectorOps.covarianceFromMoments]] family)
  * hash-matches the direct computation AND the unchanged DuckDB oracles
  * (MomentStoreSpec proves artifact ≡ recompute per consumer).
  *
  * Lifecycle: hive-free single-file-scale parquet under the warehouse,
  * keyed by (dim, k), the JL sign matrix's content fingerprint
  * ([[ModelKeys]] — the ADVICE r17 stale-model discipline), and the
  * data dir hash; `_SUCCESS`-committed, ensure-once per session (the
  * [[ShingleStore]] contract). Build cost is ONE corpus scan with the
  * C298 fan — paid at ingest (Bench warms it with the other artifacts),
  * amortized over every audit read thereafter.
  */
object MomentStore {

  /** Embedding dim and JL projection dim — the C298 (q_cka) constants. */
  val Dim = 64
  val K = 16

  final case class Frames(cells: DataFrame, dims: DataFrame)

  private val ensured = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]

  /** Test-only: forget the ensure so a spec can exercise the build path. */
  private[graft] def forgetForTest(spark: SparkSession, sfDir: String): Unit =
    ensured.remove((spark.sparkContext.applicationId, storePath(spark, sfDir)))

  private[graft] def storePath(spark: SparkSession, sfDir: String): String = {
    val abs = java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val fp = ModelKeys.fingerprint(
      graft.ops.VectorOps.jlSigns(K, Dim).map(_.map(_.toFloat)))
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_moments_v1_d${Dim}k${K}_${fp}_$dirHash").toString
  }

  /** C308's cohort split, shared with q_moment_drift and the oracles. */
  private[graft] def refCohort(idCol: Column): Column =
    graft.ops.Portable.hash32(idCol) % 10000 < 8000

  /** The concatenated [x ‖ y] audit vector — C298's exact construction
    * (x cast to double; y_j a fixed-order fold dot with the ±1 sign row,
    * scaled by the correctly-rounded √k) so per-row products are
    * bit-identical to the direct fans being replaced.
    */
  private[graft] def zVector(vecCol: Column): Column = {
    val signs = graft.ops.VectorOps.jlSigns(K, Dim)
    val scale = math.sqrt(K.toDouble)
    def dot(row: Array[Double]): Column =
      aggregate(
        zip_with(vecCol, typedLit(row.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0d), (acc, x) => acc + x)
    concat(
      transform(vecCol, x => x.cast("double")),
      array((0 until K).map(j => dot(signs(j)) / scale): _*))
  }

  /** Ensure the moment artifact for `sfDir` exists and return readers
    * over its two tables. Decimal columns read back as decimal(38,12).
    */
  def ensure(spark: SparkSession, sfDir: String): Frames = {
    val loc = storePath(spark, sfDir)
    ensured.getOrElseUpdate((spark.sparkContext.applicationId, loc), {
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def committed(sub: String) =
        fs.exists(new org.apache.hadoop.fs.Path(s"$loc/$sub/_SUCCESS"))
      if (!committed("cells") || !committed("dims")) {
        if (fs.exists(p)) fs.delete(p, true)
        val docs = graft.Tables.load(spark, sfDir, "documents")
          .select(col("doc_id").as("_id"), col("source").as("_src"))
        val base = graft.Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id").as("_id"), col("embedding").as("_v"))
          .join(broadcast(docs), Seq("_id"), "left_outer")
          .select(col("_src"), refCohort(col("_id")).as("_ref"),
            zVector(col("_v")).as("_z"))
          // ONE corpus scan feeds both fans: the base frame materializes
          // once (executor-cached blocks), the build is ingest-side
          .localCheckpoint(true)
        val z = col("_z")
        base.select(col("_ref"),
            explode(flatten(transform(z, (x, i) =>
              transform(slice(z, i + 1, size(z) - i),
                (y, jj) => struct(i.as("i"), (i + jj).as("j"),
                  (x * y).as("xy")))))).as("_p"))
          .select(col("_ref"), col("_p.i").as("i"), col("_p.j").as("j"),
            col("_p.xy").as("xy"))
          .groupBy("i", "j")
          .agg(
            sum(when(col("_ref"), 1L).otherwise(0L)).as("n_a"),
            sum(when(!col("_ref"), 1L).otherwise(0L)).as("n_b"),
            sum(when(col("_ref"), col("xy")).otherwise(lit(0.0))
              .cast("decimal(28,12)")).as("sxy_a"),
            sum(when(!col("_ref"), col("xy")).otherwise(lit(0.0))
              .cast("decimal(28,12)")).as("sxy_b"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$loc/cells")
        base.select(col("_src"), col("_ref"), posexplode(z))
          .select(col("_src"), col("_ref"), col("pos").as("i"), col("col").as("x"))
          .groupBy("_src", "_ref", "i")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast("decimal(28,12)")).as("sx"))
          .select(col("_src").as("src"), col("_ref").as("ref"), col("i"),
            col("n"), col("sx"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$loc/dims")
      }
    })
    Frames(
      cells = spark.read.parquet(s"$loc/cells"),
      dims = spark.read.parquet(s"$loc/dims"))
  }
}
