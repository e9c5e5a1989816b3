package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector / embedding operators for the similarity-search north star
  * (SURVEY.md C4, C11): dot products and norms via higher-order functions
  * (codegen'd, no UDFs), brute-force cosine top-k for a bounded query set,
  * and a random-hyperplane LSH variant whose candidate generation is a
  * bucket equi-join — never an all-pairs cross join (the one scale-killer
  * VERDICT.md round 1 warned against).
  *
  * Scale posture (100 TB): the query set is broadcast (bounded); the corpus
  * side streams. Per-query top-k is a row_number window partitioned by the
  * query id — high cardinality, well distributed. The LSH path buckets the
  * corpus once (linear scan), then joins query buckets to corpus buckets on
  * the signature — candidate count is |bucket| not |corpus|.
  */
object VectorOps {

  /** Sequential left-fold dot product of two float-array columns, in
    * double precision. Element order is the array order on both engines
    * (Spark `aggregate` and DuckDB `list_reduce` are both left folds), so
    * the result is bit-identical to the DuckDB oracle.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean norm of a float-array column (sequential fold, double). */
  def norm(c: Column): Column = sqrt(dot(c, c))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd dot product (graft.functions.FloatDotProduct):
    * bit-identical to `dot` (same left-to-right double accumulation) but
    * runs as a fused loop inside WholeStageCodegen instead of interpreted
    * higher-order-function lambdas — the hot path for large corpora.
    */
  def dotNative(a: Column, b: Column): Column = graft.functions.FloatDotProduct.dot(a, b)

  /** Cosine via the fused native expression (one array traversal for
    * dot + both norms) — bit-identical to `cosine`.
    */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine(a, b)

  /** Per-vector self dot product (squared L2 norm) — SURVEY.md C4. */
  def selfDot(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), dot(col(vecCol), col(vecCol)).as("dot"))

  /** Brute-force cosine top-k: every query vector (a bounded, broadcast
    * set) against the full corpus, excluding self-matches; exact re-score;
    * deterministic top-k per query (score desc, corpus id asc). This is
    * the correctness baseline ANN implementations are verified against.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int,
                 nativeDot: Boolean = false): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"))
    val sim = if (nativeDot) cosineNative(col("q_vec"), col("c_vec"))
              else cosine(col("q_vec"), col("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), sim.as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the top-k most cosine-similar corpus vectors whose LABEL differs —
    * the near-miss negatives that carry the gradient signal random
    * negatives lack (in-batch negatives are mostly easy; the hard ones
    * live at the top of the cross-label similarity ranking). Same shape
    * as [[cosineTopK]] (broadcast query set × full corpus, exact
    * re-score, deterministic per-query top-k) with the label-mismatch
    * predicate fused into the broadcast join — the corpus scan is
    * filtered before scoring, not after ranking, so no same-label
    * candidate ever occupies a shortlist slot.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int,
                    nativeDot: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("query_label"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"),
      col(labelCol).as("corpus_label"))
    val sim = if (nativeDot) cosineNative(col("q_vec"), col("c_vec"))
              else cosine(col("q_vec"), col("c_vec"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("corpus_id") && col("query_label") =!= col("corpus_label"))
      .select(col("query_id"), col("query_label"), col("corpus_id"),
        col("corpus_label"), sim.as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998): greedily select k results maximizing
    *
    *   MMR(d) = λ·cos(q, d) − (1−λ)·max_{s ∈ selected} cos(d, s)
    *
    * (max term 0 while nothing is selected; ties toward the smaller id)
    * — the rerank that stops a near-dup cluster from monopolizing a
    * result page, the retrieval-side complement of SemDeDup's
    * corpus-side cut. Production shape: relevance RANKS a bounded pool
    * first (top `poolSize` by cosine, the distributed stage — broadcast
    * query against the full corpus, TakeOrderedAndProject cut), then the
    * greedy loop reranks the pool. Pool relevances and the pool×pool
    * similarity matrix are computed by the engine (so every double is
    * the portable left-to-right fold both engines share) and only those
    * model-sized frames reach the driver (poolSize + poolSize² rows —
    * the kMeansCentroids sanctioned-collect shape); the selection loop
    * itself is O(k·poolSize) driver arithmetic in the same fixed IEEE
    * shapes, making the whole output oracle-checkable by k unrolled
    * argmax CTEs.
    *
    * Output: (rank, vec_id, rel, mmr), mmr = the objective value at
    * selection time.
    */
  def mmrSelect(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int, lambda: Double, poolSize: Int): DataFrame = {
    val spark = corpus.sparkSession
    // The greedy loop reranks ONE query's pool: with several query rows
    // the pool would mix relevance scores across queries and the
    // LinkedHashMap would keep only the last duplicate vec_id — a
    // meaningless blended ranking. Fail fast instead (ADVICE r15).
    // Zero query rows stay legal (empty pool → empty output — the
    // EmptyInputSpec contract). The check is folded into the query row's
    // OWN materialization — the function is driver-side past the pool cut
    // anyway, and take(2) short-circuits after two rows, so valid callers
    // no longer pay a separate full-scan count() job (ADVICE r16).
    val qRows = queries.select(col(idCol).as("_qid"), col(vecCol).as("_qv")).take(2)
    require(qRows.length <= 1,
      "mmrSelect reranks a single query's pool; pass at most one query row " +
        "— loop per query for multi-query reranking")
    if (qRows.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Double, Double)].toDF("rank", "vec_id", "rel", "mmr")
    }
    val qid = qRows.head.get(0)
    val qv = typedlit(qRows.head.getSeq[Float](1))
    val c = corpus.select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
    val pool = c.where(col("_cid") =!= lit(qid))
      .select(col("_cid"), col("_cv"), cosineNative(qv, col("_cv")).as("_rel"))
      .orderBy(col("_rel").desc, col("_cid").asc).limit(poolSize)
      .localCheckpoint(true)
    val rels = pool.select(col("_cid"), col("_rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val simRows = pool.select(col("_cid").as("_ia"), col("_cv").as("_va"))
      .join(broadcast(pool.select(col("_cid").as("_ib"), col("_cv").as("_vb"))),
        col("_ia") =!= col("_ib"))
      .select(col("_ia"), col("_ib"), cosineNative(col("_va"), col("_vb")).as("_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(rels: _*)
    while (selected.size < k && remaining.nonEmpty) {
      val (bestId, bestMmr) = remaining.iterator.map { case (id, rel) =>
        val maxSim = if (selected.isEmpty) 0.0
          else selected.iterator.map(s => simRows((id, s._1))).max
        (id, lambda * rel - (1.0 - lambda) * maxSim)
      }.minBy { case (id, mmr) => (-mmr, id) }
      selected += ((bestId, remaining(bestId), bestMmr))
      remaining.remove(bestId)
    }
    // Spark round semantics (BigDecimal HALF_UP on the shortest decimal
    // representation) so the driver-side values hash-match the oracle's
    // round(); + 0.0 canonicalizes any -0.0 (the Portable.pround rule).
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0
    val out = selected.zipWithIndex.map { case ((id, rel, mmr), i) =>
      (i + 1L, id, r6(rel), r6(mmr))
    }.toSeq
    import spark.implicits._
    out.toDF("rank", "vec_id", "rel", "mmr")
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: `planes` rows ×
    * `dim` components in [-0.5, 0.5), from a fixed-seed generator — stable
    * across runs and JVMs (the same constants can therefore be embedded as
    * literals in an oracle SQL text — see SparkEntry.lshOracle).
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes, dim)(rng.nextDouble() - 0.5)
  }

  /** Banded (AND/OR-amplified) sign-LSH signatures: `bands` bands of
    * `planesPerBand` hyperplanes each; band i's signature packs the sign
    * bits of planes [i·r, (i+1)·r). Returns an array column of `bands`
    * longs.
    *
    * AND/OR amplification is what makes sign-LSH a credible ANN story at
    * scale: a pair collides iff ALL r bits of SOME band agree, so the
    * collision probability is 1 − (1 − p^r)^b where p = 1 − θ/π. `r`
    * sharpens precision (buckets shrink 2× per plane — the pruning knob);
    * `b` restores recall (more independent chances — the recall knob). A
    * single-table signature (b = 1) has no recall control: VERDICT r2's
    * confirmed scale-weakness, fixed here.
    */
  def bandedSignatures(vecCol: Column, bands: Int, planesPerBand: Int, dim: Int,
                       seed: Long = 42L): Column = {
    val planes = hyperplanes(bands * planesPerBand, dim, seed)
    array((0 until bands).map { bnd =>
      (0 until planesPerBand).map { p =>
        // Float-rounded plane constants: the codegen'd FloatDotProduct
        // takes array<float> on both sides (a fused loop instead of b·r
        // interpreted higher-order folds per row — the signature pass is
        // the linear scan of the corpus, so it must be codegen). The
        // oracle embeds the same float-rounded values as double literals,
        // so both engines see identical products and signs.
        // typedlit (one array-literal reference object) instead of
        // array(lit, ...): the plane values live in the expression's
        // references, not the generated source, so plans with different
        // constants share one compiled class (codegen-cache hit)
        val planeLit = typedlit(planes(bnd * planesPerBand + p).map(_.toFloat).toSeq)
        when(dotNative(vecCol, planeLit) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** LSH-bucketed approximate cosine top-k with banded amplification:
    * bucket corpus and queries per band, equi-join on (band, band
    * signature), union candidates across bands (dropDuplicates BEFORE
    * scoring — each surviving pair is scored exactly once), exact
    * re-score, top-k per query. At 100 TB the join key is the band
    * bucket — candidates per query are b small buckets, not the corpus.
    */
  def cosineTopKLsh(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                    k: Int, bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    val sigs = bandedSignatures(col(vecCol), bands, planesPerBand, dim)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"), sigs.as("c_sigs"))
      .select(col("corpus_id"), col("c_vec"), col("c_sigs"),
        posexplode(col("c_sigs")).as(Seq("band", "band_sig")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), sigs.as("q_sigs"))
      .select(col("query_id"), col("q_vec"), col("q_sigs"),
        posexplode(col("q_sigs")).as(Seq("band", "band_sig")))
    // First-agreeing-band filter instead of a dropDuplicates shuffle: a
    // (query, corpus) pair colliding in several bands is kept only where
    // the band is its first agreement, so the candidate stream stays
    // exactly-once and fully map-side after the broadcast join.
    val firstAgreeingBand = !exists(
      filter(sequence(lit(0), lit(bands - 1)), e => e < col("band")),
      e => get(col("c_sigs"), e) === get(col("q_sigs"), e))
    val cand = c.join(broadcast(q), Seq("band", "band_sig"))
      .where(col("query_id") =!= col("corpus_id") && firstAgreeingBand)
    val scored = cand.select(col("query_id"), col("corpus_id"),
      cosine(col("q_vec"), col("c_vec")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs, exact: all (a < b) pairs with
    * cosine ≥ threshold within a bounded id range — the verification
    * baseline for LSH near-dup. Equi-self-join free: the bounded subset is
    * broadcast against itself only once.
    */
  def nearDupPairsExact(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosineNative(col("vec_a"), col("vec_b")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs at scale: banded sign-LSH
    * bucket the corpus, equi-join per band on (band, band signature),
    * union candidates across bands (dedup before scoring), exact
    * re-score, threshold — never an all-pairs cross join. Expected recall
    * for a pair at angle θ is 1 − (1 − (1 − θ/π)^r)^b — tune (b, r) to the
    * target similarity: high-similarity near-dup detection wants large r
    * (small buckets, strong pruning) with enough bands to hold recall.
    */
  def nearDupPairsLsh(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                      bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    val sig = df.select(col(idCol), col(vecCol),
        bandedSignatures(col(vecCol), bands, planesPerBand, dim).as("sigs"))
      .select(col(idCol), col(vecCol), col("sigs"),
        posexplode(col("sigs")).as(Seq("band", "band_sig")))
      .hint("shuffle_hash")
    // Same-plan self-join (exchange-reuse eligible) + first-agreeing-band
    // filter: exactly-once candidates with no dedup shuffle — the pair
    // stream flows straight into the single exact re-score.
    val joined = sig.as("a").join(sig.as("b"),
      col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
    val firstAgreeingBand = !exists(
      filter(sequence(lit(0), lit(bands - 1)), e => e < col("a.band")),
      e => get(col("a.sigs"), e) === get(col("b.sigs"), e))
    joined
      .where(firstAgreeingBand)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosineNative(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Multi-probe sign-LSH near-dup candidates (r19, VERDICT r18 item 5):
    * [[nearDupPairsLsh]] probes only EXACT band buckets, so a pair whose
    * signatures differ by one flipped hyperplane in every band is
    * unreachable no matter how many bands are paid for — multi-probe
    * (Lv et al. 2007) additionally probes every Hamming-1 neighbor
    * bucket, the standard recall-at-fixed-memory lever: recall rises
    * without retraining, re-hashing, or storing anything new.
    *
    * Shape: the probe side fans each band signature to itself plus its
    * `planesPerBand` one-bit flips (fan 1+p per band — constant, tiny),
    * the build side keeps exact signatures, and the equi-join key stays
    * (band, signature) — at 100 TB candidates per row are (1+p)·bands
    * small buckets, never the corpus. Exactly-once candidates without a
    * dedup shuffle: a pair can collide in at most ONE variant per band
    * (the flip that equals the signature difference), so the
    * first-band-within-Hamming-1 predicate — computed row-locally from
    * the carried signature arrays via xor/bit_count — keeps each pair
    * at its first reachable band only, the [[nearDupPairsLsh]]
    * first-agreeing-band idiom generalized to Hamming distance ≤ 1.
    */
  def nearDupPairsLshMultiprobe(df: DataFrame, idCol: String, vecCol: String,
                                threshold: Double, bands: Int,
                                planesPerBand: Int, dim: Int): DataFrame = {
    val sigged = df.select(col(idCol), col(vecCol),
      bandedSignatures(col(vecCol), bands, planesPerBand, dim).as("sigs"))
    val build = sigged
      .select(col(idCol), col(vecCol), col("sigs"),
        posexplode(col("sigs")).as(Seq("band", "band_sig")))
      .hint("shuffle_hash")
    // probe fan: the exact signature plus its planesPerBand 1-bit flips
    // (flip masks are driver-side literals — planesPerBand is a model
    // constant, not data)
    val flipLits = (0 until planesPerBand).map(p => lit(1L << p))
    val variants = flatten(transform(col("sigs"), (sig, b) =>
      array((struct(b.as("band"), sig.as("band_sig")) +:
        flipLits.map(f => struct(b.as("band"),
          sig.bitwiseXOR(f).as("band_sig")))): _*)))
    val probe = sigged
      .select(col(idCol), col(vecCol), col("sigs"), explode(variants).as("_v"))
      .select(col(idCol), col(vecCol), col("sigs"),
        col("_v.band").as("band"), col("_v.band_sig").as("band_sig"))
      .hint("shuffle_hash")
    val joined = probe.as("a").join(build.as("b"),
      col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
    val firstReachableBand = !exists(
      filter(sequence(lit(0), lit(bands - 1)), e => e < col("a.band")),
      e => bit_count(get(col("a.sigs"), e).bitwiseXOR(get(col("b.sigs"), e)))
        <= lit(1))
    joined
      .where(firstReachableBand)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosineNative(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Per-row nearest-centroid cell id: k fused dot products against the
    * (driver-side, literal) centroid array, argmax via struct ordering —
    * highest dot wins, ties break to the lowest cell id. No join: the
    * centroids ARE the model, k·dim floats, embedded in the expression.
    */
  def nearestCell(vecCol: Column, centroids: Array[Array[Float]]): Column = {
    // typedlit: centroid values become reference objects, keeping the
    // generated source identical across k-means iterations so each
    // iteration's plan is a codegen-cache hit instead of a fresh compile
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(dotNative(vecCol, typedlit(c.toSeq)).as("dot"), lit(-i).as("negid"))
    }
    // greatest() rejects <2 children at analysis time; a 1-cell quantizer
    // degrades to the constant assignment (ADVICE r6).
    val best = if (scored.length == 1) scored.head else greatest(scored: _*)
    (best.getField("negid") * -1).cast("int")
  }

  /** The `nProbe` cells nearest to a query vector, best first. */
  def topCells(vecCol: Column, centroids: Array[Array[Float]], nProbe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(dotNative(vecCol, typedlit(c.toSeq)).as("dot"), lit(-i).as("negid"))
    }
    transform(slice(sort_array(array(scored: _*), asc = false), 1, nProbe),
      s => (s.getField("negid") * -1).cast("int"))
  }

  /** Spherical k-means (Lloyd's) over an embedding column, DataFrame-
    * iterative: vectors are L2-normalized, assignment is max-dot against
    * the current centroids (a literal expression — no join), and each new
    * centroid is the element-wise mean of its members, re-normalized.
    * Only the k·dim centroid floats ever reach the driver per iteration —
    * the data-side work is one narrow aggregation per iteration, so the
    * loop is `iters` Spark jobs, not a driver-side scan.
    *
    * Deterministic: seeded init picks the k vectors with the smallest
    * md5(id), and the per-dimension means use exact decimal sums
    * (Portable.decSum) so centroid bits do not depend on partitioning.
    * Empty cells keep their previous centroid.
    */
  def kMeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): Array[Array[Float]] = {
    // Normalize ONCE and materialize (localCheckpoint): every iteration
    // re-reads executor-cached blocks instead of re-scanning and
    // re-normalizing the source.
    val base = df.select(normalized(col(vecCol)).as("_v"),
        md5(col(idCol).cast("string")).as("_h"))
      .localCheckpoint(true)
    val firstRow = base.select(size(col("_v"))).limit(1).collect()
    if (firstRow.isEmpty) return Array.empty // empty corpus: no centroids
    val dim = firstRow.head.getInt(0)
    var centroids: Array[Array[Float]] = base.orderBy("_h").limit(k)
      .collect().map(_.getSeq[Float](0).toArray)
    // Per-iteration update is ONE wide aggregation (64 decimal-exact
    // element sums + count, a single shuffle over k cells) — the
    // posexplode + double-groupBy form paid two shuffles per round.
    val sumCols = (0 until dim).map { i =>
      sum(element_at(col("_v"), i + 1).cast("double").cast("decimal(28,9)")).as(s"_d$i")
    }
    (0 until iters).foreach { _ =>
      val rows = base
        .select(nearestCell(col("_v"), centroids).as("_cell"), col("_v"))
        .groupBy("_cell")
        .agg(count(lit(1)).as("_n"), sumCols: _*)
        .collect()
      val next = centroids.map(_.clone())
      rows.foreach { r =>
        val n = r.getLong(1).toDouble
        val m = (0 until dim).map(i => r.getDecimal(2 + i).doubleValue / n).toArray
        val nrm2 = math.sqrt(m.map(x => x * x).sum)
        if (nrm2 > 0) next(r.getInt(0)) = m.map(x => (x / nrm2).toFloat)
      }
      centroids = next
    }
    centroids
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * max-abs scale, qᵢ = floor(xᵢ·127/scale + 0.5) — the 4× storage
    * compression for embedding columns at rest (a quantized 64-dim vector
    * is 64 bytes + one float). The rounding recipe is floor(·+0.5) so it
    * is reproducible verbatim in any engine; zero vectors quantize to
    * zeros with scale 0. Dequantize as qᵢ·scale/127 (max abs error
    * scale/254).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val s = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    val q = transform(col(vecCol), x =>
      when(s > 0, floor(x.cast("double") * 127.0 / s + 0.5).cast("tinyint"))
        .otherwise(lit(0).cast("tinyint")))
    df.select(col(idCol), s.as("scale"), q.as("q"))
  }

  /** L2-normalize a float-array column (null-safe; zero vectors pass
    * through unscaled).
    */
  def normalized(vecCol: Column): Column = {
    val n = sqrt(dotNative(vecCol, vecCol))
    transform(vecCol, x => when(n > 0, (x / n).cast("float")).otherwise(x))
  }

  /** IVF probe-limited approximate top-k: the corpus is bucketed once by
    * nearest centroid (a linear scan — at rest this is the clustered
    * layout), each query probes only its `nProbe` nearest cells, and the
    * exact re-score runs inside the probed buckets. Candidates per query
    * are nProbe/k of the corpus instead of all of it. Pairs are unique by
    * construction (one cell per corpus vector, distinct probe cells per
    * query), so there is no dedup shuffle.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, centroids: Array[Array[Float]], nProbe: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"),
      nearestCell(col(vecCol), centroids).as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(topCells(col(vecCol), centroids, nProbe)).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineNative(col("q_vec"), col("c_vec")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF top-k over the cell-partitioned at-rest layout
    * ([[graft.sources.IvfClusterStore]]): the corpus frame already
    * carries its cell — the hive partition column — so no per-query
    * re-assignment runs (k full-dimension dots per corpus row, the
    * dominant cost at k=64), and the probe restriction reaches the
    * partitioned scan as dynamic partition pruning through the broadcast
    * query join: un-probed cells' files are never read. Bit-identical
    * results to [[ivfTopK]] (same assignment recipe at write time, same
    * scoring and rank order).
    */
  /** Scored IVF candidates for EVERY probe budget up to `nProbeMax` in
    * one pass (r21, the q_pq_recall_curve sharing move): each corpus row
    * lives in exactly one cell and each query probes an ORDERED cell
    * list, so a candidate carries the 0-based position `_probe` at which
    * its cell was probed — filtering `_probe < np` then re-ranking
    * reproduces [[ivfTopK]](np) / [[ivfTopKClustered]](np) candidate
    * sets and scores exactly (the cell lists for smaller np are
    * prefixes; scoring does not depend on np). One corpus scan + one
    * broadcast join serves the whole recall curve instead of one per
    * budget.
    */
  def ivfScoredWithProbeRank(corpusWithCell: DataFrame, queries: DataFrame,
                             idCol: String, vecCol: String,
                             centroids: Array[Array[Float]],
                             nProbeMax: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      posexplode(topCells(col(vecCol), centroids, nProbeMax)).as(Seq("_probe", "cell")))
    corpusWithCell.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("_probe"),
        cosineNative(col("q_vec"), col("c_vec")).as("score"))
  }

  /** Per-budget top-k cut of [[ivfScoredWithProbeRank]] output: the same
    * rank rule as [[ivfTopK]], restricted to cells probed within `np`.
    */
  def ivfCutTopK(scored: DataFrame, k: Int, np: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    scored.where(col("_probe") < np)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  def ivfTopKClustered(clustered: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, k: Int, centroids: Array[Array[Float]],
                       nProbe: Int): DataFrame = {
    val c = clustered.select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"), col("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(topCells(col(vecCol), centroids, nProbe)).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineNative(col("q_vec"), col("c_vec")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Plain (non-spherical) k-means over a float-array column — the
    * subquantizer trainer for product quantization, where sub-vector
    * MAGNITUDE matters (spherical k-means would collapse it). Assignment
    * is min-L2 via the equivalent argmax of dot(v,c) − ½‖c‖² (the ‖c‖²
    * term is a driver-side literal, so the expression reuses the same
    * fused dot product); update is the exact-decimal element mean.
    * Deterministic like `kMeansCentroids`: md5-seeded init, decimal sums,
    * empty cells keep their previous centroid.
    */
  def subKMeans(df: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): Array[Array[Float]] = {
    val base = df.select(col(vecCol).as("_v"), md5(col(idCol).cast("string")).as("_h"))
      .localCheckpoint(true)
    val firstRow = base.select(size(col("_v"))).limit(1).collect()
    if (firstRow.isEmpty) return Array.empty
    val dim = firstRow.head.getInt(0)
    var centroids: Array[Array[Float]] = base.orderBy("_h").limit(k)
      .collect().map(_.getSeq[Float](0).toArray)
    val sumCols = (0 until dim).map { i =>
      sum(element_at(col("_v"), i + 1).cast("double").cast("decimal(28,9)")).as(s"_d$i")
    }
    (0 until iters).foreach { _ =>
      val rows = base
        .select(nearestCode(col("_v"), centroids).as("_cell"), col("_v"))
        .groupBy("_cell")
        .agg(count(lit(1)).as("_n"), sumCols: _*)
        .collect()
      val next = centroids.map(_.clone())
      rows.foreach { r =>
        val n = r.getLong(1).toDouble
        if (n > 0)
          next(r.getInt(0)) = (0 until dim)
            .map(i => (r.getDecimal(2 + i).doubleValue / n).toFloat).toArray
      }
      centroids = next
    }
    centroids
  }

  /** ½‖c‖² of a centroid, as the exact double a left-to-right fold
    * produces — embedded as a literal in both the Spark expression and the
    * DuckDB oracle, so neither engine recomputes it.
    */
  def halfNorm2(c: Array[Float]): Double =
    c.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble) / 2.0

  /** Min-L2 code assignment against a literal codebook: argmax of
    * dot(v,c) − ½‖c‖², ties to the lowest code. The PQ encoder.
    */
  def nearestCode(vecCol: Column, centroids: Array[Array[Float]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct((dotNative(vecCol, typedlit(c.toSeq)) - halfNorm2(c)).as("d"),
        lit(-i).as("negid"))
    }
    // Single-code books degrade to the constant assignment (ADVICE r6).
    val best = if (scored.length == 1) scored.head else greatest(scored: _*)
    (best.getField("negid") * -1).cast("int")
  }

  /** Product quantization, split into the lifecycle stages a 100 TB
    * deployment actually has (VERDICT r16 item 1):
    *
    *   ENCODE — corpus → (id, packed code word), computed ONCE when data
    *            lands and persisted as a parquet artifact
    *            ([[graft.sources.PqCodeStore]]); previously every query
    *            re-ran the m·k sub-space assignments over the corpus.
    *   RANK   — the ADC scan reads ONLY the code table: 8 bytes/vector at
    *            the production m=16, k=16 (16 4-bit codes in one long — a
    *            32× compression of the scan payload).
    *   FETCH  — exact vectors are read back for the top `rerank`
    *            candidates per query only (the tiny candidate set
    *            broadcast-joins the vector table by id), then re-scored
    *            with the exact cosine.
    */
  /** The m ≤ 16 / codes ≤ 16 validity guard EVERY 4-bit nibble packing
    * shares — [[packedPqCode]], [[pqEncodeStaged]]'s per-column staging,
    * and [[ivfPqTopK]]'s inline packing (ADVICE r17 item 1: Java shift
    * amounts are mod 64, so an unguarded m > 16 or a 5-bit code silently
    * WRAPS into corrupt code words instead of failing fast).
    */
  private def requirePackable(codebooks: Array[Array[Array[Float]]]): Unit = {
    val m = codebooks.length
    require(m > 0 && m <= 16, s"packed PQ codes support 1..16 sub-spaces, got $m")
    require(codebooks.forall(_.length <= 16),
      "packed PQ codes support at most 16 codes per sub-space (4-bit nibbles)")
  }

  /** All m sub-space code assignments of a vector packed into ONE long —
    * code_i occupies bits [4i, 4i+4). Valid for m ≤ 16 and k ≤ 16 codes
    * (the production PQ16x4 shape uses all 64 bits; bit 63 is code_15's
    * high bit, not a sign — unpacking uses the LOGICAL shift). Packing
    * keeps the at-rest artifact and any shuffle payload at 8 B/vector.
    */
  def packedPqCode(vecCol: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    requirePackable(codebooks)
    val m = codebooks.length
    val d = codebooks(0)(0).length
    (0 until m).map { i =>
      shiftleft(nearestCode(slice(vecCol, i * d + 1, d), codebooks(i)).cast("long"), 4 * i)
    }.reduce(_.bitwiseOR(_))
  }

  /** Sub-space `i`'s code out of a [[packedPqCode]] word (logical shift —
    * bit 63 is data, not sign).
    */
  def pqCodeAt(codeCol: Column, i: Int): Column =
    shiftrightunsigned(codeCol, 4 * i).bitwiseAND(lit(15L)).cast("int")

  /** The at-rest PQ code table: (idCol, code). See
    * [[graft.sources.PqCodeStore]] for the persisted-artifact lifecycle.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebooks: Array[Array[Array[Float]]]): DataFrame =
    corpus.select(col(idCol),
      packedPqCode(col(vecCol), codebooks).as("code"))

  /** The at-rest IVF-PQ layout: (idCol, cell, code) — the coarse cell
    * for probe pruning plus the packed code word. With `residualEncoding`
    * the codes quantize v − centroid(cell) (FAISS layout; `codebooks` then
    * from [[trainResidualBooks]]).
    */
  def ivfPqEncode(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: Array[Array[Float]],
                  codebooks: Array[Array[Array[Float]]],
                  residualEncoding: Boolean): DataFrame = {
    val base = corpus.select(col(idCol),
      nearestCell(col(vecCol), centroids).as("cell"), col(vecCol).as("_v"))
    val enc = if (residualEncoding) residualCol(col("_v"), col("cell"), centroids)
              else col("_v")
    base.select(col(idCol), col("cell"), packedPqCode(enc, codebooks).as("code"))
  }

  /** ADC ranking over a pre-encoded code table — the RANK stage: each
    * query precomputes its m·k lookup table of sub-space dots once; a
    * candidate pair then costs m nibble-unpacks + element_ats + a decimal
    * sum of the m partials (order-free, so the oracle replicates it with a
    * grouped decimal SUM instead of a fixed-order chain). The per-term
    * cast is decimal(18,12) — long-backed, so the m-term chain stays in
    * compact arithmetic (values are unchanged: 12-dp rounding is the
    * same at any precision and LUT dots are far below the 10⁶ cap).
    * Output: (query_id, q_vec, corpus_id, _rn) with _rn the per-query ADC
    * rank — exposing the ranking lets a caller that needs SEVERAL rerank
    * budgets (q_pq_recall_curve) pay the LUT + ranking once per run.
    */
  def pqAdcRankedCoded(codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                       codebooks: Array[Array[Array[Float]]]): DataFrame = {
    val m = codebooks.length
    require(m > 0, "need at least one codebook")
    val kk = codebooks(0).length
    val d = codebooks(0)(0).length
    val lut = array((0 until m).flatMap { i =>
      codebooks(i).map { cj => dotNative(slice(col("q_vec"), i * d + 1, d), typedlit(cj.toSeq)) }
    }: _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("_lut", lut)
    val approx = codes.select(col(idCol).as("corpus_id"), col("code"))
      .join(broadcast(q))
      .where(col("query_id") =!= col("corpus_id"))
      .withColumn("approx",
        (0 until m).map(i => element_at(col("_lut"), pqCodeAt(col("code"), i) + lit(i * kk + 1))
          .cast("decimal(18,12)")).reduce(_ + _).cast("double"))
    val wa = Window.partitionBy("query_id").orderBy(col("approx").desc, col("corpus_id").asc)
    approx.select(col("query_id"), col("q_vec"), col("corpus_id"),
      row_number().over(wa).as("_rn"))
  }

  /** The FETCH stage: the ADC candidate frame (already cut to its rerank
    * budget upstream — rerank·|queries| rows) reads back exact vectors for
    * the candidates ONLY — never a second corpus-wide vector scan — and
    * re-scores with the exact cosine. Output:
    * (query_id, corpus_id, _rn, score).
    *
    * Plan shape (r18 — VERDICT r17 item 2): the serving plan carries ONE
    * exchange. The candidate frame is eagerly checkpointed — it is tiny
    * (rerank·|queries| rows), so the ADC rank exchange executes once,
    * inside the checkpoint job, however many consumers read it — then
    * candidate ids broadcast into the corpus scan as a LEFT SEMI filter,
    * and the fetched vectors (equally tiny) broadcast BACK into the
    * candidate frame. [[cutTopK]]'s final window re-clusters by query_id:
    * that is the serving plan's single exchange, and its traffic is the
    * candidate frame itself — rerank·|queries| rows, never corpus-sized
    * (the rank exchange upstream is equally thin: Spark's partial
    * WindowGroupLimit caps it at rerank rows per query per map
    * partition). The old shape streamed the WHOLE corpus through the
    * fetch join instead — a corpus-wide probe whose output forfeited any
    * clustering — before the same final exchange. Note an exchange-FREE
    * final cut is not expressible here: under AQE, AdaptiveSparkPlanExec
    * reports UnknownPartitioning to Dataset.checkpoint (measured r18), so
    * the rank window's clustering cannot be carried across the
    * materialization barrier, and persist() — whose InMemoryTableScan
    * does preserve it — registers the plan in the CacheManager, where the
    * next run of the same query would silently read this run's
    * candidates (a benchmark-integrity leak, rejected).
    */
  def rerankFetchScored(ranked: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String): DataFrame = {
    val cand = ranked.localCheckpoint(true)
    val vecs = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"))
    val candVecs = vecs.join(broadcast(cand.select("corpus_id")), Seq("corpus_id"), "left_semi")
    cand.join(broadcast(candVecs), Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("_rn"),
        cosineNative(col("q_vec"), col("c_vec")).as("score"))
  }

  /** Final cut of a [[rerankFetchScored]] frame: among each query's top
    * `rerank` ADC candidates, the exact-score top `k`.
    */
  def cutTopK(scored: DataFrame, k: Int, rerank: Int): DataFrame = {
    val wf = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    scored.where(col("_rn") <= rerank)
      .select(col("query_id"), col("corpus_id"), col("score"))
      .withColumn("rank", row_number().over(wf))
      .where(col("rank") <= k)
  }

  /** Fused recall-curve read-out (r22, guide §2.4): every per-budget
    * branch of the r21 curves still paid its own rank window + join +
    * aggregate against the shared scored/brute frames — 3–4 windows,
    * 3–4 broadcast joins and 3–4 one-row aggregates per curve. All
    * budgets share ONE total order (score desc, corpus_id asc within a
    * query), so one running-count window computes, per candidate row and
    * per budget b, its rank among the budget-b-eligible rows: the row is
    * in budget b's exact top-k iff it is itself eligible and ≤ k
    * eligible rows precede-or-equal it — precisely the
    * filter-then-row_number rule of [[cutTopK]] / [[ivfCutTopK]]
    * (filtering a total order preserves relative order). One left join
    * against the brute top-k and one aggregate with a conditional sum
    * per budget then serve the whole curve; the per-budget rows unfold
    * from a single explode. Same rows, same types, same integers as the
    * per-budget branches — verified against the unchanged DuckDB oracle.
    *
    * `inBudget(b)` is the eligibility predicate (`_rn <= b` for the PQ
    * rerank curve, `_probe < b` for the IVF probe curve); `budgetCol`
    * names the output budget column.
    */
  def recallCurveFused(brute: DataFrame, scored: DataFrame,
                       budgets: Seq[Int], inBudget: Int => Column,
                       budgetCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("corpus_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flags = scored.select(
      col("query_id") +: col("corpus_id") +: budgets.map { b =>
        (inBudget(b) &&
          sum(when(inBudget(b), lit(1L)).otherwise(lit(0L))).over(w) <= k)
          .cast("long").as(s"_h$b")
      }: _*)
      // keep only rows that hit SOME budget's top-k: the frame shrinks
      // from candidate-sized (probe-bounded — corpus-fraction at scale)
      // to ≤ k·|budgets|·|queries| rows, making the broadcast below safe
      // at any corpus size; dropped rows contributed only coalesce(0)s
      .where(budgets.map(b => col(s"_h$b") === lit(1L)).reduce(_ || _))
    // broadcast: the left join against the (equally tiny) brute top-k
    // otherwise lands on a stats-blind SortMergeJoin post-window
    // (measured r22: 1 SMJ + 2 sort exchanges in the fused plan)
    val agged = brute.join(broadcast(flags), Seq("query_id", "corpus_id"), "left")
      .agg(count(lit(1)).as("n_pairs"),
        budgets.map(b => sum(coalesce(col(s"_h$b"), lit(0L))).as(s"_f$b")): _*)
    agged.select(explode(array(budgets.map(b =>
        struct(lit(b.toLong).as("_b"), col("n_pairs").as("n_pairs"),
          col(s"_f$b").as("n_found"))): _*)).as("_e"))
      .select(col("_e._b").as(budgetCol), col("_e.n_pairs"), col("_e.n_found"),
        round(col("_e.n_found").cast("double") / col("_e.n_pairs"), 6).as("recall"))
      .orderBy(budgetCol)
  }

  /** PQ ADC top-k over a persisted code table (the production path —
    * encode paid once at ingest, not per query).
    */
  def pqTopKCoded(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  codebooks: Array[Array[Array[Float]]], rerank: Int): DataFrame = {
    val ranked = pqAdcRankedCoded(codes, queries, idCol, vecCol, codebooks)
      .where(col("_rn") <= rerank)
    cutTopK(rerankFetchScored(ranked, corpus, idCol, vecCol), k, rerank)
  }

  /** In-flight encode with a materialization barrier BETWEEN the m
    * per-sub-space nibble columns and the packed word. Two jobs done by
    * one checkpoint: (a) it stops the optimizer collapsing the encode into
    * the downstream join (which would re-evaluate all m·k sub-space dots
    * per (query × corpus) PAIR), and (b) it keeps the m nearest-code
    * argmaxes as SEPARATE projection columns — fused into one expression
    * they exceed codegen's 64 KB method limit at the production m=16
    * (expression codegen splits methods per column, not within one).
    */
  private def pqEncodeStaged(corpus: DataFrame, idCol: String, vecCol: String,
                             codebooks: Array[Array[Array[Float]]]): DataFrame = {
    requirePackable(codebooks)
    val m = codebooks.length
    val d = codebooks(0)(0).length
    val nibs = (0 until m).map { i =>
      shiftleft(nearestCode(slice(col(vecCol), i * d + 1, d), codebooks(i)).cast("long"), 4 * i)
        .as(s"_nib$i")
    }
    corpus.select((col(idCol) +: nibs): _*).localCheckpoint(true)
      .select(col(idCol),
        (0 until m).map(i => col(s"_nib$i")).reduce(_.bitwiseOR(_)).as("code"))
  }

  /** PQ ADC top-k with an in-flight encode — for ad-hoc corpora (specs,
    * exploratory use). The declared queries ride the persisted
    * [[graft.sources.PqCodeStore]] artifact via [[pqTopKCoded]] instead.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, codebooks: Array[Array[Array[Float]]], rerank: Int): DataFrame = {
    val codes = pqEncodeStaged(corpus, idCol, vecCol, codebooks)
    pqTopKCoded(codes, corpus, queries, idCol, vecCol, k, codebooks, rerank)
  }

  /** Per-row residual `v − centroid(cell)` as a float-array column — the
    * FAISS-style IVF-PQ encoding input. Float subtraction on float
    * components (the oracle replays it as FLOAT[] − FLOAT[] in DuckDB —
    * identical IEEE single-precision ops, no double-rounding hazard).
    */
  def residualCol(vecCol: Column, cellCol: Column,
                  centroids: Array[Array[Float]]): Column =
    zip_with(vecCol,
      element_at(typedlit(centroids.map(_.toSeq).toSeq), cellCol + 1),
      (x, c) => x - c)

  /** Train PQ codebooks on IVF-cell residuals (not raw vectors) — the
    * standard recall improvement at identical query cost: within a cell,
    * vectors share the centroid's direction, so raw-vector codebooks
    * spend their 16 codes re-describing the centroid; residual codebooks
    * spend them on what DIFFERS inside the cell. Shared across cells
    * (one codebook set, FAISS layout), so the query-side ADC LUT stays
    * per-query; only the scalar q·centroid term is per probed cell.
    */
  def trainResidualBooks(df: DataFrame, idCol: String, vecCol: String,
                         centroids: Array[Array[Float]], m: Int, subDim: Int,
                         k: Int, iters: Int): Array[Array[Array[Float]]] = {
    val res = df.select(col(idCol),
      residualCol(col(vecCol), nearestCell(col(vecCol), centroids), centroids).as("_res"))
    (0 until m).map { i =>
      subKMeans(res.select(col(idCol), slice(col("_res"), i * subDim + 1, subDim).as("sub")),
        idCol, "sub", k, iters)
    }.toArray
  }

  /** IVF-PQ composed ANN — the layout every billion-vector system ships
    * (VERDICT r6 item 2): the coarse quantizer (IVF cells) bounds WHICH
    * rows a query touches, and product quantization bounds the BYTES per
    * touched row. The corpus is materialized once as its at-rest form —
    * (cell, m codes, exact vector) — queries probe their `nProbe` nearest
    * of the k cells, the ADC lookup-table ranking runs only inside probed
    * cells (nProbe/k of the corpus instead of all of it — the fix for
    * pqTopK's whole-corpus scan), and the top `rerank` candidates re-score
    * with the exact cosine. Candidate pairs are unique by construction
    * (one cell per corpus vector, distinct probe cells per query), so
    * there is no dedup shuffle; the query side is broadcast.
    *
    * With `residualEncoding = true` (`codebooks` then from
    * [[trainResidualBooks]], VERDICT r7 item 5): codes quantize
    * `v − centroid(cell)`, and the ADC approximation becomes
    * q·centroid(cell) + Σ_m LUT[code_m] — the exact decomposition
    * q·v = q·centroid + q·residual with only the residual quantized, so
    * the centroid's contribution carries NO quantization error. The
    * per-(query, cell) addend is one scalar; the LUT itself stays
    * per-query because codebooks are shared across cells (FAISS layout).
    *
    * The encoding is a MEASURED choice, not a default (LshRecallSpec):
    * residual wins when cells are tight (clustered corpora — the usual
    * production regime, where ‖v − c‖ ≪ ‖v‖); on quasi-random unit
    * embeddings with a small coarse k the within-cell cosine is ~0.3-0.5,
    * so ‖v − c‖ > ‖v‖ and residual codes carry MORE quantization error
    * than raw ones (measured on the test corpus: mean ADC error 0.095 vs
    * 0.086, planted-twin recall 46/50 vs 49/50).
    */
  def ivfPqTopKCoded(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     centroids: Array[Array[Float]], nProbe: Int,
                     codebooks: Array[Array[Array[Float]]], rerank: Int,
                     residualEncoding: Boolean = false): DataFrame = {
    val m = codebooks.length
    require(m > 0, "need at least one codebook")
    val kk = codebooks(0).length
    val d = codebooks(0)(0).length
    val centsLit = typedlit(centroids.map(_.toSeq).toSeq)
    val lut = array((0 until m).flatMap { i =>
      codebooks(i).map { cj => dotNative(slice(col("q_vec"), i * d + 1, d), typedlit(cj.toSeq)) }
    }: _*)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        explode(topCells(col(vecCol), centroids, nProbe)).as("cell"))
      .withColumn("_lut", lut)
    // q·centroid(cell): the unquantized half of the residual decomposition.
    val q = if (residualEncoding)
      q0.withColumn("_qcent", dotNative(col("q_vec"), element_at(centsLit, col("cell") + 1)))
    else q0
    // decimal(18,12): long-backed compact arithmetic for the m-term ADC
    // chain (values unchanged — same 12-dp rounding, magnitudes far
    // below the 10⁶ cap; the r16 treatment)
    val lutSum = (0 until m).map(i =>
      element_at(col("_lut"), pqCodeAt(col("code"), i) + lit(i * kk + 1)).cast("decimal(18,12)"))
    val approxTerms =
      if (residualEncoding) col("_qcent").cast("decimal(18,12)") +: lutSum else lutSum
    val approx = codes.select(col(idCol).as("corpus_id"), col("cell"), col("code"))
      .join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("corpus_id"))
      .withColumn("approx", approxTerms.reduce(_ + _).cast("double"))
    val wa = Window.partitionBy("query_id").orderBy(col("approx").desc, col("corpus_id").asc)
    val ranked = approx.select(col("query_id"), col("q_vec"), col("corpus_id"),
        row_number().over(wa).as("_rn"))
      .where(col("_rn") <= rerank)
    cutTopK(rerankFetchScored(ranked, corpus, idCol, vecCol), k, rerank)
  }

  /** IVF-PQ with an in-flight encode (ad-hoc corpora / specs; same staged
    * barrier as [[pqTopK]]'s — see [[pqEncodeStaged]]). The declared
    * queries ride the persisted PqCodeStore artifact via
    * [[ivfPqTopKCoded]] instead.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int, centroids: Array[Array[Float]], nProbe: Int,
                codebooks: Array[Array[Array[Float]]], rerank: Int,
                residualEncoding: Boolean = false): DataFrame = {
    requirePackable(codebooks)
    val m = codebooks.length
    val d = codebooks(0)(0).length
    val base = corpus.select(col(idCol),
      nearestCell(col(vecCol), centroids).as("cell"), col(vecCol).as("_v"))
    val enc = if (residualEncoding) residualCol(col("_v"), col("cell"), centroids)
              else col("_v")
    val nibs = (0 until m).map { i =>
      shiftleft(nearestCode(slice(enc, i * d + 1, d), codebooks(i)).cast("long"), 4 * i)
        .as(s"_nib$i")
    }
    val codes = base.select((Seq(col(idCol), col("cell")) ++ nibs): _*).localCheckpoint(true)
      .select(col(idCol), col("cell"),
        (0 until m).map(i => col(s"_nib$i")).reduce(_.bitwiseOR(_)).as("code"))
    ivfPqTopKCoded(codes, corpus, queries, idCol, vecCol, k, centroids, nProbe,
      codebooks, rerank, residualEncoding)
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus with the
    * coarse quantizer (k-means cells — the SAME persisted IVF artifact the
    * ANN queries use), then mark every vector that has a lower-id
    * neighbor with cosine ≥ `threshold` INSIDE ITS CELL as a duplicate.
    * Keep-first-by-id is the deterministic stand-in for "keep one per
    * group"; the within-cell restriction is the whole scale story —
    * pairwise work is bounded by cluster size, never |corpus|², which is
    * how embedding-level dedup runs on billion-document corpora
    * (clusters are also independently parallel, no cross-cell shuffle).
    *
    * Returns (id, cell, kept). Reference scope: the semantic twin of the
    * fingerprint dedup family (/root/reference/README.md pipeline stage
    * "dedup"); composes the C11 similarity machinery with C10 policy.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[Array[Float]], threshold: Double): DataFrame = {
    val cells = df.select(col(idCol), col(vecCol),
      nearestCell(col(vecCol), centroids).as("cell"))
    val a = cells.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = cells.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    val dups = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(cosineNative(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("_dup", lit(true))
    cells.select(col(idCol), col("cell").cast("long").as("cell"))
      .join(dups, Seq(idCol), "left_outer")
      .select(col(idCol), col("cell"),
        not(coalesce(col("_dup"), lit(false))).as("kept"))
  }

  /** [[semanticDedup]] over the cell-partitioned at-rest layout
    * ([[graft.sources.IvfClusterStore]]): the corpus frame already carries
    * its `cell` — the hive partition column — so the k full-dimension dot
    * products per corpus row that [[semanticDedup]] pays on every run
    * (the dominant cost after the r17 k=64 promotion) never execute;
    * only `extra` rows not present in the store (e.g. a freshly-ingested
    * delta being dedup-checked against the clustered corpus) are assigned
    * on the fly. Bit-identical to [[semanticDedup]] on the union — the
    * store's write-time assignment IS [[nearestCell]], the same recipe
    * used here for `extra` (IvfClusterStoreSpec proves the parity).
    */
  def semanticDedupClustered(clustered: DataFrame, extra: DataFrame,
                             idCol: String, vecCol: String,
                             centroids: Array[Array[Float]], threshold: Double): DataFrame = {
    val assignedExtra = extra.select(col(idCol), col(vecCol),
      nearestCell(col(vecCol), centroids).as("cell"))
    // The pairwise work decomposes into store×store + store×extra +
    // extra×extra rather than one self-join over (store ∪ extra): a union
    // of a partitioned scan with a computed frame makes the join key a
    // union output, and DPP then pushes its IN-subquery filter into the
    // COMPUTED branch too, where no scan can execute it (measured r18:
    // "dynamicpruning#N has not finished" at runtime). Decomposed, every
    // dynamic pruning filter lands on a real scan — and the store scan in
    // the cross part legitimately prunes to the extra rows' few cells,
    // which is the production delta-vs-corpus shape. Semantics require
    // store and extra ids to be distinct rows (same-id pairs are excluded,
    // matching the union-based [[semanticDedup]]).
    val sa = clustered.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val sb = clustered.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    val ea = assignedExtra.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val eb = assignedExtra.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    def lowerWins(pairs: DataFrame): DataFrame = pairs
      .where(col("id_a") < col("id_b"))
      .where(cosineNative(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as(idCol))
    // store×extra: each unordered pair appears once — flag whichever id
    // is larger (the union-based self-join's id_a < id_b filter sees the
    // pair in both orientations and keeps exactly that one).
    val crossDups = sa.join(eb, Seq("cell"))
      .where(col("id_a") =!= col("id_b"))
      .where(cosineNative(col("va"), col("vb")) >= threshold)
      .select(greatest(col("id_a"), col("id_b")).as(idCol))
    val dups = lowerWins(sa.join(sb, Seq("cell")))
      .unionByName(crossDups)
      .unionByName(lowerWins(ea.join(eb, Seq("cell"))))
      .distinct()
      .withColumn("_dup", lit(true))
    val cells = clustered.select(col(idCol), col("cell"))
      .unionByName(assignedExtra.select(col(idCol), col("cell")))
    cells.select(col(idCol), col("cell").cast("long").as("cell"))
      .join(dups, Seq(idCol), "left_outer")
      .select(col(idCol), col("cell"),
        not(coalesce(col("_dup"), lit(false))).as("kept"))
  }

  /** IVF-style coarse quantization: assign every vector to its nearest of
    * `centroids` (broadcast), giving a partition (cell) id for clustered
    * storage / probe-limited search. Centroids are any small DataFrame of
    * (centroid_id, vec).
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val scored = df.join(broadcast(centroids))
      .select(col(idCol), col(cidCol),
        dot(col(vecCol), col(cvecCol)).as("sim"))
    val w = Window.partitionBy(idCol).orderBy(col("sim").desc, col(cidCol).asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col(idCol), col(cidCol).as("cell"), col("sim"))
  }

  /** Mean-pool embeddings per group — the chunk→document aggregation every
    * two-stage embedding pipeline runs (chunks are embedded, documents are
    * searched). The vectors are exploded to (group, dim, value) and pooled
    * with one hash aggregate on (group, dim): the shuffle carries compact
    * triples and parallelism is groups × dims, never a row-local fold over
    * a whole group's vectors on one task. The pooled vector is serialized
    * as sorted "dim:micro" tokens (dimension-ordered, components scaled to
    * integral micro-units) so the result is representation-stable across
    * engines — same trick as featureHash. Mean in exact decimal; n_vectors
    * reports the pooled group size.
    */
  /** Matryoshka truncation: keep the first `dims` components of each
    * embedding and L2-renormalize — the standard "nested representation"
    * trick for cutting ANN index cost (a matryoshka-trained model packs
    * the most information into the leading dimensions, so searching at
    * 8–64 dims and re-ranking at full width trades recall for a large
    * constant-factor saving; see Kusupati et al. 2022).
    *
    * Output is one row per (vector, dimension) with the renormalized
    * component — the exploded form keeps the comparison representation-
    * independent (no array-literal formatting) and is what a downstream
    * per-dimension index build consumes anyway. The squared-norm sum is
    * decimal-cast (order-independent); the division and sqrt are the only
    * floating steps, identical IEEE ops in any engine, rounded to 6 dp.
    * All-zero prefixes yield IEEE NaN components (0/0) rather than a
    * crash.
    *
    * Scale shape: slice is row-local; posexplode fans each vector to
    * `dims` rows only (not full width); one hash aggregate on vec_id for
    * the norm, one broadcast-sized rejoin per vector — no driver state,
    * no full-width shuffle.
    */
  def matryoshka(df: DataFrame, idCol: String, vecCol: String, dims: Int): DataFrame = {
    // dim is 1-based, matching SQL list-subscript convention.
    val comp = df.select(col(idCol), posexplode(slice(col(vecCol), 1, dims)).as(Seq("dim0", "v")))
      .select(col(idCol), (col("dim0") + 1).cast("long").as("dim"),
        col("v").cast("double").as("v"))
    val norms = comp.groupBy(idCol)
      .agg(sqrt(Portable.decSum(col("v") * col("v"), 12)).as("_norm"))
    comp.join(norms, Seq(idCol))
      .select(col(idCol), col("dim"),
        round(col("v") / col("_norm"), 6).as("value"))
  }

  def meanPool(df: DataFrame, groupExpr: Column, vecCol: String): DataFrame = {
    val perDim = df
      .select(groupExpr.as("group_id"), posexplode(col(vecCol)).as(Seq("dim0", "v")))
      .groupBy("group_id", "dim0")
      .agg(Portable.decAvg(col("v").cast("double"), 8).as("avg_v"),
        count(lit(1)).as("_cnt"))
    perDim
      // Pad width 4 (the featureHash pattern), NOT the dimension's current
      // digit count: Spark's lpad TRUNCATES strings longer than the pad
      // length, so width 2 would fold dim 100 into '10' and silently
      // corrupt the pooled string for >99-dim vectors (ADVICE r7).
      .withColumn("comp", concat(
        lpad((col("dim0") + 1).cast("string"), 4, "0"), lit(":"),
        round(col("avg_v") * 1e6).cast("long").cast("string")))
      .groupBy("group_id")
      .agg(max(col("_cnt")).as("n_vectors"),
        concat_ws(" ", array_sort(collect_list(col("comp")))).as("pooled_micro"))
  }

  /** Upper-triangular covariance entries of an embedding column — the
    * d(d+1)/2-element summary that feeds PCA/whitening (and the first
    * diagnostic for anisotropic embedding spaces, where cosine ANN
    * recall quietly degrades). The (i, j, x_i·x_j) expansion is ROW-LOCAL
    * (the basketPairs nested-slice idiom on the vector's own array — no
    * self-join, no shuffle before the aggregate), map-side combines to
    * ≤ partitions·d² rows on the wire, and cov(i,j) finalizes as
    * Σxy/n − mean_i·mean_j from exact decimal sums — bit-stable under
    * any partitioning, so the whole matrix hash-checks against DuckDB.
    * Fan-out is d²/2 per row: fine for embedding dims (64² here), the
    * wrong tool for 100k-wide sparse features (use [[graft.ops.TextOps
    * .featureHash]] + co-occurrence counts there).
    */
  def embeddingCovariance(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val pairs = df.select(explode(flatten(transform(v, (x, i) =>
        transform(slice(v, i + 1, size(v) - i),
          (y, jj) => struct(i.as("i"), (i + jj).as("j"),
            (x.cast("double") * y.cast("double")).as("xy")))))).as("_p"))
      .select(col("_p.i").as("i"), col("_p.j").as("j"), col("_p.xy").as("xy"))
      .groupBy("i", "j")
      .agg(Portable.decSum(col("xy"), 12).as("_sxy"), count(lit(1)).as("n"))
    val means = df.select(posexplode(v))
      .select(col("pos").as("i"), col("col").cast("double").as("x"))
      .groupBy("i").agg(Portable.decSum(col("x"), 12).as("_sx"))
    pairs
      .join(broadcast(means.select(col("i"), col("_sx").as("_si"))), Seq("i"))
      .join(broadcast(means.select(col("i").as("j"), col("_sx").as("_sj"))), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        Portable.canonZero(round(col("_sxy") / col("n") -
          (col("_si") / col("n")) * (col("_sj") / col("n")), 6)).as("cov"))
  }

  /** Top-k principal components of the covariance matrix by power
    * iteration with Gram-Schmidt deflation — a k×d MODEL built on the
    * driver from the d²-entry covariance (the kMeansCentroids pattern:
    * collecting a model-sized aggregate at index-build time is the
    * sanctioned collect; the corpus itself never moves). Deterministic:
    * fixed arithmetic, deterministic start vector (normalized
    * (1, 2, …, d) — never orthogonal to a top component in practice; a
    * degenerate zero iterate falls back to a shifted start), fixed
    * iteration count. Returns components in variance order.
    */
  def pcaComponents(cov: DataFrame, d: Int, k: Int, iters: Int = 100): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    cov.select("i", "j", "cov").collect().foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    val comps = Array.ofDim[Double](k, d)
    for (c <- 0 until k) {
      var v = Array.tabulate(d)(i => (i + 1).toDouble)
      def orthonormalize(x: Array[Double]): Array[Double] = {
        val y = x.clone()
        for (p <- 0 until c) {
          val proj = (0 until d).map(i => y(i) * comps(p)(i)).sum
          for (i <- 0 until d) y(i) -= proj * comps(p)(i)
        }
        val n = math.sqrt(y.map(x => x * x).sum)
        if (n < 1e-12) Array.tabulate(d)(i => if (i == c) 1.0 else 0.0) else y.map(_ / n)
      }
      v = orthonormalize(v)
      for (_ <- 0 until iters) {
        val w = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
        v = orthonormalize(w)
      }
      comps(c) = v
    }
    comps
  }

  /** Project embeddings onto PCA components (broadcast k×d model;
    * per-row dot products — row-local, codegen'd). Output keeps the id
    * plus `pc1..pck` projection columns; mean-centering uses the means
    * implied by the covariance build so projections are centered scores.
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 components: Array[Array[Double]],
                 meansVec: Array[Double]): DataFrame = {
    val centered = zip_with(col(vecCol),
      typedLit(meansVec.toSeq), (x, mu) => x.cast("double") - mu)
    val projCols = components.zipWithIndex.map { case (comp, c) =>
      aggregate(zip_with(centered, typedLit(comp.toSeq), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x).as(s"pc${c + 1}")
    }
    df.select((col(idCol) +: projCols.toSeq): _*)
  }

  /** Embedding-space drift between two cohorts: the per-dimension mean
    * vectors of each cohort, compared by cosine and L2 — the
    * representation-level counterpart of the scalar PSI gate (a
    * feature distribution can hold still while the embedding space
    * rotates under it; retrieval quality dies either way). One row out:
    * cohort sizes, cosine of the mean vectors, L2 distance.
    *
    * Shape: one posexplode fan (row-local), one (cohort, dim) hash agg
    * of decimal sums — dims-sized, not corpus-sized — then a dims-row
    * join and one final aggregate; every mean and cross-moment is
    * decimal-snapshotted so the two scalars are bit-stable at any
    * partition count.
    */
  def embeddingDrift(df: DataFrame, cohortCol: Column, vecCol: String): DataFrame = {
    val fan = df.select(cohortCol.cast("boolean").as("_ref"), posexplode(col(vecCol)))
      .select(col("_ref"), (col("pos") + 1).as("_pos"), col("col").cast("double").as("_v"))
    val means = fan.groupBy("_ref", "_pos")
      .agg((Portable.decSum(col("_v"), 12) / count(lit(1))).as("_m"),
        count(lit(1)).as("_n"))
    val a = means.where(col("_ref")).select(col("_pos"), col("_m").as("_ma"), col("_n").as("_na"))
    val b = means.where(!col("_ref")).select(col("_pos"), col("_m").as("_mb"), col("_n").as("_nb"))
    a.join(b, Seq("_pos"))
      .agg(
        max("_na").as("n_ref"), max("_nb").as("n_cur"),
        Portable.decSum(col("_ma") * col("_mb"), 12).as("_dot"),
        Portable.decSum(col("_ma") * col("_ma"), 12).as("_aa"),
        Portable.decSum(col("_mb") * col("_mb"), 12).as("_bb"),
        Portable.decSum((col("_ma") - col("_mb")) * (col("_ma") - col("_mb")), 12).as("_d2"))
      .select(col("n_ref"), col("n_cur"),
        when(col("_aa") > 0 && col("_bb") > 0,
          Portable.pround(col("_dot") / (sqrt(col("_aa")) * sqrt(col("_bb"))), 9))
          .as("mean_cos"),
        round(sqrt(col("_d2")), 9).as("l2_dist"))
  }

  /** Second-moment drift between two embedding cohorts (r18b) — the
    * SHAPE-sensitive companion of [[embeddingDrift]] (which compares
    * centroid means — the linear-kernel MMD — and is blind to a
    * variance expansion or a rotation around an unchanged mean):
    * compares the uncentered second-moment matrices S = E[xxᵀ] by
    * Frobenius distance ‖S_A − S_B‖_F and cosine ⟨S_A,S_B⟩/‖S_A‖‖S_B‖.
    * ‖S_A − S_B‖²_F is exactly the quadratic-kernel MMD²
    * (k(x,y) = (xᵀy)²: E k(x,x') = ‖E[xxᵀ]‖²_F), so this is a proper
    * two-sample distribution test statistic over embedding space, not
    * a heuristic. The read that catches "the new crawl's embeddings
    * have the same centroid but a different spread".
    *
    * Scale shape: ONE row-local upper-triangular (i,j) fan per row (the
    * C138 shape — no self-join, map-side combinable), one (cohort,
    * cell) aggregate, a d²-bounded cell join, one roll-up; per-cell
    * means are the [[embeddingDrift]] decimal-sum/count shape,
    * off-diagonal cells weighted ×2 for the full symmetric matrix.
    */
  def secondMomentDrift(df: DataFrame, cohortCol: Column, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // ONE cell aggregate carries both cohorts as conditional sums (the
    // per-cohort decimal sums are identical to separately-grouped ones —
    // the `otherwise(0)` addends are exact zeros), so no cohort-keyed
    // cell join ever materializes
    val cells = df.select(cohortCol.cast("boolean").as("_ref"),
        explode(flatten(transform(v, (x, i) =>
          transform(slice(v, i + 1, size(v) - i),
            (y, jj) => struct(i.as("i"), (i + jj).as("j"),
              (x.cast("double") * y.cast("double")).as("xy")))))).as("_p"))
      .select(col("_ref"), col("_p.i").as("i"), col("_p.j").as("j"),
        col("_p.xy").as("xy"))
      .groupBy("i", "j")
      .agg(
        sum(when(col("_ref"), 1L).otherwise(0L)).as("_na"),
        sum(when(!col("_ref"), 1L).otherwise(0L)).as("_nb"),
        Portable.decSum(when(col("_ref"), col("xy")).otherwise(lit(0.0)), 12).as("_sa"),
        Portable.decSum(when(!col("_ref"), col("xy")).otherwise(lit(0.0)), 12).as("_sb"))
    secondMomentDriftFromCells(cells)
  }

  /** [[secondMomentDrift]]'s read over an already-aggregated cohort cell
    * frame (i, j, _na, _nb, _sa, _sb) — the shared tail for the direct
    * corpus fan, the MomentStore serving path, and the streaming
    * MomentState twin: per-cell means, Frobenius norms, and the
    * quadratic-MMD distance/cosine from the same fixed IEEE shapes.
    */
  private[graft] def secondMomentDriftFromCells(cells: DataFrame): DataFrame = {
    val ma = col("_sa") / col("_na")
    val mb = col("_sb") / col("_nb")
    val w = when(col("i") === col("j"), lit(1.0)).otherwise(lit(2.0))
    cells.where(col("_na") > 0 && col("_nb") > 0)
      .agg(
        max("_na").as("n_a"), max("_nb").as("n_b"),
        Portable.decSum(w * ma * mb, 12).as("_dot"),
        Portable.decSum(w * ma * ma, 12).as("_aa"),
        Portable.decSum(w * mb * mb, 12).as("_bb"),
        Portable.decSum(w * (ma - mb) * (ma - mb), 12).as("_d2"))
      .select(col("n_a"), col("n_b"),
        round(sqrt(col("_aa")), 9).as("frob_a"),
        round(sqrt(col("_bb")), 9).as("frob_b"),
        round(sqrt(col("_d2")), 9).as("moment_dist"),
        when(col("_aa") > 0 && col("_bb") > 0,
          Portable.pround(col("_dot") / (sqrt(col("_aa")) * sqrt(col("_bb"))), 6))
          .as("moment_cos"))
  }

  /** Per-source centroid similarity matrix (r18b) — WHICH sources are
    * semantically close: per source the embedding centroid (exact
    * decimal per-dimension means), then every source pair's centroid
    * cosine and L2 distance — the semantic MIXING MAP a corpus plan
    * reads before merging near-duplicate domains or assigning separate
    * weights (C134 asks "does the domain label predict tokens", C267
    * compares token DISTRIBUTIONS; this compares where the domains sit
    * in embedding space). The C181 cohort-drift machinery generalized
    * from 2 cohorts to the full k×k catalog.
    *
    * Scale shape: one broadcast id join attaches the group, ONE
    * (group, dim) hash aggregate collapses the corpus to k·d rows,
    * and the pair fan is the k²-bounded catalog self-join on the
    * dimension key; per-pair moments decimal-snapshot, the cosine/L2
    * are fixed IEEE shapes. Degenerate zero-norm centroids NULL the
    * cosine, never throw.
    */
  def sourceCentroidSimilarity(emb: DataFrame, docs: DataFrame,
                               idCol: String, vecCol: String,
                               docIdCol: String, groupCol: String): DataFrame = {
    val joined = emb.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .join(broadcast(docs.select(col(docIdCol).as("_id"), col(groupCol).as("_g"))
        .where(col("_g").isNotNull)), Seq("_id"))
    val means = joined.select(col("_g"), posexplode(col("_v")))
      .select(col("_g"), col("pos").as("_p"), col("col").cast("double").as("_x"))
      .groupBy("_g", "_p")
      .agg((Portable.decSum(col("_x"), 12) / count(lit(1))).as("_m"),
        count(lit(1)).as("_n"))
    val a = means.select(col("_g").as("g_a"), col("_p").as("_pa"),
      col("_m").as("_ma"), col("_n").as("_na"))
    val b = means.select(col("_g").as("g_b"), col("_p").as("_pb"),
      col("_m").as("_mb"), col("_n").as("_nb"))
    a.join(broadcast(b), col("_pa") === col("_pb") && col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b")
      .agg(max("_na").as("n_a"), max("_nb").as("n_b"),
        Portable.decSum(col("_ma") * col("_mb"), 12).as("_dot"),
        Portable.decSum(col("_ma") * col("_ma"), 12).as("_aa"),
        Portable.decSum(col("_mb") * col("_mb"), 12).as("_bb"),
        Portable.decSum((col("_ma") - col("_mb")) * (col("_ma") - col("_mb")), 12)
          .as("_d2"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        when(col("_aa") > 0 && col("_bb") > 0,
          Portable.pround(col("_dot") / (sqrt(col("_aa")) * sqrt(col("_bb"))), 6))
          .as("centroid_cos"),
        round(sqrt(col("_d2")), 9).as("centroid_l2"))
  }

  /** Simplified (centroid-based) silhouette per IVF cell: for each
    * vector, a = cosine distance to its OWN centroid, b = the nearest
    * OTHER centroid's distance, s = (b − a)/max(a, b) ∈ [−1, 1]; the
    * per-cell mean says which cells are tight (≈1), smeared (≈0), or
    * mis-partitioned (<0) — the index-health gate run after (re)training
    * an IVF quantizer, and the cheap O(n·k) stand-in for the O(n²)
    * full-pairwise silhouette (Rousseeuw 1987).
    *
    * Assignment is the artifact's own nearestCell (raw-dot argmax, ties
    * to the lowest cell — the committed quantizer's actual partition, so
    * the report audits the index as it IS). Everything is row-local
    * against the k·dim literal centroids until one k-cell hash agg; the
    * mean snapshots at decimal(28,12) then rounds (signed — a
    * mis-partitioned cell's mean is legitimately negative). Degenerate
    * max(a,b) ≤ 0 (vector exactly on two centroids) → NULL, excluded
    * from the mean's divisor.
    */
  def clusterSilhouette(corpus: DataFrame, idCol: String, vecCol: String,
                        centroids: Array[Array[Float]]): DataFrame = {
    val v = col(vecCol)
    val vnorm = sqrt(dotNative(v, v))
    val dists = centroids.map { c =>
      val clit = typedlit(c.toSeq)
      lit(1.0) - dotNative(v, clit) / (vnorm * sqrt(dotNative(clit, clit)))
    }
    val distArr = array(dists.toIndexedSeq: _*)
    val own = nearestCell(v, centroids)
    // r21: materialize the assignment and the distance array ONCE per row
    // behind a projection barrier — `own` (an argmax over k dots) used to
    // be re-evaluated inside the transform lambda PER ARRAY ELEMENT
    // (k × k × dim multiplies per row; CollapseProject keeps the barrier
    // because the reused expressions are non-cheap), and the scan spread
    // lets the row-local O(k·dim) work use every core on the
    // single-row-group bench file (structural no-op on real inputs)
    val staged = Portable.spreadSmallScan(corpus.select(col(vecCol)))
      .select(own.as("cell"), distArr.as("_d"))
    val a = element_at(col("_d"), col("cell") + 1)
    val b = array_min(transform(col("_d"),
      (x, i) => when(i === col("cell"), lit(Double.PositiveInfinity)).otherwise(x)))
    val s = when(greatest(a, b) > 0, (b - a) / greatest(a, b))
    staged.select(col("cell"), s.as("_s"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"),
        Portable.pround(Portable.decSum(col("_s"), 12) / count(col("_s")), 9)
          .as("mean_sil"))
      .orderBy("cell")
  }

  /** The deterministic ±1 Johnson-Lindenstrauss sign matrix: entry
    * (j, d) — projection row j in 0..k-1, input dim d in 1..dim (1-based,
    * the SQL subscript convention) — is +1 when bit 0 of the portable
    * md5 hash of "rp:j:d" is 0, else −1 (Achlioptas 2003: ±1 entries
    * satisfy the JL lemma with the same constants as Gaussians). Pure
    * function of the indices → any engine reproduces it exactly.
    */
  private[graft] def jlSigns(k: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k, dim) { (j, d0) =>
      val h = md.digest(s"rp:$j:${d0 + 1}".getBytes("UTF-8"))
      val word = java.lang.Long.parseLong(h.take(4).map(b => f"$b%02x").mkString, 16)
      if (word % 2 == 0) 1.0 else -1.0
    }
  }

  /** Johnson-Lindenstrauss distortion audit: project `vecCol` (dim
    * `dim`) to `k` dims through [[jlSigns]] (scaled 1/√k) and report,
    * for every probe pair (ids below `probeLimit`), the true vs
    * projected squared distance and their ratio — the measured evidence
    * (E[ratio] = 1, spread ~ √(2/k)) for using the projection as a
    * cheap ANN pre-filter at 100 TB: 4× fewer bytes per vector BEFORE
    * the index, with a known distance-distortion envelope.
    *
    * Engine parity: each projected coordinate is a fixed-order
    * left-to-right sum over the vector array (Spark `aggregate` =
    * DuckDB `list_reduce`, both sequential in array order) of exact
    * sign flips, divided by the correctly-rounded √k — identical
    * doubles in both engines; both squared distances are the same
    * fixed-order sums of squares.
    *
    * Scale shape: the projection is row-local (k·dim multiply-adds per
    * row, no shuffle); the audit join is probe×probe on a broadcast
    * row-limited frame. The full-corpus path a user would ship is the
    * projection alone — linear, embarrassingly parallel.
    */
  /** Quantized-retrieval recall audit: per probe, the top-k corpus
    * neighbors by exact float dot product vs by the int8-quantized
    * estimate sₐ·s_c·Σqₐq_c/127² ([[quantizeInt8]]'s dequantization
    * applied to scoring), reported as recall@k — the measured answer to
    * "can the 4×-smaller at-rest vectors serve first-stage retrieval".
    * The integer dot is EXACT in any engine (Σ of int8 products —
    * order-free), the scale product is one fixed double chain, and both
    * rankings tie-break on corpus id, so the whole audit hash-checks.
    *
    * Scale shape: probe frame broadcasts into one corpus scan (the
    * cosineTopK shape); both top-k windows ride ONE probe-hash exchange;
    * at corpus scale the quantized score would be served from the IVF
    * cells (C57) — this query measures what that costs in recall.
    */
  def int8Recall(df: DataFrame, idCol: String, vecCol: String,
                 k: Int, probeLimit: Int): DataFrame = {
    val q = quantizeInt8(df, idCol, vecCol)
    val base = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .join(q.select(col(idCol).as("_id"), col("scale").as("_s"),
        col("q").as("_q")), Seq("_id"))
    val probes = base.where(col("_id") < probeLimit)
      .select(col("_id").as("_pid"), col("_v").as("_pv"),
        col("_s").as("_ps"), col("_q").as("_pq"))
    val qdot = aggregate(
      zip_with(col("_pq"), col("_q"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val pairs = broadcast(probes).join(base, col("_pid") =!= col("_id"))
      .select(col("_pid"), col("_id"),
        dotNative(col("_pv"), col("_v")).as("_fs"),
        (col("_ps") * col("_s") * qdot.cast("double") / lit(16129.0d)).as("_qs"))
    val wF = Window.partitionBy("_pid").orderBy(col("_fs").desc, col("_id").asc)
    val wQ = Window.partitionBy("_pid").orderBy(col("_qs").desc, col("_id").asc)
    val topF = pairs.withColumn("_rn", row_number().over(wF))
      .where(col("_rn") <= k).select(col("_pid"), col("_id"))
    val topQ = pairs.withColumn("_rn", row_number().over(wQ))
      .where(col("_rn") <= k).select(col("_pid"), col("_id"))
    topF.join(topQ.withColumn("_hit", lit(1L)), Seq("_pid", "_id"), "left")
      .groupBy(col("_pid").as("probe_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
      .select(col("probe_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 6).as("recall"))
  }

  /** One-bit (sign) quantization retrieval recall (r19) — the extreme
    * end of the storage/recall ladder this engine already measures at
    * 4× (C222's int8) and 4×-dims (C216's JL): keep ONE bit per
    * dimension (the sign), 64× smaller than float32, and rank by sign
    * agreement — the Hamming estimate of angular similarity (Charikar
    * 2002: P[sign agree] = 1 − θ/π per dimension, so agreement count is
    * a monotone estimator of cosine). Per probe, top-k by exact float
    * dot vs top-k by agreement; the overlap IS the measured price of
    * serving retrieval from 1-bit vectors. Integer agreement counts
    * with id tie-breaks — no float ties can flip ranks cross-engine.
    *
    * Scale shape: the audit joins broadcast probes against the corpus
    * (the C222 shape); the production path stores the 64 sign bits
    * packed in one long per vector and serves xor+popcount — this
    * query measures whether that index would return the right answers.
    */
  def signRecall(df: DataFrame, idCol: String, vecCol: String,
                 k: Int, probeLimit: Int): DataFrame = {
    val base = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    val probes = base.where(col("_id") < probeLimit)
      .select(col("_id").as("_pid"), col("_v").as("_pv"))
    val agree = aggregate(
      zip_with(col("_pv"), col("_v"),
        (x, y) => when((x > 0f) === (y > 0f), 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    val pairs = broadcast(probes).join(base, col("_pid") =!= col("_id"))
      .select(col("_pid"), col("_id"),
        dotNative(col("_pv"), col("_v")).as("_fs"),
        agree.as("_hs"))
    val wF = Window.partitionBy("_pid").orderBy(col("_fs").desc, col("_id").asc)
    val wH = Window.partitionBy("_pid").orderBy(col("_hs").desc, col("_id").asc)
    val topF = pairs.withColumn("_rn", row_number().over(wF))
      .where(col("_rn") <= k).select(col("_pid"), col("_id"))
    val topH = pairs.withColumn("_rn", row_number().over(wH))
      .where(col("_rn") <= k).select(col("_pid"), col("_id"))
    topF.join(topH.withColumn("_hit", lit(1L)), Seq("_pid", "_id"), "left")
      .groupBy(col("_pid").as("probe_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
      .select(col("probe_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 6).as("recall"))
  }

  def jlDistortion(df: DataFrame, idCol: String, vecCol: String,
                   dim: Int, k: Int, probeLimit: Int): DataFrame = {
    val signs = jlSigns(k, dim)
    val scale = math.sqrt(k.toDouble)
    def dot(v: Column, row: Array[Double]): Column =
      aggregate(
        zip_with(v, typedLit(row.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0d), (acc, x) => acc + x)
    val projected = df
      .where(col(idCol) < probeLimit)
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        array((0 until k).map(j => dot(col(vecCol), signs(j)) / scale): _*)
          .as("_p"))
    def d2(a: Column, b: Column): Column =
      aggregate(
        zip_with(a, b, (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0d), (acc, x) => acc + x)
    projected.as("a").join(broadcast(projected.as("b")),
        col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        round(d2(col("a._v"), col("b._v")), 6).as("d2_true"),
        round(d2(col("a._p"), col("b._p")), 6).as("d2_proj"),
        when(d2(col("a._v"), col("b._v")) > 0,
          round(d2(col("a._p"), col("b._p")) / d2(col("a._v"), col("b._v")), 6))
          .as("distortion"))
      .orderBy("id_a", "id_b")
  }

  /** Participation ratio / effective rank of the embedding covariance
    * (r18b) — how many dimensions the embeddings ACTUALLY use:
    * PR = (Σλ)²/Σλ² = trace(C)²/‖C‖²_F, computed entirely from the
    * [[embeddingCovariance]] entries WITHOUT an eigendecomposition
    * (trace(C²) = ΣᵢⱼC²ᵢⱼ for symmetric C — the sum-of-squares over the
    * matrix, off-diagonals twice). PR near d means isotropic use of the
    * space; PR ≪ d means a few directions dominate — the one-number
    * justification for C216's JL compression and the matryoshka-style
    * truncation, and the anisotropy warning for cosine-ANN recall
    * (C138's covariance is the input; this is its summary).
    *
    * Portability: the covariance entries are ALREADY rounded at 6 dp by
    * C138's contract (bit-identical across engines); trace and ‖C‖²_F
    * are decimal-snapshotted sums of those rounded entries, and the one
    * final division is a fixed double shape. d×d rows in, one row out.
    */
  def participationRatio(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    participationRatioFromCov(embeddingCovariance(df, idCol, vecCol))

  /** [[participationRatio]]'s read over an already-computed covariance
    * frame (i, j, cov) — the shared tail that lets the MomentStore
    * serving path and the direct corpus fan produce identical bits.
    */
  def participationRatioFromCov(cov: DataFrame): DataFrame = {
    val diag = when(col("i") === col("j"), col("cov")).otherwise(lit(0.0))
    val sq = when(col("i") === col("j"), col("cov") * col("cov"))
      .otherwise(lit(2.0) * col("cov") * col("cov"))
    val agg = cov.agg(
      coalesce(sum(when(col("i") === col("j"), 1L).otherwise(0L)), lit(0L)).as("d"),
      Portable.decSum(diag, 12).as("_tr"),
      Portable.decSum(sq, 12).as("_fr"))
    agg.select(col("d"),
      Portable.pround(col("_tr"), 9).as("trace"),
      round(col("_fr"), 9).as("frob_sq"),
      when(col("_fr") > 0,
        Portable.pround(col("_tr") * col("_tr") / col("_fr"), 6))
        .as("participation_ratio"),
      when(col("_fr") > 0 && col("d") > 0,
        Portable.pround(col("_tr") * col("_tr") / col("_fr") /
          col("d").cast("double"), 6)).as("pr_fraction"))
  }

  /** Linear CKA between the raw embeddings and their k-dim JL projection
    * (r18b) — did the compression PRESERVE the representational geometry
    * (Kornblith et al. 2019): CKA(X,Y) = ‖C_xy‖²_F/(‖C_xx‖_F·‖C_yy‖_F)
    * over the centered cross/auto second moments, = 1 iff the two
    * representations agree up to rotation+scale. C216's distortion audit
    * checks pairwise DISTANCES on probe pairs; CKA is the global
    * single-number read over the WHOLE corpus — the promotion gate for
    * serving ANN from the compressed vectors.
    *
    * Portability/scale: Y = X·R/√k with C216's deterministic ±1 md5 sign
    * matrix (both engines replay R exactly; √k is correctly-rounded
    * IEEE); all three moment matrices come from ONE row-local (i,j)
    * upper-triangular fan over the CONCATENATED [x‖y] vector (the C138
    * shape — no self-join, map-side combinable, ONE corpus scan: the xx
    * block is i,j < d, the cross block i < d ≤ j, the yy block d ≤ i,j)
    * with exact decimal sums; each covariance entry rounds at 6 dp
    * BEFORE the Frobenius accumulation (the C138 contract), squares
    * decimal-snapshot into the three block sums in the SAME aggregate,
    * and the final ratio is fixed IEEE (two √, one divide). Fan width is
    * (d+k)(d+k+1)/2 per row — constant in corpus size.
    */
  def linearCka(df: DataFrame, vecCol: String, dim: Int, k: Int): DataFrame = {
    val signs = jlSigns(k, dim)
    val scale = math.sqrt(k.toDouble)
    def dot(v: Column, row: Array[Double]): Column =
      aggregate(
        zip_with(v, typedLit(row.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0d), (acc, x) => acc + x)
    val z = concat(
      transform(col(vecCol), x => x.cast("double")),
      array((0 until k).map(j => dot(col(vecCol), signs(j)) / scale): _*))
    val base = df.select(z.as("_z"))
    val cells = base.select(explode(flatten(transform(col("_z"), (x, i) =>
        transform(slice(col("_z"), i + 1, size(col("_z")) - i),
          (y, jj) => struct(i.as("i"), (i + jj).as("j"), (x * y).as("xy")))))).as("_p"))
      .select(col("_p.i").as("i"), col("_p.j").as("j"), col("_p.xy").as("xy"))
      .groupBy("i", "j")
      .agg(Portable.decSum(col("xy"), 12).as("_sxy"), count(lit(1)).as("n"))
    val means = base.select(posexplode(col("_z")))
      .select(col("pos").as("i"), col("col").as("x"))
      .groupBy("i").agg(Portable.decSum(col("x"), 12).as("_s"))
    val cov = Portable.canonZero(round(col("_sxy") / col("n") -
      (col("_si") / col("n")) * (col("_sj") / col("n")), 6))
    val inXx = col("i") < dim && col("j") < dim
    val inYy = col("i") >= dim && col("j") >= dim
    val sqSym = when(col("i") === col("j"), cov * cov).otherwise(lit(2.0) * cov * cov)
    val agg = cells
      .join(broadcast(means.select(col("i"), col("_s").as("_si"))), Seq("i"))
      .join(broadcast(means.select(col("i").as("j"), col("_s").as("_sj"))), Seq("j"))
      .agg(max("n").as("n"),
        Portable.decSum(when(inXx, sqSym).otherwise(lit(0.0)), 12).as("_cxx"),
        Portable.decSum(when(inYy, sqSym).otherwise(lit(0.0)), 12).as("_cyy"),
        Portable.decSum(when(!inXx && !inYy, cov * cov).otherwise(lit(0.0)), 12)
          .as("_cxy"))
    agg.select(col("n"), lit(dim.toLong).as("d"), lit(k.toLong).as("k"),
      round(col("_cxy"), 9).as("cross_frob_sq"),
      round(col("_cxx"), 9).as("x_frob_sq"),
      round(col("_cyy"), 9).as("y_frob_sq"),
      when(col("_cxx") > 0 && col("_cyy") > 0,
        Portable.pround(col("_cxy") / (sqrt(col("_cxx")) * sqrt(col("_cyy"))), 6))
        .as("cka"))
  }

  /** Rank-biased-overlap tail weights for [[rboProjection]] — shared
    * with the oracle generator as 12-dp literals: tail(m) =
    * Σ_{d=m..depth} (1−p)·p^{d−1}/d at p = ½, so every power is an
    * exact dyadic double and the fixed-order sum is deterministic.
    */
  private[graft] def rboTails(depth: Int): Array[Double] =
    Array.tabulate(depth) { i =>
      var s = 0.0
      ((i + 1) to depth).foreach(d => s += math.pow(0.5, d) / d)
      java.math.BigDecimal.valueOf(s)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue
    }

  /** Rank-biased overlap between the TRUE cosine ranking and the
    * JL-PROJECTED cosine ranking per probe (r18b) — the top-k RANKING
    * member of the compression-audit family (C216 checks pairwise
    * distances, C298 the global geometry; RBO asks the question serving
    * actually cares about: does the compressed index return the same
    * top results, weighted toward rank 1). Truncated RBO lower bound
    * (Webber et al. 2010) at persistence p = ½: each id in BOTH top-D
    * lists contributes tail(max(rank_true, rank_proj)) — algebraically
    * Σ_d (1−p)p^{d−1}·overlap_d/d — so the whole read is one join on
    * the two D-row shortlists plus literal-weight sums.
    *
    * Portability: both rankings use the shared fold-shape cosines with
    * corpus-id tie-breaks (bit-identical scores → identical ranks);
    * the tail weights enter as 12-dp literals computed once
    * driver-side ([[rboTails]] — the r17 constant convention). Scale:
    * probe set broadcast against the corpus (the [[cosineTopK]]
    * baseline shape), ONE probe-keyed exchange serves both rank
    * windows and the final aggregate.
    */
  def rboProjection(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                    kProj: Int, probeLimit: Int, depth: Int): DataFrame = {
    val signs = jlSigns(kProj, dim)
    val scale = math.sqrt(kProj.toDouble)
    def pdot(v: Column, row: Array[Double]): Column =
      aggregate(
        zip_with(v, typedLit(row.toSeq), (x, s) => x.cast("double") * s),
        lit(0.0d), (acc, x) => acc + x)
    val withProj = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      array((0 until kProj).map(j => pdot(col(vecCol), signs(j)) / scale): _*)
        .as("_p"))
    val q = withProj.where(col("_id") < probeLimit)
      .select(col("_id").as("query_id"), col("_v").as("_qv"), col("_p").as("_qp"))
    // true ranking rides the fused float expression; the projected
    // vectors are doubles, so their cosine takes the generic fold
    // (bit-identical shape — both are left folds over array order)
    val scored = withProj.join(broadcast(q), col("query_id") =!= col("_id"))
      .select(col("query_id"), col("_id").as("corpus_id"),
        cosineNative(col("_qv"), col("_v")).as("_st"),
        cosine(col("_qp"), col("_p")).as("_sp"))
      .repartition(col("query_id"))
    val wT = Window.partitionBy("query_id").orderBy(col("_st").desc, col("corpus_id").asc)
    val wP = Window.partitionBy("query_id").orderBy(col("_sp").desc, col("corpus_id").asc)
    val ranked = scored
      .withColumn("_ra", row_number().over(wT))
      .withColumn("_rb", row_number().over(wP))
      .where(col("_ra") <= depth && col("_rb") <= depth)
    val tails = typedLit(rboTails(depth).toSeq)
    val agg = ranked
      .groupBy("query_id")
      .agg(count(lit(1)).as("_ov"),
        Portable.decSum(element_at(tails, greatest(col("_ra"), col("_rb"))), 12)
          .as("_rbo"))
    // a probe whose shortlists are disjoint still gets its row (RBO 0)
    q.select(col("query_id")).join(broadcast(agg), Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("_ov"), lit(0L)).as("overlap_at_k"),
        round(coalesce(col("_rbo"), lit(0.0)), 9).as("rbo_min"))
  }

  // ── MomentStore serving paths (r19, VERDICT r18 item 1) ──────────────
  // Every reader below derives its audit from the persisted mergeable
  // moment partials (graft.sources.MomentStore) instead of re-scanning
  // the corpus: decimal partial sums merge EXACTLY (decimal addition is
  // exact, counts are longs), so each derived frame is bit-identical to
  // its direct corpus-fan sibling above and the DuckDB oracles are
  // unchanged (MomentStoreSpec pins artifact ≡ recompute per consumer).

  /** Global per-dimension first-moment totals of the store's `dims`
    * table: (i, _n: long, _s: decimal) summed over (source, cohort).
    */
  private def dimTotals(dims: DataFrame): DataFrame =
    dims.groupBy("i").agg(sum("n").as("_n"), sum("sx").as("_s"))

  /** [[embeddingCovariance]] served from the moment artifact — the
    * xx block (i, j < dim) of the cells table plus broadcast global
    * means; cov finalizes through the identical 6-dp contract.
    */
  def covarianceFromMoments(cells: DataFrame, dims: DataFrame, dim: Int): DataFrame = {
    val xx = cells.where(col("i") < dim && col("j") < dim)
      .select(col("i"), col("j"), (col("n_a") + col("n_b")).as("n"),
        (col("sxy_a") + col("sxy_b")).cast("double").as("_sxy"))
    val totals = dimTotals(dims.where(col("i") < dim))
      .select(col("i"), col("_s").cast("double").as("_sx"))
    xx
      .join(broadcast(totals.select(col("i"), col("_sx").as("_si"))), Seq("i"))
      .join(broadcast(totals.select(col("i").as("j"), col("_sx").as("_sj"))), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        Portable.canonZero(round(col("_sxy") / col("n") -
          (col("_si") / col("n")) * (col("_sj") / col("n")), 6)).as("cov"))
  }

  /** [[participationRatio]] served from the moment artifact: the
    * derived covariance into the shared [[participationRatioFromCov]]
    * tail.
    */
  def participationRatioFromMoments(cells: DataFrame, dims: DataFrame,
                                    dim: Int): DataFrame =
    participationRatioFromCov(covarianceFromMoments(cells, dims, dim))

  /** [[secondMomentDrift]] served from the moment artifact: the xx-block
    * cohort partials straight into the shared MMD tail — zero corpus
    * work at read time.
    */
  def secondMomentDriftFromMoments(cells: DataFrame, dim: Int): DataFrame =
    secondMomentDriftFromCells(
      cells.where(col("i") < dim && col("j") < dim)
        .select(col("i"), col("j"), col("n_a").as("_na"), col("n_b").as("_nb"),
          col("sxy_a").cast("double").as("_sa"),
          col("sxy_b").cast("double").as("_sb")))

  /** [[linearCka]] served from the moment artifact: the store's cells
    * ARE the [x‖y] fan's aggregate, so the whole read is the block
    * bookkeeping + one roll-up over 3,240 rows.
    */
  def ckaFromMoments(cells: DataFrame, dims: DataFrame, dim: Int, k: Int): DataFrame = {
    val c = cells.select(col("i"), col("j"), (col("n_a") + col("n_b")).as("n"),
      (col("sxy_a") + col("sxy_b")).cast("double").as("_sxy"))
    val totals = dimTotals(dims).select(col("i"), col("_s").cast("double").as("_sd"))
    val cov = Portable.canonZero(round(col("_sxy") / col("n") -
      (col("_si") / col("n")) * (col("_sj") / col("n")), 6))
    val inXx = col("i") < dim && col("j") < dim
    val inYy = col("i") >= dim && col("j") >= dim
    val sqSym = when(col("i") === col("j"), cov * cov).otherwise(lit(2.0) * cov * cov)
    val agg = c
      .join(broadcast(totals.select(col("i"), col("_sd").as("_si"))), Seq("i"))
      .join(broadcast(totals.select(col("i").as("j"), col("_sd").as("_sj"))), Seq("j"))
      .agg(max("n").as("n"),
        Portable.decSum(when(inXx, sqSym).otherwise(lit(0.0)), 12).as("_cxx"),
        Portable.decSum(when(inYy, sqSym).otherwise(lit(0.0)), 12).as("_cyy"),
        Portable.decSum(when(!inXx && !inYy, cov * cov).otherwise(lit(0.0)), 12)
          .as("_cxy"))
    agg.select(col("n"), lit(dim.toLong).as("d"), lit(k.toLong).as("k"),
      round(col("_cxy"), 9).as("cross_frob_sq"),
      round(col("_cxx"), 9).as("x_frob_sq"),
      round(col("_cyy"), 9).as("y_frob_sq"),
      when(col("_cxx") > 0 && col("_cyy") > 0,
        Portable.pround(col("_cxy") / (sqrt(col("_cxx")) * sqrt(col("_cyy"))), 6))
        .as("cka"))
  }

  /** [[sourceCentroidSimilarity]] served from the moment artifact: the
    * per-(source, dimension) first-moment partials merge across cohorts
    * into exactly the centroid means the direct doc-join fan produces;
    * the k²-bounded pair fan and the cosine/L2 shapes are unchanged.
    */
  def sourceCentroidSimilarityFromMoments(dims: DataFrame, dim: Int): DataFrame = {
    val means = dims.where(col("src").isNotNull && col("i") < dim)
      .groupBy(col("src").as("_g"), col("i").as("_p"))
      .agg((sum("sx").cast("double") / sum("n")).as("_m"),
        sum("n").as("_n"))
    val a = means.select(col("_g").as("g_a"), col("_p").as("_pa"),
      col("_m").as("_ma"), col("_n").as("_na"))
    val b = means.select(col("_g").as("g_b"), col("_p").as("_pb"),
      col("_m").as("_mb"), col("_n").as("_nb"))
    a.join(broadcast(b), col("_pa") === col("_pb") && col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b")
      .agg(max("_na").as("n_a"), max("_nb").as("n_b"),
        Portable.decSum(col("_ma") * col("_mb"), 12).as("_dot"),
        Portable.decSum(col("_ma") * col("_ma"), 12).as("_aa"),
        Portable.decSum(col("_mb") * col("_mb"), 12).as("_bb"),
        Portable.decSum((col("_ma") - col("_mb")) * (col("_ma") - col("_mb")), 12)
          .as("_d2"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        when(col("_aa") > 0 && col("_bb") > 0,
          Portable.pround(col("_dot") / (sqrt(col("_aa")) * sqrt(col("_bb"))), 6))
          .as("centroid_cos"),
        round(sqrt(col("_d2")), 9).as("centroid_l2"))
  }
}
