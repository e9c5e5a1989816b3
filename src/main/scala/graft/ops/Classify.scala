package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine trained classifiers over the document corpus (r20).
  *
  * The quality-classifier step of a production data pipeline (fastText /
  * DSIR-style): train ON the corpus, score the corpus, keep what clears
  * the bar. C178's Naive Bayes is the closed-form baseline of this
  * family; [[logisticRegression]] is the discriminative member — the
  * model an LLM-data curation run actually ships, trained here with the
  * same engine-portability discipline as the Cox fits (C311): every
  * per-iteration aggregate decimal-snapshots at 12 dp, the weight
  * catalog re-rounds each step, and the oracle replays the identical
  * iteration as unrolled CTE rounds.
  */
object Classify {

  /** Binary logistic regression over hashed token features (C317) —
    * majorize-minimize (bounded-curvature) Newton with L2 damping,
    * fixed iteration count, trained in-engine, evaluated in-sample.
    *
    * Features: C87's hashing trick (portable md5 → `nBuckets` buckets)
    * NORMALIZED to per-doc relative frequencies x_ij = tf_ij/len_i
    * (doc-length invariant — the form a quality classifier wants, and
    * the per-doc feature mass Σ_j x_ij = 1 is what bounds the step
    * below), plus an intercept pseudo-feature (bucket −1, x = 1). The
    * feature frame is checkpointed ONCE; every iteration reuses it.
    *
    * Step rule: the raw diagonal-Jacobi Newton DIVERGES here —
    * correlated buckets each move to explain the full residual, z
    * overshoots, the sigmoid saturates to exactly 0/1 after rounding,
    * the true curvature collapses to 0 and the next step is g/λ
    * (measured on sf0.001: weights reached 10⁴ and AUC fell below
    * random). Instead the per-coordinate curvature uses the
    * Cauchy-Schwarz majorizer for non-negative features,
    *   (Σ_j x_j v_j)² ≤ (Σ_j x_j)·(Σ_j x_j v_j²), Σ_j x_j = 2 here
    *   (1 feature mass + 1 intercept) and p(1−p) ≤ 1/4, so
    *   H ⪯ diag(h̃_j),  h̃_j = 0.5·Σ_i x_ij   (iteration-independent),
    * giving a GUARANTEED monotone ascent (the Collins-Schapire-Singer
    * parallel-update bound) that is at most 2× conservative vs the
    * true Newton diagonal — no tuning, no divergence. Per iteration:
    *   z_i = Σ_j x_ij·w_j            (per-term DECIMAL(28,12) — exact,
    *                                  order-free, bit-identical
    *                                  cross-engine)
    *   p_i = round(σ(z_i), 7)        (the ONE transcendental; its
    *                                  argument is an exactly-agreed
    *                                  double, and the 7-dp round gives
    *                                  a last-ulp libm disagreement
    *                                  ~1e-9 odds per eval of flipping
    *                                  a rounded value — same risk
    *                                  class as the NB per-token ln)
    *   g_j = Σ_i x_ij·(y_i − p_i)    (decimal-snapshotted)
    *   w_j ← round(w_j + (g_j − λ·w_j)/(h̃_j + λ), 9)    (+0.0 canon;
    *                                  9 dp, NOT 12 — weights sit at
    *                                  O(0.1–1), where 12 dp is digit
    *                                  ~13 of the mantissa and Spark's
    *                                  string-based BigDecimal round vs
    *                                  DuckDB's binary round disagree on
    *                                  real data (measured: 6 of 216
    *                                  updates flipped the 12th dp); at
    *                                  9 dp the boundary is ~1e7 ulps
    *                                  wide and both engines agree)
    * Updates are driver-side over the bucket catalog — ≤ nBuckets+1
    * doubles per iteration, the C135 DSIR model-sized read,
    * re-broadcast each round.
    *
    * Read-out: one row per bucket (weight catalog) with the in-sample
    * evaluation repeated — n, n_pos, Mann-Whitney AUC of the final
    * linear score z (z is decimal-exact, so ranks agree cross-engine;
    * ties via the C-auc rank form), and accuracy at the z > 0 decision
    * boundary (exact comparison of an exact z — no probability
    * rounding on the decision path).
    *
    * Scale shape: training touches the corpus 2·iters times through
    * the checkpointed (doc, bucket, x) frame — hash-agg shuffles keyed
    * by doc then bucket, nothing wider than the feature frame ever
    * moves, and the model never exceeds the bucket catalog. The AUC
    * read-out reduces to the distinct-z catalog before its single rank
    * window (the C-auc shape with one logical group); at 100 TB you'd
    * stratify the AUC per source or sample — the training loop itself
    * needs neither.
    */
  def logisticRegression(df: DataFrame, idCol: String, textCol: String,
                         labelCol: Column, nBuckets: Int = 64,
                         iters: Int = 8, lambda: Double = 0.1): DataFrame = {
    val docs = df.select(col(idCol).as("_id"),
      labelCol.cast("boolean").cast("long").as("_y"))
    // r21 (guide §8): the doc-keyed exchange moves BEFORE the token
    // fan-out — repartitioning the compact (id, text) rows parallelizes
    // the explode+md5 stage (the single-file scan is one task) and
    // hash(_id) satisfies every downstream per-doc aggregate and join,
    // so the exploded token stream never crosses an exchange
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val tok = df.repartition(nPart, col(idCol))
      .select(col(idCol).as("_id"),
        explode(TextOps.tokens(col(textCol))).as("_w"))
    val counts = tok
      .withColumn("_b", Portable.hash32(col("_w")) % nBuckets)
      .groupBy("_id", "_b").agg(count(lit(1)).as("_cnt"))
    val docLen = counts.groupBy("_id").agg(sum("_cnt").as("_len"))
    val feat = counts.join(docLen, Seq("_id"))
      .select(col("_id"), col("_b"),
        (col("_cnt").cast("double") / col("_len").cast("double")).as("_x"))
    // r21 optimization (guide §2.3/§2.4): the training loop used to keep
    // the feature frame in EXPLODED (doc, bucket, x) form, so every
    // iteration paid a groupBy(_id) shuffle to rebuild z, a join back to
    // the labels, and a second shuffle of the whole feature frame into
    // the gradient's groupBy(_b) — three exchanges per round. Grouping
    // ONCE to a per-doc feature array (docs × ≤ nBuckets+1 entries, the
    // same bytes) makes z a row-local array aggregate (zero shuffles)
    // and leaves exactly ONE exchange per round: the bucket-keyed
    // gradient aggregate, which is the transpose the algorithm
    // fundamentally needs. Every per-term product still snapshots to
    // DECIMAL(28,12) before an exact decimal sum (sum(decimal(28,12))
    // accumulates in decimal(38,12); the array fold below uses the same
    // accumulator type), so z and g are bit-identical to the exploded
    // form — regrouping an exact sum is order-free.
    // the intercept pseudo-feature (bucket −1, x = 1) appends ROW-LOCALLY
    // after grouping (same multiset of (b, x) terms as the former
    // unionByName row; the union defeated the co-partitioning above) —
    // the left join keeps token-free docs, which carry just the intercept
    val intercept = array(struct(lit(-1L).as("_b"), lit(1.0d).as("_x")))
    val docFeat = docs
      .join(feat.groupBy("_id")
        .agg(collect_list(struct(col("_b"), col("_x"))).as("_f0")),
        Seq("_id"), "left")
      .select(col("_id"), col("_y"),
        when(col("_f0").isNull, intercept)
          .otherwise(concat(col("_f0"), intercept)).as("_fs"))
      .localCheckpoint(true)
    val spark = df.sparkSession

    // iteration-independent majorized curvature per bucket (off the
    // checkpointed per-doc frame: same terms, one cheap explode)
    val curv: Map[Long, Double] = docFeat
      .select(explode(col("_fs")).as("_f"))
      .groupBy(col("_f._b").as("_b"))
      .agg((Portable.decSum(col("_f._x"), 12) * lit(0.5d)).as("_hh"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var w: Map[Long, Double] = curv.keys.map(_ -> 0.0d).toMap

    def weightFrame(m: Map[Long, Double]): DataFrame = {
      import spark.implicits._
      m.toSeq.sortBy(_._1).toDF("_b", "_w")
    }
    // The weight lookup is a LITERAL MAP expression, not a broadcast
    // join: the model is bucket-catalog-sized and changes every round,
    // so joining it costs a fresh broadcast + join per iteration (8 of
    // each) where a codegen'd element_at costs nothing — and the values
    // are identical doubles either way. Every observed bucket is a key
    // (w is initialized from the feature frame's bucket set), so the
    // lookup never misses.
    // z_i = Σ_j x_ij·w_j as a row-local fold over the feature array:
    // each term casts to DECIMAL(28,12) exactly as Portable.decSum does,
    // the accumulator is the same decimal(38,12) a builtin
    // sum(decimal(28,12)) uses, and the exact result casts to double —
    // bit-identical to the former groupBy(_id) aggregate, minus its
    // exchange.
    def zCol(m: Map[Long, Double]): Column = {
      val wMap = map(m.toSeq.sortBy(_._1)
        .flatMap { case (b, v) => Seq(lit(b), lit(v)) }: _*)
      // accumulator stays decimal(32,12): the + result (decimal(33,12))
      // casts back losslessly each step (|z| ≪ 10^20), so every addition
      // is exact — a decimal(38,12) accumulator would widen to the
      // precision cap and Spark would shave the scale to 11
      // coalesce replicates sum()'s null-SKIP for any term the decimal
      // cast would null (unreachable today — every bucket has a weight
      // and |x·w| ≪ 10^16 — but the fold would otherwise null-poison
      // the whole doc where the old aggregate skipped one term)
      aggregate(col("_fs"), lit(0).cast("decimal(32,12)"),
        (acc, f) => (acc + coalesce(
          (f.getField("_x") * element_at(wMap, f.getField("_b")))
            .cast("decimal(28,12)"),
          lit(0).cast("decimal(28,12)"))).cast("decimal(32,12)")).cast("double")
    }

    for (_ <- 0 until iters) {
      val g = docFeat
        .select(col("_fs"), col("_y"),
          round(lit(1.0d) / (lit(1.0d) + exp(-zCol(w))), 7).as("_p"))
        .select(explode(col("_fs")).as("_f"), col("_y"), col("_p"))
        .groupBy(col("_f._b").as("_b"))
        .agg(Portable.decSum(col("_f._x") * (col("_y") - col("_p")), 12).as("_g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      w = w.map { case (b, wb) =>
        val step = wb + (g.getOrElse(b, 0.0d) - lambda * wb) /
          (curv(b) + lambda)
        b -> (java.math.BigDecimal.valueOf(step)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue + 0.0d)
      }
    }

    val scored = docFeat.select(col("_id"), col("_y"), zCol(w).as("_z"))
    val eval = Profiling.rocAuc(scored.withColumn("_grp", lit("all")),
        "_grp", col("_z"), col("_y") === 1)
      .select(col("n"), col("n_pos"), col("auc"))
    val acc = scored.agg(
      (sum(when((col("_z") > 0) === (col("_y") === 1), 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double")).as("acc"))
    weightFrame(w).select(col("_b").as("bucket"), col("_w").as("weight"))
      .crossJoin(broadcast(eval))
      .crossJoin(broadcast(acc))
  }
}
