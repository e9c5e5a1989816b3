package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming counterparts of the batch event operators
  * (graft.ops.EventOps). The reference itself is batch-only (SURVEY.md
  * §2.10), but the engine's event ops are designed to promote to streams:
  * the same `window()` aggregation works under `readStream` + watermark,
  * and gap sessionization maps to `flatMapGroupsWithState` with an
  * event-time timeout.
  *
  * Scale posture: state is bounded per key — the windowed agg keeps one
  * partial aggregate per (key, window) until the watermark passes; the
  * sessionizer keeps one open session per key, flushed on gap timeout.
  */
object StreamingOps {

  /** One-frame checkpointed state cell with GENERATION-BASED RETIREMENT
    * (ADVICE r10 item 1, applied uniformly to every foreachBatch state):
    * `swap` releases the frame retired by the PREVIOUS trigger, moves the
    * current frame to retired (still pinned), and installs the new one.
    * A lazy plan a finalizer captured over the current frame therefore
    * stays executable across one subsequent trigger — an immediate
    * release would truncate its lineage mid-flight — and every frame is
    * still freed DETERMINISTICALLY one trigger later (not whenever the
    * JVM happens to GC the RDD reference). Owners call `swap` under
    * their own mergeBatch lock; reads are volatile.
    */
  private final class RetiringFrame {
    @volatile private var cur: Option[DataFrame] = None
    @volatile private var retired: Option[DataFrame] = None
    def get: Option[DataFrame] = cur
    def swap(next: DataFrame): Unit = {
      retired.foreach(graft.ops.SessionMemo.releaseCheckpoint)
      retired = cur
      cur = Some(next)
    }
  }

  /** Watermarked tumbling-window aggregation — the streaming twin of
    * EventOps.tumblingWindowStats. Works on any DataFrame with (keyCol,
    * tsCol: timestamp, valueCol: double); on a streaming input it emits
    * finalized windows once the watermark passes (append mode).
    */
  def windowedStats(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                    width: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), window(col(tsCol), width).as("win"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol), col("win.start").as("win_start"), col("n_events"), col("sum_value"))

  /** File-source streaming twin of the batch tumbling windows: watch a
    * directory for arriving event files (the landing-zone pattern — each
    * upstream batch drops parquet parts, the stream picks them up
    * incrementally) and maintain the same windowed aggregation.
    * `maxFilesPerTrigger` bounds per-micro-batch ingest so a backlog
    * replays with bounded memory instead of one giant batch.
    */
  def fileStreamWindowedStats(spark: org.apache.spark.sql.SparkSession,
                              inputDir: String,
                              schema: org.apache.spark.sql.types.StructType,
                              keyCol: String, tsCol: String, valueCol: String,
                              width: String, watermarkDelay: String,
                              maxFilesPerTrigger: Int = 16): DataFrame =
    windowedStats(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(inputDir),
      keyCol, tsCol, valueCol, width, watermarkDelay)

  /** Streaming incremental-aggregation maintenance (VERDICT r6 item 6) —
    * the streaming twin of Relational.partialAggs/mergePartialAggs (C45):
    * each micro-batch collapses to its per-key monoid state (count +
    * exact decimal sum) and merges into the running base — history is
    * never rescanned; per-trigger cost is O(micro-batch) + O(|keys|).
    * Because count and decimal-sum are associative/commutative, the
    * maintained state is BIT-IDENTICAL to a one-pass aggregate of
    * everything that has arrived, whatever the micro-batch boundaries —
    * the convergence FileStreamingSpec asserts. The state is re-grouped
    * and checkpoint-materialized per merge so its lineage and size stay
    * one row per key, not one plan node per trigger.
    *
    * Attach with `stream.writeStream.foreachBatch(state.mergeBatch _)`
    * (the foreachBatch hook is how a streaming job maintains an external
    * materialized view transactionally — at scale the state table would
    * live in the warehouse; here it is a session DataFrame).
    */
  final class IncrementalAggState(keys: Seq[String], valueCol: String) {
    private val partial = new RetiringFrame
    private var lastBatchId: Long = -1L

    /** Idempotent under foreachBatch's replay contract: after a failure
      * Structured Streaming re-delivers the SAME batchId with the same
      * data, and a sum-monoid merge applied twice would double-count —
      * the classic exactly-once bug in hand-rolled materialized views.
      * Batch ids are monotonically increasing, so tracking the last
      * applied id and skipping ≤ it makes re-delivery a no-op; the
      * warehouse analogue transactionally commits (state, batchId)
      * together.
      */
    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.Relational.partialAggs(batch, keys, valueCol)
      val merged = partial.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy(keys.map(col): _*)
          .agg(sum("n").as("n"), sum("_dec_total").as("_dec_total"))
        case None => p
      }
      partial.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Finalized view (n, total, avg) of everything merged so far.
      *
      * ONE-TRIGGER validity (ADVICE r11): the returned plan reads the
      * current state frame, which [[RetiringFrame]] retires on the next
      * `mergeBatch` and RELEASES on the one after — so a plan held
      * across two or more triggers fails on truncated lineage. (Before
      * the r11 retirement rework replaced frames were never freed, so
      * long-captured plans happened to stay executable; that was a
      * leak, not a contract.) Execute promptly, or re-call `finalized`
      * after each trigger for a fresh plan. The same lifecycle applies
      * to every foreachBatch state in this file.
      */
    def finalized: Option[DataFrame] =
      partial.get.map(p => graft.ops.Relational.mergePartialAggs(Seq(p), keys))
  }

  /** Streaming approximate-distinct maintenance — the streaming twin of
    * Profiling.hllDistinct (C125): each micro-batch reduces to its
    * per-(group, register) HLL rank table and max-merges into the running
    * registers. MAX is the HLL merge monoid, so the maintained state is
    * EXACTLY the whole-stream sketch whatever the micro-batch boundaries
    * or arrival order — the same bit-exact convergence claim as
    * IncrementalAggState's (count, sum) monoid, on sketch state. State
    * size is |groups|·64 rows forever, the whole point of sketching an
    * unbounded stream. Same idempotent-replay contract (re-delivered
    * batchIds are no-ops).
    */
  final class HllDistinctState(groupCols: Seq[String], valueCol: String) {
    private val registers = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.Profiling.hllRegisters(batch, groupCols, valueCol)
      val merged = registers.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy((groupCols :+ "_idx").map(col): _*)
          .agg(max("_r").as("_r"))
        case None => p
      }
      // The eager checkpoint fully materializes `merged`; the replaced
      // frame retires for one trigger (captured plans stay executable)
      // and is then released, so long-running streams hold at most TWO
      // O(|state|) frames (ADVICE r8 bound + ADVICE r10 retirement).
      registers.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current estimates — the SAME finalization as the batch operator
      * (Profiling.hllEstimate), so stream-vs-batch convergence is
      * hash-exact.
      */
    def finalized: Option[DataFrame] =
      registers.get.map(graft.ops.Profiling.hllEstimate(_, groupCols))
  }

  /** Streaming histogram maintenance — the streaming twin of the C126
    * histogram-quantile sketch, with edges FIXED up front (a stream
    * cannot know its final min/max; production picks edges from a
    * historical profile). Per-micro-batch bin counts SUM-merge into the
    * running histogram — sum is the histogram merge monoid, so the
    * maintained state equals the batch whole-corpus histogram exactly
    * for any micro-batch boundaries (the count-min / HLL convergence
    * claim, on binned counts). State is |groups|·nBins rows forever.
    */
  final class HistogramState(groupCols: Seq[String], valueCol: String,
                             lo: Double, hi: Double, nBins: Int) {
    private val counts = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.Profiling.histogramCounts(batch, groupCols, valueCol, lo, hi, nBins)
      val merged = counts.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy((groupCols :+ "_bin").map(col): _*)
          .agg(sum("_cnt").as("_cnt"))
        case None => p
      }
      counts.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current histogram (group cols, _bin, _cnt). */
    def finalized: Option[DataFrame] = counts.get
  }

  /** Streaming PSI drift maintenance — the streaming twin of C181's
    * q_psi: each micro-batch reduces to its (bin, ref-count, cur-count)
    * rows, which SUM-merge into the running per-bin cohort counts — sum
    * is the PSI's merge monoid, so the maintained counts equal the
    * batch whole-corpus counts exactly for any micro-batch boundaries
    * or arrival order (the HistogramState convergence claim), and the
    * report derived from them at read time is hash-identical to the
    * batch q_psi. State is ≤ 64 symbolic bit-length bins forever; the
    * add-1 smoothing, shares, and rolled-up psi come from the SAME
    * Profiling arithmetic the batch path uses (no second formula to
    * drift). Batch-id replay is a no-op (the exactly-once contract).
    */
  final class PsiDriftState(cohortCol: Column, valueCol: Column) {
    private val counts = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.Profiling.psiBinnedCounts(batch, cohortCol, valueCol)
      val merged = counts.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("bin").agg(sum("_ca").as("_ca"), sum("_cb").as("_cb"))
        case None => p
      }
      counts.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current PSI report — identical shape and hashes to batch q_psi. */
    def finalized: Option[DataFrame] =
      counts.get.map(graft.ops.Profiling.psiFromCounts)
  }

  /** Streaming KMV distinct-sketch maintenance — the streaming twin of
    * C210's q_kmv_distinct: each micro-batch reduces to its distinct
    * (group, portable-hash) rows truncated to the k smallest per group,
    * which keep-smallest-k-merge into the running sketch. Smallest-k
    * under union is an idempotent, associative, commutative monoid (the
    * kmvMergeProof property run continuously), so the maintained sketch
    * equals the batch whole-corpus sketch EXACTLY for any micro-batch
    * boundaries or arrival order, and the estimate derived at read time
    * is bit-identical to the batch `kmv_estimate` column (same shared
    * Profiling arithmetic — no second formula to drift). State is
    * ≤ |groups|·k hashes forever. Batch-id replay is a no-op (the
    * exactly-once contract); so is re-delivery of already-seen values
    * (distinct hashes — dedup is free, unlike counter sketches).
    */
  final class KmvState(groupCol: String, valueCol: Column, k: Int) {
    private val sketch = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.Profiling.kmvSmallestK(
        graft.ops.Profiling.kmvHashes(batch, groupCol, valueCol), groupCol, k)
      val merged = sketch.get match {
        case Some(prev) =>
          graft.ops.Profiling.kmvSmallestK(prev.unionByName(p), groupCol, k)
        case None => p
      }
      sketch.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current (group, kmv_estimate) — bit-identical to the batch
      * q_kmv_distinct estimate column. */
    def finalized: Option[DataFrame] =
      sketch.get.map(graft.ops.Profiling.kmvEstimateFromSketch(_, groupCol, k))

    /** Current pairwise (ga, gb, jaccard_est) — the streaming twin of
      * C260's q_kmv_jaccard estimate column (VERDICT r16 item 6). The
      * SAME maintained smallest-k sketches serve both reads: the merge
      * monoid makes the sketch equal the batch whole-corpus sketch for
      * any micro-batch boundaries, and the shared
      * kmvJaccardFromSketches arithmetic makes the derived estimate
      * bit-identical to the batch column. The exact-Jaccard audit
      * columns are batch-only by design — they need the full hash sets,
      * which streaming state intentionally does not keep.
      */
    def pairwiseJaccard: Option[DataFrame] =
      sketch.get.map(graft.ops.Profiling.kmvJaccardFromSketches(_, groupCol, k))
  }

  /** Streaming group-moment maintenance at decimal(28,6) — the streaming
    * twin of C275's q_source_influence (r17): per-group (count, decimal
    * sum) is the canonical ADDITIVE monoid, so moments merged at any
    * micro-batch boundary or arrival order equal the whole-corpus batch
    * moments EXACTLY, and the influence derived at read time — through
    * the same [[graft.ops.Profiling.jackknifeFromMoments]] arithmetic the
    * batch operator uses — is bit-identical to the batch
    * q_source_influence rows (one formula, two callers). State is one
    * (n, Σ) row per group forever; batch-id replay is a no-op (the
    * IncrementalAggState exactly-once contract; this is that state at
    * the batch jackknife's decimal scale with the influence read
    * attached).
    */
  final class GroupMomentsState(groupCol: String, valueCol: Column) {
    private val moments = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = batch.where(valueCol.isNotNull)
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("_n"),
          sum(valueCol.cast("double").cast("decimal(28,6)")).as("_dec"))
      val merged = moments.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy(groupCol)
          .agg(sum("_n").as("_n"), sum("_dec").as("_dec"))
        case None => p
      }
      moments.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current per-group jackknife influence table — bit-identical to
      * the batch q_source_influence rows over everything merged so far.
      */
    def influence: Option[DataFrame] =
      moments.get.map(p => graft.ops.Profiling.jackknifeFromMoments(
        p.select(col(groupCol), col("_n"), col("_dec").cast("double").as("_s")),
        groupCol))
  }

  /** Streaming SPRT maintenance — the streaming twin of C277's q_sprt
    * (r17), and the operator whose NATURAL home is a stream: a
    * sequential test exists to be evaluated as data arrives. Per-day
    * (n, n_hit) Bernoulli counts are the additive monoid, so counts
    * merged at any micro-batch boundary — including late events
    * back-filling an earlier day — equal the batch daily counts exactly,
    * and the LLR walk + first-crossing decision derived at read time
    * (through the same [[graft.ops.EventOps.sprtFromDaily]] arithmetic)
    * is bit-identical to the batch q_sprt rows. State is one row per
    * day forever; batch-id replay is a no-op.
    */
  final class SprtState(tsCol: String, hitCol: Column,
                        p0: Double, p1: Double, alpha: Double, beta: Double) {
    private val daily = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = batch.where(hitCol.isNotNull && col(tsCol).isNotNull)
        .groupBy(to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(hitCol.cast("boolean"), 1L).otherwise(0L)).as("n_hit"))
      val merged = daily.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("day")
          .agg(sum("n").as("n"), sum("n_hit").as("n_hit"))
        case None => p
      }
      daily.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current per-day walk + decisions — bit-identical to the batch
      * q_sprt rows over everything merged so far.
      */
    def decisions: Option[DataFrame] =
      daily.get.map(p => graft.ops.EventOps.sprtFromDaily(p, p0, p1, alpha, beta))

    /** Current e-value walk + anytime-valid p (C278, r18) — the SAME
      * maintained day counts serve both sequential monitors; bit-identical
      * to the batch q_evalue rows over everything merged so far.
      */
    def eValues: Option[DataFrame] =
      daily.get.map(p => graft.ops.EventOps.eProcessFromDaily(p, p0, p1, alpha))
  }

  /** Streaming Fano/overdispersion maintenance — the streaming twin of
    * C294's q_fano (r18b): burstiness is a monitoring read, so its
    * natural home is a continuously-updated state. Per-(key, day)
    * counts are the additive monoid (late events back-filling an
    * earlier day merge exactly like the SPRT's), and the dense-grid
    * dispersion derives at read time through the SAME
    * [[graft.ops.TimeSeries.fanoFromDaily]] arithmetic — bit-identical
    * to the batch q_fano rows over everything merged so far. State is
    * one row per (key, day) forever; batch-id replay is a no-op.
    */
  final class FanoState(keyCol: String, tsCol: String, chi2Crit: Double) {
    private val daily = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = batch.where(col(tsCol).isNotNull)
        .groupBy(col(keyCol).as("_k"), to_date(col(tsCol)).as("_day"))
        .agg(count(lit(1)).as("_c"))
      val merged = daily.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("_k", "_day")
          .agg(sum("_c").as("_c"))
        case None => p
      }
      daily.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current per-key dispersion table — bit-identical to the batch
      * q_fano rows over everything merged so far.
      */
    def dispersion: Option[DataFrame] =
      daily.get.map(p => graft.ops.TimeSeries.fanoFromDaily(p, keyCol, chi2Crit))
  }

  /** Streaming calibration maintenance — the streaming twin of C187's
    * q_calibration AND C295's q_brier (r18b): calibration is a DRIFT
    * property (a score honest on last month's corpus quietly stops being
    * honest as the mix shifts), so its natural home is a continuously
    * updated state. Per-bin (n, positives, Σscore, Σ(score−y)²) with the
    * sums as DECIMALS is the additive monoid
    * ([[graft.ops.Profiling.scoreBins]]); both the reliability report
    * and the Murphy decomposition derive at read time through the SAME
    * `calibrationFromBins`/`brierFromBins` arithmetic — bit-identical to
    * the batch rows over everything merged so far (one state, two
    * monitors, the SprtState precedent). `rowFilter` pre-guards rows the
    * score expression cannot evaluate (e.g. zero-token docs — ANSI
    * double division throws). State is nBins rows forever; batch-id
    * replay is a no-op.
    */
  final class CalibrationBinsState(scoreCol: Column, labelCol: Column,
                                   nBins: Int, rowFilter: Column) {
    private val bins = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.Profiling.scoreBins(
        batch.where(rowFilter), scoreCol, labelCol, nBins)
      val merged = bins.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("bin")
          .agg(sum("n").as("n"), sum("n_pos").as("n_pos"),
            sum("_ssd").as("_ssd"), sum("_sqd").as("_sqd"))
        case None => p
      }
      bins.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current reliability table + ECE — bit-identical to the batch
      * q_calibration rows over everything merged so far.
      */
    def report: Option[DataFrame] =
      bins.get.map(graft.ops.Profiling.calibrationFromBins)

    /** Current Murphy decomposition — bit-identical to the batch
      * q_brier row over everything merged so far.
      */
    def brier: Option[DataFrame] =
      bins.get.map(graft.ops.Profiling.brierFromBins)
  }

  /** Streaming source-mix concentration — the streaming twin of C301's
    * q_hhi (r18b): corpus concentration is an INGESTION property (one
    * domain quietly swallowing the mix is exactly what a crawl monitor
    * exists to catch), so the per-group decimal weight sums are
    * maintained as the additive monoid and HHI + effective source count
    * derive at read time through the SAME
    * [[graft.ops.Profiling.hhiFromSums]] arithmetic — bit-identical to
    * the batch q_hhi row over everything merged so far. State is one
    * row per group forever; batch-id replay is a no-op.
    */
  final class HhiState(groupCol: String, weightCol: Column) {
    private val sums = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = batch.where(weightCol.isNotNull)
        .groupBy(col(groupCol).as("_g"))
        .agg(sum(weightCol.cast("double").cast("decimal(28,6)")).as("_sd"))
      val merged = sums.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("_g").agg(sum("_sd").as("_sd"))
        case None => p
      }
      sums.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current concentration row — bit-identical to the batch q_hhi row
      * over everything merged so far.
      */
    def concentration: Option[DataFrame] =
      sums.get.map(graft.ops.Profiling.hhiFromSums)
  }

  /** Streaming second-moment maintenance — the streaming twin of the
    * MomentStore family (VERDICT r18 item 2): C308's cohort drift,
    * C138's covariance, C297's participation ratio, and C298's linear
    * CKA all derive from the per-(i,j) cohort-conditional decimal
    * second-moment partials of the concatenated [x ‖ y] vector plus the
    * per-dimension first moments — an additive monoid (decimal addition
    * is exact, counts are longs), so ONE maintained state serves all
    * four monitors bit-identically to their batch reads over everything
    * merged so far (the CalibrationBinsState two-reads-one-state
    * precedent, taken to four). Representation drift is exactly the
    * property a crawl-ingestion monitor wants continuously: "the new
    * batch moved the embedding distribution's SHAPE" fires long before
    * retrieval quality visibly dies.
    *
    * State is (dim+k)(dim+k+1)/2 cell rows + (dim+k) dim rows forever —
    * corpus-size-independent, the same frames [[graft.sources
    * .MomentStore]] persists (a checkpointed state could be WRITTEN as
    * the store). Batch-id replay is a no-op; arrival order is
    * irrelevant (pure sums).
    */
  final class MomentState(idCol: String, vecCol: String) {
    private val cells = new RetiringFrame
    private val dims = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val base = batch.select(
        graft.sources.MomentStore.refCohort(col(idCol)).as("_ref"),
        graft.sources.MomentStore.zVector(col(vecCol)).as("_z"))
        .localCheckpoint(true)
      val z = col("_z")
      val pc = base.select(col("_ref"),
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
      val pd = base.select(posexplode(z))
        .select(col("pos").as("i"), col("col").as("x"))
        .groupBy("i")
        .agg(count(lit(1)).as("n"), sum(col("x").cast("decimal(28,12)")).as("sx"))
      val mergedCells = cells.get match {
        case Some(prev) => prev.unionByName(pc)
          .groupBy("i", "j")
          .agg(sum("n_a").as("n_a"), sum("n_b").as("n_b"),
            sum("sxy_a").as("sxy_a"), sum("sxy_b").as("sxy_b"))
        case None => pc
      }
      val mergedDims = dims.get match {
        case Some(prev) => prev.unionByName(pd)
          .groupBy("i").agg(sum("n").as("n"), sum("sx").as("sx"))
        case None => pd
      }
      // Materialize BOTH merged frames before swapping EITHER (ADVICE
      // r19 item 4): with the old swap-then-checkpoint order, a failure
      // in the dims checkpoint left cells already advanced while
      // lastBatchId was not — so the replayed batch double-counted into
      // cells. Checkpointing first makes a mid-merge failure leave the
      // state untouched and replay a true no-op.
      val ckCells = mergedCells.localCheckpoint(true)
      val ckDims =
        try mergedDims.localCheckpoint(true)
        catch { case t: Throwable =>
          graft.ops.SessionMemo.releaseCheckpoint(ckCells); throw t
        }
      cells.swap(ckCells)
      dims.swap(ckDims)
      lastBatchId = batchId
    }

    /** Current cohort second-moment drift — bit-identical to the batch
      * q_moment_drift row over everything merged so far.
      */
    def drift: Option[DataFrame] = cells.get.map(c =>
      graft.ops.VectorOps.secondMomentDriftFromMoments(
        c, graft.sources.MomentStore.Dim))

    /** Current covariance matrix — bit-identical to the batch
      * q_embed_cov rows over everything merged so far.
      */
    def covariance: Option[DataFrame] = for (c <- cells.get; d <- dims.get)
      yield graft.ops.VectorOps.covarianceFromMoments(
        c, d, graft.sources.MomentStore.Dim)

    /** Current participation ratio — bit-identical to the batch
      * q_effective_rank row over everything merged so far.
      */
    def participation: Option[DataFrame] = for (c <- cells.get; d <- dims.get)
      yield graft.ops.VectorOps.participationRatioFromMoments(
        c, d, graft.sources.MomentStore.Dim)

    /** Current linear CKA — bit-identical to the batch q_cka row over
      * everything merged so far.
      */
    def cka: Option[DataFrame] = for (c <- cells.get; d <- dims.get)
      yield graft.ops.VectorOps.ckaFromMoments(c, d,
        graft.sources.MomentStore.Dim, graft.sources.MomentStore.K)
  }

  /** Streaming split-conformal maintenance — the streaming twin of C270's
    * q_conformal (VERDICT r17 item 4): a distribution-free monitoring band
    * exists to be re-read as data arrives. Two pieces of state:
    *
    *  - the (is-calibration, score, count) CATALOG — an additive monoid
    *    (counts sum), and the ONLY input the conformal read needs: q̂ pick
    *    and coverage derive through the SAME
    *    [[graft.ops.Profiling.conformalFromScoreCounts]] arithmetic as
    *    the batch rows, so a correctly-maintained catalog is bit-identical
    *    by construction. Bounded by the distinct 6-dp-rounded residuals,
    *    never by stream length.
    *  - a per-unit (last order, last value) BOUNDARY row, so the
    *    persistence residual of each unit's first row in a batch scores
    *    against its true predecessor across the batch boundary. One row
    *    per unit forever.
    *
    * Ordering contract: rows must arrive in `orderCol` order WITHIN each
    * unit (batch boundaries may split a unit anywhere) — the persistence
    * residual is inherently sequential, so a late row inserted between two
    * already-scored neighbours would need their pair re-scored; unlike
    * the SPRT's additive day counts, that cannot be repaired from compact
    * state. Batch-id replay is a no-op.
    */
  final class ConformalState(unitCol: String, orderCol: String, tsCol: String,
                             valueCol: Column, splitDay: Int, alpha: Double) {
    private val catalog = new RetiringFrame   // (_cal, _score, _c)
    private val boundary = new RetiringFrame  // (unit, _ord, _v)
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(unitCol).orderBy(col("_ord"))
      val rows = batch.where(valueCol.isNotNull)
        .select(col(unitCol), col(orderCol).as("_ord"), col(tsCol).as("_ts"),
          valueCol.cast("double").as("_v"))
        .withColumn("_prev_in", lag(col("_v"), 1).over(w))
        .withColumn("_rn", row_number().over(w))
      val withPrev = boundary.get match {
        case Some(b) => rows.join(
            broadcast(b.select(col(unitCol), col("_v").as("_bv"))), Seq(unitCol), "left")
          .withColumn("_prev",
            coalesce(col("_prev_in"), when(col("_rn") === 1, col("_bv"))))
        case None => rows.withColumn("_prev", col("_prev_in"))
      }
      // same score definition as the batch operator: 6-dp rounding AT
      // definition bounds the catalog (see conformalInterval's scaladoc)
      val p = withPrev.where(col("_prev").isNotNull)
        .select((dayofmonth(col("_ts")) < splitDay).as("_cal"),
          graft.ops.Portable.pround(abs(col("_v") - col("_prev")), 6).as("_score"))
        .groupBy("_cal", "_score").agg(count(lit(1)).as("_c"))
      val mergedCat = catalog.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("_cal", "_score").agg(sum("_c").as("_c"))
        case None => p
      }
      val batchLast = rows.groupBy(unitCol)
        .agg(max(struct(col("_ord"), col("_v"))).as("_last"))
        .select(col(unitCol), col("_last._ord").as("_ord"), col("_last._v").as("_v"))
      val mergedBound = boundary.get match {
        case Some(prev) => prev.unionByName(batchLast)
          .groupBy(unitCol)
          .agg(max(struct(col("_ord"), col("_v"))).as("_last"))
          .select(col(unitCol), col("_last._ord").as("_ord"), col("_last._v").as("_v"))
        case None => batchLast
      }
      catalog.swap(mergedCat.localCheckpoint(true))
      boundary.swap(mergedBound.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current conformal summary row — bit-identical to the batch
      * q_conformal row over everything merged so far.
      */
    def interval: Option[DataFrame] =
      catalog.get.map(c => graft.ops.Profiling.conformalFromScoreCounts(c, alpha))
  }

  /** Streaming change-point maintenance — the streaming twin of C258's
    * q_changepoint (VERDICT r17 item 4). Unlike the sketchable monitors
    * (SPRT day counts, conformal score catalog), change-point
    * LOCALIZATION is information-theoretically tied to the series itself:
    * every candidate split's cost reads prefix sums at that split, and a
    * single late row shifts every later prefix — no compact mergeable
    * summary can answer "where did the level shift" exactly. The honest
    * streaming state is therefore the per-series (order, value) log —
    * bounded by the monitored series' lengths (a monitoring deployment
    * bounds these by construction: fixed lookback, bounded key set), not
    * by aggregate stream volume — and the read shares the WHOLE batch
    * operator ([[graft.ops.TimeSeries.binSegChangepoint]] sorts by
    * `orderCol` itself), which buys full out-of-order/back-fill safety:
    * the log is a SET of rows, so arrival order is irrelevant. Exactly
    * one delivery per row is the contract (batch-id replay is a no-op;
    * the same guarantee every counter-state twin carries).
    */
  final class BinSegState(seriesKey: String, orderCol: String, valueCol: String) {
    private val log = new RetiringFrame   // (seriesKey, orderCol, valueCol)
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = batch.where(col(valueCol).isNotNull)
        .select(col(seriesKey), col(orderCol), col(valueCol))
      val merged = log.get match {
        case Some(prev) => prev.unionByName(p)
        case None => p
      }
      log.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current per-series best split — bit-identical to the batch
      * q_changepoint rows over everything merged so far.
      */
    def changepoints: Option[DataFrame] =
      log.get.map(p => graft.ops.TimeSeries.binSegChangepoint(
        p, seriesKey, orderCol, valueCol))
  }

  /** Streaming user-growth maintenance — the streaming twin of C229's
    * q_user_growth acquisition curve: each micro-batch reduces to its
    * per-user minimum first-seen day, which MIN-merges into the running
    * first-seen state (min is an idempotent, associative, commutative
    * monoid — late or re-delivered events can only confirm or improve a
    * first-seen day, never corrupt it). The derived (day, n_new,
    * cum_users) curve is therefore exactly the batch answer for any
    * micro-batch boundaries or arrival order. State is one row per user
    * (the CdcApplyState keyed-state class — bounded by the user catalog,
    * never by stream length); the active/returning columns, which would
    * need per-(day, user) state, stay batch-only by design.
    */
  final class UserFirstSeenState(userCol: String, tsCol: String) {
    private val firstSeen = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = batch.groupBy(col(userCol))
        .agg(to_date(min(col(tsCol))).as("_day"))
      val merged = firstSeen.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy(userCol).agg(min("_day").as("_day"))
        case None => p
      }
      firstSeen.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current (day, n_new, cum_users) acquisition curve — exactly the
      * batch q_user_growth projection over the same events. */
    def finalized: Option[DataFrame] = firstSeen.get.map { fs =>
      fs.groupBy("_day").agg(count(lit(1)).as("n_new"))
        .withColumn("cum_users",
          sum("n_new").over(org.apache.spark.sql.expressions.Window
            .orderBy("_day").rowsBetween(Long.MinValue, 0)))
        .select(col("_day").as("day"), col("n_new"), col("cum_users"))
    }
  }

  /** Streaming survival-shelf maintenance (r19) — ONE state serving the
    * WHOLE survival family: per-unit (first, last) DATE spans are the
    * shelf's complete sufficient statistic ([[graft.ops.EventOps
    * .perUserSpan]]), and (min, max) over dates is an additive monoid
    * (date casting is monotone, so per-batch spans merge to the global
    * span exactly). Kaplan–Meier (C221), Nelson–Aalen (C310), the
    * log-rank test (C292) and the Cox fit (C311) all derive at read
    * time through the SAME `FromSpan` arithmetic as their batch
    * queries — bit-identical over everything merged so far, the
    * CalibrationBinsState one-state-many-monitors precedent taken to a
    * whole shelf. Censoring stays CORRECT continuously: the corpus
    * edge (gmax) re-derives from the maintained spans each read, so a
    * unit that was censored yesterday and ordered again today simply
    * extends its span and the censor boundary moves with the stream.
    * State is one row per unit forever (the CdcApplyState bound);
    * batch-id replay is a no-op; arrival order is irrelevant (min/max).
    */
  final class SurvivalState(userCol: String, tsCol: String,
                            censorDays: Int, unitDays: Int) {
    private val spans = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.EventOps.perUserSpan(batch, userCol, tsCol)
      val merged = spans.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("_u").agg(min("_f").as("_f"), max("_l").as("_l"))
        case None => p
      }
      spans.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current KM curve — bit-identical to batch q_km_survival. */
    def kaplanMeier: Option[DataFrame] = spans.get.map(s =>
      graft.ops.EventOps.kaplanMeierFromSpan(s, censorDays, unitDays))

    /** Current cumulative hazard — bit-identical to batch q_na_hazard. */
    def nelsonAalen: Option[DataFrame] = spans.get.map(s =>
      graft.ops.EventOps.nelsonAalenFromSpan(s, censorDays, unitDays))

    /** Current log-rank comparison — bit-identical to batch q_logrank. */
    def logRank(isA: Column => Column): Option[DataFrame] = spans.get.map(s =>
      graft.ops.EventOps.logRankFromSpan(s, isA, censorDays, unitDays))

    /** Current Cox fit — bit-identical to batch q_cox_ph. */
    def coxPh(isA: Column => Column, iters: Int = 12): Option[DataFrame] =
      spans.get.map(s =>
        graft.ops.EventOps.coxPhFromSpan(s, isA, censorDays, unitDays, iters))
  }

  /** Streaming difference-in-differences maintenance (r20, VERDICT r19
    * item 7) — the streaming twin of EventOps.didEstimate on the
    * SurvivalState pattern: the maintained state is the (unit, day)
    * DECIMAL outcome-sum panel (an additive monoid — day partials
    * sum-merge at any micro-batch boundary and roll up to the same
    * (unit, period) totals bit-exactly), and the pre/post boundary
    * RE-DERIVES from the maintained day span at read time exactly like
    * SurvivalState's censoring boundary — a unit's new events extend
    * the span and the split date moves with the stream, so the read is
    * always the batch answer over everything merged so far.
    *
    * State is one row per (unit, active day) — bounded by units × the
    * observed day catalog, never by event volume. Batch-id replay is a
    * no-op; arrival order is irrelevant (pure decimal sums).
    */
  final class DidState(userCol: String, tsCol: String, valueCol: String) {
    private val daily = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.EventOps.didDailyPanel(batch, userCol, tsCol,
        col(valueCol))
      val merged = daily.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("_u", "_dt")
          .agg(sum("_yd").cast("decimal(28,6)").as("_yd"))
        case None => p
      }
      daily.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current DiD estimate — bit-identical to batch q_did over
      * everything merged so far.
      */
    def did(isA: Column => Column): Option[DataFrame] =
      daily.get.map(d => graft.ops.EventOps.didFromDaily(d, isA))
  }

  /** Streaming count-min sketch maintenance — the streaming twin of
    * TextOps.countMinSketch (C127): each micro-batch reduces to its own
    * depth×width counter matrix and SUM-merges into the running sketch.
    * Counters are plain sums of token occurrences, so sum is the
    * count-min merge monoid (Cormode & Muthukrishnan 2005's shard-merge
    * property run continuously): the maintained state equals the batch
    * whole-stream sketch HASH-EXACTLY whatever the micro-batch boundaries
    * or arrival order — the HllDistinctState convergence claim on summed
    * counters instead of maxed registers. State is ≤ depth·width rows
    * forever (the point of sketching an unbounded token stream), point
    * queries run against current state via the SAME finalization as the
    * batch operator (TextOps.countMinEstimate), and the idempotent-replay
    * contract matches the other states (re-delivered batchIds are
    * no-ops).
    */
  final class CmSketchState(textCol: String, depth: Int, width: Int) {
    private val counters = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.TextOps.countMinSketch(batch, textCol, depth, width)
      val merged = counters.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
        case None => p
      }
      counters.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current sketch matrix (j, bucket, cnt) — comparable row-for-row
      * with the batch whole-corpus `countMinSketch`.
      */
    def finalized: Option[DataFrame] = counters.get

    /** Point-query estimates from current state — the batch
      * `countMinEstimate` finalization over the maintained matrix.
      */
    def estimates(tokens: Seq[String]): Option[DataFrame] =
      counters.get.map(graft.ops.TextOps.countMinEstimate(_, tokens, depth, width))
  }

  /** Streaming basket-pair support maintenance (r12) — the streaming twin
    * of Relational.mergeBasketPairSupports (the C45/C113 delta pattern on
    * [[graft.sources.PairStore]]): order lines stream in, and the pair
    * support table stays current without ever rescanning history. Each
    * micro-batch names its TOUCHED baskets; the delta kernel re-derives
    * pairs for those baskets only — from the union of their accumulated
    * and newly-arrived items, the spanning-basket case a naive
    * delta-only pair expansion gets wrong — and folds signed support
    * deltas into the running table.
    *
    * State is two frames: the accumulated DISTINCT (basket, item) rows
    * (needed so a basket spanning micro-batches can re-derive its full
    * pair set) and the pair-support table itself. Per-trigger cost is
    * O(micro-batch) + O(touched-basket pairs) + one sum-groupBy over the
    * pair table. Item-level duplicates are no-ops by construction (the
    * kernel's collect_set makes removed ≡ added for already-known
    * items), on top of the batchId replay guard every foreachBatch state
    * shares. At warehouse scale the (basket, item) frame is the fact
    * table itself — the state this class holds in-session is exactly
    * what partition-pruned fact storage provides there.
    */
  final class PairSupportState(basketCol: String, itemCol: String) {
    private val facts = new RetiringFrame
    private val pairs = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val delta = batch.select(col(basketCol), col(itemCol)).distinct()
      val (nextPairs, nextFacts) = facts.get match {
        case Some(prevFacts) =>
          val merged = graft.ops.Relational.mergeBasketPairSupports(
            pairs.get.get, prevFacts, delta, basketCol, itemCol)
          (merged, prevFacts.unionByName(delta).distinct())
        case None =>
          (graft.ops.Relational.basketPairs(delta, basketCol, itemCol)
            .groupBy("item_a", "item_b").agg(count(lit(1)).as("support")),
            delta)
      }
      // materialize pairs FIRST: its plan reads the previous facts frame,
      // which the facts.swap below retires
      pairs.swap(nextPairs.localCheckpoint(true))
      facts.swap(nextFacts.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current (item_a, item_b, support) table — comparable row-for-row
      * with the batch basketPairs aggregate over everything arrived.
      * One-trigger validity (see IncrementalAggState.finalized).
      */
    def finalized: Option[DataFrame] = pairs.get
  }

  /** Streaming inter-event burstiness — the streaming twin of
    * EventOps.burstiness (C143): each micro-batch reduces to per-user
    * segment moments (n_events, first_us, last_us, Σg, Σg²) and folds
    * into the running state via the segment-concatenation monoid —
    * the merge adds the BRIDGE gap (batch first − stored last) so gaps
    * that straddle a trigger boundary are counted exactly once, and
    * (n_p−1) + (n_b−1) + 1 = n_p+n_b−1 keeps the gap count consistent.
    * Moments stay exact (Σg long, Σg² decimal), so `finalized` routes
    * through the SAME fixed-shape projection as the batch operator and
    * converges row-for-row with it whatever the micro-batch boundaries.
    *
    * Ordering contract: per user, each arriving segment must be LATER
    * than everything already merged (append-log time order — the
    * landing-zone replay shape every file-stream fixture here uses).
    * The monoid concatenates segments; it cannot interleave them — an
    * out-of-order arrival would bridge with a negative gap. Merge
    * refuses it loudly (spec-pinned) rather than corrupting moments;
    * the batch operator over the full log is the adjudicator for
    * unordered sources. State is one row per user forever — O(|users|),
    * never O(events). Same idempotent-replay contract as
    * IncrementalAggState (re-delivered batchIds are no-ops); same
    * one-trigger finalized validity.
    */
  final class BurstinessState(userCol: String, tsCol: String, tieCol: String) {
    private val moments = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val b = graft.ops.EventOps.gapSegmentMoments(batch, userCol, tsCol, tieCol)
      val merged = moments.get match {
        case Some(prev) =>
          val p = prev.select(col(userCol), col("n_events").as("_np"),
            col("first_us").as("_fp"), col("_sg").as("_sgp"),
            col("_sg2").as("_sg2p"), col("last_us").as("_lp"))
          val joined = p.join(b, Seq(userCol), "full_outer")
          val bridge = when(col("_lp").isNotNull && col("first_us").isNotNull,
            col("first_us") - col("_lp")).otherwise(lit(0L))
          joined.select(col(userCol),
            (coalesce(col("_np"), lit(0L)) + coalesce(col("n_events"), lit(0L)))
              .as("n_events"),
            coalesce(col("_fp"), col("first_us")).as("first_us"),
            coalesce(col("last_us"), col("_lp")).as("last_us"),
            (coalesce(col("_sgp"), lit(0L)) + coalesce(col("_sg"), lit(0L)) + bridge)
              .as("_sg"),
            (coalesce(col("_sg2p"), lit(0L).cast("decimal(38,0)")) +
              coalesce(col("_sg2"), lit(0L).cast("decimal(38,0)")) +
              bridge.cast("decimal(20,0)") * bridge).as("_sg2"),
            bridge.as("_bridge"))
        case None => b.withColumn("_bridge", lit(0L))
      }
      // Checkpoint WITH the bridge column and store the frame as-is:
      // RetiringFrame release unpersists only a direct LogicalRDD, so a
      // projection on top would turn retirement into a silent leak. The
      // extra column is ignored by both the merge join and `finalized`.
      val next = merged.localCheckpoint(true)
      val broken = next.where(col("_bridge") < 0L)
      if (broken.limit(1).count() > 0) {
        val u = broken.select(col(userCol)).head().get(0)
        graft.ops.SessionMemo.releaseCheckpoint(next)
        throw new IllegalStateException(
          s"BurstinessState: out-of-order arrival for user $u — batch events " +
            "predate already-merged state; this state requires per-user " +
            "append-log time order (use the batch operator for unordered logs)")
      }
      moments.swap(next)
      lastBatchId = batchId
    }

    /** Current per-user burstiness — comparable row-for-row with the
      * batch operator over everything arrived. One-trigger validity
      * (see IncrementalAggState.finalized).
      */
    def finalized: Option[DataFrame] = moments.get.map { m =>
      graft.ops.EventOps.burstinessFromMoments(
        m.select(col(userCol), (col("n_events") - 1).as("n_gaps"),
          col("_sg"), col("_sg2")),
        userCol, minGaps = 2L)
    }
  }

  /** Streaming exponentially-decayed leaderboard — the streaming twin of
    * EventOps.decayedLeaderboard (C253): state is the (key, day, cnt)
    * daily rollup — a counts MONOID, so merging per-batch rollups equals
    * the batch rollup for any micro-batch boundaries or arrival order,
    * and the decayed ranking derives from state at READ time against the
    * max day seen so far (late-arriving old days simply back-fill their
    * counts; the 2^(−age) weights re-derive, no decay state to patch).
    * State is keys × day-catalog sized — the same daily rollup table a
    * batch deployment keeps. Idempotent-replay contract as every
    * foreachBatch state here.
    */
  final class DecayedLeaderboardState(tsCol: String, keyCol: String) {
    private val daily = new RetiringFrame
    private var lastBatchId: Long = -1L

    private def rollup(batch: DataFrame): DataFrame = batch
      .select(col(keyCol).cast("string").as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day").agg(count(lit(1)).as("cnt"))

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = rollup(batch)
      val merged = daily.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("key", "day").agg(sum("cnt").as("cnt"))
        case None => p
      }
      daily.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** The decayed top-k off the current state — bit-identical to the
      * batch operator over the same rows (same dyadic weights, decimal
      * sum, rounded rank key). One-trigger validity (RetiringFrame).
      */
    def leaderboard(k: Int): Option[DataFrame] = daily.get.map { d =>
      val maxDay = d.agg(max("day").as("_maxDay"))
      val w = graft.ops.Portable.kRowWindow(col("score").desc, col("key").asc)
      d.crossJoin(broadcast(maxDay))
        .withColumn("_wgt", pow(lit(0.5), datediff(col("_maxDay"), col("day"))))
        .groupBy("key")
        .agg(graft.ops.Portable.decSum(col("cnt") * col("_wgt"), 12).as("_raw"),
          sum("cnt").as("raw_count"))
        .select(col("key"), col("raw_count"),
          graft.ops.Portable.pround(col("_raw"), 6).as("score"))
        .orderBy(col("score").desc, col("key").asc).limit(k)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select("rank", "key", "raw_count", "score")
    }
  }

  /** Streaming CDC apply (VERDICT r7 item 7) — the streaming twin of
    * Relational.cdcApply (C89): I/U/D changelog micro-batches merge into
    * a running base via foreachBatch, latest version per key wins, D
    * suppresses. The maintained state is the max-version row per key
    * (base rows seeded at version `baseVersion`, below every change), so
    * the result is independent of BOTH the micro-batch boundaries and the
    * arrival ORDER of changes — a late-arriving stale version loses to
    * the newer one already applied, exactly as the batch whole-changelog
    * window decides it. Per-trigger cost is O(micro-batch) + O(|keys|);
    * history is never rescanned. Same idempotent-replay contract as
    * IncrementalAggState (re-delivered batchIds are no-ops).
    *
    * Ties on (key, version) break by an explicit op priority, D > U > I
    * (Relational.cdcOpPriority — NOT the op string's own collation, whose
    * descending order is U > I > D), so a delete at the same version as
    * an update wins deterministically in this state, the batch kernel,
    * and the DuckDB oracle the convergence spec compares against.
    *
    * This class is the foreachBatch-driven REFERENCE implementation: its
    * per-trigger cost is O(|state|) because the whole frame re-ranks each
    * micro-batch. The production shape is `cdcApplyKeyed` below, whose
    * state store touches only the batch's keys per trigger.
    */
  final class CdcApplyState(key: String, opCol: String, versionCol: String,
                            payload: Seq[String]) {
    private val state = new RetiringFrame
    private var lastBatchId: Long = -1L
    private val cols = Seq(col(key), col(opCol), col(versionCol)) ++ payload.map(col)

    /** Seed the maintained state with the base snapshot (op I, version
      * `baseVersion` — conventionally 0, below every changelog version).
      */
    def init(base: DataFrame, baseVersion: Long = 0L): Unit = synchronized {
      val seeded = base.select(
        (Seq(col(key), lit("I").as(opCol), lit(baseVersion).as(versionCol)) ++
          payload.map(col)): _*)
      state.swap(seeded.localCheckpoint(true))
    }

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val unioned = state.get match {
        case Some(prev) => prev.unionByName(batch.select(cols: _*))
        case None => batch.select(cols: _*)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(key)
        .orderBy(col(versionCol).desc, graft.ops.Relational.cdcOpPriority(opCol).desc)
      val merged = unioned
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .drop("_rn")
      // merged is fully materialized by the eager checkpoint; the
      // replaced frame retires for one trigger (captured plans stay
      // executable) before release, so long-running streams hold at most
      // TWO O(|keys|) frames (ADVICE r8 bound + ADVICE r10 retirement).
      state.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** Current table view: live rows only (deletes suppressed). */
    def finalized: Option[DataFrame] =
      state.get.map(_.where(col(opCol) =!= "D").select(col(key) +: payload.map(col): _*))
  }

  /** Streaming shingle document-frequency state — the streaming twin of
    * the ShingleStore-backed curation signals (novelty, decontamination;
    * VERDICT r8 item 7). Two pieces of maintained state:
    *
    *   - the per-shingle document-frequency table, SUM-merged per
    *     micro-batch: shingles are distinct per document and a document
    *     arrives in exactly one batch, so per-batch df partials sum to
    *     the whole-corpus df whatever the batch boundaries — sum is the
    *     df merge monoid, the same convergence claim as HistogramState's
    *     binned counts.
    *   - the arrived (doc, shingle) pairs, appended per batch and
    *     COMPACTED every `compactEvery` triggers: each batch's shingle
    *     table is checkpointed once (per-trigger cost O(batch)), and once
    *     `compactEvery` frames accumulate they are unioned into ONE
    *     checkpointed frame and the old frames RETIRED — held pinned for
    *     one more trigger so plans the finalizers already captured stay
    *     executable, then released — so both pinned-block memory and the
    *     width of the union plan the finalizers read stay bounded however
    *     long the stream runs, for an amortized per-trigger recompaction
    *     cost of O(arrived / compactEvery). At scale these parts are the
    *     incrementally appended ShingleStore parquet artifact — the
    *     landing-zone pattern — held here as checkpoint frames in the
    *     reference implementation.
    *
    * Novelty is retrospective by nature (an early document becomes
    * "shared" when its twin arrives later), so per-doc verdicts finalize
    * from CURRENT state — one shingle-keyed join of the arrived pairs
    * against the df table, exactly the batch shingleNovelty plan — and
    * converge to the batch answer once the same documents have arrived
    * (FileStreamingSpec). Decontamination against a static benchmark
    * reads the same arrived pairs. Idempotent-replay contract as the
    * other states (re-delivered batchIds are no-ops).
    */
  final class ShingleDfState(idCol: String, textCol: String, n: Int,
                             compactEvery: Int = 8) {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    @volatile private var dfCounts: Option[DataFrame] = None
    private val shingleParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // Frames replaced by the MOST RECENT trigger, still pinned: a plan a
    // finalizer captured before that trigger may reference them, and the
    // plan is lazy — executing it after an immediate release would fail on
    // truncated lineage (ADVICE r10 item 1). Retired frames are released
    // at the START of the next trigger (generation-based retirement), so a
    // captured plan stays executable until a SECOND trigger completes;
    // callers that hold plans longer must collect eagerly.
    private val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      // Previous generation's retirees are now two triggers old — no
      // captured plan younger than the state they describe can exist.
      retired.foreach(graft.ops.SessionMemo.releaseCheckpoint)
      retired.clear()
      val sh = graft.ops.TextOps.shingles(batch, idCol, textCol, n)
        .localCheckpoint(true)
      shingleParts += sh
      val p = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val merged = dfCounts match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("shingle").agg(sum("df").as("df"))
        case None => p
      }
      val prev = dfCounts
      dfCounts = Some(merged.localCheckpoint(true))
      prev.foreach(retired += _)
      // Compact LAST: the eager df checkpoint above must read `sh` while
      // its blocks are still pinned — the compacted union is itself
      // materialized eagerly before the old frames are retired.
      if (shingleParts.size >= compactEvery) {
        val compacted = shingleParts.reduce(_ unionByName _).localCheckpoint(true)
        retired ++= shingleParts
        shingleParts.clear()
        shingleParts += compacted
      }
      lastBatchId = batchId
    }

    /** Number of retained checkpoint frames — bounded at `compactEvery`
      * by construction (spec-asserted); exposed for that evidence.
      */
    def partCount: Int = synchronized { shingleParts.size }

    /** Frames awaiting release at the next trigger — bounded at
      * `compactEvery` + 1 (one compaction's worth of shingle frames plus
      * the replaced df table); exposed for spec evidence.
      */
    def retiredCount: Int = synchronized { retired.size }

    // Read under the same lock mergeBatch holds, so a reader never
    // captures a union plan mid-swap (ADVICE r9 item 1); the captured
    // plan then stays EXECUTABLE across one subsequent trigger because
    // replaced frames retire for a generation before release (ADVICE r10
    // item 1).
    private def arrivedShingles: Option[DataFrame] = synchronized {
      shingleParts.reduceOption(_ unionByName _)
    }

    /** Per-doc novelty from current state — the batch shingleNovelty
      * aggregation over the arrived pairs and the maintained df table.
      */
    def finalizedNovelty: Option[DataFrame] = for {
      sh <- arrivedShingles; d <- dfCounts
    } yield sh.join(d, Seq("shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        round(col("n_shared").cast("double") / col("n_shingles").cast("double"), 6))

    /** Contamination flags of every arrived doc against a static
      * benchmark shingle table — the batch operator over current state.
      */
    def finalizedContamination(benchShingles: DataFrame, minCommon: Long): Option[DataFrame] =
      arrivedShingles.map { sh =>
        graft.ops.TextOps.contaminationFlagsFromShingles(
          sh.select(col(idCol)).distinct(), sh, benchShingles, idCol, minCommon)
      }
  }

  /** Keyed-state streaming CDC apply — the production shape the r8
    * verdict prescribed over CdcApplyState's whole-frame re-rank: the
    * changelog streams into `flatMapGroupsWithState`, the state store
    * keeps ONE row per key (the max-(version, op-priority) change seen so
    * far, ties broken D > U > I exactly as the batch kernel
    * `Relational.cdcApply` and its oracle), and the base snapshot seeds
    * the store via initial state (op 'I', version `baseVersion` — below
    * every changelog version). Per-trigger work touches ONLY the
    * micro-batch's keys; untouched keys sit in the state store unread and
    * unrewritten, so trigger cost is O(batch keys), not O(all keys). In
    * Update output mode a trigger emits exactly the keys whose winning
    * row CHANGED (a 1-key micro-batch emits 1 row — spec-asserted); a
    * stale arrival (below the standing winner) changes nothing and emits
    * nothing. Consumers materialize the current table by upserting
    * emitted rows over the base and dropping op='D' keys — the same
    * semantics as the batch kernel, with the engine's own checkpointed
    * state store supplying crash recovery and exactly-once replay.
    *
    * The grouping key is the key column rendered to string (injective for
    * the integral/string keys changelogs key on), which lets one
    * Row-encoded implementation serve any payload schema; emitted rows
    * carry the original typed key column. `base` must have unique keys
    * (it is a snapshot).
    *
    * `tombstoneTtlMs` (r12 — the r9 verdict's unbounded-state item):
    * with the default `None`, op='D' winners live in the state store
    * forever — correct for a MERGE target that may see arbitrarily late
    * stale versions, but a delete-heavy changelog then grows state
    * monotonically. Set a TTL to expire tombstones on a processing-time
    * horizon (Kafka log-compaction's `delete.retention.ms` contract):
    * once a delete's winning row has sat untouched past the TTL, the
    * state row is dropped — freeing store memory — and the key behaves
    * as never-seen. The trade is explicit: the TTL is a promise that no
    * changelog entry for the key older than the horizon will still
    * arrive; a stale pre-delete version delivered AFTER expiry would
    * resurrect the key as a fresh insert (the same contract every
    * compacted-log consumer accepts). Any arrival for a tombstoned key
    * inside the horizon — even a stale one that changes nothing —
    * re-arms the clock (Spark clears a registered timeout on every
    * invocation for the key, so the sweep only fires on keys quiet for
    * a full TTL). Expiry itself emits nothing: consumers already
    * dropped the key when the delete was emitted.
    *
    * Engine interaction to know about: once any processing-time timeout
    * exists, Spark schedules micro-batches CONTINUOUSLY (a fresh batch
    * timestamp is how due timeouts get evaluated), so pair the TTL with
    * a real processing-time trigger in production — and do not wait on
    * `processAllAvailable`, which never observes the idle moment it
    * needs with batches back-to-back; poll `lastProgress` instead (as
    * the TTL spec does).
    */
  def cdcApplyKeyed(changes: DataFrame, base: DataFrame, key: String,
                    opCol: String, versionCol: String, payload: Seq[String],
                    baseVersion: Long = 0L,
                    tombstoneTtlMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    // The grouping key is the key column rendered to string; that is
    // injective only for integral/string keys. Fail fast on anything else
    // (a Double/Decimal key would silently merge 1 vs 1.0 state or split
    // equal keys across renderings — ADVICE r9 item 3).
    import org.apache.spark.sql.types._
    val keyType = changes.schema(key).dataType
    require(keyType == StringType || keyType == LongType || keyType == IntegerType ||
        keyType == ShortType || keyType == ByteType,
      s"cdcApplyKeyed requires an integral or string key column; '$key' is $keyType")
    val cols = Seq(col(key), col(opCol), col(versionCol).cast("long").as(versionCol)) ++
      payload.map(col)
    val projected = changes.select(cols: _*)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(projected.schema)
    implicit val strEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    val opIdx = 1
    val verIdx = 2
    def pri(r: Row): Int = r.getString(opIdx) match {
      case "D" => 3
      case "U" => 2
      case _   => 1
    }
    def beats(a: Row, b: Row): Boolean =
      a.getLong(verIdx) > b.getLong(verIdx) ||
        (a.getLong(verIdx) == b.getLong(verIdx) && pri(a) > pri(b))
    def upsert(k: String, rows: Iterator[Row], state: GroupState[Row]): Iterator[Row] = {
      if (state.hasTimedOut) {
        // Tombstone quiet past the TTL horizon: free the state row. No
        // emission — consumers dropped the key when the delete emitted.
        state.remove()
        Iterator.empty
      } else {
        val prev = state.getOption
        val winner = rows.foldLeft(prev) {
          case (Some(b), r) => if (beats(r, b)) Some(r) else Some(b)
          case (None, r)    => Some(r)
        }
        // Every invocation clears a registered timeout, so a surviving
        // tombstone must re-arm its clock whether or not the winner
        // changed (a stale arrival would otherwise disarm expiry).
        def armTombstone(w: Row): Unit = tombstoneTtlMs.foreach { ttl =>
          if (w.getString(opIdx) == "D") state.setTimeoutDuration(ttl)
        }
        winner match {
          case Some(w) if !prev.contains(w) =>
            state.update(w)
            armTombstone(w)
            Iterator.single(w)
          case Some(w) =>
            armTombstone(w)
            Iterator.empty
          case None => Iterator.empty
        }
      }
    }
    val seeded = base.select(
      (Seq(col(key), lit("I").as(opCol), lit(baseVersion).cast("long").as(versionCol)) ++
        payload.map(col)): _*)
    val initial = seeded.groupByKey((r: Row) => r.get(0).toString)
    val timeoutConf =
      if (tombstoneTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    projected.groupByKey((r: Row) => r.get(0).toString)
      .flatMapGroupsWithState(OutputMode.Update(), timeoutConf, initial)(upsert)
      .toDF(projected.schema.fieldNames.toIndexedSeq: _*)
  }

  /** Keyed streaming first/last-touch attribution — the streaming twin
    * of EventOps.touchAttribution (C155), on engine-checkpointed per-user
    * state (the cdcApplyKeyed production shape, not a frame state): each
    * user's state is just (first_touch, last_touch, last_us, last_tie) —
    * O(1) per user forever — and every arriving conversion emits its
    * credit row in the micro-batch it arrives in (append mode).
    *
    * Ordering contract: per user, arrivals must be append-log time
    * ordered ACROSS batches (WITHIN a batch the group sorts itself); a
    * row at or before the state's high-water (us, tie) mark throws
    * rather than silently mis-crediting — the same loud refusal as
    * BurstinessState, with the batch operator as the adjudicator for
    * unordered logs. State never expires: a user's first touch is
    * meaningful for their whole lifetime (pair with a TTL policy
    * upstream if the log retires users).
    */
  def attributionKeyed(events: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String, convType: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val keyType = events.schema(userCol).dataType
    require(keyType == StringType || keyType == LongType || keyType == IntegerType ||
        keyType == ShortType || keyType == ByteType,
      s"attributionKeyed requires an integral or string user column; '$userCol' is $keyType")
    val projected = events.select(col(userCol), col(tieCol).cast("long").as(tieCol),
      unix_micros(col(tsCol)).as("_us"), col(typeCol).cast("string").as(typeCol))
    val outSchema = StructType(Seq(
      StructField(tieCol, LongType),
      projected.schema(userCol),
      StructField("first_touch", StringType),
      StructField("last_touch", StringType)))
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    implicit val strEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val stEnc: org.apache.spark.sql.Encoder[(String, String, Long, Long)] =
      Encoders.product[(String, String, Long, Long)]
    def step(k: String, rows: Iterator[Row],
             state: GroupState[(String, String, Long, Long)]): Iterator[Row] = {
      var (first, lastT, lastUs, lastTie) =
        state.getOption.getOrElse((null: String, null: String, Long.MinValue, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      rows.toSeq.sortBy(r => (r.getLong(2), r.getLong(1))).foreach { r =>
        val us = r.getLong(2)
        val tie = r.getLong(1)
        if (us < lastUs || (us == lastUs && tie <= lastTie))
          throw new IllegalStateException(
            s"attributionKeyed: out-of-order arrival for user $k — event " +
              s"($us, $tie) at or before the merged high-water ($lastUs, $lastTie); " +
              "this state requires per-user append-log time order " +
              "(use the batch operator for unordered logs)")
        val tpe = r.getString(3)
        if (tpe == convType) out += Row(tie, r.get(0), first, lastT)
        else { if (first == null) first = tpe; lastT = tpe }
        lastUs = us
        lastTie = tie
      }
      state.update((first, lastT, lastUs, lastTie))
      out.iterator
    }
    projected.groupByKey((r: Row) => r.get(0).toString)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }

  /** Streaming MACD — the streaming twin of TimeSeries.macd (C244):
    * per-key state is the three EWMA accumulators plus the (ts, tie)
    * high-water mark, updated by `flatMapGroupsWithState`; one output
    * row per event with the same (macd, signal, hist) triple the batch
    * recurrence emits. Same ordered-append contract as
    * [[attributionKeyed]]: recurrences are ORDER-DEFINED, so an event
    * at or before the merged high-water is an error, not a silent
    * mis-fold (use the batch operator for unordered logs). Within a
    * micro-batch rows sort by (ts, tie) first, so any single batch may
    * arrive unordered; only CROSS-batch regressions reject.
    *
    * Convergence: state after any prefix equals the batch fold over
    * that prefix (the recurrence is a left fold; batching is just fold
    * splitting) — FileStreamingSpec asserts bit-equality against
    * TimeSeries.macd.
    */
  def macdKeyed(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                valueCol: String, fastN: Int = 12, slowN: Int = 26,
                signalN: Int = 9): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val keyType = events.schema(keyCol).dataType
    require(keyType == StringType || keyType == LongType || keyType == IntegerType ||
        keyType == ShortType || keyType == ByteType,
      s"macdKeyed requires an integral or string key column; '$keyCol' is $keyType")
    val aF = 2.0 / (fastN + 1.0); val aS = 2.0 / (slowN + 1.0)
    val aG = 2.0 / (signalN + 1.0)
    val projected = events.select(col(keyCol), col(tieCol).cast("long").as(tieCol),
      unix_micros(col(tsCol)).as("_us"), col(valueCol).cast("double").as(valueCol))
    val outSchema = StructType(Seq(
      StructField(tieCol, LongType),
      projected.schema(keyCol),
      StructField(valueCol, DoubleType),
      StructField("macd", DoubleType),
      StructField("signal", DoubleType),
      StructField("hist", DoubleType)))
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    implicit val strEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val stEnc: org.apache.spark.sql.Encoder[(Boolean, Double, Double, Double, Long, Long)] =
      Encoders.product[(Boolean, Double, Double, Double, Long, Long)]
    def step(k: String, rows: Iterator[Row],
             state: GroupState[(Boolean, Double, Double, Double, Long, Long)]): Iterator[Row] = {
      var (seen, fast, slow, sig, lastUs, lastTie) =
        state.getOption.getOrElse((false, 0.0, 0.0, 0.0, Long.MinValue, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      rows.toSeq.sortBy(r => (r.getLong(2), r.getLong(1))).foreach { r =>
        val us = r.getLong(2)
        val tie = r.getLong(1)
        if (us < lastUs || (us == lastUs && tie <= lastTie))
          throw new IllegalStateException(
            s"macdKeyed: out-of-order arrival for key $k — event ($us, $tie) at or " +
              s"before the merged high-water ($lastUs, $lastTie); recurrences are " +
              "order-defined (use the batch operator for unordered logs)")
        val x = r.getDouble(3)
        if (!seen) { seen = true; fast = x; slow = x; sig = 0.0 }
        else {
          fast = aF * x + (1.0 - aF) * fast
          slow = aS * x + (1.0 - aS) * slow
          sig = aG * (fast - slow) + (1.0 - aG) * sig
        }
        val m = fast - slow
        out += Row(tie, r.get(0), x, m, sig, m - sig)
        lastUs = us
        lastTie = tie
      }
      state.update((seen, fast, slow, sig, lastUs, lastTie))
      out.iterator
    }
    projected.groupByKey((r: Row) => r.get(0).toString)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }

  /** Streaming twin of TextOps.dedupExact: fingerprint each arriving
    * document (md5 over whitespace-normalized, lower-cased text — the
    * same portable recipe as batch) and emit only the first occurrence
    * of each fingerprint, within and across micro-batches. State is one
    * 32-byte fingerprint per distinct document, kept indefinitely —
    * exact corpus-wide dedup semantics. Pass `withinWatermark = true`
    * (with an event-time column already watermarked upstream) to bound
    * state to the watermark horizon instead, trading completeness for
    * bounded memory on unbounded streams.
    */
  def streamingDedupExact(df: DataFrame, textCol: String,
                          withinWatermark: Boolean = false): DataFrame = {
    val fp = df.withColumn("fingerprint",
      md5(regexp_replace(lower(col(textCol)), "\\s+", " ")))
    if (withinWatermark) fp.dropDuplicatesWithinWatermark("fingerprint")
    else fp.dropDuplicates("fingerprint")
  }

  /** Streaming line-dedup maintenance — the streaming twin of
    * TextOps.dedupLines (C164): each micro-batch reduces its documents
    * to per-line-fingerprint FIRST occurrences (min over (id, line_no)
    * — the keep-first rule as a monoid), which min-merge into the
    * running winner table. Min is associative, commutative and
    * idempotent, so the maintained state equals the batch winners for
    * ANY micro-batch boundaries or arrival order: a later duplicate of
    * an earlier line loses the merge, exactly the batch rule (a line
    * from a LOWER (id, line_no) arriving later correctly displaces —
    * the batch twin is order-free, so the stream must be too). State is
    * one row per DISTINCT line fingerprint (fp, id, line_no) — bounded
    * by content diversity, not stream length. Same idempotent-replay
    * contract as every foreachBatch state here (re-delivered batchIds
    * are no-ops).
    */
  final class LineDedupState(idCol: String, textCol: String) {
    private val winners = new RetiringFrame
    private var lastBatchId: Long = -1L

    private def batchWinners(batch: DataFrame): DataFrame = batch
      .select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("line_no", "line")))
      .groupBy(md5(col("line")).as("line_fp"))
      .agg(min(struct(col("id"), col("line_no").cast("long").as("line_no"))).as("_w"))
      .select(col("line_fp"), col("_w.id").as("id"), col("_w.line_no").as("line_no"))

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = batchWinners(batch)
      val merged = winners.get match {
        case Some(prev) => prev.unionByName(p)
          .groupBy("line_fp")
          .agg(min(struct(col("id"), col("line_no"))).as("_w"))
          .select(col("line_fp"), col("_w.id").as("id"), col("_w.line_no").as("line_no"))
        case None => p
      }
      winners.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** (line_fp, id, line_no) winner per distinct line seen so far.
      * One-trigger validity (the RetiringFrame contract).
      */
    def finalized: Option[DataFrame] = winners.get
  }

  /** Streaming Pareto-frontier maintenance — the streaming twin of
    * Relational.skyline2D (C169): each micro-batch is reduced to its own
    * per-group skyline, which merges into the running frontier by
    * re-skylining the union. The skyline operator is closed under this
    * merge — skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)), because
    * a point dominated in A ∪ B is dominated by some frontier point of
    * whichever side held its dominator — and dropping dominated points
    * is idempotent and order-free, so the maintained state equals the
    * batch skyline for ANY micro-batch boundaries or arrival order
    * (a frontier point later displaced by a better arrival is re-judged
    * at every merge). State is the CURRENT frontier only — bounded by
    * the per-group frontier width (≤ distinct x values per group), never
    * stream length. Same idempotent-replay contract as every
    * foreachBatch state here (re-delivered batchIds are no-ops).
    *
    * Inherits skyline2D's integral-x precondition (enforced there with a
    * `require` — ADVICE r15): fractional x coordinates must be floored
    * or scaled to an integer grid before feeding the stream.
    */
  final class SkylineState(groupCol: String, xCol: String, yCol: String) {
    private val frontier = new RetiringFrame
    private var lastBatchId: Long = -1L

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) return
      val p = graft.ops.Relational.skyline2D(batch, groupCol, xCol, yCol)
      val merged = frontier.get match {
        case Some(prev) =>
          graft.ops.Relational.skyline2D(prev.unionByName(p), groupCol, xCol, yCol)
        case None => p
      }
      frontier.swap(merged.localCheckpoint(true))
      lastBatchId = batchId
    }

    /** The current per-group Pareto frontier. One-trigger validity (the
      * RetiringFrame contract).
      */
    def finalized: Option[DataFrame] = frontier.get
  }

  /** Streaming approximate near-dup over SimHash band keys: each arriving
    * document gets its row-local 64-bit SimHash (TextOps.rowSimHash — a
    * stateless projection, no shuffle), explodes into the same 4 × 16-bit
    * bands the batch near-dup join uses, and keeps only the FIRST document
    * per (band, band value) bucket. A later document within Hamming ≤ 3 of
    * an earlier one shares at least one exact band (pigeonhole), so at
    * least one of its band rows is dropped — "kept fewer than 4 of its
    * band rows" flags it as an approximate near-duplicate of earlier
    * state, converging to the batch simHashNearDup candidate relation on
    * replay (FileStreamingSpec).
    *
    * State is one row per distinct (band, band value) — bounded by 4 ×
    * min(corpus, 4·65,536 per band) entries. Pass `withinWatermark = true`
    * (input already watermarked on an event-time column) to bound state to
    * the watermark horizon instead, trading cross-horizon completeness for
    * bounded memory on unbounded streams.
    */
  def streamingNearDupBands(df: DataFrame, idCol: String, textCol: String,
                            withinWatermark: Boolean = false): DataFrame = {
    // Token-less documents are excluded up front: batch simHash emits no
    // row for them (explode of an empty token list), while rowSimHash
    // would fingerprint them all as 0 — without this filter every
    // empty/whitespace-only document would collide on all 4 bands and be
    // flagged as a near-dup of the first one seen (ADVICE r4).
    val banded = df
      .where(size(graft.ops.TextOps.tokens(col(textCol))) > 0)
      .withColumn("simhash", graft.ops.TextOps.rowSimHash(col(textCol)))
      .select(col(idCol), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("(simhash >> (band * 16)) & 65535"))
    if (withinWatermark) banded.dropDuplicatesWithinWatermark("band", "band_val")
    else banded.dropDuplicates("band", "band_val")
  }

  /** Stream-static enrichment: each micro-batch of the stream joins the
    * static dimension via an explicit broadcast — the dimension ships to
    * executors once per micro-batch plan, the stream side never shuffles,
    * and (unlike stream-stream joins) no watermark or join state is
    * needed because the static side is complete by definition. This is
    * the standard "decorate events with reference data" stage; left
    * outer keeps unmatched events (dimension gaps surface as nulls
    * downstream instead of silently dropping facts).
    */
  def streamStaticEnrich(stream: DataFrame, streamKeyCol: String,
                         dim: DataFrame, dimKeyCol: String): DataFrame =
    stream.join(broadcast(dim), col(streamKeyCol) === col(dimKeyCol), "left_outer")

  /** Stream–stream inner interval join: match each left row to right rows
    * with the same key whose timestamp falls in
    * `[leftTs − lookbackSeconds, leftTs]` — the streaming enrichment join
    * (e.g. purchases joined to the clicks that preceded them). Both sides
    * are watermarked and the join condition carries the explicit time
    * range, which is what lets Spark BOUND THE STATE: a buffered right row
    * can be dropped once the left watermark passes `rightTs +
    * lookbackSeconds`, so state is O(rate × (lookback + delay)) per key —
    * never the whole history. Without the range condition the state store
    * grows without bound; this operator makes the bound structural.
    * Column names must be disjoint apart from the join keys.
    */
  def streamStreamIntervalJoin(left: DataFrame, leftTsCol: String,
                               right: DataFrame, rightTsCol: String,
                               keys: Seq[String], lookbackSeconds: Long,
                               watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTsCol) >= l(leftTsCol) - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
      r(rightTsCol) <= l(leftTsCol)
    keys.foldLeft(l.join(r, cond))((acc, k) => acc.drop(r(k)))
  }

  /** Stream–stream LEFT OUTER interval join — the "did anything precede
    * this?" enrichment where ABSENCE is the signal (purchases with no
    * qualifying view = dark-funnel attribution). Same bounded-state
    * mechanics as the inner form, plus the outer contract: an unmatched
    * left row is emitted null-padded only once the watermark passes its
    * own timestamp — the point after which no in-interval right row can
    * still arrive — so every null result is a PROOF of absence under the
    * lateness bound, not a race. Until the watermark reaches that
    * deadline the row sits in state; outer results are therefore delayed
    * by exactly the lateness allowance, the price of correctness.
    */
  def streamStreamIntervalJoinLeftOuter(left: DataFrame, leftTsCol: String,
                                        right: DataFrame, rightTsCol: String,
                                        keys: Seq[String], lookbackSeconds: Long,
                                        watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTsCol) >= l(leftTsCol) - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
      r(rightTsCol) <= l(leftTsCol)
    keys.foldLeft(l.join(r, cond, "left_outer"))((acc, k) => acc.drop(r(k)))
  }

  case class SessionEvent(key: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class SessionOut(key: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Gap-based session aggregation with explicit state: a session closes
    * when no event arrives within `gapSeconds` of its last event (enforced
    * by an event-time timeout keyed to the watermark). Emits one row per
    * closed session.
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
                 watermarkDelay: String): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(key: Long, rows: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      val gapMs = gapSeconds * 1000
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(key, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.end), s.n, s.sum))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
            case Some(s) =>
              closed ::= SessionOut(key, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.end), s.n, s.sum)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
