package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Count-min cell key (sketch row j, hashed bucket) — top-level so the
  * typed groupByKey/transformWithState encoders are plain products.
  */
case class CmCell(j: Int, bucket: Long)

/** A cell's updated running counter, emitted whenever the cell receives
  * increments in a trigger (Update-mode semantics).
  */
case class CmCellCount(j: Int, bucket: Long, cnt: Long)

/** `transformWithState` evaluation (VERDICT r11 item 7): the count-min
  * streaming state — the smallest of the five foreachBatch states —
  * re-expressed as ENGINE-CHECKPOINTED keyed state via Spark 4's
  * arbitrary-state API.
  *
  * Shape: each arriving document projects to its per-token sketch cells
  * (the same seeded-md5 hash front-end as `TextOps.countMinSketch`), the
  * stream groups by cell, and a [[StatefulProcessor]] keeps ONE
  * `ValueState[Long]` counter per (j, bucket) — ≤ depth·width keys ever,
  * the same bound as the frame state. Each trigger emits the updated
  * running totals of exactly the cells it touched; a consumer upserting
  * those rows holds the sketch matrix, comparable row-for-row with the
  * batch whole-corpus `countMinSketch`.
  *
  * What this buys over the foreachBatch `CmSketchState` (the wired
  * default): the counters live in the ENGINE's checkpointed state store,
  * so a crashed or stopped query RESUMES from its checkpoint with state
  * intact and replayed batches applied exactly once (spec-demonstrated:
  * stop, restart against the same checkpoint, totals continue) — the one
  * property driver-side frames cannot offer (their idempotent-batchId
  * guard protects within a run, not across a JVM loss). What it costs:
  * (a) the state operator requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` →
  * `...state.RocksDBStateStoreProvider`; the default HDFS-backed
  * provider is rejected at query start for transformWithState); (b) the
  * shuffle into the state operator carries one row per token-occurrence
  * × depth — the foreachBatch path pre-aggregates each micro-batch to
  * ≤ depth·width rows (map-side combine) before touching shared state,
  * while keyed per-cell counting cannot combine below the engine
  * without a second stateful aggregation; (c) point estimates need the
  * consumer-materialized matrix first (the frame state finalizes
  * straight off its DataFrame). Verdict recorded in SURVEY §2.10: the
  * five foreachBatch states STAY the wired default (their per-batch
  * pre-aggregation and plan-level finalization are the 100 TB posture);
  * this keyed twin is the restart-safe variant for deployments where
  * exactly-once across JVM loss outweighs the shuffle-volume cost, with
  * convergence + restart-safety gated in `CmSketchKeyedSpec`.
  */
object CmSketchKeyed {

  /** One row per (token occurrence × sketch row): the cell each
    * occurrence increments. Streaming-safe pure projection (explode +
    * hash; no aggregation), identical hashing to the batch operator so
    * the maintained counters land in the batch sketch's cells.
    */
  def cellIncrements(df: DataFrame, textCol: String, depth: Int, width: Int): DataFrame =
    df.select(explode(graft.ops.TextOps.tokens(col(textCol))).as("token"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("token"))
      .select(col("j").cast("int").as("j"),
        pmod(graft.ops.TextOps.seededHash32(col("j"), col("token")), lit(width.toLong))
          .as("bucket"))

  /** Per-cell running-total counter: state is one Long per cell, updated
    * with the trigger's increment count, emitted as the new total.
    */
  private final class CellSumProcessor
      extends StatefulProcessor[CmCell, CmCell, CmCellCount] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: CmCell, rows: Iterator[CmCell],
                                 timerValues: TimerValues): Iterator[CmCellCount] = {
      var add = 0L
      while (rows.hasNext) { rows.next(); add += 1L }
      val next = (if (cnt.exists()) cnt.get() else 0L) + add
      cnt.update(next)
      Iterator.single(CmCellCount(key.j, key.bucket, next))
    }
  }

  /** Streaming sketch maintenance over engine-checkpointed keyed state:
    * emits (j, bucket, cnt) running totals for the cells each trigger
    * touches. Requires the RocksDB state store provider (see object
    * scaladoc) and a checkpointLocation for restart-safety.
    */
  def sketchUpdates(df: DataFrame, textCol: String, depth: Int, width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    cellIncrements(df, textCol, depth, width).as[CmCell]
      .groupByKey(identity)
      .transformWithState(new CellSumProcessor, TimeMode.None(), OutputMode.Update())
      .toDF()
  }
}
