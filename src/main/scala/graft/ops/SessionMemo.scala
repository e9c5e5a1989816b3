package graft.ops

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Bounded session memoization for checkpoint-materialized frames
  * (VERDICT r7 item 8): the memo caches (SimHash near-dup edges, quality
  * scores, the trade edge list) hold `localCheckpoint`ed DataFrames —
  * executor-pinned blocks. Keyed by (applicationId, corpus) and never
  * evicted, a long-lived session touching several corpus dirs would
  * accumulate pinned state for corpora it will never query again. Policy:
  * each cache keeps ONE live entry — a miss evicts every other entry and
  * RELEASES its checkpoint blocks before the new one materializes. The
  * caches exist to share one materialization among the 2-3 queries of one
  * corpus run, so cross-corpus retention buys nothing.
  */
object SessionMemo {

  /** Unpersist the RDD blocks behind a localCheckpoint'ed frame. Safe on
    * any frame (non-checkpointed plans are left alone) and on frames from
    * a stopped SparkContext (release failures are swallowed — the blocks
    * died with the context).
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }

  /** Get-or-build with single-entry retention: on a miss, every OTHER
    * entry of `cache` is removed and its checkpoint released, then
    * `build` (expected to end in `.localCheckpoint(true)`) materializes
    * the new value.
    */
  def memoize[K](cache: TrieMap[K, DataFrame], key: K)(build: => DataFrame): DataFrame =
    cache.get(key) match {
      case Some(df) => df
      case None =>
        cache.keys.foreach { k =>
          if (k != key) cache.remove(k).foreach(releaseCheckpoint)
        }
        val df = build
        cache.putIfAbsent(key, df) match {
          case Some(winner) =>
            // concurrent miss: another thread installed first — release
            // OUR checkpoint (it would otherwise pin blocks unreferenced)
            releaseCheckpoint(df)
            winner
          case None => df
        }
    }
}
