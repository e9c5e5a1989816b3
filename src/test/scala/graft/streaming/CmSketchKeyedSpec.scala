package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the transformWithState count-min prototype (VERDICT r11
  * item 7): (1) the consumer-materialized cell matrix converges to the
  * batch whole-corpus sketch across micro-batch boundaries, and (2) the
  * engine-checkpointed state survives a full query STOP + RESTART — the
  * restart-safety the driver-side frame states cannot offer — with the
  * restarted query continuing totals, not recounting from zero.
  */
class CmSketchKeyedSpec extends SparkSpec {

  private val Depth = 4
  private val Width = 64

  test("keyed count-min converges to the batch sketch and survives a restart") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val firstHalf = docs.where(col("doc_id") % 2 === 0)
    val secondHalf = docs.where(col("doc_id") % 2 === 1)
    assert(firstHalf.count() > 0 && secondHalf.count() > 0)

    val inDir = java.nio.file.Files.createTempDirectory("graft_cmk_in").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cmk_ckpt").toFile.getAbsolutePath
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]

    // transformWithState requires the RocksDB state store provider; scope
    // it to these runs and restore the session default after.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = CmSketchKeyed.sketchUpdates(stream, "text", Depth, Width)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
          cells.synchronized { rows.foreach { case (k, v) => cells(k) = v } }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      // Run 1: first half of the corpus, then STOP the query entirely.
      firstHalf.coalesce(1).write.mode("append").parquet(inDir)
      runOnce()
      val afterFirst = cells.synchronized(cells.toMap)
      assert(afterFirst.nonEmpty)

      // Run 2: a FRESH query against the same checkpoint picks the state
      // store back up; the second half lands on top of run 1's counters.
      secondHalf.coalesce(1).write.mode("append").parquet(inDir)
      runOnce()
    } finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None    => spark.conf.unset(provKey)
      }
    }

    val streamed = cells.synchronized(cells.toMap)
    val batch = graft.ops.TextOps.countMinSketch(docs, "text", Depth, Width)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // Had the restart lost state, second-half cells would hold only their
    // second-half counts and this equality would fail.
    assert(streamed === batch,
      s"streamed matrix (${streamed.size} cells) must equal the batch sketch (${batch.size})")
  }
}
