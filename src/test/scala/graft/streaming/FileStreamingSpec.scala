package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ops.{EventOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

case class Doc2(doc_id: Long, text: String)

/** File-source streaming over the driver test events: files land in a
  * watched directory in two arrivals (interleaved users, so per-key state
  * must merge across micro-batches) and the streaming windowed aggregation
  * must converge to the batch q_event_windows answer.
  */
class FileStreamingSpec extends SparkSpec {

  test("file-source stream converges to the batch tumbling-window answer") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts", "value")
    val inDir = java.nio.file.Files.createTempDirectory("graft_stream_in").toFile.getAbsolutePath

    // first arrival: even event ids (every user appears in both halves)
    events.where(pmod(col("event_id"), lit(2)) === 0).write.mode("append").parquet(inDir)

    val stream = StreamingOps.fileStreamWindowedStats(spark, inDir, events.schema,
      "user_id", "ts", "value", "10 minutes", "1 minute")
    val q = stream.writeStream.format("memory").queryName("file_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val midCount = spark.table("file_win").count()
      assert(midCount > 0, "first arrival must already produce windows")

      // second arrival: the rest — existing (user, window) state must update
      events.where(pmod(col("event_id"), lit(2)) === 1).write.mode("append").parquet(inDir)
      q.processAllAvailable()

      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.get(0).toString, r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap

      val streamed = toMap(spark.table("file_win")
        .select(col("user_id"),
          date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("n_events"), col("sum_value")))
      val batch = toMap(EventOps.tumblingWindowStats(
        events.drop("event_id"), "user_id", "ts", "value", "10 minutes"))

      assert(streamed.keySet === batch.keySet)
      batch.foreach { case (k, (n, s)) =>
        val (sn, ss) = streamed(k)
        assert(sn === n, s"n_events mismatch for $k")
        assert(math.abs(ss - s) < 1e-6, s"sum_value mismatch for $k")
      }
    } finally q.stop()
  }

  test("streaming hopping windows converge to the batch hopping-window answer") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts", "value")
    val inDir = java.nio.file.Files.createTempDirectory("graft_hop_in").toFile.getAbsolutePath
    events.where(pmod(col("event_id"), lit(2)) === 0).write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 16).parquet(inDir)
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), window(col("ts"), "10 minutes", "5 minutes").as("win"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("win.start").as("win_start"), col("n_events"), col("sum_value"))
    val q = stream.writeStream.format("memory").queryName("hop_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      events.where(pmod(col("event_id"), lit(2)) === 1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.get(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val streamed = toMap(spark.table("hop_win")
        .select(col("user_id"),
          date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("n_events"), col("sum_value")))
      val batch = toMap(graft.ops.EventOps.hoppingWindowStats(
        events, "user_id", "ts", "value", "10 minutes", "5 minutes"))
      assert(streamed.keySet === batch.keySet)
      batch.foreach { case (k, (n, s)) =>
        val (sn, ss) = streamed(k)
        assert(sn === n, s"n_events mismatch for $k")
        assert(math.abs(ss - s) < 1e-6, s"sum_value mismatch for $k")
      }
    } finally q.stop()
  }

  test("file-source streaming sessionize converges to the batch session boundaries") {
    val s = spark
    import s.implicits._
    // whole-second timestamps so the batch (second-truncated epoch) and
    // streaming (millisecond) gap rules agree
    val slice = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .where(col("user_id") < 10)
      .select(col("user_id").as("key"), date_trunc("second", col("ts")).as("ts"),
        col("value"))
    val inDir = java.nio.file.Files.createTempDirectory("graft_sess_in").toFile.getAbsolutePath
    slice.write.mode("append").parquet(inDir)
    // sentinel per key, far past every real event: closes all real sessions
    val maxTs = slice.agg(max("ts")).head().getTimestamp(0)
    slice.select("key").distinct()
      .select(col("key"),
        lit(new java.sql.Timestamp(maxTs.getTime + 86400L * 1000)).as("ts"),
        lit(0.0).as("value"))
      .write.mode("append").parquet(inDir)

    val stream = spark.readStream.schema(slice.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .as[StreamingOps.SessionEvent]
    val q = StreamingOps.sessionize(stream, gapSeconds = 1800L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_file").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_file")
        .select(col("key"), col("session_start"), col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      // batch truth: gap-sessionize, then one row per (key, session)
      val batch = EventOps.sessionize(
          slice.withColumn("seq", monotonically_increasing_id()), "key", "seq", "ts", 1800L)
        .groupBy("key", "session_seq")
        .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"),
          sum("value").as("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime) -> (r.getLong(3), r.getDouble(4)))
        .toMap
      assert(batch.nonEmpty)
      assert(streamed.keySet === batch.keySet)
      batch.foreach { case (k, (n, sv)) =>
        val (sn, ss) = streamed(k)
        assert(sn === n, s"n_events mismatch for session $k")
        assert(math.abs(ss - sv) < 1e-6, s"sum_value mismatch for session $k")
      }
    } finally q.stop()
  }

  test("streamingNearDupBands flags near-dups across micro-batches, converging to the batch relation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far " +
      "past the green hills toward the quiet river bend every single morning without fail"
    val texts = Map(
      0L -> base,
      1L -> base, // exact dup of 0 (hamming 0 — all 4 bands collide)
      2L -> "completely different content about distributed query engines at scale",
      3L -> base.replaceFirst("quick", "cat"), // near-dup of 0: hamming 1, 3 shared bands
      4L -> "yet another unrelated document mentioning streaming watermarks only")
    val corpus = df(texts.toSeq.sortBy(_._1).map { case (id, t) => Doc2(id, t) })

    // batch truth on the same corpus: near-dup candidate docs are the
    // larger ids of the band-collision pairs (arrival order = id order)
    val batchPairs = TextOps.simHashNearDup(corpus, "doc_id", "text", 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs === Set((0L, 1L), (0L, 3L), (1L, 3L)),
      "test corpus must make exactly docs 1 and 3 near-dups of doc 0")

    val in = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingNearDupBands(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      in.addData((0L, texts(0L)), (1L, texts(1L)), (2L, texts(2L)))
      q.processAllAvailable()
      in.addData((3L, texts(3L)), (4L, texts(4L))) // cross-batch near-dup + a fresh doc
      q.processAllAvailable()
      val survivors = spark.table("neardup_stream").groupBy("doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // a doc keeping all 4 band rows collided with nothing earlier; a doc
      // losing any band row is an approximate near-dup of earlier state
      val flagged = texts.keySet.filter(id => survivors.getOrElse(id, 0L) < 4)
      val batchNearDups = batchPairs.map(_._2) // larger id of each pair
      assert(flagged === batchNearDups,
        s"streaming band-flagged docs $flagged must equal batch near-dup ids $batchNearDups")
    } finally q.stop()
  }

  test("chunkDocuments is stream-compatible: micro-batched chunks equal the batch chunks") {
    // the chunker is a stateless generator (explode over start offsets), so
    // it promotes to Structured Streaming with no state store and no
    // watermark — each arriving document emits its chunks in that
    // micro-batch, and replaying the corpus reproduces the batch relation
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val out = TextOps.chunkDocuments(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", chunkSize = 64, overlap = 16)
    val q = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      val (first, second) = corpus.splitAt(20)
      in.addData(first.toIndexedSeq); q.processAllAvailable()
      in.addData(second.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("chunk_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      val batch = TextOps.chunkDocuments(
          df(corpus.toIndexedSeq.map { case (id, t) => Doc2(id, t) }),
          "doc_id", "text", chunkSize = 64, overlap = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streamingDedupExact keeps first occurrence within and across micro-batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingDedupExact(
      in.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // batch 1: an exact dup and a whitespace/case variant of doc 0
      in.addData((0L, "hello spark world"), (1L, "hello spark world"), (2L, "HELLO  spark world"))
      q.processAllAvailable()
      // batch 2: a cross-batch dup plus one genuinely new doc
      in.addData((3L, "hello spark world"), (4L, "a brand new document"))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(kept.toSeq === Seq(0L, 4L))
    } finally q.stop()
  }

  test("streaming line-dedup winners converge to the batch keep-first rule") {
    // C164's streaming twin: per-batch (line_fp -> min(id, line_no))
    // winners min-merge across micro-batches; the min monoid makes the
    // state equal the batch winners regardless of arrival order — proven
    // by streaming the docs in REVERSE id order, where later batches
    // must displace earlier winners.
    val docs = Seq(
      (1L, "header\nalpha beta\ngamma"),
      (2L, "header\ndelta\ngamma"),
      (3L, "header\nheader\nepsilon"))
    val s = spark
    import s.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft_ldd_in").toFile.getAbsolutePath
    // one file per doc, written in REVERSE order (doc 3 arrives first)
    docs.reverse.foreach { d =>
      Seq(d).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    }
    val batchDf = docs.toDF("doc_id", "text")
    val state = new StreamingOps.LineDedupState("doc_id", "text")
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.finalized.get.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // plain-Scala referee: first (id, line_no) per line corpus-wide
      val referee = docs.flatMap { case (id, text) =>
        text.split("\n", -1).zipWithIndex.map { case (l, i) => (l, id, i.toLong) }
      }.groupBy(_._1).map { case (l, occ) =>
        val w = occ.map(o => (o._2, o._3)).min
        md5Hex(l) -> w
      }
      assert(streamed === referee,
        "min-merged winners must equal batch keep-first despite reverse arrival")
      // replay idempotence: re-delivering the last batchId is a no-op
      val before = streamed
      state.mergeBatch(batchDf.limit(1), 2L)
      q.processAllAvailable()
      val after = state.finalized.get.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(after === before)
    } finally q.stop()
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("streaming skyline frontier converges to the batch skyline") {
    // C169's streaming twin: skyline(A ∪ B) = skyline(skyline(A) ∪
    // skyline(B)) — arrival order must not matter, so the dominating
    // points arrive LAST and must evict earlier provisional frontier
    // rows; a dominated late arrival must bounce off the frontier.
    val pts = Seq(
      (1L, "g1", 5L, 5L),   // provisional frontier, evicted by 3 then 4
      (2L, "g1", 1L, 9L),   // survives every merge
      (3L, "g1", 6L, 5L),   // evicts 1, later evicted by 4
      (4L, "g1", 7L, 6L),   // final dominator
      (5L, "g1", 6L, 4L),   // late arrival, dominated on entry
      (6L, "g2", 2L, 2L))   // other group untouched by g1 dominance
    val s = spark
    import s.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft_sky_in").toFile.getAbsolutePath
    pts.foreach { p =>
      Seq(p).toDF("doc_id", "source", "x", "y").coalesce(1)
        .write.mode("append").parquet(inDir)
    }
    val batchDf = pts.toDF("doc_id", "source", "x", "y")
    val state = new StreamingOps.SkylineState("source", "x", "y")
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val streamed = asSet(state.finalized.get)
      val batch = asSet(graft.ops.Relational.skyline2D(batchDf, "source", "x", "y"))
      assert(streamed === batch,
        "maintained frontier must equal the batch skyline despite dominators arriving last")
      assert(streamed.map(_._1) === Set(2L, 4L, 6L))
      // replay idempotence: re-delivering an already-applied batchId is a no-op
      state.mergeBatch(batchDf, 0L)
      assert(asSet(state.finalized.get) === batch)
    } finally q.stop()
  }

  test("streaming incremental aggregation converges bit-exactly to the one-pass batch aggregate") {
    // C45's streaming twin (VERDICT r6 item 6): micro-batched partialAggs
    // merged into a base via foreachBatch must equal aggregating all
    // arrived rows in one pass — exactly, not approximately, because the
    // state is the (count, decimal-sum) monoid. Files land in two
    // arrivals with every user split across both, so per-key state MUST
    // merge across micro-batches to get the counts right.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "value")
    val inDir = java.nio.file.Files.createTempDirectory("graft_incr_in").toFile.getAbsolutePath
    events.where(pmod(col("event_id"), lit(2)) === 0).write.mode("append").parquet(inDir)

    val state = new StreamingOps.IncrementalAggState(Seq("user_id"), "value")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 2).parquet(inDir) // force several micro-batches
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val mid = state.finalized.map(_.count()).getOrElse(0L)
      assert(mid > 0, "first arrival must already have maintained state")

      events.where(pmod(col("event_id"), lit(2)) === 1).write.mode("append").parquet(inDir)
      q.processAllAvailable()

      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      val streamed = toMap(state.finalized.get
        .select("user_id", "n", "total", "avg_value"))
      val batch = toMap(graft.ops.Relational.mergePartialAggs(
          Seq(graft.ops.Relational.partialAggs(events, Seq("user_id"), "value")), Seq("user_id"))
        .select("user_id", "n", "total", "avg_value"))
      assert(streamed.keySet === batch.keySet)
      // BIT-exact (==, no epsilon): the decimal monoid guarantees the
      // maintained state equals the one-pass answer regardless of how
      // micro-batch boundaries partitioned the rows
      batch.foreach { case (k, v) => assert(streamed(k) === v, s"user $k") }
    } finally q.stop()
  }

  test("incremental aggregation is idempotent under foreachBatch batch replay") {
    // exactly-once contract: after a failure, foreachBatch RE-DELIVERS the
    // same batchId with the same data; a naive sum-monoid merge applied
    // twice double-counts. Replayed and stale batch ids must be no-ops.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "value").limit(100)
    val state = new StreamingOps.IncrementalAggState(Seq("user_id"), "value")
    def snapshot() = state.finalized.get.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    state.mergeBatch(events, batchId = 0L)
    val afterFirst = snapshot()
    state.mergeBatch(events, batchId = 0L)   // replay of the SAME batch
    assert(snapshot() === afterFirst, "replayed batchId must not double-count")
    state.mergeBatch(events, batchId = 1L)   // genuinely new delivery
    val afterSecond = snapshot()
    assert(afterSecond !== afterFirst, "a new batchId must merge")
    state.mergeBatch(events, batchId = 0L)   // stale id after progress
    assert(snapshot() === afterSecond, "stale batchId must be a no-op")
  }

  test("stream-static broadcast enrichment converges to the batch join+agg") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts", "value")
    // dimension misses users >= 10 so the left-outer null path is exercised
    val dim = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .where(col("c_custkey") < 10)
      .select(col("c_custkey"), col("c_mktsegment"))
    val inDir = java.nio.file.Files.createTempDirectory("graft_enrich_in").toFile.getAbsolutePath
    def agg(enriched: org.apache.spark.sql.DataFrame) = enriched
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(28,4)")).as("sv"))
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDecimal(2))).toSet

    events.where(pmod(col("event_id"), lit(2)) === 0).write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 4).parquet(inDir)
    val q = agg(StreamingOps.streamStaticEnrich(stream, "user_id", dim, "c_custkey"))
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      events.where(pmod(col("event_id"), lit(2)) === 1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      val streamed = toSet(spark.table("enrich_stream"))
      val batch = toSet(agg(
        StreamingOps.streamStaticEnrich(events, "user_id", dim, "c_custkey")))
      assert(streamed === batch)
      assert(batch.exists(_._1.isEmpty), "unmatched users must surface as a null segment group")
    } finally q.stop()
  }

  test("stream-stream interval join converges to the batch range join") {
    // Arrivals are time-ordered (the watermark contract); the second
    // arrival's purchases must still match FIRST-arrival views, proving
    // the right side is buffered as state across micro-batches.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // views for users 1..40 at 10:00; user 41's view long before lookback
    val viewRows = (1L to 40L).map(u => (1000L + u, u, ts("2024-01-01 10:00:00"))) :+
      ((1041L, 41L, ts("2024-01-01 08:00:00")))
    // batch-1 purchases (users 1..20, 10:05) match in-batch; batch-2
    // purchases (users 21..41, 10:20) match across batches; user 41's
    // view is outside the 1h lookback -> no pair
    val p1 = (1L to 20L).map(u => (2000L + u, u, ts("2024-01-01 10:05:00")))
    val p2 = (21L to 41L).map(u => (2000L + u, u, ts("2024-01-01 10:20:00")))
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val vIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingOps.streamStreamIntervalJoin(
      pIn.toDF().toDF("p_id", "user_id", "p_ts"), "p_ts",
      vIn.toDF().toDF("v_id", "user_id", "v_ts"), "v_ts",
      Seq("user_id"), lookbackSeconds = 3600L, watermarkDelay = "10 minutes")
    val q = joined.select("p_id", "v_id").writeStream.format("memory")
      .queryName("ssj_stream").outputMode("append").start()
    try {
      vIn.addData(viewRows); pIn.addData(p1)
      q.processAllAvailable()
      pIn.addData(p2)
      q.processAllAvailable()
      val streamed = spark.table("ssj_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val purchases = df((p1 ++ p2).map(r => Ssj(r._1, r._2, r._3)))
        .toDF("p_id", "user_id", "p_ts")
      val views = df(viewRows.map(r => Ssj(r._1, r._2, r._3)))
        .toDF("v_id", "v_user", "v_ts")
      val batch = purchases.join(views,
          col("user_id") === col("v_user") &&
            col("v_ts") >= col("p_ts") - expr("INTERVAL 3600 SECONDS") &&
            col("v_ts") <= col("p_ts"))
        .select("p_id", "v_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.size === 40, "every user 1..40 pairs exactly once; user 41 never")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join null-emits unmatched rows after the watermark deadline") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val vIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingOps.streamStreamIntervalJoinLeftOuter(
      pIn.toDF().toDF("p_id", "user_id", "p_ts"), "p_ts",
      vIn.toDF().toDF("v_id", "user_id", "v_ts"), "v_ts",
      Seq("user_id"), lookbackSeconds = 3600L, watermarkDelay = "10 minutes")
    val q = joined.select("p_id", "v_id").writeStream.format("memory")
      .queryName("ssj_outer").outputMode("append").start()
    try {
      // user 1: view then purchase (match); user 2: purchase, NO view
      vIn.addData(Seq((1001L, 1L, ts("2024-01-01 10:00:00"))))
      pIn.addData(Seq((2001L, 1L, ts("2024-01-01 10:05:00")),
        (2002L, 2L, ts("2024-01-01 10:05:00"))))
      q.processAllAvailable()
      val early = spark.table("ssj_outer").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(!early.exists(_._1 == 2002L),
        "the unmatched purchase must NOT null-emit before the watermark passes its deadline")
      // sentinels on BOTH inputs advance the global watermark to
      // 11:50 > 10:05 → purchase 2002's state expires → null emission
      vIn.addData(Seq((1099L, 99L, ts("2024-01-01 12:00:00"))))
      pIn.addData(Seq((2098L, 98L, ts("2024-01-01 12:00:00"))))
      q.processAllAvailable()
      val late = spark.table("ssj_outer").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(late.contains((2001L, Some(1001L))), "in-interval pair must match")
      assert(late.contains((2002L, None)),
        "watermark-expired unmatched purchase must surface null-padded")
      assert(!late.contains((2098L, None)),
        "the pending sentinel (watermark not yet past its deadline) must not emit")
    } finally q.stop()
  }

  test("streaming HLL sketch converges hash-exactly to the batch sketch") {
    // C125's streaming twin: per-micro-batch register tables max-merge
    // into the running sketch; MAX is the HLL merge monoid, so the
    // maintained state must equal the batch whole-corpus sketch EXACTLY
    // (registers, s_scaled, estimate) whatever the batch boundaries.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "user_id")
    val inDir = java.nio.file.Files.createTempDirectory("graft_hll_in").toFile.getAbsolutePath
    events.where(pmod(col("event_id"), lit(3)) === 0).write.mode("append").parquet(inDir)
    events.where(pmod(col("event_id"), lit(3)) === 1).write.mode("append").parquet(inDir)
    events.where(pmod(col("event_id"), lit(3)) === 2).write.mode("append").parquet(inDir)

    val state = new StreamingOps.HllDistinctState(Seq("event_type"), "user_id")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val streamed = toMap(state.finalized.get)
      val batch = toMap(graft.ops.Profiling.hllDistinct(events, Seq("event_type"), "user_id"))
      assert(streamed === batch,
        "micro-batched max-merged registers must reproduce the batch sketch bit-for-bit")
    } finally q.stop()
  }

  test("streaming count-min sketch converges exactly to the batch sketch") {
    // C127's streaming twin: per-micro-batch depth×width counter matrices
    // SUM-merge (the count-min merge monoid) into the running sketch, so
    // the maintained state equals the batch whole-corpus sketch exactly
    // for any micro-batch boundaries — and point estimates finalized from
    // the state equal the batch estimates (upper bounds ≥ true counts).
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val inDir = java.nio.file.Files.createTempDirectory("graft_cms_in").toFile.getAbsolutePath
    (0 to 2).foreach { m =>
      docs.where(pmod(col("doc_id"), lit(3)) === m).coalesce(1)
        .write.mode("append").parquet(inDir)
    }

    val state = new StreamingOps.CmSketchState("text", depth = 4, width = 256)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.finalized.get
      val batch = graft.ops.TextOps.countMinSketch(docs, "text", 4, 256)
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "sum-merged micro-batch sketches must equal the batch sketch exactly")
      // point estimates: finalized from state = batch finalization, and
      // each is an upper bound on the true count (count-min guarantee)
      val probes = Seq("the", "data", "quality")
      val est = state.estimates(probes).get.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batchEst = graft.ops.TextOps.countMinEstimate(batch, probes, 4, 256)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est === batchEst)
      val truth = docs.select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("c")).where(col("token").isin(probes: _*))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      probes.foreach { t =>
        assert(est(t) >= truth.getOrElse(t, 0L),
          s"count-min estimate for '$t' must upper-bound the true count")
      }
      // replay contract: a stale batchId is a no-op
      state.mergeBatch(docs.limit(5), batchId = 0L)
      assert(state.finalized.get.except(batch).count() === 0)

      // retirement contract (uniform across foreachBatch states): a plan
      // captured before a trigger must execute to its as-of-capture
      // answer after that trigger swaps the state frame.
      val captured = state.estimates(probes).get
      state.mergeBatch(docs.limit(7), batchId = 100L)
      assert(captured.collect().map(r => r.getString(0) -> r.getLong(1)).toMap === est,
        "a plan captured before a trigger must stay executable and as-of-capture")
    } finally q.stop()
  }

  test("streaming histogram with fixed edges converges exactly to the batch histogram") {
    // C126's streaming twin: per-micro-batch bin counts sum-merge (the
    // histogram merge monoid) into the running state; fixed edges stand
    // in for the historical profile a production stream pins up front.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "value")
    val inDir = java.nio.file.Files.createTempDirectory("graft_histo_in").toFile.getAbsolutePath
    events.where(pmod(col("event_id"), lit(2)) === 0).write.mode("append").parquet(inDir)
    events.where(pmod(col("event_id"), lit(2)) === 1).write.mode("append").parquet(inDir)

    val state = new StreamingOps.HistogramState(Seq("event_type"), "value",
      lo = 0.0, hi = 400.0, nBins = 64)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.finalized.get
      val batch = graft.ops.Profiling.histogramCounts(events, Seq("event_type"), "value",
        lo = 0.0, hi = 400.0, nBins = 64)
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "sum-merged micro-batch histograms must equal the batch histogram exactly")
      // clamping keeps totals equal to the row count
      val total = streamed.agg(sum("_cnt")).collect().head.getLong(0)
      assert(total === events.count())
    } finally q.stop()
  }

  test("streaming PSI drift state converges exactly to the batch q_psi report") {
    // C181's streaming twin: per-bin cohort counts are the PSI's sum
    // monoid; the report derived from the merged counts must be
    // hash-identical to the batch psiReport whatever the micro-batch
    // boundaries, and batch-id replay must be a no-op.
    val docs = graft.ops.Relational.splitAssign(
      Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "n_chars"),
      "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val inDir = java.nio.file.Files.createTempDirectory("graft_psi_in").toFile.getAbsolutePath
    // three uneven micro-batches, cohorts deliberately imbalanced per file
    docs.where(pmod(col("doc_id"), lit(3)) === 0).write.mode("append").parquet(inDir)
    docs.where(pmod(col("doc_id"), lit(3)) === 1).write.mode("append").parquet(inDir)
    docs.where(pmod(col("doc_id"), lit(3)) === 2).write.mode("append").parquet(inDir)

    val state = new StreamingOps.PsiDriftState(col("split") === "train", col("n_chars"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.finalized.get
      val batch = graft.ops.Profiling.psiReport(docs, col("split") === "train", col("n_chars"))
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "sum-merged cohort counts must reproduce the batch PSI report exactly")
      // replaying an already-applied batchId must not double-count
      state.mergeBatch(docs, 0L)
      val replayed = state.finalized.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0,
        "batch-id replay must be a no-op")
    } finally q.stop()
  }

  test("streaming KMV sketch converges exactly to the batch kmv_estimate") {
    // C210's streaming twin: keep-smallest-k is an idempotent,
    // associative, commutative union monoid, so the sketch maintained
    // over arbitrary micro-batch boundaries must yield estimates
    // BIT-identical to the batch q_kmv_distinct column — k=16 so the
    // estimator path (not just the exact fallback) is exercised.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text")
    val inDir = java.nio.file.Files.createTempDirectory("graft_kmv_in").toFile.getAbsolutePath
    docs.where(pmod(col("doc_id"), lit(3)) === 0).write.mode("append").parquet(inDir)
    docs.where(pmod(col("doc_id"), lit(3)) === 1).write.mode("append").parquet(inDir)
    docs.where(pmod(col("doc_id"), lit(3)) === 2).write.mode("append").parquet(inDir)

    val state = new StreamingOps.KmvState("lang", col("text"), 16)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.finalized.get
      val batch = graft.ops.Profiling.kmvDistinct(docs, "lang", col("text"), 16)
        .select("lang", "kmv_estimate")
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "smallest-k-merged sketch must reproduce the batch estimates exactly")
      // the estimator path must actually be exercised (some lang above k)
      assert(graft.ops.Profiling.kmvDistinct(docs, "lang", col("text"), 16)
        .where(col("n_distinct_hashed") > 16).count() > 0)
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(docs, 0L)
      val replayed = state.finalized.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0,
        "batch-id replay must be a no-op")
      // re-delivery of already-seen values must also be a no-op (distinct
      // hashes — dedup is free, unlike counter sketches)
      state.mergeBatch(docs.limit(50), 99L)
      val redelivered = state.finalized.get
      assert(redelivered.except(batch).count() === 0 && batch.except(redelivered).count() === 0,
        "re-delivered values must not move the sketch")
    } finally q.stop()
  }

  test("streaming calibration bins serve both the report and the Brier read, bit-identical to batch") {
    // C187 + C295's streaming twin (r18b): calibration is a drift
    // property, so the bin state is maintained continuously; the
    // per-bin decimal sufficient statistics are an additive monoid and
    // BOTH reads (reliability report, Murphy decomposition) must equal
    // their batch queries exactly over everything merged so far.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text")
    val t = TextOps.tokens(col("text"))
    val score = size(org.apache.spark.sql.functions.filter(t,
      x => x.isin(TextOps.Stopwords: _*))).cast("double") / size(t).cast("double")
    val label = col("lang") === "en"
    val inDir = java.nio.file.Files.createTempDirectory("graft_cal_in").toFile.getAbsolutePath
    docs.where(col("doc_id") % 2 === 0).write.mode("append").parquet(inDir)
    docs.where(col("doc_id") % 2 =!= 0).write.mode("append").parquet(inDir)
    val state = new StreamingOps.CalibrationBinsState(score, label, 10, size(t) > 0)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val scored = docs.select(col("lang"), score.as("_score")).where(size(t) > 0)
      val batchRep = graft.ops.Profiling.calibrationReport(
        scored, col("_score"), col("lang") === "en", 10)
      val rep = state.report.get
      assert(rep.count() > 0)
      assert(rep.except(batchRep).count() === 0 && batchRep.except(rep).count() === 0,
        "merged bins must reproduce the batch reliability table exactly")
      val batchBrier = graft.ops.Profiling.brierDecomposition(
        scored, col("_score"), col("lang") === "en", 10)
      val br = state.brier.get
      assert(br.except(batchBrier).count() === 0 && batchBrier.except(br).count() === 0,
        "one state, two monitors — the Murphy read must match batch too")
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(docs, 0L)
      val replayed = state.report.get
      assert(replayed.except(batchRep).count() === 0 &&
        batchRep.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("streaming HHI concentration is bit-identical to batch") {
    // C301's streaming twin (r18b): per-source decimal character sums
    // are the additive monoid; the concentration read from the merged
    // state must equal the batch q_hhi row exactly.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "n_chars")
    val inDir = java.nio.file.Files.createTempDirectory("graft_hhi_in").toFile.getAbsolutePath
    docs.where(col("doc_id") % 2 === 0).write.mode("append").parquet(inDir)
    docs.where(col("doc_id") % 2 =!= 0).write.mode("append").parquet(inDir)
    val state = new StreamingOps.HhiState("source", col("n_chars"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val batch = graft.ops.Profiling.hhiConcentration(docs, "source", col("n_chars"))
      val streamed = state.concentration.get
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "merged source sums must reproduce the batch concentration exactly")
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(docs, 0L)
      val replayed = state.concentration.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("streaming DiD state equals batch over uneven batches and replays as a no-op") {
    // r20 (VERDICT r19 item 7): the (unit, day) decimal outcome-sum
    // panel is an additive monoid and the pre/post boundary re-derives
    // from the maintained day span at read time — so the DiD read off
    // the merged state must equal batch q_did bit-exactly however the
    // stream batches the corpus, including units whose pre- and
    // post-period events arrive in DIFFERENT batches (the split date
    // itself moves as later batches extend the span).
    val evs = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "ts", "value")
    val inDir = java.nio.file.Files.createTempDirectory("graft_did_in").toFile.getAbsolutePath
    // three uneven batches keyed by user hash — pre/post rows of one
    // user land together, but the global span grows batch by batch
    val h = pmod(col("user_id"), lit(5))
    evs.where(h <= 1).write.mode("append").parquet(inDir)
    evs.where(h === 2).write.mode("append").parquet(inDir)
    evs.where(h >= 3).write.mode("append").parquet(inDir)
    val state = new StreamingOps.DidState("user_id", "ts", "value")
    val stream = spark.readStream.schema(evs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val isA = (u: org.apache.spark.sql.Column) =>
        pmod(graft.ops.Portable.hash32(u), lit(2L)) === 0
      val batch = EventOps.didEstimate(evs, "user_id", "ts", col("value"), isA)
      val streamed = state.did(isA).get
      assert(streamed.except(batch).count() === 0 &&
        batch.except(streamed).count() === 0,
        "DiD from the maintained daily panel must equal batch exactly")
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(evs, 0L)
      val replayed = state.did(isA).get
      assert(replayed.except(batch).count() === 0 &&
        batch.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("streaming survival state serves the whole shelf bit-identically") {
    // r19: per-unit (first, last) date spans are the survival shelf's
    // complete sufficient statistic and a (min, max) monoid, so KM,
    // Nelson-Aalen, log-rank AND the Cox fit read from one maintained
    // state must equal their batch queries exactly — including a unit
    // whose span is SPLIT across batches (its early orders arrive in
    // batch 1, later ones in batch 3, so the merged span — and its
    // censoring status against the moving corpus edge — must re-derive).
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_custkey", "o_orderdate")
    val inDir = java.nio.file.Files.createTempDirectory("graft_surv_in").toFile.getAbsolutePath
    val yr = year(col("o_orderdate"))
    orders.where(yr <= 1994).write.mode("append").parquet(inDir)
    orders.where(yr === 1995).write.mode("append").parquet(inDir)
    orders.where(yr >= 1996).write.mode("append").parquet(inDir)
    val state = new StreamingOps.SurvivalState("o_custkey", "o_orderdate",
      censorDays = 180, unitDays = 30)
    val stream = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val isA = (u: org.apache.spark.sql.Column) =>
        pmod(graft.ops.Portable.hash32(u), lit(2L)) === 0
      val checks: Seq[(String, DataFrame, DataFrame)] = Seq(
        ("kaplanMeier", state.kaplanMeier.get,
          EventOps.kaplanMeier(orders, "o_custkey", "o_orderdate", 180, 30)),
        ("nelsonAalen", state.nelsonAalen.get,
          EventOps.nelsonAalen(orders, "o_custkey", "o_orderdate", 180, 30)),
        ("logRank", state.logRank(isA).get,
          EventOps.logRank(orders, "o_custkey", "o_orderdate", isA, 180, 30)),
        ("coxPh", state.coxPh(isA).get,
          EventOps.coxPh(orders, "o_custkey", "o_orderdate", isA, 180, 30)))
      checks.foreach { case (what, streamed, batch) =>
        withClue(s"$what: ") {
          assert(streamed.except(batch).count() === 0 &&
            batch.except(streamed).count() === 0,
            s"the $what read from merged spans must equal batch exactly")
        }
      }
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(orders, 0L)
      val batchKm = EventOps.kaplanMeier(orders, "o_custkey", "o_orderdate", 180, 30)
      val replayed = state.kaplanMeier.get
      assert(replayed.except(batchKm).count() === 0 &&
        batchKm.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("streaming second-moment state serves all four representation monitors bit-identically") {
    // The MomentStore family's streaming twin (r19, VERDICT r18 item 2):
    // cohort-conditional decimal second-moment partials are an additive
    // monoid, so drift, covariance, participation ratio AND linear CKA
    // read from ONE maintained state must equal their batch queries
    // exactly, however the stream happens to batch the corpus.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val inDir = java.nio.file.Files.createTempDirectory("graft_mom_in").toFile.getAbsolutePath
    // three uneven batches — the split must be irrelevant to the sums
    emb.where(col("vec_id") % 7 === 0).write.mode("append").parquet(inDir)
    emb.where(col("vec_id") % 7 === 1).write.mode("append").parquet(inDir)
    emb.where(col("vec_id") % 7 >= 2).write.mode("append").parquet(inDir)
    val state = new StreamingOps.MomentState("vec_id", "embedding")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val checks: Seq[(String, DataFrame, DataFrame)] = Seq(
        ("drift", state.drift.get,
          graft.ops.VectorOps.secondMomentDrift(emb,
            graft.sources.MomentStore.refCohort(col("vec_id")), "embedding")),
        ("covariance", state.covariance.get,
          graft.ops.VectorOps.embeddingCovariance(emb, "vec_id", "embedding")),
        ("participation", state.participation.get,
          graft.ops.VectorOps.participationRatio(emb, "vec_id", "embedding")),
        ("cka", state.cka.get,
          graft.ops.VectorOps.linearCka(emb, "embedding",
            graft.sources.MomentStore.Dim, graft.sources.MomentStore.K)))
      checks.foreach { case (what, streamed, batch) =>
        withClue(s"$what: ") {
          assert(streamed.except(batch).count() === 0 &&
            batch.except(streamed).count() === 0,
            s"the $what read from merged moment state must equal batch exactly")
        }
      }
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(emb, 0L)
      val replayed = state.drift.get
      val batchDrift = graft.ops.VectorOps.secondMomentDrift(emb,
        graft.sources.MomentStore.refCohort(col("vec_id")), "embedding")
      assert(replayed.except(batchDrift).count() === 0 &&
        batchDrift.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("streaming Fano dispersion is bit-identical to batch, under out-of-order arrival") {
    // C294's streaming twin (r18b): per-(key, day) counts are an
    // additive monoid, so the dense-grid dispersion read from the
    // maintained state must equal the batch q_fano rows exactly —
    // including when a late file back-fills EARLIER days (which also
    // stretches the grid's min bound at read time).
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("ts", "event_type")
    val inDir = java.nio.file.Files.createTempDirectory("graft_fano_in").toFile.getAbsolutePath
    val day = dayofmonth(col("ts"))
    events.where(day >= 16).write.mode("append").parquet(inDir)   // newest first
    events.where(day < 16).write.mode("append").parquet(inDir)    // back-fill
    val state = new StreamingOps.FanoState("event_type", "ts", 49.588)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.dispersion.get
      val batch = graft.ops.TimeSeries.fanoDispersion(events, "event_type",
        "ts", 49.588)
      assert(streamed.count() > 0)
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "merged daily counts must reproduce the batch dispersion exactly")
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(events, 0L)
      val replayed = state.dispersion.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("streaming SPRT decisions are bit-identical to batch, under out-of-order arrival") {
    // C277's streaming twin (r17): per-day Bernoulli counts are an
    // additive monoid, so the LLR walk + first-crossing decisions read
    // from the maintained state must equal the batch q_sprt rows exactly
    // — INCLUDING when late files back-fill EARLIER days (the second
    // file below carries the first half of the month).
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("ts", "event_type", "event_id")
    val inDir = java.nio.file.Files.createTempDirectory("graft_sprt_in").toFile.getAbsolutePath
    val day = dayofmonth(col("ts"))
    events.where(day >= 16).write.mode("append").parquet(inDir)   // newest first
    events.where(day < 16).write.mode("append").parquet(inDir)    // back-fill
    val state = new StreamingOps.SprtState("ts", col("event_type") === "purchase",
      0.10, 0.15, 0.05, 0.05)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.decisions.get
      val batch = graft.ops.EventOps.sprt(events, "ts",
        col("event_type") === "purchase", 0.10, 0.15, 0.05, 0.05)
      assert(streamed.count() > 0)
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "merged daily counts must reproduce the batch walk and decisions exactly")
      // the SAME maintained day counts serve the e-process read (C278,
      // r18): the anytime-valid monitor must match batch bit-for-bit too
      val streamedE = state.eValues.get
      val batchE = graft.ops.EventOps.eProcess(events, "ts",
        col("event_type") === "purchase", 0.10, 0.15, 0.05)
      assert(streamedE.except(batchE).count() === 0 &&
        batchE.except(streamedE).count() === 0,
        "one state, two sequential monitors — the e-walk must match batch")
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(events, 0L)
      val replayed = state.decisions.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("streaming conformal interval is bit-identical to batch, split across the boundary") {
    // C270's streaming twin (VERDICT r17 item 4): the (cal, score, count)
    // catalog is an additive monoid and the boundary rows carry each
    // unit's last value across the split, so the q̂ pick + coverage read
    // through the shared conformalFromScoreCounts must equal the batch
    // q_conformal row exactly — INCLUDING the persistence residuals whose
    // (prev, cur) pair straddles the batch boundary. In-order arrival per
    // unit is the contract (see ConformalState's scaladoc), so each half
    // is a single file (one part) and the halves are stamped so the
    // earlier-ordered half is ingested first.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_id", "ts", "value")
    val inDir = java.nio.file.Files.createTempDirectory("graft_conf_in").toFile.getAbsolutePath
    val mid = events.agg(percentile_approx(col("event_id"), lit(0.5), lit(100)))
      .head().getLong(0)
    events.where(col("event_id") < mid).repartition(1).write.mode("append").parquet(inDir)
    // parquet part files of the two writes must ingest in order-column
    // order: stamp the first half strictly older (FileStreamSource orders
    // by modification time), then write the second half
    val dir = new java.io.File(inDir)
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.setLastModified(f.lastModified() - 60000)))
    events.where(col("event_id") >= mid).repartition(1).write.mode("append").parquet(inDir)
    val state = new StreamingOps.ConformalState("user_id", "event_id", "ts",
      col("value"), splitDay = 16, alpha = 0.1)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.interval.get
      val batch = graft.ops.Profiling.conformalInterval(events, "user_id", "event_id",
        "ts", col("value"), splitDay = 16, alpha = 0.1)
      assert(streamed.head().getAs[Any]("q_hat") != null,
        "the calibration catalog must be populated")
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "merged score catalog must reproduce the batch conformal row exactly")
      // the boundary path must actually fire: units exist on both sides
      val straddlers = events.where(col("event_id") < mid).select("user_id")
        .intersect(events.where(col("event_id") >= mid).select("user_id"))
      assert(straddlers.count() > 0, "the split must straddle units")
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(events, 0L)
      val replayed = state.interval.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0,
        "batch-id replay must be a no-op")
    } finally q.stop()
  }

  test("streaming change-point state is bit-identical to batch, under out-of-order arrival") {
    // C258's streaming twin (VERDICT r17 item 4): the per-series
    // (order, value) log is a SET, so arrival order is irrelevant — the
    // read shares the whole batch operator, which sorts by the order
    // column itself. The second file back-fills EARLIER rows (odd
    // event_ids land after even ones) to prove it.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_id", "value")
    val inDir = java.nio.file.Files.createTempDirectory("graft_binseg_in").toFile.getAbsolutePath
    events.where(pmod(col("event_id"), lit(2)) === 0).write.mode("append").parquet(inDir)
    events.where(pmod(col("event_id"), lit(2)) === 1).write.mode("append").parquet(inDir)
    val state = new StreamingOps.BinSegState("user_id", "event_id", "value")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.changepoints.get
      val batch = graft.ops.TimeSeries.binSegChangepoint(events, "user_id", "event_id", "value")
      assert(streamed.count() > 0)
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "the maintained series log must reproduce the batch change-points exactly")
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(events, 0L)
      val replayed = state.changepoints.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0,
        "batch-id replay must be a no-op")
    } finally q.stop()
  }

  test("streaming group moments yield jackknife influences bit-identical to batch") {
    // C275's streaming twin (r17): (count, decimal sum) is an additive
    // monoid, so the per-source moments maintained over arbitrary batch
    // boundaries must reproduce the batch q_source_influence rows
    // bit-for-bit through the shared jackknifeFromMoments read.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "n_chars")
    val inDir = java.nio.file.Files.createTempDirectory("graft_jk_in").toFile.getAbsolutePath
    // boundary split straddles sources: each batch holds half of every
    // source's docs, so every group's moments assemble across batches
    docs.where(pmod(col("doc_id"), lit(2)) === 0).write.mode("append").parquet(inDir)
    docs.where(pmod(col("doc_id"), lit(2)) === 1).write.mode("append").parquet(inDir)

    val state = new StreamingOps.GroupMomentsState("source", col("n_chars"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.influence.get
      val batch = graft.ops.Profiling.jackknifeInfluence(docs, "source", col("n_chars"))
      assert(streamed.count() > 0)
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "merged moments must reproduce the batch influence table exactly")
      // replaying an already-applied batchId must be a no-op
      state.mergeBatch(docs, 0L)
      val replayed = state.influence.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0,
        "batch-id replay must be a no-op")
    } finally q.stop()
  }

  test("streaming KMV sketches yield pairwise Jaccard estimates bit-identical to batch") {
    // C260's streaming twin (VERDICT r16 item 6): the SAME maintained
    // smallest-k sketches that serve the distinct estimate also serve
    // the pairwise union-sketch Jaccard — the merge monoid makes the
    // sketch exactly the batch whole-corpus sketch regardless of where
    // the batch boundary falls, and kmvJaccardFromSketches is the one
    // shared formula, so the estimates must match BIT-for-bit. k=16
    // keeps every lang pair on the estimator path (unions above k).
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text")
    val inDir = java.nio.file.Files.createTempDirectory("graft_kmvj_in").toFile.getAbsolutePath
    // boundary split straddles languages: batch 1 holds the FIRST half
    // of every language's docs, batch 2 the rest — every pair's union
    // sketch is assembled across the batch boundary
    docs.where(pmod(col("doc_id"), lit(2)) === 0).write.mode("append").parquet(inDir)
    docs.where(pmod(col("doc_id"), lit(2)) === 1).write.mode("append").parquet(inDir)

    val state = new StreamingOps.KmvState("lang", col("text"), 16)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.pairwiseJaccard.get
      val batch = graft.ops.Profiling.kmvJaccard(docs, "lang", col("text"), 16)
        .select("ga", "gb", "jaccard_est")
      assert(streamed.count() > 0, "the corpus has several languages — pairs must exist")
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "maintained-sketch pairwise Jaccard must equal the batch estimates exactly")
      // replaying an already-applied batchId must not move the pairs
      state.mergeBatch(docs, 0L)
      val replayed = state.pairwiseJaccard.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0,
        "batch-id replay must be a no-op for the pairwise read too")
    } finally q.stop()
  }

  test("streaming user-growth state converges to the batch acquisition curve") {
    // C229's streaming twin: per-user min first-seen day is an
    // idempotent min monoid, so the derived (day, n_new, cum_users)
    // curve must equal the batch q_user_growth projection whatever the
    // micro-batch boundaries — INCLUDING arrival out of time order
    // (later files carry EARLIER events below).
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "ts", "event_id")
    val inDir = java.nio.file.Files.createTempDirectory("graft_ug_in").toFile.getAbsolutePath
    // reverse-chronological landing: the newest third arrives FIRST
    val day = dayofmonth(col("ts"))
    events.where(day >= 20).write.mode("append").parquet(inDir)
    events.where(day >= 10 && day < 20).write.mode("append").parquet(inDir)
    events.where(day < 10).write.mode("append").parquet(inDir)

    val state = new StreamingOps.UserFirstSeenState("user_id", "ts")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      val streamed = state.finalized.get
      val batch = graft.ops.EventOps.userGrowth(events, "user_id", "ts")
        .where(col("n_new") > 0)
        .select(col("day"), col("n_new"), col("cum_users"))
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "min-merged first-seen days must reproduce the batch acquisition curve")
      // replay + re-delivery are no-ops (idempotent monoid)
      state.mergeBatch(events, 0L)
      state.mergeBatch(events.limit(100), 42L)
      val replayed = state.finalized.get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("streaming CDC apply converges to the batch cdcApply, out of order and replayed") {
    // C89's streaming twin (VERDICT r7 item 7): the q_cdc_apply changelog
    // (updates v2, deletes v3, inserts v1) lands in micro-batches in
    // REVERSE version order — deletes first, inserts last — so a naive
    // sequential apply would resurrect deleted keys when their stale v2
    // update arrives later. The max-version state must converge to the
    // batch whole-changelog answer anyway.
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val upd = cust.where(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"), lit("U").as("op"), lit(2L).as("version"),
        col("c_name"), (col("c_acctbal") + lit(50.0)).as("c_acctbal"))
    val del = cust.where(col("c_custkey") % 11 === 0)
      .select(col("c_custkey"), lit("D").as("op"), lit(3L).as("version"),
        col("c_name"), col("c_acctbal"))
    // exact (key, version) tie with the deletes: D > U priority must hold
    // even though the update arrives in a LATER micro-batch
    val updTie = cust.where(col("c_custkey") % 11 === 0 && col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), lit("U").as("op"), lit(3L).as("version"),
        col("c_name"), (col("c_acctbal") + lit(999.0)).as("c_acctbal"))
    val ins = cust.where(col("c_custkey") % 13 === 0)
      .select((col("c_custkey") + 500000L).as("c_custkey"), lit("I").as("op"),
        lit(1L).as("version"), concat(col("c_name"), lit("_new")).as("c_name"),
        col("c_acctbal"))
    val changes = upd.unionByName(del).unionByName(updTie).unionByName(ins)

    val inDir = java.nio.file.Files.createTempDirectory("graft_cdc_in").toFile.getAbsolutePath
    // one file per op class, landed newest-version-first
    del.coalesce(1).write.mode("append").parquet(inDir)
    updTie.coalesce(1).write.mode("append").parquet(inDir)
    upd.coalesce(1).write.mode("append").parquet(inDir)
    ins.coalesce(1).write.mode("append").parquet(inDir)

    val state = new StreamingOps.CdcApplyState("c_custkey", "op", "version",
      Seq("c_name", "c_acctbal"))
    state.init(cust)
    val stream = spark.readStream.schema(changes.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir) // one op class per micro-batch
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      val streamed = toMap(state.finalized.get.select("c_custkey", "c_name", "c_acctbal"))
      val batch = toMap(graft.ops.Relational.cdcApply(cust, changes,
          "c_custkey", "op", "version", Seq("c_name", "c_acctbal"))
        .select("c_custkey", "c_name", "c_acctbal"))
      assert(streamed.keySet === batch.keySet,
        "deleted keys must stay deleted despite their stale update arriving later")
      batch.foreach { case (k, v) => assert(streamed(k) === v, s"key $k") }
      // replay contract: re-merging a stale batchId is a no-op
      state.mergeBatch(del, batchId = 0L)
      assert(toMap(state.finalized.get.select("c_custkey", "c_name", "c_acctbal")) === streamed)
    } finally q.stop()
  }

  test("streaming shingle-df state: novelty and contamination converge to batch") {
    // VERDICT r8 item 7: per-shingle df counts SUM-merge across
    // micro-batches (the df merge monoid — shingles are distinct per doc
    // and each doc arrives once), so novelty finalized from streaming
    // state must equal the batch shingleNovelty over the same documents,
    // including the RETROSPECTIVE flip: docs landing in the first batch
    // become "shared" when their twins arrive in the second.
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val bench = docs.where(col("doc_id") < 20)
    val corpus = docs.where(col("doc_id") >= 20)

    val inDir = java.nio.file.Files.createTempDirectory("graft_shdf_in").toFile.getAbsolutePath
    (0 to 3).foreach { m =>
      corpus.where(col("doc_id") % 4 === m).coalesce(1).write.mode("append").parquet(inDir)
    }

    // compactEvery=2 forces a compaction on every second trigger — the
    // retained-frame bound is exercised, not just claimed (ADVICE r9 1).
    val state = new StreamingOps.ShingleDfState("doc_id", "text", 3, compactEvery = 2)
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      // 4 triggers with compactEvery=2: retained frames must stay bounded
      // by compactEvery, not grow with trigger count.
      assert(state.partCount <= 2,
        s"shingleParts must be compacted to <= compactEvery frames, got ${state.partCount}")
      def novMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val streamedNov = novMap(state.finalizedNovelty.get
        .select("doc_id", "n_shingles", "n_shared", "shared_frac"))
      val batchNov = novMap(graft.ops.TextOps.shingleNovelty(
          graft.ops.TextOps.shingles(corpus, "doc_id", "text", 3), "doc_id")
        .select("doc_id", "n_shingles", "n_shared", "shared_frac"))
      assert(streamedNov === batchNov,
        "sum-merged df state must reproduce the batch novelty verdicts exactly")

      val benchSh = graft.ops.TextOps.shingles(bench, "doc_id", "text", 3)
      def conMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      val streamedCon = conMap(state.finalizedContamination(benchSh, 2L).get
        .select("doc_id", "n_common_shingles", "contaminated"))
      val batchCon = conMap(graft.ops.TextOps.contaminationFlagsFromShingles(
          corpus.select("doc_id"),
          graft.ops.TextOps.shingles(corpus, "doc_id", "text", 3), benchSh,
          "doc_id", minCommon = 2L)
        .select("doc_id", "n_common_shingles", "contaminated"))
      assert(streamedCon === batchCon)

      // replay contract: a stale batchId is a no-op
      state.mergeBatch(corpus.limit(5), batchId = 0L)
      assert(novMap(state.finalizedNovelty.get
        .select("doc_id", "n_shingles", "n_shared", "shared_frac")) === streamedNov)

      // ADVICE r10 item 1 — the EXECUTION race: a lazy plan captured
      // before a trigger must stay executable after that trigger runs a
      // compaction (parts is at capacity here, so the next merge compacts
      // and retires the very frames this plan reads). Generation-based
      // retirement keeps them pinned for one more trigger; without it
      // this collect() dies on truncated lineage.
      val captured = state.finalizedNovelty.get
      state.mergeBatch(corpus.limit(3), batchId = 100L)
      assert(state.retiredCount > 0,
        "the compacting trigger must RETIRE replaced frames, not free them")
      assert(novMap(captured.select("doc_id", "n_shingles", "n_shared", "shared_frac"))
          === streamedNov,
        "a plan captured before a trigger must execute to its as-of-capture answer")
    } finally q.stop()
  }

  test("keyed-state CDC apply converges to batch and a 1-key trigger emits 1 row") {
    // The production CDC shape (VERDICT r8 item 3): flatMapGroupsWithState
    // keyed state, base seeded as initial state. Same adversarial landing
    // order as the reference-implementation spec above (deletes first,
    // then the same-version tie updates, then stale updates, then
    // inserts), PLUS the O(batch-keys) evidence: after convergence a
    // micro-batch touching exactly ONE key must emit exactly ONE row —
    // the state store never re-emits (or re-ranks) the untouched keys —
    // and a STALE change (version below the standing winner) emits zero.
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val upd = cust.where(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"), lit("U").as("op"), lit(2L).as("version"),
        col("c_name"), (col("c_acctbal") + lit(50.0)).as("c_acctbal"))
    val del = cust.where(col("c_custkey") % 11 === 0)
      .select(col("c_custkey"), lit("D").as("op"), lit(3L).as("version"),
        col("c_name"), col("c_acctbal"))
    val updTie = cust.where(col("c_custkey") % 11 === 0 && col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), lit("U").as("op"), lit(3L).as("version"),
        col("c_name"), (col("c_acctbal") + lit(999.0)).as("c_acctbal"))
    val ins = cust.where(col("c_custkey") % 13 === 0)
      .select((col("c_custkey") + 500000L).as("c_custkey"), lit("I").as("op"),
        lit(1L).as("version"), concat(col("c_name"), lit("_new")).as("c_name"),
        col("c_acctbal"))
    val changes = upd.unionByName(del).unionByName(updTie).unionByName(ins)

    val inDir = java.nio.file.Files.createTempDirectory("graft_cdck_in").toFile.getAbsolutePath
    del.coalesce(1).write.mode("append").parquet(inDir)
    updTie.coalesce(1).write.mode("append").parquet(inDir)
    upd.coalesce(1).write.mode("append").parquet(inDir)
    ins.coalesce(1).write.mode("append").parquet(inDir)

    val stream = spark.readStream.schema(changes.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val out = StreamingOps.cdcApplyKeyed(stream, cust, "c_custkey", "op", "version",
      Seq("c_name", "c_acctbal"))

    // Driver-side consumer: upsert each trigger's emitted winners over the
    // base (tiny — emissions are only changed keys), recording per-batch
    // emission counts for the O(batch-keys) assertions.
    val current = scala.collection.mutable.Map.empty[Long, (String, String, Double)]
    cust.collect().foreach(r =>
      current(r.getLong(0)) = ("I", r.getString(1), r.getDouble(2)))
    val emitCounts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = out.writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect()
        emitCounts += rows.length.toLong
        rows.foreach(r => current(r.getLong(0)) = (r.getString(1), r.getString(3), r.getDouble(4)))
      }
      .start()
    try {
      q.processAllAvailable()
      val streamed = current.toMap.filter(_._2._1 != "D").map { case (k, (_, n, b)) => k -> (n, b) }
      val batch = graft.ops.Relational.cdcApply(cust, changes,
          "c_custkey", "op", "version", Seq("c_name", "c_acctbal"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      assert(streamed.keySet === batch.keySet,
        "tie deletes must suppress their keys; stale updates must not resurrect them")
      batch.foreach { case (k, v) => assert(streamed(k) === v, s"key $k") }

      // a trigger touching ONE key emits exactly one row...
      val one = cust.where(col("c_custkey") === 1L)
        .select(col("c_custkey"), lit("U").as("op"), lit(10L).as("version"),
          col("c_name"), lit(7777.0).as("c_acctbal"))
      one.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(emitCounts.last === 1L,
        s"1-key trigger must emit 1 row, not rewrite all keys (got ${emitCounts.last})")
      assert(current(1L) === (("U", current(1L)._2, 7777.0)))

      // ...and a STALE change (loses to the standing winner) emits none
      val stale = cust.where(col("c_custkey") === 1L)
        .select(col("c_custkey"), lit("U").as("op"), lit(1L).as("version"),
          col("c_name"), lit(1.0).as("c_acctbal"))
      stale.coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(emitCounts.last === 0L, "stale version must not emit or disturb state")
      assert(current(1L)._3 === 7777.0)
    } finally q.stop()
  }

  test("cdcApplyKeyed tombstone TTL expires deletes: state shrinks, re-insert is fresh") {
    // The r9 verdict's unbounded-state item: with a TTL, an op='D'
    // winner quiet past the horizon is dropped from the state store
    // (row count shrinks), and a subsequent arrival for the key behaves
    // as a FRESH insert — even one whose version is BELOW the expired
    // delete's, the explicit retention trade the scaladoc documents
    // (without expiry that stale version would lose to the tombstone
    // and emit nothing).
    // NOTE: a registered processing-time timeout makes the engine run
    // continuous micro-batches (each batch's new timestamp is how due
    // timeouts get evaluated), so processAllAvailable never observes an
    // idle moment and would hang — the spec polls emissions/progress
    // with deadlines instead (the scaladoc documents the same for
    // production consumers).
    val base = spark.range(5).select(col("id").as("k"), lit("base").as("v"))
    val inDir = java.nio.file.Files.createTempDirectory("graft_cdcttl_in").toFile.getAbsolutePath
    def change(k: Long, op: String, ver: Long, v: String) =
      spark.range(1).select(lit(k).as("k"), lit(op).as("op"),
        lit(ver).as("version"), lit(v).as("v"))
    change(1L, "D", 10L, "gone").coalesce(1).write.mode("append").parquet(inDir)

    val stream = spark.readStream
      .schema(change(0L, "I", 0L, "x").schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val out = StreamingOps.cdcApplyKeyed(stream, base, "k", "op", "version",
      Seq("v"), tombstoneTtlMs = Some(500L))
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, String)]
    val q = out.writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()
    def emittedNow: List[(Long, String, Long, String)] =
      emitted.synchronized(emitted.toList)
    def stateRows(): Long =
      Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    def awaitUntil(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime < deadline) Thread.sleep(50)
      assert(cond, s"timed out waiting for $what")
    }
    try {
      awaitUntil("the delete to emit")(emittedNow == List((1L, "D", 10L, "gone")))
      awaitUntil("the tombstone to sit in state (5 seeded keys, delete in place)")(
        stateRows() == 5L)
      // No helper data needed: the engine's own timeout sweep drops the
      // quiet tombstone once the 500 ms TTL passes.
      awaitUntil("the expired tombstone to leave the store")(stateRows() == 4L)
      // Version 1 < the expired delete's version 10: without expiry this
      // stale arrival would lose to the tombstone and emit nothing; after
      // expiry the key is never-seen and the insert lands fresh.
      change(1L, "I", 1L, "back").coalesce(1).write.mode("append").parquet(inDir)
      awaitUntil("the post-expiry re-insert to land as a fresh insert")(
        emittedNow.lastOption.contains((1L, "I", 1L, "back")))
      awaitUntil("state to regrow to 5")(stateRows() == 5L)
    } finally q.stop()
  }

  test("streaming pair-support maintenance converges to the batch pair aggregate") {
    // The C82/PairStore streaming twin: order lines land in two arrivals
    // split WITHIN baskets (odd/even line numbers), so pairs mixing an
    // old and a new item exist only if the state re-derives touched
    // baskets from accumulated + arrived items — the spanning-basket
    // case mergeBasketPairSupports was built for. The maintained table
    // must equal the one-pass basketPairs aggregate over everything
    // arrived, row for row.
    val lines = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber")
    val inDir = java.nio.file.Files.createTempDirectory("graft_pairs_in").toFile.getAbsolutePath
    lines.where(pmod(col("l_linenumber"), lit(2)) === 0)
      .drop("l_linenumber").write.mode("append").parquet(inDir)

    val state = new StreamingOps.PairSupportState("l_orderkey", "l_partkey")
    val schema = lines.drop("l_linenumber").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(inDir)
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      assert(state.finalized.map(_.count()).getOrElse(0L) > 0,
        "first arrival must already have maintained pairs")

      lines.where(pmod(col("l_linenumber"), lit(2)) === 1)
        .drop("l_linenumber").write.mode("append").parquet(inDir)
      q.processAllAvailable()

      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val streamed = toMap(state.finalized.get.select("item_a", "item_b", "support"))
      val batch = toMap(graft.ops.Relational.basketPairs(lines, "l_orderkey", "l_partkey")
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
        .select("item_a", "item_b", "support"))
      assert(streamed === batch,
        "maintained pair supports must equal the one-pass aggregate")
      // the split produced genuinely spanning baskets (pairs that exist
      // only across the two arrivals), so the equality above exercised
      // the delta re-derivation, not just unioned batch-local pairs
      val firstOnly = toMap(graft.ops.Relational.basketPairs(
          lines.where(pmod(col("l_linenumber"), lit(2)) === 0), "l_orderkey", "l_partkey")
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("support")))
      val secondOnly = toMap(graft.ops.Relational.basketPairs(
          lines.where(pmod(col("l_linenumber"), lit(2)) === 1), "l_orderkey", "l_partkey")
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("support")))
      assert(batch.keySet.diff(firstOnly.keySet ++ secondOnly.keySet).nonEmpty,
        "fixture must contain cross-arrival pairs or the test proves nothing")
    } finally q.stop()
  }

  test("pair-support state is idempotent under foreachBatch batch replay") {
    val lines = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_partkey").limit(200)
    val state = new StreamingOps.PairSupportState("l_orderkey", "l_partkey")
    def snapshot() = state.finalized.get.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    state.mergeBatch(lines, batchId = 0L)
    val afterFirst = snapshot()
    state.mergeBatch(lines, batchId = 0L) // replay of the SAME batch
    assert(snapshot() === afterFirst, "replayed batchId must not inflate supports")
    // a NEW batchId carrying already-seen items is ALSO a no-op — the
    // item-level set semantics (removed ≡ added for known items), the
    // second idempotency layer the scaladoc promises
    state.mergeBatch(lines, batchId = 1L)
    assert(snapshot() === afterFirst, "re-delivered items must be support no-ops")
  }

  test("burstiness state converges to the batch operator across a time-split arrival") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts")
    // time split: per-user contiguous segments (the state's ordering
    // contract) with a genuine cross-batch bridge gap per user
    val sorted = events.select("ts").orderBy("ts").collect()
    val cutoff = sorted(sorted.length / 2).getTimestamp(0)
    val first = events.where(col("ts") < cutoff)
    val second = events.where(col("ts") >= cutoff)
    val bothSides = first.select("user_id").distinct()
      .intersect(second.select("user_id").distinct()).count()
    assert(bothSides > 0, "fixture must bridge users across the split or the test proves nothing")

    val state = new StreamingOps.BurstinessState("user_id", "ts", "event_id")
    state.mergeBatch(first, batchId = 0L)
    state.mergeBatch(second, batchId = 1L)

    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Double]("mean_gap_us"),
        r.getAs[Double]("burstiness"))).toMap
    val streamed = toMap(state.finalized.get)
    val batch = toMap(EventOps.burstiness(events, "user_id", "ts", "event_id"))
    assert(streamed === batch,
      "maintained moments must reproduce the batch answer bit-for-bit")
  }

  test("burstiness state is replay-idempotent and refuses out-of-order segments") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts")
    val sorted = events.select("ts").orderBy("ts").collect()
    val cutoff = sorted(sorted.length / 2).getTimestamp(0)
    val first = events.where(col("ts") < cutoff)
    val second = events.where(col("ts") >= cutoff)

    val state = new StreamingOps.BurstinessState("user_id", "ts", "event_id")
    state.mergeBatch(first, batchId = 0L)
    val snap = state.finalized.get.collect().map(_.toSeq).toSet
    state.mergeBatch(first, batchId = 0L) // replayed trigger: no-op
    assert(state.finalized.get.collect().map(_.toSeq).toSet === snap)

    // out-of-order: merging the EARLIER half after the later one must
    // fail loudly (negative bridge), not corrupt the moments
    val bad = new StreamingOps.BurstinessState("user_id", "ts", "event_id")
    bad.mergeBatch(second, batchId = 0L)
    val ex = intercept[IllegalStateException] {
      bad.mergeBatch(first, batchId = 1L)
    }
    assert(ex.getMessage.contains("out-of-order"))
  }

  test("attributionKeyed converges to batch attribution across a time-split arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark
    import s.implicits._
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_id", "ts", "event_type")
    val rows = events.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getTimestamp(2), r.getString(3)))
      .sortBy(r => (r._3.getTime, r._2))
    val (firstHalf, secondHalf) = rows.splitAt(rows.length / 2)

    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val out = StreamingOps.attributionKeyed(
      in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
      "user_id", "ts", "event_id", "event_type", "purchase")
    val q = out.writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      in.addData(firstHalf.toIndexedSeq)
      q.processAllAvailable()
      in.addData(secondHalf.toIndexedSeq)
      q.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> (Option(r.getString(2)), Option(r.getString(3)))).toMap
      val streamed = toMap(spark.table("attr_stream")
        .select("event_id", "user_id", "first_touch", "last_touch"))
      val batch = toMap(EventOps.touchAttribution(events, "user_id", "ts",
        "event_id", "event_type", "purchase"))
      assert(streamed === batch,
        "keyed state must reproduce the batch credit rows exactly")
      // the split must produce conversions whose credited touches span
      // the two arrivals, or cross-batch state was never exercised
      val firstIds = firstHalf.map(_._2).toSet
      val crossBatch = secondHalf.filter(_._4 == "purchase").map(_._2)
        .filter(id => batch.get(id).exists(_._1.isDefined))
      assert(crossBatch.nonEmpty, "fixture must carry cross-arrival conversions")
      assert(firstIds.nonEmpty)
    } finally q.stop()
  }

  test("macdKeyed converges bit-exactly to the batch MACD across a time-split arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark
    import s.implicits._
    // synthetic series whose (ts, tie) order IS the batch orderCol order,
    // so the stream folds the identical sequence per key
    def t(n: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${n / 60}%02d:${n % 60}%02d:00")
    val rows = (0 until 80).map { i =>
      (i % 4L, i.toLong, t(i), 10.0 + (i % 7) * 1.5 - (i % 3))
    }
    val (a, b) = rows.splitAt(37)
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val out = StreamingOps.macdKeyed(
      in.toDF().toDF("key", "tie", "ts", "v"), "key", "ts", "tie", "v")
    val q = out.writeStream.format("memory").queryName("macd_stream")
      .outputMode("append").start()
    try {
      in.addData(a.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b.toIndexedSeq)
      q.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      val streamed = toMap(spark.table("macd_stream")
        .select("tie", "key", "v", "macd", "signal", "hist"))
      val batchDf = graft.ops.TimeSeries.macd(rows.toDF("key", "tie", "ts", "v")
        .select("key", "tie", "v"), "key", "tie", "v")
      val batch = toMap(batchDf.select("tie", "key", "v", "macd", "signal", "hist"))
      assert(streamed === batch,
        "streamed recurrence must fold the identical doubles as the batch pass")
    } finally q.stop()
  }

  test("macdKeyed refuses out-of-order cross-batch arrivals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark
    import s.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val out = StreamingOps.macdKeyed(
      in.toDF().toDF("key", "tie", "ts", "v"), "key", "ts", "tie", "v")
    val q = out.writeStream.format("memory").queryName("macd_bad")
      .outputMode("append").start()
    try {
      in.addData((1L, 10L, t(5), 1.0))
      q.processAllAvailable()
      in.addData((1L, 9L, t(3), 2.0)) // predates the high-water mark
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("out-of-order") ||
        Option(ex.getCause).exists(_.getMessage.contains("out-of-order")))
    } finally q.stop()
  }

  test("attributionKeyed refuses out-of-order cross-batch arrivals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark
    import s.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val out = StreamingOps.attributionKeyed(
      in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
      "user_id", "ts", "event_id", "event_type", "purchase")
    val q = out.writeStream.format("memory").queryName("attr_bad")
      .outputMode("append").start()
    try {
      in.addData((1L, 10L, t(5), "view"))
      q.processAllAvailable()
      in.addData((1L, 9L, t(3), "click")) // predates the high-water mark
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("out-of-order") ||
        Option(ex.getCause).exists(_.getMessage.contains("out-of-order")))
    } finally q.stop()
  }

  test("streaming decayed leaderboard converges to the batch ranking") {
    // C253's streaming twin: the (key, day, cnt) daily rollup is a count
    // monoid, so whatever the micro-batch boundaries — including an
    // out-of-order batch back-filling an EARLIER day — the derived
    // decayed ranking must equal the batch operator bit-for-bit.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("ts", "event_type")
    val inDir = java.nio.file.Files.createTempDirectory("graft_decay_in").toString
    // two arbitrary slices, written as separate files → separate triggers;
    // the second file carries the EARLIEST days (out-of-order arrival)
    val w = events.withColumn("_r", col("ts").cast("long") % 2)
    w.where(col("_r") === 0).drop("_r").coalesce(1).write.parquet(s"$inDir/f0")
    val state = new StreamingOps.DecayedLeaderboardState("ts", "event_type")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/f0")
    val q = stream.writeStream.foreachBatch(state.mergeBatch _).start()
    try {
      q.processAllAvailable()
      // late back-fill applied directly (same mergeBatch contract)
      state.mergeBatch(w.where(col("_r") === 1).drop("_r"), 1000L)
      val streamed = state.leaderboard(10).get
      val batch = graft.ops.EventOps.decayedLeaderboard(events, "ts", "event_type", 10)
      assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0,
        "streamed decayed ranking must equal the batch operator")
      // batchId replay is a no-op
      state.mergeBatch(events, 1000L)
      val replayed = state.leaderboard(10).get
      assert(replayed.except(batch).count() === 0 && batch.except(replayed).count() === 0)
    } finally q.stop()
  }

  test("cdcApplyKeyed rejects non-integral/string key columns at entry") {
    // The state-store grouping key is the key column rendered to string —
    // injective for integral/string keys only. A Double key must fail
    // fast, not silently merge 1 vs 1.0 state (ADVICE r9 item 3).
    val base = spark.range(3).select(col("id").cast("double").as("k"),
      lit("x").as("v"))
    val changes = base.select(col("k"), lit("U").as("op"), lit(1L).as("version"),
      col("v"))
    val ex = intercept[IllegalArgumentException] {
      StreamingOps.cdcApplyKeyed(changes, base, "k", "op", "version", Seq("v"))
    }
    assert(ex.getMessage.contains("integral or string"))
  }
}

case class Ssj(id: Long, user: Long, t: java.sql.Timestamp)
