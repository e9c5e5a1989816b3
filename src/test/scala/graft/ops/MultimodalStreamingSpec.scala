package graft.ops

import graft.SparkSpec
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class MDoc(doc_id: Long, text: String, source: String)

class MultimodalStreamingSpec extends SparkSpec {

  private def docs = df(Seq(
    MDoc(0, "hello world", "src0"),
    MDoc(1, "hello world", "src0"),     // identical payload → identical features
    MDoc(2, "other text entirely", "src1")))

  test("packBinary: payload round-trips, metadata is typed") {
    val packed = MultimodalOps.packBinary(
      docs.withColumnRenamed("doc_id", "id"), "id", "text", "text/plain")
    val r = packed.orderBy("id").head()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "hello world")
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("mime") === "text/plain")
    assert(meta.getAs[Long]("byte_len") === 11L)
    assert(meta.getAs[String]("source") === "src0")
  }

  test("packBinary tolerates inputs without a source column") {
    val noSource = docs.drop("source").withColumnRenamed("doc_id", "id")
    val packed = MultimodalOps.packBinary(noSource, "id", "text", "text/plain")
    assert(packed.select("meta.source").collect().forall(_.getString(0) === "unknown"))
  }

  test("decodeByteFeatures: real nibble histogram + entropy from payload bytes") {
    val packed = MultimodalOps.packBinary(
      docs.withColumnRenamed("doc_id", "id"), "id", "text", "text/plain")
    val decoded = MultimodalOps.decodeByteFeatures(packed).collect().sortBy(_.id)
    assert(decoded.length === 3)
    assert(decoded.forall(_.features.length === MultimodalOps.ByteFeatureDim))
    assert(decoded(0).features.toSeq === decoded(1).features.toSeq) // same payload
    assert(decoded(0).features.toSeq !== decoded(2).features.toSeq)
    // the 16 frequency dims sum to 1 for a non-empty payload
    decoded.foreach { d =>
      assert(math.abs(d.features.take(16).map(_.toDouble).sum - 1.0) < 1e-6)
    }
    // hand-check "hello world" (UTF-8, 11 bytes, 22 nibbles): nibble 6
    // appears 8 times (h/e/l/o/w/r/d high nibbles and 'l'/'o' lows...) —
    // verify against a direct recomputation instead of a magic constant
    val bytes = "hello world".getBytes("UTF-8")
    val cnt = new Array[Int](16)
    bytes.foreach { b => cnt((b & 0xff) >> 4) += 1; cnt(b & 0xf) += 1 }
    val tot = 2.0 * bytes.length
    (0 until 16).foreach { j =>
      assert(decoded(0).features(j) === (cnt(j) / tot).toFloat, s"dim $j")
    }
    val expEnt = -cnt.filter(_ > 0).map(c => c / tot * math.log(c / tot)).sum / math.log(2.0)
    assert(decoded(0).features(16) === expEnt.toFloat)
    // entropy of a uniform-ish text payload sits strictly between 0 and 4
    assert(decoded.forall(d => d.features(16) > 0f && d.features(16) < 4f))
  }

  test("decodeByteFeatures: empty payload yields all-zero features, no NaN") {
    val empty = df(Seq(MDoc(0, "", "src0"), MDoc(1, "x", "src0")))
    val packed = MultimodalOps.packBinary(
      empty.withColumnRenamed("doc_id", "id"), "id", "text", "text/plain")
    val decoded = MultimodalOps.decodeByteFeatures(packed).collect().sortBy(_.id)
    assert(decoded(0).features.forall(_ === 0f))
    assert(decoded.flatMap(_.features).forall(f => !f.isNaN))
  }

  test("sampleFrames: stride over byte_len-derived frame count, no payload fanout") {
    val packed = MultimodalOps.packBinary(
      docs.withColumnRenamed("doc_id", "id"), "id", "text", "video/fake")
    val frames = MultimodalOps.sampleFrames(packed, bytesPerFrame = 2L, stride = 2)
    // doc 0: 11 bytes / 2 = 5 frames → sampled idx 0,2,4
    val f0 = frames.where(col("id") === 0).select("frame_idx")
      .collect().map(_.getLong(0)).sorted
    assert(f0.toSeq === Seq(0L, 2L, 4L))
    assert(!frames.columns.contains("payload")) // payload pruned before explode
  }

  test("featureStats aggregates per mime and dimension") {
    val packed = MultimodalOps.packBinary(
      docs.withColumnRenamed("doc_id", "id"), "id", "text", "text/plain")
    val stats = MultimodalOps.featureStats(MultimodalOps.decodeByteFeatures(packed))
    assert(stats.count() === MultimodalOps.ByteFeatureDim) // one mime × 17 dims
    val r = stats.where(col("dim") === 0).head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("total_bytes") === (11 + 11 + 19).toDouble)
  }

  test("streaming windowedStats matches the batch tumbling windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:03:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:07:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 00:12:00")
    mem.addData((7L, t0, 2.0), (7L, t1, 3.0), (7L, t2, 5.0))
    val streamDf = mem.toDF().toDF("user_id", "ts", "value")
    val q = StreamingOps.windowedStats(streamDf, "user_id", "ts", "value", "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_out").orderBy("win_start").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("n_events") === 2L)
      assert(rows(0).getAs[Double]("sum_value") === 5.0)
      assert(rows(1).getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("streaming sessionize closes sessions on gap timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.SessionEvent]
    def ev(min: Int, v: Double) =
      StreamingOps.SessionEvent(7L, java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), v)
    val q = StreamingOps.sessionize(mem.toDS(), gapSeconds = 600L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      mem.addData(ev(0, 1.0), ev(5, 2.0))   // one session: 00:00-00:05
      q.processAllAvailable()
      mem.addData(ev(30, 4.0))              // gap 25 min > 10 min → closes first session
      q.processAllAvailable()
      mem.addData(ev(59, 8.0))              // gap 29 min → closes second session
      q.processAllAvailable()
      val rows = spark.table("sess_out").orderBy("session_start").collect()
      assert(rows.length >= 1)
      val first = rows.head
      assert(first.getAs[Long]("n_events") === 2L)
      assert(first.getAs[Double]("sum_value") === 3.0)
      assert(first.getAs[java.sql.Timestamp]("session_start").toString.startsWith("2024-01-01 00:00"))
      assert(first.getAs[java.sql.Timestamp]("session_end").toString.startsWith("2024-01-01 00:05"))
    } finally q.stop()
  }
}
