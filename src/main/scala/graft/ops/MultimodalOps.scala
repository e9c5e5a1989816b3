package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the LLM-data-pipeline north star:
  * image/audio/video payloads ride as opaque `binary` columns with a typed
  * metadata struct; decode / feature-extraction / frame-sampling run
  * per-partition over the binary batches.
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): `decodeFeaturesStub` derives a deterministic fake feature
  * vector from the payload bytes. The Spark-side plumbing — schema,
  * encoders, partition-wise batch processing, metadata propagation — is
  * real and tested; swapping the stub for a JNI/codec call changes one
  * function.
  *
  * Scale posture: payloads never shuffle unless the caller aggregates on
  * them — decode happens partition-local (`mapPartitions`), features are
  * small fixed-width arrays, and all downstream analytics group on the
  * compact metadata/feature columns.
  */
object MultimodalOps {

  /** Media metadata carried next to every binary payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_len", LongType),
    StructField("source", StringType)))

  /** Wrap a string column as a binary payload + typed metadata struct —
    * the ingestion shape a real pipeline gets from raw media files.
    * `sourceCol` names an optional provenance column; inputs without one
    * get a constant "unknown" instead of an AnalysisException.
    */
  def packBinary(df: DataFrame, idCol: String, payloadCol: String, mime: String,
                 sourceCol: Option[String] = Some("source")): DataFrame = {
    val src = sourceCol.filter(df.columns.contains) match {
      case Some(c) => coalesce(col(c), lit("unknown"))
      case None    => lit("unknown")
    }
    df.select(
      col(idCol),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(mime).as("mime"),
        length(col(payloadCol)).cast("long").as("byte_len"),
        src.as("source")).as("meta"))
  }

  /** Output row of the decode stage. */
  case class DecodedFeatures(id: Long, mime: String, byte_len: Long, features: Array[Float])

  /** Partition-wise "decode": one pass per partition over the binary
    * payloads, emitting a fixed-width feature vector per document. The
    * feature derivation below is a deterministic STUB standing in for a
    * real decoder (`??? ← decode(payload)` would go here); everything
    * around it — the mapPartitions batch shape, encoder, fixed feature
    * width — is the production plumbing.
    */
  def decodeFeaturesStub(packed: DataFrame, featureDim: Int = 8): Dataset[DecodedFeatures] = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(
        col("id").cast("long"),
        col("payload"),
        col("meta.mime"),
        col("meta.byte_len"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, mime, byteLen) =>
          // STUB: a real implementation decodes the media here. The fake
          // features are a stable function of the payload bytes so tests
          // and re-runs are deterministic.
          val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
          val features = Array.tabulate(featureDim)(i => ((md(i % md.length) & 0xff) / 255.0f))
          DecodedFeatures(id, mime, byteLen, features)
        }
      }
  }

  /** Frame sampling for video-like payloads: emit every `stride`-th frame
    * index up to `meta.byte_len / bytesPerFrame` — pure generator-side
    * (`explode(sequence)`), no payload duplication across rows.
    */
  def sampleFrames(packed: DataFrame, bytesPerFrame: Long, stride: Int): DataFrame = {
    val nFrames = greatest((col("meta.byte_len") / bytesPerFrame).cast("long"), lit(1L))
    packed.select(
        col("id"),
        col("meta"),
        explode(sequence(lit(0L), nFrames - 1, lit(stride.toLong))).as("frame_idx"))
  }

  /** Corpus stats over decoded features: per-mime feature means — the
    * downstream-analytics shape (small columns only; payloads pruned).
    */
  def featureStats(decoded: Dataset[DecodedFeatures]): DataFrame =
    decoded.toDF()
      .select(col("mime"), col("byte_len"), posexplode(col("features")).as(Seq("dim", "f")))
      .withColumn("dim", col("dim").cast("long"))
      .groupBy("mime", "dim")
      .agg(
        count(lit(1)).as("n"),
        avg("f").as("mean_f"),
        Portable.decSum(col("byte_len").cast("double")).as("total_bytes"))
}
