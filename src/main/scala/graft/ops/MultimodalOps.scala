package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the LLM-data-pipeline north star:
  * image/audio/video payloads ride as opaque `binary` columns with a typed
  * metadata struct; decode / feature-extraction / frame-sampling run
  * per-partition over the binary batches.
  *
  * The feature extraction (`decodeByteFeatures`) operates on the ACTUAL
  * payload bytes — per-payload nibble histogram plus Shannon entropy, the
  * standard content-type/compression fingerprint (encrypted or compressed
  * media ≈ 4 bits/nibble; text ≈ 2-3; zero-padded containers less) — so
  * the full decode path is real end-to-end. Format-specific codecs
  * (JPEG/PCM/H.264) are absent in this environment; plugging one in
  * replaces the histogram loop inside the same mapPartitions batch shape,
  * encoders, and metadata propagation.
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

  /** Number of feature dimensions emitted per payload: 16 nibble
    * frequencies + 1 entropy.
    */
  val ByteFeatureDim = 17

  /** Partition-wise decode: one pass per partition over the binary
    * payloads, emitting a fixed-width feature vector computed from the
    * payload BYTES — dims 0-15 are the frequency of each 4-bit nibble
    * value among the payload's nibbles, dim 16 is the Shannon entropy
    * (bits/nibble) of that distribution. Deterministic, codec-free, and
    * oracle-expressible (the nibble counts equal hex-digit counts of the
    * hex encoding, which any engine can compute); a format-specific
    * decoder slots into this same mapPartitions loop.
    */
  def decodeByteFeatures(packed: DataFrame): Dataset[DecodedFeatures] = {
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
          val cnt = new Array[Long](16)
          var i = 0
          while (i < payload.length) {
            val b = payload(i) & 0xff
            cnt(b >> 4) += 1
            cnt(b & 0xf) += 1
            i += 1
          }
          val tot = 2.0 * payload.length
          val features = new Array[Float](ByteFeatureDim)
          if (payload.length > 0) {
            var entropy = 0.0
            var j = 0
            while (j < 16) {
              val p = cnt(j) / tot
              features(j) = p.toFloat
              if (cnt(j) > 0) entropy -= p * math.log(p)
              j += 1
            }
            features(16) = (entropy / math.log(2.0)).toFloat
          }
          DecodedFeatures(id, mime, byteLen, features)
        }
      }
  }

  /** Output row of the waveform decode. */
  case class WaveStats(id: Long, n_samples: Long, rms: Double, peak: Long)

  /** Audio-path decode: interpret the payload as little-endian int16 PCM
    * and emit per-payload waveform statistics — sample count, RMS energy,
    * peak amplitude. Bit-deterministic across engines: the squared-sample
    * sum is integer-valued (exact in a double below 2^53), the division is
    * one IEEE op, and sqrt is correctly rounded everywhere — so the oracle
    * reproduces it from the hex encoding with no tolerance. A trailing odd
    * byte is ignored; payloads under one sample emit zeros.
    */
  def waveformStats(packed: DataFrame): Dataset[WaveStats] = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val n = payload.length / 2
          var sumSq = 0L
          var peak = 0L
          var i = 0
          while (i < n) {
            val s = (((payload(2 * i + 1): Int) << 8) | (payload(2 * i) & 0xff)).toShort.toLong
            sumSq += s * s
            if (math.abs(s) > peak) peak = math.abs(s)
            i += 1
          }
          val rms = if (n > 0) math.rint(math.sqrt(sumSq.toDouble / n) * 1e6) / 1e6 else 0.0
          WaveStats(id, n.toLong, rms, peak)
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

  /** Output row of the image-header parse. */
  case class ImageDims(id: Long, format: String, width: Long, height: Long)

  /** Image-container header parse — REAL format decoding on the payload
    * bytes, not a fingerprint: PNG (8-byte signature, then the IHDR chunk
    * carries width/height as big-endian u32 at offsets 16/20), GIF
    * ("GIF87a"/"GIF89a", then the logical-screen width/height as
    * little-endian u16 at offsets 6/8), and JPEG (SOI then a MARKER WALK:
    * each FF-marker segment carries a big-endian u16 length including its
    * own two bytes, so APPn/COM/quantization segments are skipped by
    * length until a start-of-frame marker — any SOFn in 0xC0-0xCF except
    * 0xC4/0xC8/0xCC, covering baseline, progressive, lossless, and
    * arithmetic-coded frames — whose header carries height/width as
    * big-endian u16 after the precision byte). PNG and GIF are fixed
    * offsets; JPEG is the format whose dimensions float behind
    * variable-length metadata, which is why real corpora (where JPEG
    * dominates) need the walk. Same partition-local mapPartitions shape
    * as [[decodeByteFeatures]]; a full codec slots into the same loop.
    * Unrecognized or malformed payloads (bad signature, truncated
    * segment, zero-length marker, scan data before any SOF) emit
    * ("unknown", -1, -1) rather than throwing: at corpus scale a
    * malformed header is data, not an exception.
    */
  def imageDims(packed: DataFrame): Dataset[ImageDims] = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        def u8(p: Array[Byte], i: Int): Long = p(i) & 0xffL
        def be32(p: Array[Byte], i: Int): Long =
          (u8(p, i) << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
        def be16(p: Array[Byte], i: Int): Long = (u8(p, i) << 8) | u8(p, i + 1)
        def le16(p: Array[Byte], i: Int): Long = u8(p, i) | (u8(p, i + 1) << 8)
        val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
        // JPEG marker walk to the first SOFn frame header; None on any
        // structural violation. Every marker in 0xC0-0xCF is a frame
        // header sharing the len/precision/height/width layout EXCEPT
        // 0xC4 (DHT), 0xC8 (JPG extension), 0xCC (DAC) — so lossless
        // SOF3, differential SOF5-7, and arithmetic-coded SOF9-11/13-15
        // all resolve, not just baseline/extended/progressive.
        def jpegDims(p: Array[Byte]): Option[(Long, Long)] = {
          var i = 2
          while (i + 1 < p.length) {
            if (u8(p, i) != 0xffL) return None
            var j = i + 1 // skip FF fill bytes before the marker code
            while (j < p.length && u8(p, j) == 0xffL) j += 1
            if (j >= p.length) return None
            val marker = u8(p, j).toInt
            if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              // frame header: len(2) precision(1) height(2) width(2) ...
              if (j + 7 >= p.length || be16(p, j + 1) < 8) return None
              return Some((be16(p, j + 6), be16(p, j + 4))) // (width, height)
            } else if (marker == 0xd9 || marker == 0xda) {
              return None // EOI / entropy-coded scan before any SOF
            } else if ((marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
              i = j + 1 // standalone marker, no length field
            } else {
              if (j + 2 >= p.length) return None
              val len = be16(p, j + 1)
              if (len < 2 || j + 1 + len >= p.length) return None
              i = j + 1 + len.toInt
            }
          }
          None
        }
        rows.map { case (id, p) =>
          if (p != null && p.length >= 24 && p.startsWith(pngSig) &&
              p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
            ImageDims(id, "png", be32(p, 16), be32(p, 20))
          else if (p != null && p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
              p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
            ImageDims(id, "gif", le16(p, 6), le16(p, 8))
          else if (p != null && p.length >= 4 && u8(p, 0) == 0xffL && u8(p, 1) == 0xd8L)
            jpegDims(p) match {
              case Some((w, h)) => ImageDims(id, "jpeg", w, h)
              case None         => ImageDims(id, "unknown", -1L, -1L)
            }
          else ImageDims(id, "unknown", -1L, -1L)
        }
      }
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
