package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract run per-partition so
  * one codec context amortizes over a batch (the Scala analog of a Pandas-UDF
  * `mapInPandas` batch loop).
  *
  * The actual media codecs are NOT in this environment, so the decode kernel
  * is a clearly-marked deterministic stub ([[stubDecode]]) — the Spark-side
  * contract (schema, batching, partitioning, null handling) is real and
  * tested, and a production codec drops into [[decodeKernel]] without
  * touching the plumbing.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      byteLen: Long,
      checksum: Long)

  final case class MediaFeatures(
      id: Long,
      mediaType: String,
      byteLen: Long,
      checksum: Long,
      featureDim: Int,
      features: Array[Float])

  /** STUB decode kernel — deterministic fake standing in for a real codec
    * (e.g. JPEG decode → resize → channel means, or PCM frame-sample). It
    * reads the payload bytes and produces a fixed-dim feature vector from a
    * rolling checksum, so tests get stable values with the exact batching/
    * schema behavior of a real kernel.
    */
  def stubDecode(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null) return out
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < payload.length) {
      h = h * 31 + payload(i)
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / math.max(1, payload.length / dim.toFloat); j += 1 }
    out
  }

  def checksum64(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    if (payload == null) return 0L
    while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
    h
  }

  /** The decode stage: per-partition batch loop over (id, mediaType, payload)
    * rows. `mapPartitions` (not per-row map) so a real codec can hoist its
    * context/scratch buffers out of the row loop — the same shape a
    * vectorized Pandas-UDF batch would have.
    */
  def decodeKernel(
      df: DataFrame,
      idCol: String = "id",
      typeCol: String = "media_type",
      payloadCol: String = "payload",
      dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    implicit val enc = Encoders.product[MediaFeatures]
    df.select(col(idCol).cast("long"), col(typeCol).cast("string"), col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .mapPartitions { it =>
        // codec context init would go here, once per partition
        it.map { case (id, mt, payload) =>
          val len = if (payload == null) 0L else payload.length.toLong
          MediaFeatures(id, mt, len, checksum64(payload), dim, stubDecode(payload, dim))
        }
      }
  }

  /** Metadata-only pass (no decode): cheap map-side stats over the payload —
    * the column-pruned path when only sizes/checksums are needed.
    */
  def mediaMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("byte_len", octet_length(col(payloadCol)).cast("long"))
      .withColumn("payload_crc", crc32(col(payloadCol)))

  // --- resize ------------------------------------------------------------

  final case class Resized(
      id: Long, width: Int, height: Int, pixels: Array[Byte], checksum: Long)

  /** STUB resize — nearest-neighbor byte sampling of the payload onto a
    * `w × h` grid, standing in for a real image resample. Deterministic,
    * so the plumbing (fixed output size, per-partition batching) is
    * testable; a real decoder+resampler replaces only the inner function.
    */
  def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < out.length) {
      out(i) = payload((i.toLong * payload.length / out.length).toInt)
      i += 1
    }
    out
  }

  /** The resize stage: binary → fixed-size binary per row, `mapPartitions`
    * so a real resampler hoists its scratch buffers out of the row loop.
    */
  def resizeKernel(
      df: DataFrame,
      targetW: Int,
      targetH: Int,
      idCol: String = "id",
      payloadCol: String = "payload"): Dataset[Resized] = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    implicit val enc = Encoders.product[Resized]
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val px = stubResize(payload, targetW, targetH)
          Resized(id, targetW, targetH, px, checksum64(px))
        }
      }
  }

  // --- frame sampling ----------------------------------------------------

  final case class Frame(id: Long, frameIdx: Long, frameLen: Long, frameChecksum: Long)

  /** Frame-sample stage: treat the payload as a sequence of fixed-size
    * frames and keep every `every`-th one, emitting ONE ROW PER SAMPLED
    * FRAME — the generator (1 → N rows) shape a video pipeline needs so
    * downstream per-frame operators (decode, feature-extract) stay
    * per-row. A real demuxer replaces the fixed-size chunking; the
    * explode-shaped plumbing, indices and truncated-final-frame handling
    * are the part that carries to production.
    */
  def frameSampleKernel(
      df: DataFrame,
      frameSize: Int = 64,
      every: Int = 3,
      idCol: String = "id",
      payloadCol: String = "payload"): Dataset[Frame] = {
    require(frameSize > 0 && every > 0, "frameSize and every must be positive")
    implicit val enc = Encoders.product[Frame]
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val len = if (payload == null) 0 else payload.length
          val nFrames = (len + frameSize - 1) / frameSize
          (0 until nFrames by every).iterator.map { c =>
            val start = c * frameSize
            val flen = math.min(frameSize, len - start)
            val slice = java.util.Arrays.copyOfRange(payload, start, start + flen)
            Frame(id, c.toLong, flen.toLong, checksum64(slice))
          }
        }
      }
  }
}
