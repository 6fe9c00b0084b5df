package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-batched kernels (the Scala
  * analog of `mapInPandas` — one buffer of rows per partition feeds the
  * "decoder" in batches, keeping the codec boundary wide).
  *
  * The actual image/audio decode is STUBBED (no codec libs in this
  * container): `decodeStub` derives deterministic metadata and a fake
  * feature vector from the bytes. The Spark-side contract — schema,
  * batch shape, partitioning, null handling — is real and tested;
  * swapping in a real decoder changes only the function body.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  final case class Decoded(
      media_id: Long, width: Int, height: Int, channels: Int,
      format: String, feature: Array[Float])

  /** Deterministic stand-in for an image decode: metadata from byte
    * length, features from byte averages over `channels` strides.
    * Marked clearly as the stub seam.
    */
  def decodeStub(mediaId: Long, bytes: Array[Byte]): Decoded = {
    val len = bytes.length
    val width = len % 97
    val height = (len * 7) % 89
    val channels = 3
    val feature = new Array[Float](channels)
    var i = 0
    while (i < len) {
      feature(i % channels) += (bytes(i) & 0xff)
      i += 1
    }
    var c = 0
    while (c < channels) {
      feature(c) = if (len == 0) 0f else feature(c) / len
      c += 1
    }
    Decoded(mediaId, width, height, channels, "stub", feature)
  }

  /** media(media_id BIGINT, media BINARY) -> decoded metadata+features,
    * batched per partition (batch size bounds peak decoder memory, like
    * `spark.sql.execution.arrow.maxRecordsPerBatch` for mapInPandas).
    */
  def decode(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): Dataset[Decoded] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.iterator.map { case (id, bytes) =>
            decodeStub(id, if (bytes == null) Array.empty else bytes)
          }
        }
      }
  }

  /** Resize to (targetW x targetH): the metadata arithmetic is real;
    * the pixel resample is the stub seam (deterministic stride-sample
    * of the source bytes to targetW*targetH*channels output bytes, so
    * output size is exactly what a real resampler would produce). The
    * `grouped(batchSize)` layer marks the seam where a real resampler
    * would make one vectorized call per batch — with the per-element
    * stub it changes nothing observable.
    */
  def resize(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int, channels: Int = 3,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0 && channels > 0,
      "target dims and channels must be positive")
    val outLen = targetW * targetH * channels
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val b = if (bytes == null) Array.empty[Byte] else bytes
            val out = new Array[Byte](outLen)
            if (b.nonEmpty) {
              var i = 0
              while (i < outLen) {
                out(i) = b((i.toLong * b.length / outLen).toInt)
                i += 1
              }
            }
            (id, targetW, targetH, channels, out)
          }
        }
      }.toDF("media_id", "width", "height", "channels", "media")
  }

  /** Frame sampling for "video" blobs: split bytes into n equal frames
    * (schema/plumbing demo; a real impl samples keyframes).
    */
  def frameSample(spark: SparkSession, media: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val step = math.max(1, b.length / n)
        (0 until n).iterator.takeWhile(i => i * step < b.length).map { i =>
          (id, i, b.slice(i * step, math.min(b.length, (i + 1) * step)))
        }
      }.toDF("media_id", "frame_id", "frame")
  }
}
