package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: media as opaque `binary` + typed metadata,
  * decode/feature-extract as a per-partition batch transform.
  *
  * The decode step itself is a STUB (this container ships no image/audio
  * codecs): `decodeStub` produces deterministic pseudo-features from the
  * bytes. Everything around it is the real production shape:
  *
  *  - input contract:  (id LONG, media BINARY, media_type STRING)
  *  - output contract: (id LONG, media_type STRING, n_bytes LONG,
  *                      features ARRAY<FLOAT>)
  *  - execution shape: `mapPartitions` — the JVM analog of `mapInPandas`,
  *    one decoder init per partition (model load, codec context), rows
  *    streamed through in batches, never collected to the driver.
  *
  * Swapping in a real decoder means replacing `decodeStub` only; the
  * schema, partitioning and per-partition lifecycle stay identical.
  */
object Multimodal {

  val FeatureDim = 8

  case class MediaRow(id: Long, media: Array[Byte], media_type: String)
  case class FeatureRow(id: Long, media_type: String, n_bytes: Long, features: Array[Float])

  /** Deterministic fake "decode": per-feature byte-histogram projections.
    * Stands in for image resize/embed or audio frame-sample.
    */
  private[pipeline] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      f(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < FeatureDim) { f(j) /= bytes.length; j += 1 }
    }
    f
  }

  /** Per-partition decode: one decoder context per partition, streaming
    * iterator in/out (constant memory regardless of partition size).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // decoder/codec init happens HERE, once per partition
      rows.map { r =>
        FeatureRow(r.id, r.media_type, r.media.length.toLong, decodeStub(r.media))
      }
    }
  }

  /** documents.text as the stand-in binary payload → feature table. */
  def documentFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("media"),
        col("lang").as("media_type"))
      .as[MediaRow]
    decodeFeatures(media).toDF()
  }

  /** One sampled frame: position, time offset, decoded features. */
  case class FrameRow(id: Long, media_type: String, n_frames: Long,
                      frame_idx: Long, t_offset_ms: Long, features: Array[Float])

  val FrameBytes = 8      // stand-in: 8 payload bytes per "frame"
  val FrameMs = 40L       // 25 fps

  /** Uniform k-frame sampling over a video-ish payload — the
    * frame-sample preprocessing a video pipeline runs before per-frame
    * embedding. Frame geometry (here: fixed-size byte windows at 25 fps)
    * comes from metadata in production; sampling picks k uniformly spaced
    * indices j·(n−1)/(k−1) (every frame when n ≤ k), so clip length
    * doesn't change the downstream batch shape. Same per-partition
    * decoder lifecycle as [[decodeFeatures]]; the per-frame decode is the
    * documented stub over the frame's byte window, everything else —
    * schema, explode shape, partitioning — is the production contract.
    */
  def sampleFrames(media: Dataset[MediaRow], k: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // decoder/codec context init once per partition, as in decodeFeatures
      rows.flatMap { r =>
        val nFrames = math.max(1L, r.media.length.toLong / FrameBytes)
        val idxs =
          if (nFrames <= k) 0L until nFrames
          else (0 until k).map(j => j.toLong * (nFrames - 1) / (k - 1))
        idxs.distinct.map { i =>
          val from = (i * FrameBytes).toInt
          val frame = r.media.slice(from, math.min(from + FrameBytes, r.media.length))
          FrameRow(r.id, r.media_type, nFrames, i, i * FrameMs, decodeStub(frame))
        }
      }
    }
  }

  /** Oracle-checkable frame-sample projection: same sampling geometry,
    * frame content witnessed by an md5 of the frame window (replayable in
    * any engine) instead of the stubbed decode.
    */
  def documentFrames(spark: SparkSession, dir: String, k: Int = 4): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("media_type"),
        greatest(lit(1L), expr(s"length(text) div $FrameBytes")).as("n_frames"),
        col("text"))
      .select(col("doc_id"), col("media_type"), col("n_frames"), col("text"),
        explode(when(col("n_frames") <= k,
            sequence(lit(0L), col("n_frames") - 1))
          .otherwise(expr(s"transform(sequence(0, ${k - 1}), " +
            s"j -> CAST(j AS BIGINT) * (n_frames - 1) DIV ${k - 1})"))).as("frame_idx"))
      .distinct() // short clips can repeat an index under uniform spacing
      .select(col("doc_id"), col("media_type"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * FrameMs).as("t_offset_ms"),
        md5(expr(s"CAST(substring(text, CAST(frame_idx * $FrameBytes AS INT) + 1, " +
          s"$FrameBytes) AS BINARY)")).as("frame_hash"))
}
