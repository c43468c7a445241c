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
}
