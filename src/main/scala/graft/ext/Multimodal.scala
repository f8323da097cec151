package graft.ext

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed partition-parallel.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (`fakeDecode`): it
  * derives plausible metadata purely from the payload bytes (length + md5),
  * so tests and oracles are exact while the Spark-side plumbing — binary
  * schema, per-partition batch processing, metadata struct shape — is real.
  * Swapping `fakeDecode` for a JNI/FFI codec keeps every plan shape intact.
  */
object Multimodal {

  /** Synthesize a binary payload column from the documents table (stand-in
    * for real image/audio bytes).
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** STUB decoder: deterministic pseudo-metadata from payload bytes.
    * A real implementation would decode headers here (e.g. via a
    * mapPartitions batch over a native codec); the schema and the
    * partition-parallel shape are what downstream code depends on.
    */
  def fakeDecode(media: DataFrame): DataFrame = {
    val h = md5(col("payload"))
    media.select(
      col("media_id"),
      col("source"),
      length(col("payload")).as("n_bytes"),
      struct(
        (lit(64) + pmod(ascii(substring(h, 1, 1)), lit(16)) * 16).as("width"),
        (lit(64) + pmod(ascii(substring(h, 2, 1)), lit(16)) * 16).as("height"),
        (lit(1) + pmod(col("media_id"), lit(8))).as("n_frames"),
        substring(h, 1, 8).as("codec_tag")).as("meta"))
  }

  final case class MediaMeta(
      media_id: Long, source: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, codec_tag: String)

  /** The batch-decode path a real codec plugs into: `mapPartitions` over the
    * binary payloads, with per-partition codec initialization (here a reused
    * MessageDigest standing in for a native decoder handle — the Scala
    * analogue of the reference-era `mapInPandas` batch shape). Emits the
    * SAME deterministic stub metadata as [[fakeDecode]] (tested equal), so
    * swapping in a real decoder changes only this function's body.
    */
  def decodeBatched(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("source"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition "codec"
        it.map { case (id, bytes, src) =>
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          MediaMeta(
            media_id = id, source = src, n_bytes = bytes.length,
            width = 64 + (hex.charAt(0).toInt % 16) * 16,
            height = 64 + (hex.charAt(1).toInt % 16) * 16,
            n_frames = (1 + id % 8).toInt,
            codec_tag = hex.substring(0, 8))
        }
      }
  }

  /** Frame-sampling plan: explode a deterministic frame index per media row
    * (the real system would decode those frames; here the plumbing —
    * explode + repartition by media_id — is the deliverable).
    */
  def sampleFrames(decoded: DataFrame, everyNth: Int = 2): DataFrame =
    decoded
      .select(col("media_id"), col("meta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1)).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)
}
