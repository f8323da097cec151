package graft.ext

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
