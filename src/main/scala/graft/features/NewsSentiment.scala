package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** News-sentiment feature view (contract feature #10): per-symbol sentiment
  * events carrying an embedding vector and a score, looked up as-of like the
  * other features.
  *
  * Reference: `news_sentiment` table with `news_sentiment_embedding
  * vector(1536)` + `sentiment_score NUMERIC(5,4)` and a cosine ANN index
  * (`sql/timescaledb_schema.sql:268-286`); 300 s async SLA. The corpus has
  * no news table, so the view derives a deterministic news stream from the
  * `embeddings` table: event time = corpus epoch + vec_id hours, symbol =
  * vec_id mod |symbols|, score = label mapped into [-1, 1]. The derivation
  * is plain column arithmetic so the DuckDB oracle reproduces it exactly.
  */
object NewsSentiment {

  /** Deterministic news-event stream over the embeddings corpus. */
  def newsEvents(spark: SparkSession, dir: String, nSymbols: Int = 15): DataFrame =
    graft.core.Tables.embeddings(spark, dir).select(
      expr("timestamp_micros(CAST(1704067200000000 + vec_id * 3600000000 AS BIGINT))").as("time"),
      pmod(col("vec_id"), lit(nSymbols.toLong)).cast("string").as("symbol"),
      col("vec_id").cast("string").as("news_id"),
      ((col("label").cast("double") - 4.5) / 4.5).as("sentiment_score"),
      col("embedding").as("news_sentiment_embedding"))

  /** Latest sentiment per symbol at/before `asOf` plus the embedding norm
    * (a cheap scalar stand-in for downstream vector use).
    */
  def latestAsOf(spark: SparkSession, dir: String, asOf: String): DataFrame =
    newsEvents(spark, dir)
      .filter(col("time") <= lit(asOf).cast("timestamp"))
      .groupBy("symbol")
      .agg(
        max_by(col("news_id"), col("time")).as("news_id"),
        Quantize.r(max_by(col("sentiment_score"), col("time")), 6).as("sentiment_score"),
        max_by(col("time"), col("time")).as("news_time"),
        Quantize.r(
          sqrt(aggregate(
            max_by(col("news_sentiment_embedding"), col("time")).cast("array<double>"),
            lit(0.0), (acc, x) => acc + x * x)), 6).as("embedding_norm"))
}
