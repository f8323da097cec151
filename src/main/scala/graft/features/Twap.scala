package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average price per 1-hour bucket per symbol over IRREGULARLY
  * spaced ticks.
  *
  * VWAP (`sql/timescaledb_schema.sql:162-178`) weights by traded volume; TWAP
  * weights each tick's price by how long it remained the latest print inside
  * the bucket — the standard execution-quality benchmark when volume is
  * unreliable or absent. Each tick holds from its own timestamp until the
  * next tick (per symbol), truncated at the bucket end; the gap before the
  * bucket's first tick carries no in-bucket price and is excluded (the
  * bucket-local variant — no cross-bucket carry, so buckets are independent
  * and the aggregation distributes like OHLC).
  *
  * Shape: one per-symbol ordered window pass (the same sort Volatility's lag
  * already pays — an adjacent-tick delta cannot avoid it) feeding one hash
  * aggregate. No joins, no second shuffle. Ties on `time` are ordered by
  * `trade_id` so the zero-width segments pair deterministically — the LAST
  * tick of a tied group is the one whose price spans to the next distinct
  * timestamp.
  */
object Twap {

  def compute(trades: DataFrame, bucketSec: Long = 3600): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(col("time"), col("trade_id"))
    val bucketMicros = bucketSec * 1000000L
    val tMicros = unix_micros(col("time"))
    val bucketStart = floor(tMicros / bucketMicros) * bucketMicros
    val bucketEnd = bucketStart + bucketMicros
    trades
      .withColumn("__next", lead(unix_micros(col("time")), 1).over(w))
      .withColumn("__w",
        least(coalesce(col("__next"), bucketEnd), bucketEnd) - tMicros)
      .groupBy(timestamp_micros(bucketStart.cast("long")).as("bucket"), col("symbol"))
      .agg(
        Quantize.r(
          sum(col("price") * col("__w")) / nullif(sum(col("__w")), lit(0.0)), 6)
          .as("twap_1h"),
        sum(col("__w")).cast("long").as("active_micros"),
        count(lit(1)).as("n_trades"))
  }
}
