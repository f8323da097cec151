package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volume-weighted average price per 5-minute bucket per symbol.
  *
  * Reference: `sql/timescaledb_schema.sql:162-178` —
  * `sum(price*volume)/NULLIF(sum(volume),0)` — and
  * `spark/batch_feature_calculation.py:141-165`.
  *
  * One hash-agg shuffle; the null-safe divide happens post-aggregation so the
  * partial aggregates remain plain sums.
  */
object Vwap {

  def compute(trades: DataFrame, bucket: String = "5 minutes"): DataFrame =
    trades
      .groupBy(window(col("time"), bucket), col("symbol"))
      .agg(
        sum(col("price") * col("volume")).as("pv"),
        sum(col("volume")).as("total_volume"))
      .select(
        col("window.start").as("bucket"),
        col("symbol"),
        Quantize.r(col("pv") / nullif(col("total_volume"), lit(0.0)), 6).as("vwap_5m"),
        col("total_volume"))
}
