package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Buy/sell trade imbalance per 5-minute bucket per symbol.
  *
  * Reference: `sql/timescaledb_schema.sql:218-238` — conditional sums over
  * `side`, `(buy - sell) / NULLIF(buy + sell, 0)`, with the `WHERE side IS NOT
  * NULL` domain filter (`:229`).
  *
  * Filter is applied *before* the aggregation so it pushes into the scan;
  * the conditional sums are codegen'd `CASE WHEN` — one shuffle total.
  */
object Imbalance {

  def compute(trades: DataFrame, bucket: String = "5 minutes"): DataFrame =
    trades
      .filter(col("side").isNotNull)
      .groupBy(window(col("time"), bucket), col("symbol"))
      .agg(
        sum(when(col("side") === "buy", col("volume")).otherwise(lit(0.0))).as("buy_volume"),
        sum(when(col("side") === "sell", col("volume")).otherwise(lit(0.0))).as("sell_volume"))
      .select(
        col("window.start").as("bucket"),
        col("symbol"), col("buy_volume"), col("sell_volume"),
        Quantize.r(
          (col("buy_volume") - col("sell_volume")) /
            nullif(col("buy_volume") + col("sell_volume"), lit(0.0)), 6).as("imbalance"))
}
