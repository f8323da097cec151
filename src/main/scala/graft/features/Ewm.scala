package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EWM-12: exponential moving average (α = 0.15) over the last 12 ticks.
  *
  * Reference: `sql/timescaledb_schema.sql:103-138` (`calculate_ewm_12` plpgsql)
  * and spec `sql/smartdb_contract.md:49-55`. Per SURVEY.md §7.4 item 1, the
  * reference's plpgsql literal behavior is buggy (single smoothing step,
  * inverted direction); we implement the spec: the standard recursive EWM,
  * `s1 = p1; s_i = α·p_i + (1−α)·s_{i−1}`, folded over the last 12 prices in
  * ascending time order.
  *
  * Not a built-in window aggregate — expressed as `collect_list` over a
  * 12-row frame + the `aggregate` higher-order function (whole-stage-codegen
  * friendly, no UDF). The 12-element array bound keeps per-row state O(1), so
  * the plan is the same single symbol-shuffle + sort as any other window fn.
  * A reusable `Aggregator`-based form lives in [[graft.functions.EwmAggregator]].
  */
object Ewm {

  val Alpha = 0.15

  /** Fold `s = (1-α)·s + α·p` over an array column of prices (ascending). */
  def ewmOverArray(arr: Column, alpha: Double = Alpha): Column =
    aggregate(
      slice(arr, lit(2), size(arr) - 1),
      element_at(arr, 1),
      (acc, x) => lit(1.0 - alpha) * acc + lit(alpha) * x)

  def compute(trades: DataFrame, n: Int = 12, alpha: Double = Alpha): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time").rowsBetween(-(n - 1), 0)
    trades.select(
      col("time"), col("symbol"), col("price"),
      Quantize.r(ewmOverArray(collect_list(col("price")).over(w), alpha), 6).as("ewm_12"))
  }
}
