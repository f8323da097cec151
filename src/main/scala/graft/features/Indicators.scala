package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic technical indicators over the per-symbol tick stream — the
  * feature tier a finance user of the reference stack layers on top of its
  * SMA/EWM/volatility base (`sql/timescaledb_schema.sql:68-80` shows the
  * window-function idiom; these extend it to the standard band/momentum/
  * drawdown trio).
  *
  * Plan shape (all three): Exchange hashpartition(symbol) → Sort(time) →
  * Window — the SAME single shuffle every per-symbol window feature pays,
  * so stacking indicators adds zero extra shuffles when composed on one
  * sorted pass. Rows frames keep per-task state O(frame), never O(history).
  */
object Indicators {

  /** Bollinger bands: n-tick rolling mean ± k sample standard deviations.
    * Rows with fewer than 2 frame rows have undefined stddev → null bands
    * (emitted as-is; matches SQL stddev_samp window semantics).
    */
  def bollinger(trades: DataFrame, n: Int = 20, k: Double = 2.0): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time").rowsBetween(-(n - 1), 0)
    val mid = avg(col("price")).over(w)
    val sd = stddev_samp(col("price")).over(w)
    trades.select(
      col("time"), col("symbol"), col("price"),
      Quantize.r(mid, 6).as("bb_mid"),
      Quantize.r(mid + lit(k) * sd, 6).as("bb_upper"),
      Quantize.r(mid - lit(k) * sd, 6).as("bb_lower"))
  }

  /** Maximum drawdown per symbol: the most negative peak-to-trough return
    * `(price - running_max) / running_max` over the time-ordered series.
    * Running max is order-exact (no floating accumulation), so the result
    * is engine-portable without quantization of intermediates.
    */
  def maxDrawdown(trades: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time")
      .rowsBetween(Window.unboundedPreceding, 0)
    val peak = max(col("price")).over(w)
    // nullif guards a zero peak (a leading zero price) from ANSI-mode
    // divide-by-zero; such rows contribute null, not -Inf
    trades
      .select(col("symbol"), ((col("price") - peak) / nullif(peak, lit(0.0))).as("dd"))
      .groupBy("symbol")
      .agg(Quantize.r(min(col("dd")), 6).as("max_drawdown"))
  }

  /** RSI over an n-tick rows frame (Cutler's simple-average form — the
    * windowed variant, not Wilder's recursive smoothing; the recursive form
    * lives with the other ordered folds, cf. [[Ewm]]). Frames with zero
    * average loss yield null (undefined ratio) rather than the chartist
    * pin-to-100 — the SQL `nullif` semantics both engines share exactly.
    */
  def rsi(trades: DataFrame, n: Int = 14): DataFrame = {
    val wLag = Window.partitionBy("symbol").orderBy("time")
    val wN = Window.partitionBy("symbol").orderBy("time").rowsBetween(-(n - 1), 0)
    // coalesce the first row's null lag to its own price (diff 0.0) so both
    // engines agree exactly — greatest()'s null handling is not portable.
    val diff = col("price") - coalesce(lag(col("price"), 1).over(wLag), col("price"))
    val base = trades.select(
      col("time"), col("symbol"),
      greatest(diff, lit(0.0)).as("gain"),
      greatest(-diff, lit(0.0)).as("loss"))
    base.select(
      col("time"), col("symbol"),
      Quantize.r(
        lit(100.0) - lit(100.0) /
          (lit(1.0) + avg(col("gain")).over(wN) /
            nullif(avg(col("loss")).over(wN), lit(0.0))),
        6).as("rsi"))
  }
}
