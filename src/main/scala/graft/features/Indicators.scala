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

  /** Stochastic oscillator on the tick stream: %K = 100·(price − minₙ) /
    * (maxₙ − minₙ) over an n-tick rows frame, %D = d-tick simple average of
    * %K. A flat frame (max == min) yields null %K (nullif semantics, like
    * [[rsi]]); %D averages the non-null %K values in its frame. Two window
    * passes over ONE sort — Catalyst reuses the (symbol, time) sort for the
    * second Window, so the cost stays the one per-symbol shuffle.
    */
  def stochastic(trades: DataFrame, n: Int = 14, d: Int = 3): DataFrame = {
    val wN = Window.partitionBy("symbol").orderBy("time").rowsBetween(-(n - 1), 0)
    val wD = Window.partitionBy("symbol").orderBy("time").rowsBetween(-(d - 1), 0)
    val kRaw = lit(100.0) * (col("price") - min(col("price")).over(wN)) /
      nullif(max(col("price")).over(wN) - min(col("price")).over(wN), lit(0.0))
    trades
      .withColumn("k_raw", kRaw)
      .select(
        col("time"), col("symbol"),
        Quantize.r(col("k_raw"), 6).as("stoch_k"),
        Quantize.r(avg(col("k_raw")).over(wD), 6).as("stoch_d"))
  }

  /** Average True Range over n OHLC bars: TR = max(high−low, |high−prev
    * close|, |low−prev close|), ATR = n-bar simple average of TR. The first
    * bar's prev close coalesces to its own close, making its TR exactly
    * high−low (low ≤ close ≤ high) without relying on greatest()'s
    * null-skipping. Bars come from [[Ohlc.compute]] (one hash agg), then
    * one per-symbol window pass over the bar stream — bar count is
    * O(buckets), so the window input is already reduced ~tick-count/bucket
    * before the sort.
    */
  def atr(trades: DataFrame, n: Int = 14, bucket: String = "1 minute"): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("bucket")
    val wN = Window.partitionBy("symbol").orderBy("bucket").rowsBetween(-(n - 1), 0)
    val pc = coalesce(lag(col("close"), 1).over(w), col("close"))
    Ohlc.compute(trades, bucket)
      .withColumn("tr",
        greatest(col("high") - col("low"), abs(col("high") - pc), abs(col("low") - pc)))
      .select(
        col("bucket"), col("symbol"),
        Quantize.r(col("tr"), 6).as("true_range"),
        Quantize.r(avg(col("tr")).over(wN), 6).as("atr_14"))
  }

  /** Final MACD(12, 26, 9) state per symbol — the three coupled EMA
    * recursions (fast, slow, signal-over-MACD-line) folded jointly in event
    * order, exactly as a streaming keyed monitor would carry them. Same
    * bounded trailing-window discipline as the batch spread EMA: only the
    * last `k` ticks enter the fold (the slow EMA's memory decays by
    * (25/27)^k ≈ 4e-14 at k=400, far below the 1e-6 output quantum), so
    * task memory is K structs per symbol at any history length, and the
    * DuckDB oracle replays the identical IEEE op sequence over the identical
    * trailing window (smoothing constants written as the same division
    * expressions, never decimal literals).
    */
  def macdFinal(trades: DataFrame, k: Int = 400): DataFrame = {
    val a12 = 2.0 / 13.0; val b12 = 1.0 - a12
    val a26 = 2.0 / 27.0; val b26 = 1.0 - a26
    val a9  = 2.0 / 10.0; val b9  = 1.0 - a9
    val wDesc = Window.partitionBy("symbol")
      .orderBy(col("time").desc, col("trade_id").desc)
    val folded = trades
      .withColumn("rnd", row_number().over(wDesc))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("symbol")))
      .filter(col("rnd") <= k)
      .groupBy("symbol")
      .agg(
        sort_array(collect_list(struct(col("rnd"), col("price"))), asc = false)
          .as("obs"),
        max(col("__n")).as("n"))
      .withColumn("p", transform(col("obs"), o => o.getField("price")))
    val st = aggregate(
      slice(col("p"), lit(2), greatest(size(col("p")) - 1, lit(0))),
      array(element_at(col("p"), 1), element_at(col("p"), 1), lit(0.0)),
      (acc, x) => {
        val e12 = lit(a12) * x + lit(b12) * element_at(acc, 1)
        val e26 = lit(a26) * x + lit(b26) * element_at(acc, 2)
        // the signal term repeats the e12/e26 trees verbatim so the fold's
        // op sequence is a fixed function of the inputs on both engines
        array(e12, e26, lit(a9) * (e12 - e26) + lit(b9) * element_at(acc, 3))
      })
    folded.select(
      col("symbol"),
      Quantize.r(element_at(st, 1) - element_at(st, 2), 6).as("macd"),
      Quantize.r(element_at(st, 3), 6).as("macd_signal"),
      Quantize.r((element_at(st, 1) - element_at(st, 2)) - element_at(st, 3), 6)
        .as("macd_hist"),
      col("n"))
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
