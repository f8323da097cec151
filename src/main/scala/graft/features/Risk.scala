package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Risk / volatility analytics beyond the close-to-close base: range-based
  * volatility estimators (Parkinson, Garman-Klass) computed from OHLC bars,
  * on-balance volume, Donchian channels, and historical VaR/CVaR — the
  * portfolio-risk tier a finance user layers on the reference's
  * volatility/Sharpe features (`spark/batch_feature_calculation.py` window
  * idioms).
  *
  * Plan shapes: range volatility is two hash aggregations (bars, then
  * symbol-day) — both map-side combined, no windows; OBV/Donchian are the
  * standard one-shuffle per-symbol window pass; VaR/CVaR is one window
  * rank over per-symbol returns (the sort is bounded per symbol) feeding a
  * keyed aggregation.
  */
object Risk {

  private val Ln2 = 0.6931471805599453 // math.log(2), correctly rounded

  /** Parkinson and Garman-Klass daily volatility per symbol from
    * intra-day bars: range-based estimators that extract ~5x more
    * efficiency from the same bar count than close-to-close stddev.
    * Composes [[Ohlc.compute]]; both estimators are per-bar terms averaged
    * per symbol-day (plain aggregates — no ordered fold, quantized once at
    * the end). Bars with a zero/degenerate edge contribute null terms
    * (nullif), matching SQL aggregate null-skipping on both engines.
    */
  def rangeVolatility(trades: DataFrame, bucket: String = "1 minute"): DataFrame = {
    val bars = Ohlc.compute(trades, bucket)
    val x = pow(log(col("high") / nullif(col("low"), lit(0.0))), 2)
    val y = pow(log(col("close") / nullif(col("open"), lit(0.0))), 2)
    val gkTerm = lit(0.5) * x - lit(2 * Ln2 - 1) * y
    bars
      .select(date_trunc("DAY", col("bucket")).as("day"), col("symbol"),
        x.as("x"), gkTerm.as("gk_term"))
      .groupBy("day", "symbol")
      .agg(
        count(col("x")).as("n_bars"),
        Quantize.r(sqrt(avg(col("x")) / lit(4 * Ln2)), 6).as("parkinson"),
        Quantize.r(
          when(avg(col("gk_term")) >= 0, sqrt(avg(col("gk_term"))))
            .otherwise(lit(null)), 6).as("garman_klass"))
  }

  /** On-balance volume: running sum of sign(Δprice)·volume per symbol in
    * (time, trade_id) order. Volume is integer-valued in this schema, so
    * the accumulation runs in BIGINT — bit-exact on every engine, no
    * quantization needed (the reason OBV is the canonical cumulative
    * indicator to hash-gate cross-engine).
    */
  def obv(trades: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time", "trade_id")
    val cum = Window.partitionBy("symbol").orderBy("time", "trade_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val step = (signum(col("price") - lag(col("price"), 1).over(w))
      .cast("bigint") * col("volume").cast("bigint"))
    trades
      .select(col("time"), col("symbol"), col("trade_id"),
        coalesce(step, lit(0L)).as("step"))
      .select(col("time"), col("symbol"), col("trade_id"),
        sum(col("step")).over(cum).as("obv"))
  }

  /** Donchian channel: n-tick rolling high/low (+ quantized mid) per
    * symbol. Order-exact min/max — engine-portable without intermediate
    * rounding.
    */
  def donchian(trades: DataFrame, n: Int = 20): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time", "trade_id")
      .rowsBetween(-(n - 1), 0)
    val hi = max(col("price")).over(w)
    val lo = min(col("price")).over(w)
    trades.select(
      col("time"), col("symbol"), col("price"),
      hi.as("dc_high"), lo.as("dc_low"),
      Quantize.r((hi + lo) / 2, 6).as("dc_mid"))
  }

  /** Amihud illiquidity per symbol-day: mean of |return| / dollar volume
    * (×10⁶ for readability) — the standard price-impact proxy. The fold is
    * a plain mean, so scaled-BIGINT exact moments apply (the [[rollSpread]]
    * discipline): each quantized per-trade ratio is an exact 1e-6 multiple,
    * its 1e6-scaled integer image sums order-independently (exact DECIMAL
    * accumulation), and the mean runs once per group on identical doubles in
    * both engines — O(1) per-group state, no per-group array, no ordered
    * fold.
    */
  def amihud(trades: DataFrame): DataFrame = {
    val ord = Window.partitionBy("symbol").orderBy("time", "trade_id")
    val r = Quantize.r(
      log(nullif(col("price"), lit(0.0)) /
        nullif(lag(col("price"), 1).over(ord), lit(0.0))), 6)
    trades
      .select(to_date(col("time")).as("day"), col("symbol"),
        col("time"), col("trade_id"), r.as("r"),
        (col("price") * col("volume")).as("dollar_vol"))
      .filter(col("r").isNotNull && col("dollar_vol") > 0)
      .select(col("day"), col("symbol"),
        Quantize.i(abs(col("r")) / col("dollar_vol") * lit(1e6)).as("xi"))
      .groupBy("day", "symbol")
      .agg(sum(col("xi").cast("decimal(38,0)")).as("sxi"),
        count(lit(1)).as("n_trades"))
      .select(col("day"), col("symbol"),
        Quantize.r(
          col("sxi").cast("double") / col("n_trades").cast("double") / lit(1e6), 6)
          .as("amihud_illiq"),
        col("n_trades"))
  }

  /** Roll's implied spread per symbol: 2·√(−cov(Δp_t, Δp_{t−1})) from the
    * serial covariance of price changes (Roll 1984) — the microstructure
    * estimate of the effective bid-ask spread from trade prices alone.
    * Null when the autocovariance is non-negative (the model's no-spread
    * regime).
    *
    * Scaled-integer exact moments (no arrays, no ordered fold): the
    * quantized Δp is an exact 1e-6 multiple, so its 1e6-scaled BIGINT
    * image folds with plain order-independent SUMs — Σx, Σy, Σxy stay
    * exact integers (DECIMAL(38,0) accumulation; integer addition is
    * associative-commutative), the covariance ratio and √ run once per
    * symbol on identical doubles in both engines, and per-group state is
    * O(1) instead of the full price history — the 100×-scale-safe shape.
    */
  def rollSpread(trades: DataFrame): DataFrame = {
    val ord = Window.partitionBy("symbol").orderBy("time", "trade_id")
    val dp = Quantize.r(col("price") - lag(col("price"), 1).over(ord), 6)
    val dec = "decimal(38,0)"
    // second window pass over the non-null changes pairs each Δp with its
    // predecessor; first-change rows carry a null `y` and join no pair
    val agged = trades
      .select(col("symbol"), col("time"), col("trade_id"), dp.as("dp"))
      .filter(col("dp").isNotNull)
      .select(col("symbol"), col("time"), col("trade_id"),
        Quantize.i(col("dp")).as("x"))
      .select(col("symbol"), col("x"),
        lag(col("x"), 1).over(ord).as("y"))
      .groupBy("symbol")
      .agg(
        count(col("y")).as("n_pairs"),
        sum(when(col("y").isNotNull, col("x")).cast(dec)).as("sxd"),
        sum(col("y").cast(dec)).as("syd"),
        // DECIMAL multiply: 64-bit x·y can overflow on outlier Δp images
        sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
          .as("sxyd"))
    val m = col("n_pairs").cast("double")
    val sx = col("sxd").cast("double")
    val sy = col("syd").cast("double")
    val sxy = col("sxyd").cast("double")
    val cov = (m * sxy - sx * sy) / (m * m) // 1e12-scaled covariance
    agged.select(col("symbol"),
      Quantize.r(when(m >= 2 && cov < 0, lit(2.0) * sqrt(-cov) / lit(1e6)), 6)
        .as("roll_spread"),
      col("n_pairs"))
  }

  /** Kyle's lambda per symbol — the price-impact SLOPE: regress the
    * 5-minute bucket price change Δp on the bucket's signed volume
    * (buy − sell), λ = cov(Δp, q)/var(q). Completes the microstructure
    * family (Amihud = impact proxy, Roll = spread, VPIN = toxicity).
    *
    * Every regression input is exact before aggregation: Δp = close − open
    * (ordered min_by/max_by picks, one subtraction) quantized to its
    * 1e6-scaled BIGINT image, signed volume is a BIGINT sum. The moment
    * sums are plain order-independent DECIMAL(38,0) SUMs of exact integers
    * (products multiplied as decimals so no 64-bit overflow at scale) —
    * O(1) state per symbol, hash-stable with no per-group arrays; only the
    * final λ ratio runs in doubles (÷1e6 undoes the Δp scaling) and
    * quantizes.
    */
  def kyleLambda(trades: DataFrame, bucket: String = "5 minutes"): DataFrame = {
    val perBucket = trades
      .groupBy(window(col("time"), bucket), col("symbol"))
      .agg(
        (max_by(col("price"), col("time")) - min_by(col("price"), col("time")))
          .as("dp"),
        (sum(when(col("side") === "buy", col("volume").cast("bigint"))
          .otherwise(lit(0L))) -
          sum(when(col("side") === "sell", col("volume").cast("bigint"))
            .otherwise(lit(0L)))).as("q"))
      .select(col("symbol"), Quantize.i(col("dp")).as("dpi"), col("q"))
    val d19 = "decimal(19,0)"
    val dec = "decimal(38,0)"
    val mom = perBucket
      .groupBy("symbol")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("q").cast(dec)).as("sxd"),
        sum(col("dpi").cast(dec)).as("syd"),
        sum(col("q").cast(d19) * col("dpi").cast(d19)).as("sxyd"),
        sum(col("q").cast(d19) * col("q").cast(d19)).as("sx2d"))
    val n = col("n_buckets").cast("double")
    val sx = col("sxd").cast("double")
    val sy = col("syd").cast("double")
    val sxy = col("sxyd").cast("double")
    val sx2 = col("sx2d").cast("double")
    mom.select(col("symbol"),
      Quantize.r(
        (n * sxy - sx * sy) / nullif(n * sx2 - sx * sx, lit(0.0)) / lit(1e6), 6)
        .as("kyle_lambda"),
      col("n_buckets"))
  }

  /** VPIN order-flow toxicity (Easley/López de Prado) — simplified volume
    * clock: trades bucket by CUMULATIVE VOLUME (each trade assigned to
    * bucket ⌊cum-before / V⌋, the standard whole-trade simplification),
    * per-bucket toxicity = |buy − sell| / (buy + sell) over side-tagged
    * volume, VPIN = trailing-`window` mean of bucket toxicities.
    *
    * Engine-exact by construction: volumes are integer-valued so the
    * cumulative clock and the per-bucket sums run in BIGINT (integer sums
    * are order-independent — no float hazard anywhere before the final
    * ratio), and the trailing mean sums the 1e6-scaled BIGINT toxicity
    * image over a plain ROWS-49-PRECEDING frame — integer window sums are
    * association-independent, so the segment-tree vs running-sum window
    * implementations of different engines agree exactly, with O(window)
    * state instead of the full bucket history. Null-side trades advance
    * the volume clock but join neither side, like [[Imbalance]].
    */
  def vpin(trades: DataFrame, bucketVolume: Long = 2000, window: Int = 50): DataFrame = {
    val ord = Window.partitionBy("symbol").orderBy("time", "trade_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val v = col("volume").cast("bigint")
    val bucketed = trades
      .select(col("symbol"), col("time"), col("trade_id"), col("side"), v.as("v"))
      .withColumn("cum_before", coalesce(sum(col("v")).over(ord), lit(0L)))
      // integral division (div), NOT double `/` + cast: Spark's cast
      // truncates where DuckDB's rounds — div//// floor-divide identically
      .withColumn("vb", expr(s"cum_before div ${bucketVolume}L"))
    val buckets = bucketed
      .groupBy("symbol", "vb")
      .agg(
        sum(when(col("side") === "buy", col("v")).otherwise(lit(0L))).as("buy_v"),
        sum(when(col("side") === "sell", col("v")).otherwise(lit(0L))).as("sell_v"))
      .select(col("symbol"), col("vb"),
        Quantize.r(
          abs(col("buy_v") - col("sell_v")).cast("double") /
            nullif((col("buy_v") + col("sell_v")).cast("double"), lit(0.0)), 6)
          .as("toxicity"))
    // Trailing-window mean over the 1e6-scaled BIGINT toxicity image.
    // Buckets with NO side-tagged volume have NULL toxicity and are
    // SKIPPED by the mean — SQL aggregate null semantics, not scored as
    // "perfectly balanced" zero; a window of only unknown buckets yields
    // null VPIN.
    val w50 = Window.partitionBy("symbol").orderBy("vb")
      .rowsBetween(-(window - 1), 0)
    buckets
      .withColumn("toxi", Quantize.i(col("toxicity")))
      .withColumn("s", sum(col("toxi")).over(w50))
      .withColumn("cnt", count(col("toxi")).over(w50))
      .select(col("symbol"), col("vb"), col("toxicity"),
        when(col("cnt") > 0,
          Quantize.r(col("s").cast("double") / col("cnt").cast("double") / lit(1e6), 6))
          .as("vpin"))
  }

  /** Hampel filter — rolling-median tick cleaning: a price farther than
    * `k·1.4826·MAD` from its trailing-n rolling median is flagged and
    * replaced by that median (the standard outlier-repair pass run before
    * feature computation on raw ticks). All statistics are NEAREST-RANK
    * picks from the sorted frame array, so every emitted value is an
    * actual observation both engines select identically — no averaging,
    * no interpolation, nothing to quantize.
    *
    * Shape: ONE per-symbol window pass carrying an O(n) frame array per
    * row (n = 21 ticks — constant, bounded state; the trailing frame
    * keeps it causal/streaming-compatible).
    */
  def hampel(trades: DataFrame, n: Int = 21, k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time", "trade_id")
      .rowsBetween(-(n - 1), 0)
    val frame = collect_list(col("price")).over(w)
    val base = trades.select(col("time"), col("symbol"), col("trade_id"),
      col("price"), frame.as("a"))
    val m = size(col("a"))
    val mid = ceil(m.cast("double") / 2).cast("int")
    val withMed = base.select(col("time"), col("symbol"), col("trade_id"),
      col("price"), col("a"), element_at(array_sort(col("a")), mid).as("med"))
    val mad = element_at(
      array_sort(transform(col("a"), x => abs(x - col("med")))), mid)
    val outlier = abs(col("price") - col("med")) > lit(k) * lit(1.4826) * mad
    withMed.select(
      col("time"), col("symbol"), col("price"), col("med"),
      outlier.as("is_outlier"),
      when(outlier, col("med")).otherwise(col("price")).as("cleaned"))
  }

  /** Historical VaR/CVaR at confidence `alpha` (left tail) per symbol, on
    * quantized per-trade log returns. The tail cut is NEAREST-RANK by
    * construction — rank k = ceil(alpha·n) over (return, trade_id) order —
    * not an interpolated percentile, so the cut row is an actual
    * observation both engines pick identically (interpolation arithmetic
    * differs across engines in the last ulp; a rank doesn't). CVaR averages
    * the rows AT OR BELOW the rank (tie-broken by trade_id), again
    * identical on both sides.
    */
  def varCvar(trades: DataFrame, alpha: Double = 0.05): DataFrame = {
    // confidence level in the output names: var_95/cvar_95 for alpha=0.05
    val conf = math.round((1 - alpha) * 100)
    val ord = Window.partitionBy("symbol").orderBy("time", "trade_id")
    val r = Quantize.r(
      log(nullif(col("price"), lit(0.0)) /
        nullif(lag(col("price"), 1).over(ord), lit(0.0))), 6)
    val rets = trades
      .select(col("symbol"), col("trade_id"), r.as("r"))
      .filter(col("r").isNotNull)
    val rankW = Window.partitionBy("symbol").orderBy("r", "trade_id")
    val nW = Window.partitionBy("symbol")
    val ranked = rets.select(
      col("symbol"), col("r"),
      row_number().over(rankW).as("rn"),
      ceil(lit(alpha) * count(lit(1)).over(nW)).as("k"))
    // CVaR sums the tail's 1e6-scaled BIGINT return images — exact
    // order-independent integer sums (never a partition-order-dependent
    // float avg: at sf0.1 one symbol's tail mean landed exactly on a
    // 0.5e-6 rounding boundary and flipped between engines). O(1) state
    // per symbol instead of materializing the 5%-of-history tail array.
    val dec = "decimal(38,0)"
    ranked
      .filter(col("rn") <= col("k"))
      .groupBy("symbol")
      .agg(
        max_by(col("r"), col("rn")).as(s"var_$conf"),
        sum(Quantize.i(col("r")).cast(dec)).as("sd"),
        count(lit(1)).as("n_tail"))
      .select(col("symbol"), col(s"var_$conf"),
        Quantize.r(
          col("sd").cast("double") / col("n_tail").cast("double") / lit(1e6), 6)
          .as(s"cvar_$conf"),
        col("n_tail"))
  }
}
