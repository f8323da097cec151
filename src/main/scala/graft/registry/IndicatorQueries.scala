package graft.registry

import graft.functions.Quantize
import graft.features.{GapFill, Indicators, Ohlc, Risk}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Technical-indicator / risk tier of the feature registry (split from
  * FeatureQueries by tier — pure code motion): the per-symbol window and
  * rollup indicators (Bollinger, RSI, MACD, ATR, OBV, Donchian, VaR/CVaR,
  * Hampel, Amihud, Roll, VPIN, Kyle lambda, ...) with their DuckDB oracles.
  */
object IndicatorQueries {
  import OracleSql.{withTrades, withTradesAnd}
  import FeatureQueries.trades

  type Q = (SparkSession, String) => DataFrame

  /** Hampel oracle: nearest-rank median/MAD from the sorted trailing-21
    * frame list. Shared by the batch q_hampel and its streaming twin
    * q_stream_hampel (StreamQueries) — the two can never silently diverge.
    */
  private[registry] val hampelSql =
    """SELECT time, symbol, price, med,
      |       abs(price - med) > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad AS is_outlier,
      |       CASE WHEN abs(price - med) > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad
      |            THEN med ELSE price END AS cleaned
      |FROM (
      |  SELECT time, symbol, price, med,
      |         list_sort(list_transform(a, x -> abs(x - med)))[CAST(ceil(CAST(len(a) AS DOUBLE) / 2) AS INT)] AS mad
      |  FROM (
      |    SELECT time, symbol, price, a,
      |           list_sort(a)[CAST(ceil(CAST(len(a) AS DOUBLE) / 2) AS INT)] AS med
      |    FROM (
      |      SELECT time, symbol, price,
      |             list(price) OVER (PARTITION BY symbol ORDER BY time, trade_id
      |                               ROWS BETWEEN 20 PRECEDING AND CURRENT ROW) AS a
      |      FROM trades)))""".stripMargin

  val queries: Map[String, Q] = Map(
    // Technical indicators: same one-shuffle per-symbol window family.
    "q_bollinger" -> ((s, d) => Indicators.bollinger(trades(s, d))),

    "q_drawdown" -> ((s, d) => Indicators.maxDrawdown(trades(s, d))),

    "q_rsi14" -> ((s, d) => Indicators.rsi(trades(s, d))),

    // Linear interpolation across gaps: TimescaleDB interpolate() mode.
    "q_gapfill_interp" -> ((s, d) => {
      val bars = Ohlc.compute(trades(s, d), "5 minutes")
        .select(col("bucket"), col("symbol"), col("close"))
      GapFill.interpolate(bars, bucketSec = 300, valueCols = Seq("close"))
        .select(col("symbol"), col("bucket"),
          Quantize.r(col("close"), 6).as("close"), col("filled"))
    }),

    "q_stochastic" -> ((s, d) => Indicators.stochastic(trades(s, d))),

    "q_atr" -> ((s, d) => Indicators.atr(trades(s, d))),

    "q_macd" -> ((s, d) => Indicators.macdFinal(trades(s, d))),

    // Range-based daily volatility (Parkinson / Garman-Klass) from 1-min
    // bars: two hash aggregations, no windows.
    "q_range_vol" -> ((s, d) => Risk.rangeVolatility(trades(s, d))),

    // On-balance volume: BIGINT cumulative fold — bit-exact cross-engine.
    "q_obv" -> ((s, d) => Risk.obv(trades(s, d))),

    // Donchian 20-tick channel: order-exact rolling extrema.
    "q_donchian" -> ((s, d) => Risk.donchian(trades(s, d))),

    // Historical VaR/CVaR, nearest-rank tail cut (no interpolated
    // percentile — the cut row is an actual observation both engines pick
    // identically).
    "q_var_cvar" -> ((s, d) => Risk.varCvar(trades(s, d))),

    // Hampel tick cleaning: rolling-median/MAD outlier repair, every
    // statistic an actual observation (nearest-rank from the sorted
    // frame) — nothing to quantize.
    "q_hampel" -> ((s, d) => Risk.hampel(trades(s, d))),

    // Amihud illiquidity: |return|/dollar-volume price-impact proxy.
    "q_amihud" -> ((s, d) => Risk.amihud(trades(s, d))),

    // Roll's implied bid-ask spread from trade-price autocovariance.
    "q_roll_spread" -> ((s, d) => Risk.rollSpread(trades(s, d))),

    // VPIN order-flow toxicity on a volume clock — BIGINT bucket sums,
    // ordered trailing-mean fold.
    "q_vpin" -> ((s, d) => Risk.vpin(trades(s, d))),

    // Kyle's lambda: price-impact slope, exact regression inputs, ordered
    // moment folds (the beta discipline).
    "q_kyle_lambda" -> ((s, d) => Risk.kyleLambda(trades(s, d))),
  )

  val oracles: Map[String, String] = Map(
    "q_bollinger" -> withTrades(
      """SELECT time, symbol, price,
        |       floor((avg(price) OVER w) * 1e6 + 0.5) / 1e6 AS bb_mid,
        |       floor((avg(price) OVER w + CAST(2 AS DOUBLE) * stddev_samp(price) OVER w) * 1e6 + 0.5) / 1e6 AS bb_upper,
        |       floor((avg(price) OVER w - CAST(2 AS DOUBLE) * stddev_samp(price) OVER w) * 1e6 + 0.5) / 1e6 AS bb_lower
        |FROM trades
        |WINDOW w AS (PARTITION BY symbol ORDER BY time
        |             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""".stripMargin),

    "q_drawdown" -> withTrades(
      """SELECT symbol,
        |       floor(min(dd) * 1e6 + 0.5) / 1e6 AS max_drawdown
        |FROM (
        |  SELECT symbol,
        |         (price - max(price) OVER w) / nullif(max(price) OVER w, CAST(0 AS DOUBLE)) AS dd
        |  FROM trades
        |  WINDOW w AS (PARTITION BY symbol ORDER BY time
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |GROUP BY symbol""".stripMargin),

    "q_rsi14" -> withTrades(
      """SELECT time, symbol,
        |       floor((CAST(100 AS DOUBLE) - CAST(100 AS DOUBLE) /
        |         (CAST(1 AS DOUBLE) + avg(gain) OVER w /
        |           nullif(avg(loss) OVER w, CAST(0 AS DOUBLE)))) * 1e6 + 0.5) / 1e6 AS rsi
        |FROM (
        |  SELECT time, symbol,
        |         greatest(price - COALESCE(lag(price, 1) OVER (PARTITION BY symbol ORDER BY time), price), CAST(0 AS DOUBLE)) AS gain,
        |         greatest(-(price - COALESCE(lag(price, 1) OVER (PARTITION BY symbol ORDER BY time), price)), CAST(0 AS DOUBLE)) AS loss
        |  FROM trades)
        |WINDOW w AS (PARTITION BY symbol ORDER BY time
        |             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin),

    "q_gapfill_interp" -> withTrades(
      """SELECT symbol, make_timestamp(bm) AS bucket,
        |       floor((close + COALESCE((nclose - close) *
        |         (CAST(bm - orig AS DOUBLE) / CAST(nxt - orig AS DOUBLE)),
        |         CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS close,
        |       bm <> orig AS filled
        |FROM (
        |  SELECT symbol, orig, close, nxt, nclose,
        |         unnest(range(orig, COALESCE(nxt - 300000000, orig) + 1,
        |                      300000000)) AS bm
        |  FROM (
        |    SELECT symbol, CAST(epoch_us(bucket) AS BIGINT) AS orig, close,
        |           lead(CAST(epoch_us(bucket) AS BIGINT)) OVER w AS nxt,
        |           lead(close) OVER w AS nclose
        |    FROM (SELECT time_bucket(INTERVAL '5 minutes', time) AS bucket,
        |                 symbol, arg_max(price, time) AS close
        |          FROM trades GROUP BY 1, 2)
        |    WINDOW w AS (PARTITION BY symbol ORDER BY bucket)))""".stripMargin),

    "q_stochastic" -> withTrades(
      """SELECT time, symbol,
        |       floor(k_raw * 1e6 + 0.5) / 1e6 AS stoch_k,
        |       floor((avg(k_raw) OVER wd) * 1e6 + 0.5) / 1e6 AS stoch_d
        |FROM (
        |  SELECT time, symbol,
        |         CAST(100 AS DOUBLE) * (price - min(price) OVER wn) /
        |           nullif(max(price) OVER wn - min(price) OVER wn, CAST(0 AS DOUBLE)) AS k_raw
        |  FROM trades
        |  WINDOW wn AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |WINDOW wd AS (PARTITION BY symbol ORDER BY time
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin),

    // Mirrors Indicators.atr: first bar's prev close coalesces to its own
    // close so TR degrades to high-low without greatest-over-null semantics.
    "q_atr" -> withTradesAnd(
      s"""bars AS (${FeatureQueries.ohlcSelect})""",
      """SELECT bucket, symbol,
        |       floor(tr * 1e6 + 0.5) / 1e6 AS true_range,
        |       floor((avg(tr) OVER wn) * 1e6 + 0.5) / 1e6 AS atr_14
        |FROM (
        |  SELECT bucket, symbol,
        |         greatest(high - low,
        |                  abs(high - coalesce(lag(close) OVER w, close)),
        |                  abs(low  - coalesce(lag(close) OVER w, close))) AS tr
        |  FROM bars
        |  WINDOW w AS (PARTITION BY symbol ORDER BY bucket))
        |WINDOW wn AS (PARTITION BY symbol ORDER BY bucket
        |              ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin),

    // Joint (ema12, ema26, signal) fold over the trailing-400 ticks; state
    // encoded as DOUBLE[] so list_reduce's acc/element types line up, and the
    // smoothing constants written as the same division expressions the Spark
    // side embeds — identical IEEE op sequence, bit-exact cross-engine.
    "q_macd" -> withTrades(
      """SELECT symbol,
        |       floor((m[1] - m[2]) * 1e6 + 0.5) / 1e6 AS macd,
        |       floor(m[3] * 1e6 + 0.5) / 1e6 AS macd_signal,
        |       floor(((m[1] - m[2]) - m[3]) * 1e6 + 0.5) / 1e6 AS macd_hist,
        |       n
        |FROM (
        |  SELECT symbol, n,
        |         list_reduce(
        |           list_prepend([sl[1], sl[1], CAST(0 AS DOUBLE)],
        |             list_transform(array_slice(sl, 2, len(sl)), p -> [p])),
        |           (acc, x) -> [
        |             CAST(2 AS DOUBLE)/CAST(13 AS DOUBLE) * x[1] + (CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/CAST(13 AS DOUBLE)) * acc[1],
        |             CAST(2 AS DOUBLE)/CAST(27 AS DOUBLE) * x[1] + (CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/CAST(27 AS DOUBLE)) * acc[2],
        |             CAST(2 AS DOUBLE)/CAST(10 AS DOUBLE) *
        |               ((CAST(2 AS DOUBLE)/CAST(13 AS DOUBLE) * x[1] + (CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/CAST(13 AS DOUBLE)) * acc[1]) -
        |                (CAST(2 AS DOUBLE)/CAST(27 AS DOUBLE) * x[1] + (CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/CAST(27 AS DOUBLE)) * acc[2])) +
        |             (CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/CAST(10 AS DOUBLE)) * acc[3]]) AS m
        |  FROM (
        |    SELECT symbol, n, array_slice(l, greatest(1, len(l) - 399), len(l)) AS sl
        |    FROM (SELECT symbol, list(price ORDER BY time, trade_id) AS l,
        |                 count(*) AS n
        |          FROM trades GROUP BY symbol)))""".stripMargin),

    // Mirrors Risk.rangeVolatility: per-bar terms from the shared 1-min
    // bars CTE, averaged per symbol-day. Constants are the correctly
    // rounded doubles of 4·ln2 and 2·ln2−1 (identical on both engines).
    "q_range_vol" -> withTradesAnd(
      s"""bars AS (${FeatureQueries.ohlcSelect})""",
      """SELECT date_trunc('day', bucket) AS day, symbol,
        |       count(x) AS n_bars,
        |       floor(sqrt(avg(x) / CAST(2.772588722239781 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS parkinson,
        |       CASE WHEN avg(gk_term) >= 0
        |            THEN floor(sqrt(avg(gk_term)) * 1e6 + 0.5) / 1e6 END AS garman_klass
        |FROM (
        |  SELECT bucket, symbol,
        |         pow(ln(high / nullif(low, CAST(0 AS DOUBLE))), 2) AS x,
        |         CAST(0.5 AS DOUBLE) * pow(ln(high / nullif(low, CAST(0 AS DOUBLE))), 2)
        |           - CAST(0.3862943611198906 AS DOUBLE) * pow(ln(close / nullif(open, CAST(0 AS DOUBLE))), 2) AS gk_term
        |  FROM bars)
        |GROUP BY 1, 2""".stripMargin),

    // Mirrors Risk.obv: BIGINT accumulation — no floats anywhere.
    "q_obv" -> withTrades(
      """SELECT time, symbol, trade_id,
        |       CAST(sum(step) OVER (PARTITION BY symbol ORDER BY time, trade_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
        |FROM (
        |  SELECT time, symbol, trade_id,
        |         COALESCE(CAST(sign(price - lag(price) OVER (PARTITION BY symbol ORDER BY time, trade_id)) AS BIGINT)
        |                  * CAST(volume AS BIGINT), 0) AS step
        |  FROM trades)""".stripMargin),

    "q_donchian" -> withTrades(
      """SELECT time, symbol, price,
        |       max(price) OVER w AS dc_high, min(price) OVER w AS dc_low,
        |       floor(((max(price) OVER w + min(price) OVER w) / 2) * 1e6 + 0.5) / 1e6 AS dc_mid
        |FROM trades
        |WINDOW w AS (PARTITION BY symbol ORDER BY time, trade_id
        |             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""".stripMargin),

    // Mirrors Risk.varCvar: quantized returns, nearest-rank tail cut at
    // ceil(0.05·n) over (r, trade_id) order — the cut row is an actual
    // observation, so no interpolation arithmetic to disagree on.
    "q_var_cvar" -> withTradesAnd(
      """rets AS (
        |  SELECT symbol, trade_id,
        |         floor(ln(nullif(price, CAST(0 AS DOUBLE)) /
        |               nullif(lag(price) OVER (PARTITION BY symbol ORDER BY time, trade_id), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS r
        |  FROM trades),
        |ranked AS (
        |  SELECT symbol, r, trade_id,
        |         row_number() OVER (PARTITION BY symbol ORDER BY r, trade_id) AS rn,
        |         CAST(ceil(CAST(0.05 AS DOUBLE) * count(*) OVER (PARTITION BY symbol)) AS BIGINT) AS k
        |  FROM rets WHERE r IS NOT NULL)""".stripMargin,
      """SELECT symbol,
        |       arg_max(r, rn) AS var_95,
        |       floor((CAST(sum(CAST(floor(r * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
        |              / CAST(count(*) AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6 AS cvar_95,
        |       count(*) AS n_tail
        |FROM ranked WHERE rn <= k
        |GROUP BY symbol""".stripMargin),

    // Mirrors Risk.amihud: 1e6-scaled BIGINT ratio images, exact
    // order-independent integer sum, one mean per group (the rollSpread
    // scaled-integer-moment discipline — no per-group array).
    "q_amihud" -> withTrades(
      """SELECT day, symbol,
        |       floor((CAST(sxi AS DOUBLE) / CAST(n_trades AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6
        |         AS amihud_illiq,
        |       n_trades
        |FROM (
        |  SELECT CAST(time AS DATE) AS day, symbol,
        |         sum(CAST(floor((abs(r) / dv * CAST(1000000 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS sxi,
        |         CAST(count(*) AS BIGINT) AS n_trades
        |  FROM (
        |    SELECT time, trade_id, symbol,
        |           floor(ln(nullif(price, CAST(0 AS DOUBLE)) /
        |                 nullif(lag(price) OVER (PARTITION BY symbol ORDER BY time, trade_id), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS r,
        |           price * volume AS dv
        |    FROM trades)
        |  WHERE r IS NOT NULL AND dv > 0
        |  GROUP BY 1, 2)""".stripMargin),

    // Mirrors Risk.rollSpread: lag-paired 1e6-scaled BIGINT Δp images,
    // exact integer moment sums (no arrays), population covariance
    // (m·sxy − sx·sy)/m² (1e12-scaled), spread = 2·√(−cov)/1e6 when < 0.
    "q_roll_spread" -> withTradesAnd(
      """dps AS (
        |  SELECT symbol, time, trade_id,
        |         floor((price - lag(price) OVER (PARTITION BY symbol ORDER BY time, trade_id)) * 1e6 + 0.5) / 1e6 AS dp
        |  FROM trades),
        |dpi AS (
        |  SELECT symbol, CAST(floor(dp * 1e6 + 0.5) AS BIGINT) AS x,
        |         lag(CAST(floor(dp * 1e6 + 0.5) AS BIGINT))
        |           OVER (PARTITION BY symbol ORDER BY time, trade_id) AS y
        |  FROM dps WHERE dp IS NOT NULL),
        |rmom AS (
        |  SELECT symbol, count(y) AS n_pairs, CAST(count(y) AS DOUBLE) AS m,
        |    CAST(sum(CASE WHEN y IS NOT NULL THEN x END) AS DOUBLE) AS sx,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        |  FROM dpi GROUP BY symbol)""".stripMargin,
      """SELECT symbol,
        |       CASE WHEN m >= 2 AND (m * sxy - sx * sy) / (m * m) < 0
        |            THEN floor((CAST(2 AS DOUBLE) * sqrt(-((m * sxy - sx * sy) / (m * m))) / 1e6) * 1e6 + 0.5) / 1e6
        |       END AS roll_spread,
        |       n_pairs
        |FROM rmom""".stripMargin),

    // Mirrors Risk.hampel: nearest-rank median/MAD from the sorted
    // trailing-21 frame list; identical index arithmetic on both engines.
    "q_hampel" -> withTrades(hampelSql),

    // Mirrors Risk.kyleLambda: exact Δp image / BIGINT signed volume per
    // bucket, exact integer moment sums (HUGEINT products ↔ the Spark
    // side's DECIMAL(38,0) — both exact), only λ quantized.
    "q_kyle_lambda" -> withTradesAnd(
      """kb AS (
        |  SELECT symbol,
        |         CAST(floor((arg_max(price, time) - arg_min(price, time)) * 1e6 + 0.5) AS BIGINT) AS dpi,
        |         CAST(sum(CASE WHEN side = 'buy' THEN CAST(volume AS BIGINT) ELSE 0 END) -
        |              sum(CASE WHEN side = 'sell' THEN CAST(volume AS BIGINT) ELSE 0 END) AS HUGEINT) AS q
        |  FROM trades GROUP BY time_bucket(INTERVAL '5 minutes', time), symbol),
        |kmom AS (
        |  SELECT symbol, count(*) AS nb, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(q) AS DOUBLE) AS sx,
        |    CAST(sum(dpi) AS DOUBLE) AS sy,
        |    CAST(sum(q * dpi) AS DOUBLE) AS sxy,
        |    CAST(sum(q * q) AS DOUBLE) AS sx2
        |  FROM kb GROUP BY symbol)""".stripMargin,
      """SELECT symbol,
        |       floor(((n * sxy - sx * sy) / nullif(n * sx2 - sx * sx, CAST(0 AS DOUBLE)) / 1e6) * 1e6 + 0.5) / 1e6 AS kyle_lambda,
        |       nb AS n_buckets
        |FROM kmom""".stripMargin),

    // Mirrors Risk.vpin: BIGINT volume clock (// = div, both floor),
    // BIGINT bucket sums, quantized toxicity, trailing-50 integer window
    // sum of the 1e6-scaled toxicity image (order/association-independent
    // — no fold, no arrays).
    "q_vpin" -> withTradesAnd(
      """vbkt AS (
        |  SELECT symbol, vb,
        |         floor((CAST(abs(buy_v - sell_v) AS DOUBLE) /
        |                nullif(CAST(buy_v + sell_v AS DOUBLE), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS toxicity
        |  FROM (
        |    SELECT symbol, CAST(cum_before // 2000 AS BIGINT) AS vb,
        |           sum(CASE WHEN side = 'buy' THEN v ELSE 0 END) AS buy_v,
        |           sum(CASE WHEN side = 'sell' THEN v ELSE 0 END) AS sell_v
        |    FROM (
        |      SELECT symbol, side, CAST(volume AS BIGINT) AS v,
        |             COALESCE(sum(CAST(volume AS BIGINT)) OVER (
        |               PARTITION BY symbol ORDER BY time, trade_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |      FROM trades)
        |    GROUP BY 1, 2))""".stripMargin,
      """SELECT symbol, vb, toxicity,
        |       CASE WHEN cnt > 0
        |            THEN floor((CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6 END AS vpin
        |FROM (
        |  SELECT symbol, vb, toxicity,
        |         sum(toxi) OVER w AS s, count(toxi) OVER w AS cnt
        |  FROM (SELECT symbol, vb, toxicity,
        |               CAST(floor(toxicity * 1e6 + 0.5) AS BIGINT) AS toxi
        |        FROM vbkt)
        |  WINDOW w AS (PARTITION BY symbol ORDER BY vb
        |               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))""".stripMargin),
  )
}
