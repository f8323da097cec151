package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-trade flags: trades whose volume exceeds the symbol's 95th
  * percentile.
  *
  * Reference: contract `sql/smartdb_contract.md:73-79` (dynamic Q95 threshold;
  * the Flink jobs stub it to a constant,
  * `flink-jobs/market-realtime/anomaly_detection.py:98-102`) and the
  * `large_trade_flags` table storing `(large_trade_flag, volume,
  * percentile_95)` (`sql/timescaledb_schema.sql:182-196`).
  *
  * We implement the contract's dynamic form: exact `percentile` per symbol
  * (small result — one row per symbol), broadcast back onto the fact stream.
  * At 100 TB the threshold side is tiny by construction, so the join is a
  * broadcast hash join with no shuffle of the fact table; swap `percentile`
  * for `percentile_approx` when exactness is not contractual.
  */
object LargeTrades {

  def thresholds(trades: DataFrame, q: Double = 0.95): DataFrame =
    trades.groupBy("symbol").agg(percentile(col("volume"), lit(q)).as("percentile_95"))

  def compute(trades: DataFrame, q: Double = 0.95): DataFrame =
    trades
      .join(broadcast(thresholds(trades, q)), Seq("symbol"))
      .filter(col("volume") > col("percentile_95"))
      .select(
        col("time"), col("symbol"), col("volume"),
        Quantize.r(col("percentile_95"), 6).as("percentile_95"))
}
