package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bid-ask spread per tick: `spread = ask - bid` as a generated column.
  *
  * Reference: `sql/timescaledb_schema.sql:199-212` (`bidask_spreads` with
  * `spread GENERATED ALWAYS AS (ask - bid) STORED`) fed by the Flink path
  * which drops rows missing either side
  * (`flink-jobs/market-realtime/anomaly_detection.py:195`).
  *
  * Narrow plan: filter + project, no shuffle; the null-predicate filter pushes
  * to the parquet scan.
  */
object Spread {

  def compute(trades: DataFrame): DataFrame =
    trades
      .filter(col("bid").isNotNull && col("ask").isNotNull)
      .select(
        col("time"), col("symbol"),
        Quantize.r(col("bid"), 6).as("bid"),
        Quantize.r(col("ask"), 6).as("ask"),
        Quantize.r(col("ask") - col("bid"), 6).as("spread"))
}
