package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 1-minute (or any-bucket) OHLC bars per symbol.
  *
  * Reference semantics: `sql/timescaledb_schema.sql:44-57` (continuous aggregate
  * with TimescaleDB's *ordered* `first(price, time)` / `last(price, time)`) and
  * `spark/batch_feature_calculation.py:110-138`.
  *
  * Spark-first: one `groupBy(window, symbol)` hash aggregation — a single
  * shuffle, map-side partial aggregation for free. Timescale's ordered
  * first/last map to `min_by`/`max_by` (exact, order-insensitive, so the agg
  * stays commutative and partial-aggregatable — unlike `first(ignoreNulls)`
  * which the reference's own PySpark job uses and which is only correct after
  * a sort). At 100 TB this is the right shape: no windowing, no global sort;
  * AQE coalesces the post-shuffle partitions.
  */
object Ohlc {

  /** @param bucket Spark interval string, e.g. "1 minute". */
  def compute(trades: DataFrame, bucket: String = "1 minute"): DataFrame =
    trades
      .groupBy(window(col("time"), bucket), col("symbol"))
      .agg(
        min_by(col("price"), col("time")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("time")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("trade_count"))
      .select(
        col("window.start").as("bucket"),
        col("symbol"), col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("trade_count"))
}
