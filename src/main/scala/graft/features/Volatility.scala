package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-hour realized volatility: sample stddev of log returns per symbol.
  *
  * Reference: `sql/timescaledb_schema.sql:141-152` —
  * `stddev_samp(ln(price / LAG(price) OVER (PARTITION BY symbol ORDER BY
  * time)))` per 1-hour bucket — and the two-phase Spark version
  * `spark/batch_feature_calculation.py:70-107`.
  *
  * Two-phase as in the reference's own Spark job: (1) lag window — shuffle on
  * symbol, sort by time; (2) bucketed hash agg — second shuffle on
  * (hour, symbol). The lag deliberately crosses bucket boundaries (a bucket's
  * first return uses the previous bucket's last price), matching the SQL.
  */
object Volatility {

  /** Phase 1: per-symbol lag → log return (NULL-safe on zero prices). */
  def withLogReturn(trades: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time")
    // nullif guards: a zero price (halted/bad tick) yields a NULL log-return
    // instead of an ANSI division error / ln(0) — matching SQL NULL
    // propagation in the oracle.
    trades.withColumn("log_return",
      log(nullif(col("price"), lit(0.0)) / nullif(lag(col("price"), 1).over(w), lit(0.0))))
  }

  /** Phase 2: bucketed stddev of precomputed log returns. */
  def aggregateReturns(withReturns: DataFrame, bucket: String): DataFrame =
    withReturns
      .groupBy(window(col("time"), bucket), col("symbol"))
      .agg(
        Quantize.r(stddev_samp(col("log_return")), 6).as("volatility_1h"),
        count(col("log_return")).as("sample_count"))
      .select(
        col("window.start").as("bucket"),
        col("symbol"), col("volatility_1h"), col("sample_count"))

  def compute(trades: DataFrame, bucket: String = "1 hour"): DataFrame =
    aggregateReturns(withLogReturn(trades), bucket)

  /** Refresh-window form for
    * [[graft.streaming.StreamingFeatures.refreshAggregate]]. Because the lag
    * crosses bucket boundaries, a plain slice would give the window's first
    * row per symbol a NULL return where the full recompute has a real one. So
    * the slice is warmed with each symbol's SINGLE most recent (time, price)
    * before the window — one hash aggregate over the pre-window history
    * (map-side combined, O(symbols) output; with a date-partitioned source a
    * bounded lookback prunes that scan) — and the seed rows are dropped again
    * after the lag, before the bucket aggregation. Result is exactly equal to
    * slicing the full recompute to the window (`q_volatility_refresh` is
    * hash-gated on that).
    */
  def computeWindowed(
      src: DataFrame, loMicros: Long, hiEndMicros: Long, bucketSec: Long): DataFrame = {
    val m = unix_micros(col("time"))
    val cols = Seq("time", "symbol", "price")
    val slice = src.filter(m >= loMicros && m < hiEndMicros)
      .select(cols.map(col): _*)
    val seed = src.filter(m < loMicros)
      .groupBy("symbol")
      .agg(max_by(struct(col("time"), col("price")), col("time")).as("__s"))
      .select(col("__s.time").as("time"), col("symbol"), col("__s.price").as("price"))
    val warmed = Volatility.withLogReturn(slice.unionByName(seed))
      .filter(unix_micros(col("time")) >= loMicros)
    aggregateReturns(warmed, s"$bucketSec seconds")
  }
}
