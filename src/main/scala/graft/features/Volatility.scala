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

  def compute(trades: DataFrame, bucket: String = "1 hour"): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time")
    // nullif guards: a zero price (halted/bad tick) yields a NULL log-return
    // instead of an ANSI division error / ln(0) — matching SQL NULL
    // propagation in the oracle.
    trades
      .withColumn("log_return",
        log(nullif(col("price"), lit(0.0)) / nullif(lag(col("price"), 1).over(w), lit(0.0))))
      .groupBy(window(col("time"), bucket), col("symbol"))
      .agg(
        Quantize.r(stddev_samp(col("log_return")), 6).as("volatility_1h"),
        count(col("log_return")).as("sample_count"))
      .select(
        col("window.start").as("bucket"),
        col("symbol"), col("volatility_1h"), col("sample_count"))
  }
}
