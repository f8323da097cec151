package graft.quality

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 4-component data-quality score over OHLC bars, mirroring the reference's
  * DQSOps framework (`src/quality/great_expectations_setup.py:123-244`):
  *  - completeness: 1 − null-rate over all value cells,
  *  - consistency:  1 − violation rate of `high >= low` and `low <= close`,
  *  - accuracy:     1 − share of |zscore(close)| > 3,
  *  - timeliness:   freshness tiering of max(bucket) against the corpus
  *                  anchor (newest trade time — deterministic, not NOW()),
  *  - overall = mean of the four; alert threshold 0.85
  *    (`tests/test_phase_0_quality_health.py:47-61`).
  *
  * Two scans: one tiny agg for mean/std (z-score needs global moments), one
  * combined pass for everything else. Both are single-shuffle hash aggs.
  */
object DqScore {

  def compute(ohlc: DataFrame, anchor: DataFrame): DataFrame = {
    val stats = ohlc.agg(
      avg(col("close")).as("mu"), stddev_samp(col("close")).as("sigma"))

    val cells = Seq("open", "high", "low", "close", "volume")
    val nullCells = cells.map(c => count(when(col(c).isNull, 1)).cast("double")).reduce(_ + _)

    ohlc.crossJoin(broadcast(stats)).crossJoin(broadcast(anchor))
      .agg(
        count(lit(1)).as("n_rows"),
        (lit(1.0) - nullCells / (count(lit(1)) * cells.size).cast("double"))
          .as("completeness"),
        (lit(1.0) -
          (count(when(col("high") < col("low") || col("low") > col("close"), 1)).cast("double") /
            count(lit(1)).cast("double"))).as("consistency"),
        (lit(1.0) -
          count(when(abs((col("close") - col("mu")) / nullif(col("sigma"), lit(0.0))) > 3, 1)).cast("double") /
            count(lit(1)).cast("double")).as("accuracy"),
        when(unix_micros(max(col("mx"))) - unix_micros(max(col("bucket"))) <= 60L * 1000000L, 1.0)
          .when(unix_micros(max(col("mx"))) - unix_micros(max(col("bucket"))) <= 300L * 1000000L, 0.8)
          .otherwise(0.5).as("timeliness"))
      .select(
        col("n_rows"),
        Quantize.r(col("completeness"), 6).as("completeness"),
        Quantize.r(col("consistency"), 6).as("consistency"),
        Quantize.r(col("accuracy"), 6).as("accuracy"),
        col("timeliness"),
        Quantize.r(
          (col("completeness") + col("consistency") + col("accuracy") + col("timeliness")) / 4.0,
          6).as("overall"))
  }
}
