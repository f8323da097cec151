package graft.features

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 20-tick simple moving average per symbol (rows frame, not time frame).
  *
  * Reference: `sql/timescaledb_schema.sql:68-80` and the reference's own Spark
  * form `spark/batch_feature_calculation.py:43-49` —
  * `avg(price) OVER (PARTITION BY symbol ORDER BY time ROWS BETWEEN 19
  * PRECEDING AND CURRENT ROW)`. SURVEY.md §7.4 item 2: of the two inequivalent
  * SMAs in the reference schema we follow this window-function form (the one
  * the PIT tests validate "vs Spark offline ±ε").
  *
  * Plan shape: Exchange hashpartition(symbol) → Sort(time) → Window. One
  * shuffle; at 100 TB per-symbol data must fit a task's sort spill budget —
  * symbols are the natural parallelism unit (same assumption as the
  * reference's Kafka partition-by-symbol layout).
  */
object Sma {

  def compute(trades: DataFrame, n: Int = 20): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("time").rowsBetween(-(n - 1), 0)
    trades.select(
      col("time"), col("symbol"), col("price"),
      Quantize.r(avg(col("price")).over(w), 6).as("sma_20"))
  }
}
