package graft.features

import graft.asof.AsOfJoin
import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corporate-action (split) back-adjustment — the canonical time-series
  * restatement the reference's continuous price history implies but never
  * materializes (its `market_data_raw` keeps raw prints;
  * `sql/timescaledb_schema.sql:14-25`): every price BEFORE a split is
  * divided by the product of all later split factors so the whole history
  * is comparable in post-split units.
  *
  * Scale design:
  *  - the action calendar is a tiny dimension (a handful of rows per
  *    symbol-year), so the cumulative "divide by everything after me"
  *    factor is ONE reverse running sum over that dimension — never over
  *    the tick fact;
  *  - factors are powers of two carried as `factor_log2`, so the cumulative
  *    product is `shiftleft(1, sum(log2))` — exact BIGINT arithmetic, no
  *    float drift, bit-identical in any engine (the integer-moment
  *    discipline from the round-6 de-array applied to products);
  *  - application to ticks is the existing single-shuffle forward as-of
  *    join ([[AsOfJoin.forward]]): each trade picks the EARLIEST action at
  *    or after it, whose cumulative factor already folds in everything
  *    later. No per-trade aggregation, no trades×actions theta join.
  */
object CorporateActions {

  /** Deterministic synthetic split calendar over the corpus symbols
    * (the testdata ships no action feed): symbols ≡ 0 (mod 5) split 2:1 on
    * Jan 10, symbols ≡ 3 (mod 7) split 4:1 on Jan 20 — some symbols hit
    * both, most neither. Pure column arithmetic so the DuckDB oracle
    * replays it exactly.
    */
  def syntheticActions(trades: DataFrame): DataFrame = {
    val syms = trades.select(col("symbol")).distinct()
      .withColumn("sym_i", col("symbol").cast("int"))
    val s1 = syms.filter(col("sym_i") % 5 === 0)
      .select(col("symbol"),
        to_timestamp(lit("2024-01-10 00:00:00")).as("action_time"),
        lit(1).as("factor_log2"))
    val s2 = syms.filter(col("sym_i") % 7 === 3)
      .select(col("symbol"),
        to_timestamp(lit("2024-01-20 00:00:00")).as("action_time"),
        lit(2).as("factor_log2"))
    s1.unionByName(s2)
  }

  /** Back-adjusted price series: raw print, the exact BIGINT divisor in
    * force at that print (1 when no later action), and the adjusted price
    * quantized at 1e-6.
    */
  def backwardAdjust(trades: DataFrame, actions: DataFrame): DataFrame = {
    val tail = Window.partitionBy("symbol").orderBy("action_time")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cum = actions
      .withColumn("cum_log2", sum(col("factor_log2")).over(tail))
      .select(col("symbol"), col("action_time").as("time"), col("cum_log2"))
    val divisor = coalesce(
      expr("shiftleft(CAST(1 AS BIGINT), CAST(cum_log2 AS INT))"), lit(1L))
    AsOfJoin.forward(
      trades.select("time", "symbol", "trade_id", "price"), cum, Seq("symbol"))
      .select(
        col("time"), col("symbol"), col("trade_id"), col("price"),
        divisor.as("adj_divisor"),
        Quantize.r(col("price") / divisor, 6).as("price_adj"))
  }
}
