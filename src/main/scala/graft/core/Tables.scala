package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders over the driver-provided parquet corpus, plus the canonical
  * `trades` view that maps the synthetic `events` table onto the reference's
  * `market_data_raw` fact schema (see /root/reference/sql/timescaledb_schema.sql:14-25):
  * (time, symbol, price, volume, trade_id, side, bid, ask).
  *
  * The mapping is pure, deterministic column arithmetic so the DuckDB oracle can
  * reproduce it bit-for-bit (see [[graft.registry.OracleSql.tradesCte]]):
  *   - `ts` (int64 nanos) -> `time` truncated to micros, identical to DuckDB's
  *     `CAST(ts AS TIMESTAMP)` truncation,
  *   - `user_id` -> `symbol` (string),
  *   - `value` -> `price`,
  *   - `1 + event_id % 100` -> `volume` (deterministic, integral-valued double so
  *     sums stay exact),
  *   - `event_type` purchase/click -> side buy/sell (CHECK-constraint domain,
  *     reference `sql/timescaledb_schema.sql:20`),
  *   - synthetic bid/ask around price with deterministic null holes (7- and
  *     11-cycles) to exercise the null-predicate filters the reference applies
  *     before spread computation (`flink-jobs/market-realtime/anomaly_detection.py:195`).
  */
object Tables {

  /** All timestamps in this corpus/engine are event-time in UTC. */
  def configure(spark: SparkSession): Unit = {
    // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark 4 refuses by
    // default; read nanos as long and convert explicitly (Tables.trades).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The trade-tick fact stream (event-time ordered per symbol). */
  def trades(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      expr("timestamp_micros(ts DIV 1000)").as("time"),
      col("user_id").cast("string").as("symbol"),
      col("value").as("price"),
      expr("CAST(1 + event_id % 100 AS DOUBLE)").as("volume"),
      col("event_id").cast("string").as("trade_id"),
      expr("CASE WHEN event_type = 'purchase' THEN 'buy' WHEN event_type = 'click' THEN 'sell' END")
        .as("side"),
      expr("CASE WHEN event_id % 7 <> 0 THEN value - (1 + event_id % 10) / CAST(100 AS DOUBLE) END")
        .as("bid"),
      expr("CASE WHEN event_id % 11 <> 0 THEN value + (1 + event_id % 10) / CAST(100 AS DOUBLE) END")
        .as("ask"))
}
