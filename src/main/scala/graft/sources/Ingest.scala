package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest-side parsing and validation: JSON deserialization with
  * corrupt-record routing, contract validation with DLQ split, and the
  * (time, symbol, trade_id) dedup backstop.
  *
  * Reference: `spark/streaming_feature_updates.py:64-75` (from_json parse),
  * `flink-jobs/market-realtime/enhanced_anomaly_detection.py:26-45`
  * (deserialize errors → DLQ), `src/quality/data_contracts.py:203-222`
  * (contract-violating rows → DLQ path), `src/kafka/market_data_producer.py
  * :109-122` (failed-delivery DLQ).
  *
  * The split is a single predicate evaluated once: both branches are filters
  * over the same scan, so the source is read once per sink (or cached).
  */
object Ingest {

  /** Parse a JSON-string column with corrupt-record capture: malformed rows
    * surface with `__corrupt` non-null (PERMISSIVE mode yields an all-null
    * struct — NOT a null struct — for bad input, so the corrupt-record
    * column is the only reliable routing signal).
    */
  def parseJson(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("__corrupt", org.apache.spark.sql.types.StringType)
    df
      .withColumn("__parsed",
        from_json(col(jsonCol), withCorrupt,
          Map("columnNameOfCorruptRecord" -> "__corrupt")))
      .withColumn("__corrupt", col("__parsed.__corrupt"))
  }

  /** Contract rules for trade records — each (name, violation predicate).
    * Mirrors the CHECK constraints + pydantic validators
    * (`sql/timescaledb_schema.sql:20`, `src/features/smartdb_contract.py:35-107`).
    */
  def tradeRules: Seq[(String, Column)] = Seq(
    "price_positive"  -> (col("price").isNull || col("price") <= 0),
    "volume_in_range" -> (col("volume").isNull || col("volume") < 1 || col("volume") > 100),
    "side_in_domain"  -> (col("side").isNotNull && !col("side").isInCollection(Seq("buy", "sell"))),
    "ask_gte_bid"     -> (col("bid").isNotNull && col("ask").isNotNull && col("ask") < col("bid")),
    "spread_bounded"  -> (col("bid").isNotNull && col("ask").isNotNull &&
      col("ask") - col("bid") > lit(0.15)))

  def anyViolation(rules: Seq[(String, Column)]): Column =
    rules.map(_._2).reduce(_ || _)

  /** Split into (clean, dlq): dlq rows carry the list of violated rules. */
  def dlqSplit(df: DataFrame, rules: Seq[(String, Column)] = tradeRules): (DataFrame, DataFrame) = {
    val tagged = df.withColumn("violations",
      filter(
        array(rules.map { case (n, c) => when(c, n) }: _*),
        v => v.isNotNull))
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }

  /** Exactly-once ingest backstop: drop replayed records on the natural key
    * (`sql/timescaledb_schema.sql:24`, `ARCHITECTURE.md:49-55`).
    */
  def dedupIngest(df: DataFrame): DataFrame =
    df.dropDuplicates("time", "symbol", "trade_id")
}
