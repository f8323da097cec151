package graft.core

import java.sql.Timestamp

/** Typed views of the contract records (reference: `sql/timescaledb_schema.sql`
  * DDL and `src/features/smartdb_contract.py:85-101` FeaturePITSnapshot).
  * DataFrame code paths stay schema-dynamic; these case classes back the typed
  * `Dataset` operators (CEP state machines, encoders in tests).
  */
final case class Trade(
    time: Timestamp,
    symbol: String,
    price: Double,
    volume: Double,
    trade_id: String,
    side: Option[String],
    bid: Option[Double],
    ask: Option[Double])

final case class OhlcBar(
    bucket: Timestamp,
    symbol: String,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double,
    trade_count: Long)

/** One assembled point-in-time feature record (reference
  * `sql/timescaledb_schema.sql:292-411` feature_pit_snapshot).
  */
final case class FeatureSnapshot(
    symbol: String,
    as_of_ts: Timestamp,
    open: Option[Double],
    high: Option[Double],
    low: Option[Double],
    close: Option[Double],
    sma_20: Option[Double],
    ewm_12: Option[Double],
    volatility_1h: Option[Double],
    vwap_5m: Option[Double],
    large_trade_flag: Option[Boolean],
    bid: Option[Double],
    ask: Option[Double],
    bidask_spread: Option[Double],
    trade_imbalance_5m: Option[Double],
    regime_tag: Option[String])

/** Anomaly record emitted by the CEP detectors (reference
  * `flink-jobs/market-realtime/anomaly_detection.py:79-96,131-148`).
  */
final case class Anomaly(
    time: Timestamp,
    symbol: String,
    anomaly_type: String,
    detail: Double)
