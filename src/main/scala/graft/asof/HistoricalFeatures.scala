package graft.asof

import graft.features._
import org.apache.spark.sql.DataFrame

/** Feast-style historical (offline) feature retrieval: given an entity frame
  * of `(symbol, event_timestamp)` rows, attach the point-in-time-correct
  * value of each requested feature view — the most recent feature row at or
  * before the entity timestamp, within that view's TTL.
  *
  * Reference: `get_historical_features` over 100-timestamp entity frames
  * (`tests/test_feast_pit_correctness.py:115-151`,
  * `scripts/benchmark_performance.py:73-101`); TTLs per view at
  * `feast_repo/feature_definitions.py:37,93,145`. Feast executes this with
  * its Spark offline store as an as-of join — here it IS [[AsOfJoin]],
  * applied once per feature view.
  *
  * Scale shape: each feature view costs one key-partitioned shuffle of
  * |entities| + |feature rows| (no row explosion); feature views are joined
  * sequentially so peak memory stays bounded. With N views the plan is N
  * window shuffles — the same count as the reference's N index lookups per
  * entity row, but batched across all entities at once.
  */
object HistoricalFeatures {

  /** Attach OHLC close, SMA-20 and 5-min VWAP to an entity frame — all three
    * feature views resolved in ONE shuffle via [[AsOfJoin.backwardMulti]].
    */
  def retrieve(
      entities: DataFrame,
      trades: DataFrame,
      entityTime: String = "event_timestamp",
      ttlSeconds: Option[Long] = Some(7L * 24 * 3600)): DataFrame = {

    val views = Seq(
      AsOfJoin.FeatureView(
        Ohlc.compute(trades).select("bucket", "symbol", "close"),
        "bucket", "ohlc_", ttlSeconds),
      AsOfJoin.FeatureView(
        Sma.compute(trades).select("time", "symbol", "sma_20"),
        "time", "sma_", ttlSeconds),
      AsOfJoin.FeatureView(
        Vwap.compute(trades).select("bucket", "symbol", "vwap_5m"),
        "bucket", "vwap_", ttlSeconds))

    AsOfJoin.backwardMulti(entities, views, Seq("symbol"), entityTime)
  }
}
