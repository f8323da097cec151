package graft.quality

import graft.features.Ohlc
import graft.functions.Quantize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Component-health rollup — the engine twin of the reference's health
  * dashboard (`src/observability/health_dashboard.py:37-61`
  * `monitor_all_components` + `_aggregate_health:415-427`): one record per
  * component metric with its threshold and status, plus the worst-status
  * overall record (the reference's status-priority max). Every metric is
  * derived from the corpus itself (the freshness anchor is max(time), never
  * NOW()), so the rollup is deterministic and cross-engine value-checked
  * like any other query.
  *
  * Data-derivable analogues of the reference's async monitors:
  *  - ingest (Kafka monitor): error_rate = invalid-tick fraction, critical
  *    above 0.1% (`health_dashboard.py:91-95`);
  *  - storage (TimescaleDB monitor): continuous-aggregate lag vs the 2-min
  *    SLA (`health_dashboard.py:127-131`);
  *  - features (Feast monitor): DQSOps score, degraded below 0.8
  *    (`health_dashboard.py:203-205`);
  *  - feature_quality: null-rate (degraded above 5%,
  *    `health_dashboard.py:278-280`) and the KS distribution-shift p-value
  *    (degraded below 0.01, `health_dashboard.py:281-283`).
  *
  * Scale shape: each component is one tiny independent aggregate (the
  * reference's monitors are likewise independent async tasks); the unions
  * and the worst-status fold run over six 1-row frames — control-plane
  * cost, regardless of corpus size.
  */
object PipelineHealth {

  def compute(trades: DataFrame, events: DataFrame): DataFrame = {
    // ingest / storage / null-rate scalars in ONE pass over trades
    val m = trades.agg(
      count(lit(1)).as("n"),
      count(when(col("price") <= 0 || col("volume") <= 0, 1)).as("bad"),
      count(when(col("bid").isNull || col("ask").isNull, 1)).as("nullq"),
      (unix_micros(max(col("time"))) -
        unix_micros(date_trunc("minute", max(col("time"))))).as("lag_us"))
      .select(
        Quantize.r(col("bad").cast("double") / col("n").cast("double"), 6).as("error_rate"),
        Quantize.r(col("lag_us").cast("double") / lit(1e6), 6).as("ca_lag_seconds"),
        Quantize.r(col("nullq").cast("double") / col("n").cast("double") * lit(100), 6)
          .as("null_rate_percent"))
    val dq = DqScore.compute(Ohlc.compute(trades), trades.agg(max(col("time")).as("mx")))
      .select(col("overall").as("dq_score"))
    val ks = KsTest.dStatistic(events, "value", "event_type", "view", "click")
      .select(col("p_value"))
    // ONE row — and referenced by five metric branches plus the overall
    // fold. Without materialization Catalyst re-plans (and the executor
    // re-runs) the whole trades+dq+ks subtree PER REFERENCE: the r17 plan
    // audit measured 430 physical operators / 208 Exchanges / 80
    // BroadcastNestedLoopJoins for six 1-row outputs. localCheckpoint
    // executes the subtree once and truncates the lineage (guide §3.3:
    // materialise an intermediate to stop plan blowup), collapsing the
    // plan to the union of six selects over a local 1-row frame.
    val wide = m.crossJoin(dq).crossJoin(ks).transform(graft.core.Staging.stageNow)

    def metric(component: String, name: String, value: Column,
        threshold: Double, status: Column): DataFrame =
      wide.select(
        lit(component).as("component"), lit(name).as("metric"),
        value.cast("double").as("value"),
        lit(threshold).cast("double").as("threshold"), status.as("status"))

    val comps =
      metric("ingest", "error_rate", col("error_rate"), 0.001,
        when(col("error_rate") > 0.001, "critical").otherwise("healthy"))
        .unionByName(metric("storage", "ca_lag_seconds", col("ca_lag_seconds"), 120.0,
          when(col("ca_lag_seconds") > 120.0, "degraded").otherwise("healthy")))
        .unionByName(metric("features", "dq_score", col("dq_score"), 0.8,
          when(col("dq_score") < 0.8, "degraded").otherwise("healthy")))
        .unionByName(metric("feature_quality", "null_rate_percent",
          col("null_rate_percent"), 5.0,
          when(col("null_rate_percent") > 5.0, "degraded").otherwise("healthy")))
        .unionByName(metric("feature_quality", "ks_p_value", col("p_value"), 0.01,
          when(col("p_value") < 0.01, "degraded").otherwise("healthy")))
    val overall = comps
      .agg(max(when(col("status") === "critical", 3)
        .when(col("status") === "degraded", 2).otherwise(1)).as("p"))
      .select(
        lit("overall").as("component"), lit("worst_status").as("metric"),
        col("p").cast("double").as("value"), lit(3.0).cast("double").as("threshold"),
        when(col("p") === 3, "critical").when(col("p") === 2, "degraded")
          .otherwise("healthy").as("status"))
    comps.unionByName(overall)
  }
}
