package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus-style alert-rule evaluation as a query — the engine analogue
  * of the reference's alert definitions (`monitoring/prometheus-alerts.yml:
  * 8-46`: feature-SLA staleness, `FlinkHighLatency` p95 > bound,
  * `KafkaHighConsumerLag` lag > bound, each with a `for:` hold duration).
  *
  * A rule `expr > threshold for: N intervals` over a metric time series is
  * exactly the gaps-and-islands shape: bucket the metric to the evaluation
  * interval, flag violated buckets, group CONSECUTIVE violated buckets into
  * islands (bucket-index minus row-number — pure integer arithmetic, so the
  * grouping is engine-exact), and a rule FIRES for islands at least N
  * intervals long. Output is one row per firing alert with its interval and
  * peak value — what a Prometheus `ALERTS{alertstate="firing"}` range query
  * returns, computed from first principles over the event log.
  *
  * Scale shape: one hash aggregation to the evaluation grid (map-side
  * combined), one per-rule window pass over the GRID (bounded: buckets ×
  * rules, corpus-size-independent) — never a window over raw events.
  */
object AlertRules {

  /** `metric > threshold` sustained for ≥ `forIntervals` evaluation buckets.
    * (Prometheus `for:` divided by the evaluation interval.)
    */
  final case class Rule(alert: String, metric: String, threshold: Double,
      forIntervals: Int)

  /** Evaluate rules over a metric series `(bucket: timestamp, metric:
    * string, value: double)` on a fixed `intervalSec` evaluation grid.
    * Returns one row per FIRING alert: (alert, starts_at, ends_at,
    * n_intervals, peak).
    *
    * Missing buckets break an island (a gap in the series is "no data", not
    * a sustained violation) — guaranteed by the bucket-index arithmetic
    * without densifying the grid.
    */
  def evaluate(metrics: DataFrame, rules: Seq[Rule], intervalSec: Long): DataFrame = {
    val ruleRows = rules.map(r => (r.alert, r.metric, r.threshold, r.forIntervals))
    val spark = metrics.sparkSession
    import spark.implicits._
    val ruleDf = ruleRows.toDF("alert", "metric", "threshold", "for_intervals")

    // violated buckets of each rule's metric; island id = bucket index minus
    // per-rule rank (exact BIGINT arithmetic — consecutive violated buckets
    // share an id, any gap or healthy bucket starts a new island).
    // `div`, not `/`: Column./ is double division
    val idx = expr(s"unix_micros(bucket) div ${intervalSec * 1000000L}L")
    val w = Window.partitionBy("alert").orderBy("bucket")
    val islands = metrics
      .join(broadcast(ruleDf), Seq("metric"))
      .filter(col("value") > col("threshold"))
      .select(col("alert"), col("bucket"), col("value"), col("for_intervals"),
        idx.as("bidx"))
      .select(col("alert"), col("bucket"), col("value"), col("for_intervals"),
        (col("bidx") - row_number().over(w).cast("long")).as("island"))

    islands
      .groupBy("alert", "island")
      .agg(
        min(col("bucket")).as("starts_at"),
        max(col("bucket")).as("ends_at"),
        count(lit(1)).as("n_intervals"),
        max(col("value")).as("peak"),
        first(col("for_intervals")).as("for_intervals"))
      .filter(col("n_intervals") >= col("for_intervals"))
      .select(col("alert"), col("starts_at"), col("ends_at"),
        col("n_intervals"), col("peak"))
  }

  /** A scale-free metric pair derived from the tick stream, mirroring the
    * reference's two non-environmental alert inputs:
    *  - `p95_latency`: per-bucket p95 of the observed value (the
    *    `histogram_quantile(0.95, ...)` input shape);
    *  - `ingest_rate_ratio`: events per bucket over the corpus-wide mean
    *    per bucket — the consumer-lag proxy (a sustained surge is exactly
    *    what builds lag), made scale-invariant so thresholds hold at any SF.
    */
  def eventMetrics(ticks: DataFrame, intervalSec: Long,
      valueCol: String = "price", timeCol: String = "time"): DataFrame = {
    // staged once (lazy localCheckpoint): both the corpus-mean aggregate
    // and the metric join below consume the grid — without staging, the
    // full percentile aggregation over the raw ticks runs twice
    val bucketed = ticks
      .groupBy(window(col(timeCol), s"$intervalSec seconds").getField("start")
        .as("bucket"))
      .agg(
        graft.functions.Quantize.r(percentile(col(valueCol), lit(0.95)), 6)
          .as("p95_latency"),
        count(lit(1)).as("n"))
      .transform(graft.core.Staging.stage)
    val mean = bucketed.agg(
      (sum(col("n")).cast("double") / count(lit(1)).cast("double")).as("mean_n"))
    bucketed.crossJoin(broadcast(mean))
      .select(col("bucket"),
        map(
          lit("p95_latency"), col("p95_latency"),
          lit("ingest_rate_ratio"),
          graft.functions.Quantize.r(col("n").cast("double") / col("mean_n"), 6))
          .as("m"))
      .select(col("bucket"), explode(col("m")).as(Seq("metric", "value")))
  }
}
