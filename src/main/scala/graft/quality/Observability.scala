package graft.quality

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability — the engine-side re-expression of the reference's
  * Prometheus monitoring surface (`monitoring/prometheus-alerts.yml:8-46`:
  * throughput, consumer lag, freshness ages; `src/observability/
  * enhanced_health_monitor.py:62-74`).
  *
  * Spark-first design: metrics ride ON the query via `Dataset.observe` —
  * computed by the same executors in the same pass as the data (zero extra
  * scan, zero extra shuffle; an `AggregatingAccumulator` under the hood) and
  * surfaced through listener callbacks, exactly where a Prometheus exporter
  * would hook. Contrast with the reference's separate monitoring queries,
  * which re-read the tables they watch — at 100 TB a second scan per metric
  * tick is the difference between observability and a second workload.
  */
object Observability {

  /** Standard data-quality metric bundle for a trades-shaped frame, attached
    * as observed metrics under `name`: row count, null-side count, min/max
    * event time (freshness bounds), volume total. Works on batch AND
    * streaming frames (per micro-batch emission).
    */
  def observeTrades(df: DataFrame, name: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col("side").isNull, 1L).otherwise(0L)).as("null_side"),
      min(unix_micros(col("time"))).as("min_time_micros"),
      max(unix_micros(col("time"))).as("max_time_micros"),
      sum(col("volume")).as("sum_volume"))

  /** Freshness age in microseconds from an observed-metrics row, against a
    * reference "now" — the SLA age the reference alerts on. `None` when the
    * observed batch was empty (max_time_micros NULL): "no data" must stay
    * distinguishable from "56-years stale" for any SLA consumer.
    */
  def ageMicros(metrics: Row, nowMicros: Long): Option[Long] = {
    val i = metrics.fieldIndex("max_time_micros")
    if (metrics.isNullAt(i)) None else Some(nowMicros - metrics.getLong(i))
  }

  /** Collects observed metrics from batch query executions, keyed by the
    * observation name. Register once per session; thread-safe.
    */
  final class BatchMetricsListener extends QueryExecutionListener {
    private val collected = mutable.Map.empty[String, Row]

    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (k, v) =>
        collected.synchronized { collected(k) = v }
      }

    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()

    def get(name: String): Option[Row] = collected.synchronized { collected.get(name) }
    def clear(): Unit = collected.synchronized { collected.clear() }
  }

  def register(spark: SparkSession): BatchMetricsListener = {
    val l = new BatchMetricsListener
    spark.listenerManager.register(l)
    l
  }

  /** Throughput / state / watermark summary of a streaming query's last
    * progress — the consumer-lag and latency surface of the reference's
    * Flink dashboards, read from the engine's own progress events instead of
    * an external scraper.
    */
  final case class StreamHealth(
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      batchDurationMs: Long,
      stateRowsTotal: Long,
      watermark: String,
      observed: Map[String, Row])

  def streamHealth(q: StreamingQuery): Option[StreamHealth] =
    Option(q.lastProgress).map { p =>
      StreamHealth(
        batchId = p.batchId,
        numInputRows = p.numInputRows,
        inputRowsPerSecond =
          if (p.inputRowsPerSecond.isNaN) 0.0 else p.inputRowsPerSecond,
        processedRowsPerSecond =
          if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
        batchDurationMs = p.batchDuration,
        stateRowsTotal = p.stateOperators.map(_.numRowsTotal).sum,
        watermark = p.eventTime.getOrDefault("watermark", ""),
        observed = {
          val m = mutable.Map.empty[String, Row]
          p.observedMetrics.forEach((k, v) => m(k) = v)
          m.toMap
        })
    }
}
