package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful CEP detectors — the Spark Structured Streaming re-expression of
  * the reference's Flink keyed process functions:
  *
  *  - [[LargeTradeDetector]]: ">= 3 large trades within the window" pattern,
  *    ListState buffer with event-time eviction
  *    (`flink-jobs/market-realtime/anomaly_detection.py:40-102`; persisted
  *    variant `enhanced_anomaly_detection.py:48-130`).
  *  - [[SpreadEmaMonitor]]: keyed ValueState EMA of the bid-ask spread,
  *    alert when spread > 3 × running normal
  *    (`anomaly_detection.py:105-149`, `enhanced_anomaly_detection.py:133-173`).
  *
  * `groupByKey(symbol)` is the Flink `key_by`; `GroupState` is the keyed
  * state backend. Batches are processed in event-time order *within* each
  * group by sorting each micro-batch's iterator — state stays O(window) per
  * key, so 1000 executors × millions of symbols is just hash partitioning.
  */
object Cep {

  final case class CepTrade(timeMicros: Long, symbol: String, volume: Double)
  final case class LtState(times: List[Long])
  final case class CepAnomaly(time: Timestamp, symbol: String, large_trades_5m: Long)

  final case class SpreadObs(timeMicros: Long, symbol: String, spread: Double)
  final case class EmaState(ema: Double, n: Long, alerts: Long)
  final case class EmaResult(symbol: String, normal_spread: Double, n: Long, alerts: Long)

  def toMicrosTs(micros: Long): Timestamp = {
    val ts = new Timestamp(micros / 1000L)
    ts.setNanos(((micros % 1000000L) * 1000L).toInt)
    ts
  }

  /** Pattern: emit an anomaly for every large trade that is the >=3rd within
    * `windowMicros` for its symbol. Input must already be filtered to large
    * trades (threshold side is a broadcast batch frame — stream-static join).
    */
  object LargeTradeDetector {

    def processGroup(windowMicros: Long)(
        symbol: String,
        it: Iterator[CepTrade],
        state: GroupState[LtState]): Iterator[CepAnomaly] = {
      var buf = state.getOption.map(_.times).getOrElse(Nil)
      val out = Seq.newBuilder[CepAnomaly]
      it.toSeq.sortBy(_.timeMicros).foreach { t =>
        buf = buf.filter(_ >= t.timeMicros - windowMicros) :+ t.timeMicros
        if (buf.size >= 3) out += CepAnomaly(toMicrosTs(t.timeMicros), symbol, buf.size.toLong)
      }
      state.update(LtState(buf))
      out.result().iterator
    }

    /** Apply over a (streaming or batch) frame of large trades. */
    def detect(largeTrades: DataFrame, windowMicros: Long): Dataset[CepAnomaly] = {
      val spark = largeTrades.sparkSession
      import spark.implicits._
      largeTrades
        .select(unix_micros(col("time")).as("timeMicros"), col("symbol"), col("volume"))
        .as[CepTrade]
        .groupByKey(_.symbol)
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
          processGroup(windowMicros))
    }
  }

  final case class CusumObs(timeMicros: Long, tradeId: String, symbol: String, z: Double)
  // NOTE: adding maxTimeMicros changed the mapGroupsWithState state-encoder
  // schema (3 -> 4 fields); checkpoints written by earlier builds do not
  // restore against it — a deployment migrating across that boundary must
  // start from a fresh checkpoint (standard Spark state-schema rule).
  final case class CusumState(
      pos: Double, neg: Double, alerts: Long, maxTimeMicros: Long = Long.MinValue)
  final case class CusumResult(
      symbol: String, cusum_pos: Double, cusum_neg: Double, n_alerts: Long)

  /** Tabular CUSUM drift detector over standardized price deviations — the
    * sequential-change-detection complement to the batch KS test
    * (`src/quality/great_expectations_setup.py` drift monitoring; Flink-side
    * anomaly monitors `enhanced_anomaly_detection.py:133-173`):
    * `s⁺ = max(0, s⁺ + z − k)`, `s⁻ = max(0, s⁻ − z − k)` with slack k=0.5,
    * alert while either side exceeds h=5. O(1) state per key; `z` arrives
    * pre-standardized (per-symbol μ/σ broadcast from a batch frame, the
    * stream-static shape) and pre-quantized to 1e-6 so the fold is
    * bit-reproducible cross-engine — the DuckDB oracle replays it exactly
    * (`q_stream_cusum`).
    *
    * ORDERING CONTRACT: the CUSUM recursion is order-sensitive, and this
    * monitor sorts by (event time, trade_id) only WITHIN a micro-batch —
    * across batches it folds in arrival order. The bounded-replay harness
    * satisfies this by construction (Trigger.AvailableNow with no
    * maxFilesPerTrigger delivers the whole corpus as one batch). A source
    * that splits out-of-order data across batches violates it; the state
    * carries the max folded event time and a violation logs a warning per
    * offending batch instead of passing silently.
    *
    * LEGACY SHAPE: for sources that cannot guarantee per-key chronological
    * arrival, use [[graft.streaming.OrderedCusum]] (transformWithState,
    * buffer-until-watermark) — it produces the exact global ordered fold
    * across any batch split. StreamingSpec pins both this monitor's
    * out-of-order divergence and OrderedCusum's 3-batch equivalence.
    */
  object CusumMonitor {

    val Slack = 0.5
    val Threshold = 5.0

    def processGroup(
        symbol: String,
        it: Iterator[CusumObs],
        state: GroupState[CusumState]): CusumResult = {
      var s = state.getOption.getOrElse(CusumState(0.0, 0.0, 0L))
      val batch = it.toSeq.sortBy(o => (o.timeMicros, o.tradeId))
      batch.headOption.foreach { h =>
        if (h.timeMicros < s.maxTimeMicros)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"CUSUM[$symbol]: batch starts at ${h.timeMicros} < max folded " +
              s"time ${s.maxTimeMicros}; cross-batch fold order violated")
      }
      batch.foreach { o =>
        val pos = math.max(0.0, s.pos + o.z - Slack)
        val neg = math.max(0.0, s.neg - o.z - Slack)
        val alert = pos > Threshold || neg > Threshold
        s = CusumState(pos, neg, s.alerts + (if (alert) 1L else 0L),
          math.max(s.maxTimeMicros, o.timeMicros))
      }
      state.update(s)
      CusumResult(symbol,
        math.floor(s.pos * 1e6 + 0.5) / 1e6,
        math.floor(s.neg * 1e6 + 0.5) / 1e6, s.alerts)
    }

    /** Apply over a (streaming) frame carrying (time, trade_id, symbol, z). */
    def monitor(obs: DataFrame): Dataset[CusumResult] = {
      val spark = obs.sparkSession
      import spark.implicits._
      obs
        .select(unix_micros(col("time")).as("timeMicros"),
          col("trade_id").as("tradeId"), col("symbol"), col("z"))
        .as[CusumObs]
        .groupByKey(_.symbol)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout)(processGroup)
    }
  }

  /** Keyed EMA(α=0.1) of the spread; counts alerts where an observation
    * exceeds 3× the running normal. Emits one row per key per batch with the
    * final state (Update semantics, like the Flink job's per-event emit of
    * its ValueState).
    */
  object SpreadEmaMonitor {

    def processGroup(
        symbol: String,
        it: Iterator[SpreadObs],
        state: GroupState[EmaState]): EmaResult = {
      var s = state.getOption.getOrElse(EmaState(Double.NaN, 0L, 0L))
      it.toSeq.sortBy(_.timeMicros).foreach { o =>
        s =
          if (s.n == 0L) EmaState(o.spread, 1L, s.alerts)
          else {
            val alert = o.spread > 3.0 * s.ema
            EmaState(0.9 * s.ema + 0.1 * o.spread, s.n + 1, s.alerts + (if (alert) 1 else 0))
          }
      }
      state.update(s)
      EmaResult(symbol, math.floor(s.ema * 1e6 + 0.5) / 1e6, s.n, s.alerts)
    }

    def monitor(trades: DataFrame): Dataset[EmaResult] = {
      val spark = trades.sparkSession
      import spark.implicits._
      trades
        .filter(col("bid").isNotNull && col("ask").isNotNull)
        .select(unix_micros(col("time")).as("timeMicros"), col("symbol"),
          (col("ask") - col("bid")).as("spread"))
        .as[SpreadObs]
        .groupByKey(_.symbol)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout)(processGroup)
    }
  }
}
