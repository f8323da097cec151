package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Event-time-ordered twins of the two arrival-order CEP monitors
  * ([[Cep.SpreadEmaMonitor]], [[Cep.LargeTradeDetector]]) on the
  * `transformWithState` arbitrary-state API.
  *
  * The reference's Flink path is an UNBOUNDED keyed stream
  * (`flink-jobs/market-realtime/anomaly_detection.py:40-149`,
  * `enhanced_anomaly_detection.py:204-305`): state lives forever and events
  * keep arriving. The arrival-order monitors in [[Cep]] are exact only under
  * the single-batch replay contract (loudly asserted in the registry); these
  * processors restore correctness under ANY batching with the shared
  * [[OrderedBuffer]] discipline proven for [[OrderedCusum]]/[[OrderedHampel]]:
  * buffer in `ListState` until the event-time watermark covers a row, fold in
  * (event time, trade_id) order, flush the tail via an event-time timer in
  * the post-advance no-data batch, and count (never fold) arrivals at or
  * below the already-folded bound. State per key is O(rows inside the
  * watermark delay) plus O(1) fold state ([[OrderedSpreadEma]]) or O(window)
  * timestamps ([[OrderedLargeTrades]]) — never O(history).
  */
object OrderedCep {

  // ---------------------------------------------------------------- spread EMA

  final case class SpreadObsT(
      timeMicros: Long, tradeId: String, symbol: String, spread: Double)

  final case class EmaOState(
      ema: Double, n: Long, alerts: Long, foldedUpToMicros: Long, nLate: Long)

  /** One row per key per consuming fold; readers keep the row with max
    * `n_folded + n_late` per key (total consumed is strictly monotone).
    */
  final case class EmaFoldRow(
      symbol: String, normal_spread: Double, n_folded: Long, n_alerts: Long,
      n_late: Long)

  class SpreadEmaProcessor extends StatefulProcessor[String, SpreadObsT, EmaFoldRow] {
    @transient private var st: ValueState[EmaOState] = _
    @transient private var pending: ListState[SpreadObsT] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[EmaOState](
        "ema", Encoders.product[EmaOState], TTLConfig.NONE)
      pending = getHandle.getListState[SpreadObsT](
        "pending", Encoders.product[SpreadObsT], TTLConfig.NONE)
    }

    private def foldRipe(symbol: String, wmMs: Long): Iterator[EmaFoldRow] = {
      val s0 =
        if (st.exists()) st.get()
        else EmaOState(Double.NaN, 0L, 0L, Long.MinValue, 0L)
      val c = OrderedBuffer.consume[SpreadObsT](
        pending, wmMs, s0.foldedUpToMicros, _.timeMicros, _.tradeId)
      if (!c.consumedAny) Iterator.empty
      else {
        var ema = s0.ema; var n = s0.n; var alerts = s0.alerts
        c.ripe.foreach { o =>
          if (n == 0L) { ema = o.spread; n = 1L }
          else {
            if (o.spread > 3.0 * ema) alerts += 1L
            ema = 0.9 * ema + 0.1 * o.spread
            n += 1L
          }
        }
        val s = EmaOState(ema, n, alerts,
          math.max(s0.foldedUpToMicros, c.ripeBound), s0.nLate + c.nLate)
        st.update(s)
        Iterator.single(EmaFoldRow(symbol,
          math.floor(s.ema * 1e6 + 0.5) / 1e6, s.n, s.alerts, s.nLate))
      }
    }

    override def handleInputRows(
        symbol: String,
        rows: Iterator[SpreadObsT],
        timerValues: TimerValues): Iterator[EmaFoldRow] = {
      val arr = rows.toArray
      if (arr.nonEmpty) pending.appendList(arr)
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1L)
      foldRipe(symbol, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        symbol: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[EmaFoldRow] =
      foldRipe(symbol, timerValues.getCurrentWatermarkInMs())
  }

  /** Ordered keyed EMA(α=0.1) of the bid-ask spread over a streaming trades
    * frame — [[Cep.SpreadEmaMonitor]]'s recursion, exact under any batch
    * split. `delay` is the allowed event-time disorder across batches.
    */
  def spreadEma(trades: DataFrame, delay: String = "0 seconds"): Dataset[EmaFoldRow] = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .filter(col("bid").isNotNull && col("ask").isNotNull)
      .withWatermark("time", delay)
      .select(unix_micros(col("time")).as("timeMicros"),
        col("trade_id").as("tradeId"), col("symbol"),
        (col("ask") - col("bid")).as("spread"))
      .as[SpreadObsT]
      .groupByKey(_.symbol)
      .transformWithState(
        new SpreadEmaProcessor, TimeMode.EventTime(), OutputMode.Update(),
        Encoders.product[EmaFoldRow])
  }

  /** Last emission per key from a spread-EMA replay dump. */
  def lastSpreadEmaRows(dump: DataFrame): DataFrame =
    dump.groupBy("symbol")
      .agg(max_by(
        struct(col("normal_spread"), col("n_folded"), col("n_alerts"),
          col("n_late")),
        col("n_folded") + col("n_late")).as("r"))
      .select(col("symbol"), col("r.normal_spread"), col("r.n_folded"),
        col("r.n_alerts"), col("r.n_late"))

  // ------------------------------------------------------------ large trades

  final case class LtObsT(
      timeMicros: Long, tradeId: String, symbol: String, volume: Double)

  final case class LtOState(
      times: Seq[Long], foldedUpToMicros: Long, nLate: Long)

  /** Append-mode anomaly rows — each emission is final (no max_by needed);
    * `n_late` is the key's cumulative dropped-late count at emission time.
    */
  final case class LtAnomalyRow(
      timeMicros: Long, symbol: String, large_trades_5m: Long, n_late: Long)

  class LargeTradesProcessor(windowMicros: Long)
      extends StatefulProcessor[String, LtObsT, LtAnomalyRow] {
    @transient private var st: ValueState[LtOState] = _
    @transient private var pending: ListState[LtObsT] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[LtOState](
        "lt", Encoders.product[LtOState], TTLConfig.NONE)
      pending = getHandle.getListState[LtObsT](
        "pending", Encoders.product[LtObsT], TTLConfig.NONE)
    }

    private def foldRipe(symbol: String, wmMs: Long): Iterator[LtAnomalyRow] = {
      val s0 =
        if (st.exists()) st.get() else LtOState(Vector.empty, Long.MinValue, 0L)
      val c = OrderedBuffer.consume[LtObsT](
        pending, wmMs, s0.foldedUpToMicros, _.timeMicros, _.tradeId)
      if (!c.consumedAny) Iterator.empty
      else {
        val nLate = s0.nLate + c.nLate
        var buf = s0.times.toVector
        val out = Vector.newBuilder[LtAnomalyRow]
        c.ripe.foreach { o =>
          buf = buf.filter(_ >= o.timeMicros - windowMicros) :+ o.timeMicros
          if (buf.size >= 3)
            out += LtAnomalyRow(o.timeMicros, symbol, buf.size.toLong, nLate)
        }
        st.update(LtOState(buf,
          math.max(s0.foldedUpToMicros, c.ripeBound), nLate))
        out.result().iterator
      }
    }

    override def handleInputRows(
        symbol: String,
        rows: Iterator[LtObsT],
        timerValues: TimerValues): Iterator[LtAnomalyRow] = {
      val arr = rows.toArray
      if (arr.nonEmpty) pending.appendList(arr)
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1L)
      foldRipe(symbol, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        symbol: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[LtAnomalyRow] =
      foldRipe(symbol, timerValues.getCurrentWatermarkInMs())
  }

  /** Ordered ">= 3 large trades within the window" pattern over a streaming
    * frame already filtered to large trades ([[Cep.LargeTradeDetector]]
    * semantics, exact under any batch split).
    */
  def largeTrades(largeTradeStream: DataFrame, windowMicros: Long,
      delay: String = "0 seconds"): Dataset[LtAnomalyRow] = {
    val spark = largeTradeStream.sparkSession
    import spark.implicits._
    largeTradeStream
      .withWatermark("time", delay)
      .select(unix_micros(col("time")).as("timeMicros"),
        col("trade_id").as("tradeId"), col("symbol"), col("volume"))
      .as[LtObsT]
      .groupByKey(_.symbol)
      .transformWithState(
        new LargeTradesProcessor(windowMicros), TimeMode.EventTime(),
        OutputMode.Update(), Encoders.product[LtAnomalyRow])
  }
}
