package graft.streaming

import graft.streaming.Cep.{CusumMonitor, CusumObs}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Event-time-ORDERED CUSUM monitor on the `transformWithState` arbitrary-
  * state API (Spark 4.x) — the ordering-tolerant form of
  * [[Cep.CusumMonitor]].
  *
  * The plain monitor folds in arrival order across micro-batches, so its
  * ordering contract holds only for single-batch replays. This processor
  * restores the contract under ANY batching: observations buffer in
  * `ListState` until the event-time watermark passes them, then fold in
  * (event time, trade_id) order. The watermark delay is the disorder
  * tolerance, and state is O(rows inside the delay window) per key, not
  * O(history).
  *
  * Late-row discipline is enforced IN the processor: `groupByKey` strips
  * the event-time metadata column, so Spark's own stateful-operator late
  * filtering never sees these rows — the state therefore carries
  * `foldedUpToMicros` (the last watermark-covered microsecond already
  * folded) and any arrival at or below it is counted in `n_late` and
  * dropped, never folded out of order. Watermarks are millisecond-granular,
  * so ripeness is judged against the last covered whole millisecond
  * (wm·1000 + 999 μs): same-millisecond observations fold together when
  * they arrive together, and a straggler into an already-folded
  * millisecond is late by construction.
  *
  * Mechanics: each batch appends its rows and folds the prefix the CURRENT
  * watermark already covers; a timer registered at watermark+1 ms makes the
  * post-advance no-data batch flush the remainder (with delay 0 that is the
  * entire tail, so a bounded replay ends fully folded — same final rows as
  * the batch oracle). Emits one row per key per consuming fold; readers
  * keep the row with max `n_folded + n_late` per key (total consumed is
  * strictly monotone per emission; the bounded-replay harness does exactly
  * that).
  */
object OrderedCusum {

  final case class OState(
      pos: Double, neg: Double, alerts: Long, foldedUpToMicros: Long,
      n: Long, nLate: Long)

  final case class FoldRow(
      symbol: String, cusum_pos: Double, cusum_neg: Double, n_alerts: Long,
      n_folded: Long, n_late: Long)

  class Processor extends StatefulProcessor[String, CusumObs, FoldRow] {
    @transient private var st: ValueState[OState] = _
    @transient private var pending: ListState[CusumObs] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[OState](
        "cusum", Encoders.product[OState], TTLConfig.NONE)
      pending = getHandle.getListState[CusumObs](
        "pending", Encoders.product[CusumObs], TTLConfig.NONE)
    }

    private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

    /** Consume every buffered observation the watermark covers — fold the
      * in-order ones, count the late ones (shared [[OrderedBuffer]]
      * mechanics) — and emit the new state when anything was consumed.
      */
    private def foldRipe(symbol: String, wmMs: Long): Iterator[FoldRow] = {
      val s0 =
        if (st.exists()) st.get()
        else OState(0.0, 0.0, 0L, Long.MinValue, 0L, 0L)
      val c = OrderedBuffer.consume[CusumObs](
        pending, wmMs, s0.foldedUpToMicros, _.timeMicros, _.tradeId)
      if (!c.consumedAny) Iterator.empty
      else {
        var pos = s0.pos; var neg = s0.neg; var alerts = s0.alerts; var n = s0.n
        c.ripe.foreach { o =>
          pos = math.max(0.0, pos + o.z - CusumMonitor.Slack)
          neg = math.max(0.0, neg - o.z - CusumMonitor.Slack)
          if (pos > CusumMonitor.Threshold || neg > CusumMonitor.Threshold)
            alerts += 1L
          n += 1L
        }
        val s = OState(pos, neg, alerts,
          math.max(s0.foldedUpToMicros, c.ripeBound), n, s0.nLate + c.nLate)
        st.update(s)
        Iterator.single(FoldRow(symbol, q6(s.pos), q6(s.neg), s.alerts, s.n,
          s.nLate))
      }
    }

    override def handleInputRows(
        symbol: String,
        rows: Iterator[CusumObs],
        timerValues: TimerValues): Iterator[FoldRow] = {
      val arr = rows.toArray
      if (arr.nonEmpty) pending.appendList(arr)
      // fire on the first batch where the watermark has advanced past the
      // current one — the no-data batch after the final file flushes the tail
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1L)
      foldRipe(symbol, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        symbol: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FoldRow] =
      foldRipe(symbol, timerValues.getCurrentWatermarkInMs())
  }

  /** Apply over a streaming frame carrying (time, trade_id, symbol, z).
    * `delay` is the allowed event-time disorder ACROSS batches; rows
    * arriving below the already-folded watermark bound surface in `n_late`
    * and never perturb the fold.
    */
  def monitor(obs: DataFrame, delay: String = "0 seconds"): Dataset[FoldRow] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .withWatermark("time", delay)
      .select(unix_micros(col("time")).as("timeMicros"),
        col("trade_id").as("tradeId"), col("symbol"), col("z"))
      .as[CusumObs]
      .groupByKey(_.symbol)
      .transformWithState(
        new Processor, TimeMode.EventTime(), OutputMode.Update(),
        Encoders.product[FoldRow])
  }
}
