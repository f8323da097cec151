package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Event-time-ordered STREAMING Hampel filter on `transformWithState` —
  * in-flight tick cleaning with the exact semantics of the batch
  * [[graft.features.Risk.hampel]] (trailing-21 rolling median/MAD repair),
  * so a bounded replay produces the identical rows and `q_stream_hampel`
  * shares `q_hampel`'s DuckDB oracle: the streaming/batch equivalence
  * invariant applied to a data-cleaning operator.
  *
  * Same ordering discipline as [[OrderedCusum]] (the shared
  * [[OrderedBuffer]] mechanics): rows buffer in `ListState` until the
  * event-time watermark covers them, fold in (time, trade_id) order, a
  * timer flushes the tail in the post-advance no-data batch, and an
  * arrival at or below the already-folded bound is dropped (it can no
  * longer be cleaned in order) rather than folded wrong. State per key:
  * the pending buffer (O(rows in the watermark delay)) plus the trailing
  * n−1 prices — bounded, never O(history).
  */
object OrderedHampel {

  val N = 21
  val K = 3.0 * 1.4826

  final case class PriceObs(
      timeMicros: Long, tradeId: String, symbol: String, price: Double)

  final case class HState(
      window: Seq[Double], foldedUpToMicros: Long, nLate: Long)

  /** `n_late` is the key's cumulative dropped-late count AT EMISSION TIME —
    * a row arriving below the folded bound can no longer be cleaned in
    * order, so it is dropped, but the loss stays OBSERVABLE in every
    * subsequent output row (0 throughout an in-order replay, which is what
    * the shared batch oracle asserts).
    */
  final case class CleanRow(
      symbol: String, timeMicros: Long, price: Double, med: Double,
      is_outlier: Boolean, cleaned: Double, n_late: Long)

  /** Nearest-rank pick at ceil(m/2) from the sorted frame — the identical
    * index arithmetic the batch operator and the DuckDB oracle use.
    */
  private def rankMid(sorted: Array[Double]): Double =
    sorted(math.ceil(sorted.length / 2.0).toInt - 1)

  class Processor extends StatefulProcessor[String, PriceObs, CleanRow] {
    @transient private var st: ValueState[HState] = _
    @transient private var pending: ListState[PriceObs] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[HState](
        "hampel", Encoders.product[HState], TTLConfig.NONE)
      pending = getHandle.getListState[PriceObs](
        "pending", Encoders.product[PriceObs], TTLConfig.NONE)
    }

    private def foldRipe(symbol: String, wmMs: Long): Iterator[CleanRow] = {
      val s0 =
        if (st.exists()) st.get() else HState(Vector.empty, Long.MinValue, 0L)
      val c = OrderedBuffer.consume[PriceObs](
        pending, wmMs, s0.foldedUpToMicros, _.timeMicros, _.tradeId)
      if (!c.consumedAny) Iterator.empty
      else {
        val nLate = s0.nLate + c.nLate
        var win = s0.window.toVector
        val out = Vector.newBuilder[CleanRow]
        c.ripe.foreach { o =>
          val frame = (win :+ o.price).takeRight(N)
          val med = rankMid(frame.sorted.toArray)
          val mad = rankMid(frame.map(x => math.abs(x - med)).sorted.toArray)
          val outlier = math.abs(o.price - med) > K * mad
          out += CleanRow(symbol, o.timeMicros, o.price, med, outlier,
            if (outlier) med else o.price, nLate)
          win = frame // the trailing window INCLUDES the raw observed price
        }
        st.update(HState(win.takeRight(N - 1),
          math.max(s0.foldedUpToMicros, c.ripeBound), nLate))
        out.result().iterator
      }
    }

    override def handleInputRows(
        symbol: String,
        rows: Iterator[PriceObs],
        timerValues: TimerValues): Iterator[CleanRow] = {
      rows.foreach(pending.appendValue)
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1L)
      foldRipe(symbol, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        symbol: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[CleanRow] =
      foldRipe(symbol, timerValues.getCurrentWatermarkInMs())
  }

  /** Apply over a streaming trades frame; `delay` is the allowed
    * event-time disorder across batches.
    */
  def clean(trades: DataFrame, delay: String = "0 seconds"): Dataset[CleanRow] = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .withWatermark("time", delay)
      .select(unix_micros(col("time")).as("timeMicros"),
        col("trade_id").as("tradeId"), col("symbol"), col("price"))
      .as[PriceObs]
      .groupByKey(_.symbol)
      .transformWithState(
        new Processor, TimeMode.EventTime(), OutputMode.Update(),
        Encoders.product[CleanRow])
  }
}
