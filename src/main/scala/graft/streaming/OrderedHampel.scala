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
        // The single-batch AvailableNow replay drains the whole corpus in
        // one fold, so the per-row frame work runs on primitive arrays
        // (zero allocation, same nearest-rank arithmetic) — three Vector
        // sorts per row was the GC-bound superlinear term at 10x scale.
        val ring = new Array[Double](N) // trailing frame, oldest..newest
        var winLen = 0
        s0.window.foreach { p => ring(winLen) = p; winLen += 1 }
        val scratch = new Array[Double](N)
        val out = Vector.newBuilder[CleanRow]
        c.ripe.foreach { o =>
          if (winLen < N) { ring(winLen) = o.price; winLen += 1 }
          else { System.arraycopy(ring, 1, ring, 0, N - 1); ring(N - 1) = o.price }
          val m = winLen // frame INCLUDES the raw observed price
          val mid = math.ceil(m / 2.0).toInt - 1
          System.arraycopy(ring, 0, scratch, 0, m)
          java.util.Arrays.sort(scratch, 0, m)
          val med = scratch(mid)
          var i = 0
          while (i < m) { scratch(i) = math.abs(ring(i) - med); i += 1 }
          java.util.Arrays.sort(scratch, 0, m)
          val mad = scratch(mid)
          val outlier = math.abs(o.price - med) > K * mad
          out += CleanRow(symbol, o.timeMicros, o.price, med, outlier,
            if (outlier) med else o.price, nLate)
        }
        val keep = math.min(winLen, N - 1)
        st.update(HState(
          java.util.Arrays.copyOfRange(ring, winLen - keep, winLen).toSeq,
          math.max(s0.foldedUpToMicros, c.ripeBound), nLate))
        out.result().iterator
      }
    }

    override def handleInputRows(
        symbol: String,
        rows: Iterator[PriceObs],
        timerValues: TimerValues): Iterator[CleanRow] = {
      val arr = rows.toArray
      if (arr.nonEmpty) pending.appendList(arr)
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
