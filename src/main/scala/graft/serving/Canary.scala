package graft.serving

import graft.functions.Quantize
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shadow/canary model evaluation — the reference's Triton canary analysis
  * (`src/serving/triton_canary.py:60-110`, rollback rules at
  * `ARCHITECTURE.md:70-79`): two models score the same tick stream, a
  * trading simulation turns each signal series into PnL, and the deployment
  * decision compares PnL difference and p95 latency against the rollback
  * thresholds (|ΔPnL| > 10 % or canary p95 > 1.2× baseline ⇒ reject).
  *
  * The PnL simulation (`triton_canary.py:_simulate_trades:78-96`) is
  * genuinely sequential — position depends on every prior signal — so it
  * runs as a secondary-sort `mapPartitions` fold: hash-partition by symbol,
  * sort partitions by (symbol, time, trade_id), stream rows with O(1) state
  * per symbol (never a per-group array — the fold state is two
  * (pnl, position) pairs). Prices fold as exact 1e6-scaled BIGINT quanta
  * and signals as {-1,0,1} of the QUANTIZED price-vs-SMA difference, so
  * the whole simulation is integer-exact and the DuckDB oracle replays it
  * bit for bit.
  */
object Canary {

  final case class Tick(symbol: String, timeMicros: Long, tradeId: String,
      pi: Long, pb: Int, pc: Int)
  final case class Pnl(symbol: String, pnlBaseQ: Long, pnlCanaryQ: Long)

  /** Reference simulation, two models at once: act on every signal EXCEPT
    * the symbol's last tick (`range(len - 1)`), buy at the tick price, sell
    * only while holding, close the residual position at the last price.
    */
  private def simulate(it: Iterator[Tick]): Iterator[Pnl] = new Iterator[Pnl] {
    private var pending: Option[Pnl] = None
    private var prev: Tick = _
    private var pnlB, posB, pnlC, posC = 0L

    private def act(t: Tick): Unit = {
      if (t.pb > 0) { posB += 1; pnlB -= t.pi }
      else if (t.pb < 0 && posB > 0) { posB -= 1; pnlB += t.pi }
      if (t.pc > 0) { posC += 1; pnlC -= t.pi }
      else if (t.pc < 0 && posC > 0) { posC -= 1; pnlC += t.pi }
    }
    private def close(): Pnl = {
      val r = Pnl(prev.symbol, pnlB + prev.pi * posB, pnlC + prev.pi * posC)
      pnlB = 0; posB = 0; pnlC = 0; posC = 0
      r
    }
    private def advance(): Unit = {
      while (pending.isEmpty && it.hasNext) {
        val t = it.next()
        if (prev == null) prev = t
        else if (prev.symbol == t.symbol) { act(prev); prev = t }
        else { pending = Some(close()); prev = t }
      }
      if (pending.isEmpty && prev != null) { pending = Some(close()); prev = null }
    }
    def hasNext: Boolean = { advance(); pending.isDefined }
    def next(): Pnl = { advance(); val r = pending.get; pending = None; r }
  }

  /** The distributed simulation pass: co-locate each symbol, secondary-sort
    * the partition, stream the fold. (Also the unit-test seam.)
    */
  private[graft] def simulateForTest(ticks: Dataset[Tick]): Dataset[Pnl] =
    runSimulation(ticks)

  private def runSimulation(ticks: Dataset[Tick]): Dataset[Pnl] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.repartition(col("symbol"))
      .sortWithinPartitions("symbol", "timeMicros", "tradeId")
      .mapPartitions(simulate)
  }

  /** Per-symbol canary report over the tick stream: PnL of the baseline
    * (price vs SMA-20 regime) and canary (price vs SMA-5 — the
    * faster-reacting challenger) signals, latency p95 per serving arm, and
    * the promote/reject decision under the reference thresholds.
    */
  def evaluate(trades: DataFrame): DataFrame = {
    val spark = trades.sparkSession
    import spark.implicits._

    val ord = Window.partitionBy("symbol").orderBy("time", "trade_id")
    val w20 = ord.rowsBetween(-19, 0)
    val w5 = ord.rowsBetween(-4, 0)
    val ticks = trades.select(
        col("symbol"),
        unix_micros(col("time")).as("timeMicros"),
        col("trade_id").as("tradeId"),
        Quantize.i(col("price")).as("pi"),
        signum(Quantize.r(col("price") - avg(col("price")).over(w20), 6))
          .cast("int").as("pb"),
        signum(Quantize.r(col("price") - avg(col("price")).over(w5), 6))
          .cast("int").as("pc"))
      .as[Tick]

    val pnl = runSimulation(ticks).toDF()

    // deterministic per-arm serving latencies (ms): the reference records
    // real Triton timings; this sandbox derives them from the event id so
    // the oracle can reproduce the percentile inputs exactly. Aggregated
    // from the ticks frame, not a second trades scan — the window pass
    // already partitioned by symbol, so this groupBy adds no Exchange.
    val eid = col("tradeId").cast("long")
    val lat = ticks
      .groupBy("symbol")
      .agg(
        Quantize.r(percentile((lit(50) + eid % 20).cast("double"),
          lit(0.95)), 6).as("baseline_latency_p95"),
        Quantize.r(percentile((lit(55) + eid % 25).cast("double"),
          lit(0.95)), 6).as("canary_latency_p95"))

    val pnlB = col("pnlBaseQ").cast("double") / lit(1e6)
    val pnlC = col("pnlCanaryQ").cast("double") / lit(1e6)
    // |baseline| < 0.01 guards the ratio like triton_canary.py:72-74
    val diffPct = when(abs(pnlB) < lit(0.01), lit(0.0))
      .otherwise(Quantize.r(lit(100.0) * (pnlC - pnlB) / abs(pnlB), 6))
    pnl.join(lat, Seq("symbol"))
      .select(col("symbol"),
        Quantize.r(pnlB, 6).as("baseline_pnl"),
        Quantize.r(pnlC, 6).as("canary_pnl"),
        diffPct.as("pnl_diff_pct"),
        col("baseline_latency_p95"), col("canary_latency_p95"),
        Quantize.r(lit(100.0) *
          (col("canary_latency_p95") - col("baseline_latency_p95")) /
          col("baseline_latency_p95"), 6).as("latency_increase_pct"))
      .withColumn("status",
        when(abs(col("pnl_diff_pct")) > 10.0 ||
          col("canary_latency_p95") > col("baseline_latency_p95") * lit(1.2),
          "reject").otherwise("promote"))
  }
}
