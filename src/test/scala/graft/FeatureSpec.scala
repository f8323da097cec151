package graft

import graft.features._
import org.apache.spark.sql.functions._

/** Feature correctness on the deterministic ramp fixture — mirrors the
  * reference's invariants (`tests/test_smartdb_correctness.py:46-192`).
  */
class FeatureSpec extends SparkTestBase {

  test("SMA-20 on the ramp equals the closed-form window mean") {
    // ramp price = 150 + 0.1*i; SMA over last min(i+1,20) rows is the mean of
    // an arithmetic sequence — closed form (150 + 0.1*(first+last)/2).
    val rows = Sma.compute(rampTrades(25)).orderBy("time")
      .select("sma_20").collect().map(_.getDouble(0))
    rows.zipWithIndex.foreach { case (sma, i) =>
      val lo = math.max(0, i - 19)
      val expected = (lo to i).map(j => 150.0 + 0.1 * j).sum / (i - lo + 1)
      assert(math.abs(sma - expected) < 1e-6, s"row $i: $sma vs $expected")
    }
  }

  test("OHLC invariants: high >= low, high >= open/close, volume positive") {
    val bars = Ohlc.compute(core.Tables.trades(spark, sf0001))
    assert(bars.filter(col("high") < col("low")).count() === 0)
    assert(bars.filter(col("high") < col("open") || col("high") < col("close")).count() === 0)
    assert(bars.filter(col("low") > col("open") || col("low") > col("close")).count() === 0)
    assert(bars.filter(col("volume") <= 0).count() === 0)
  }

  test("imbalance is within [-1, 1]") {
    val imb = Imbalance.compute(core.Tables.trades(spark, sf0001))
    assert(imb.filter(col("imbalance") < -1 || col("imbalance") > 1).count() === 0)
  }

  test("volatility is non-negative; vwap positive") {
    val t = core.Tables.trades(spark, sf0001)
    assert(Volatility.compute(t).filter(col("volatility_1h") < 0).count() === 0)
    assert(Vwap.compute(t).filter(col("vwap_5m") <= 0).count() === 0)
  }

  test("regime tags form the {up, down, neutral} domain; first tick is neutral") {
    val r = Regime.compute(rampTrades(25))
    val tags = r.select("regime_tag").distinct().collect().map(_.getString(0)).toSet
    assert(tags.subsetOf(Set("up", "down", "neutral")))
    // On a strictly increasing ramp every tick after the first is 'up'.
    assert(r.orderBy("time").collect().head.getAs[String]("regime_tag") === "neutral")
    assert(r.filter(col("regime_tag") === "down").count() === 0)
  }

  test("EWM-12: single tick = price; two ticks = 0.85*p1 + 0.15*p2") {
    val e = Ewm.compute(rampTrades(2)).orderBy("time").collect()
    assert(math.abs(e(0).getAs[Double]("ewm_12") - 150.0) < 1e-9)
    assert(math.abs(e(1).getAs[Double]("ewm_12") - (0.85 * 150.0 + 0.15 * 150.1)) < 1e-6)
  }

  test("EwmAggregator matches the column-function fold") {
    import org.apache.spark.sql.functions.{udaf => mkUdaf}
    val agg = mkUdaf(new functions.EwmAggregator(12, 0.15))
    val t = core.Tables.trades(spark, sf0001).limit(500)
    val viaAgg = t.groupBy("symbol")
      .agg(agg(unix_micros(col("time")), col("price")).as("ewm"))
    val viaFold = t.groupBy("symbol")
      .agg(sort_array(collect_list(struct(col("time"), col("price")))).as("tp"))
      .select(col("symbol"),
        Ewm.ewmOverArray(expr("slice(transform(tp, x -> x.price), greatest(size(tp) - 11, 1), 12)"))
          .as("ewm"))
    val joined = viaAgg.join(viaFold, "symbol")
      .select(abs(viaAgg("ewm") - viaFold("ewm")).as("d")).agg(max("d")).collect()(0).getDouble(0)
    assert(joined < 1e-9)
  }

  test("large trades all exceed their symbol's Q95 threshold") {
    val lt = LargeTrades.compute(core.Tables.trades(spark, sf0001))
    assert(lt.filter(col("volume") <= col("percentile_95")).count() === 0)
  }
}
