package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of EWM-N: keeps the N most recent (time, price)
  * pairs and folds them ascending with `s = (1-α)s + αp` — the reference's
  * `calculate_ewm_12` contract (`sql/timescaledb_schema.sql:103-138`,
  * spec `sql/smartdb_contract.md:49-55`; spec semantics per SURVEY §7.4).
  *
  * Registered via `functions.udaf(...)` this is usable from SQL
  * (`SELECT ewm_12(epoch_us(time), price) ... GROUP BY symbol`). The buffer
  * is bounded (≤ N pairs), so partial aggregation and shuffle-side merge
  * stay O(N) per group — safe for any group cardinality. The column-function
  * twin ([[graft.features.Ewm.ewmOverArray]]) is preferred inside plans
  * (whole-stage codegen); this Aggregator is the typed/programmatic API.
  *
  * Input: (epoch-micros, price). Output: the EWM, or NaN for an empty group
  * (unreachable through groupBy, which only creates non-empty groups).
  */
class EwmAggregator(n: Int = 12, alpha: Double = 0.15)
    extends Aggregator[(Long, Double), List[(Long, Double)], Double] {

  override def zero: List[(Long, Double)] = Nil

  private def keepLatest(xs: List[(Long, Double)]): List[(Long, Double)] = {
    val sorted = xs.sortBy(_._1)
    if (sorted.size > n) sorted.drop(sorted.size - n) else sorted
  }

  override def reduce(buf: List[(Long, Double)], x: (Long, Double)): List[(Long, Double)] =
    keepLatest(x :: buf)

  override def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    keepLatest(a ++ b)

  override def finish(buf: List[(Long, Double)]): Double = buf match {
    case Nil => Double.NaN
    case head :: tail =>
      tail.foldLeft(head._2)((acc, x) => (1.0 - alpha) * acc + alpha * x._2)
  }

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    Encoders.kryo[List[(Long, Double)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
