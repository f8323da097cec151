package graft.quality

import graft.core.FeatureSnapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Freshness-SLA enforcement — the Spark analogue of the reference's
  * per-feature SLA map and pydantic freshness validators
  * (`src/features/smartdb_contract.py:115-171`, `src/config/settings.py:60-66`,
  * rejection behavior `smartdb_contract.py:35-107`).
  *
  * Ages are measured against a deterministic corpus anchor (newest event
  * time), never wall-clock — event-time discipline per SURVEY §7.4 item 7.
  */
object Sla {

  /** The contract SLA table (seconds), `src/config/settings.py:60-66`. */
  val ContractSlas: Map[String, Long] = Map(
    "ohlc_1m" -> 30, "sma_20" -> 120, "ewm_12" -> 120, "volatility_1h" -> 120,
    "vwap_5m" -> 30, "large_trade_flag" -> 30, "bidask_spread" -> 1,
    "trade_imbalance_5m" -> 30, "regime_tag" -> 60, "news_sentiment" -> 300)

  final case class Violation(feature: String, ageMicros: Long, slaMicros: Long)

  /** Rows from an ages frame (feature, age_micros) that exceed their SLA. */
  def violations(ages: DataFrame, slas: Map[String, Long] = ContractSlas): DataFrame = {
    val slaCol = slas.foldLeft(lit(null).cast("long")) { case (acc, (k, v)) =>
      when(col("feature") === k, lit(v * 1000000L)).otherwise(acc)
    }
    ages
      .withColumn("sla_micros", slaCol)
      .filter(col("sla_micros").isNotNull && col("age_micros") > col("sla_micros"))
  }

  /** Programmatic guard: accept a snapshot only when every present feature is
    * fresh enough — `Either[Violation, Snapshot]` like the reference's
    * validator layer.
    */
  def validate(
      snapshot: FeatureSnapshot,
      ages: Map[String, Long],
      slas: Map[String, Long] = ContractSlas): Either[Violation, FeatureSnapshot] =
    ages.collectFirst {
      case (feature, age) if slas.get(feature).exists(s => age > s * 1000000L) =>
        Violation(feature, age, slas(feature) * 1000000L)
    } match {
      case Some(v) => Left(v)
      case None    => Right(snapshot)
    }
}
