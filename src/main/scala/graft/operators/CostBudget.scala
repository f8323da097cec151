package graft.operators

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cost-budget monitoring as a query — the reference's budget monitor
  * (`src/cost/cost_budget.py:17-97`: per-component cost breakdown, monthly
  * budget, utilization %, violation flag, and the enforcement actions a
  * violation triggers — scale down compute, push storage to a colder tier).
  *
  * The engine form: metered cost LINES (component, cost) roll up against a
  * budget in one pass — each line annotated with its share, the total's
  * budget utilization, the violation flag, and the reference's enforcement
  * action for its component class. Cross-engine discipline: meter rates
  * should be exact binary fractions (0.5, 0.25, …) so `usage × rate` and
  * every rollup sum stay EXACT doubles — order-independent without any
  * ordered fold, the same trick as the scaled-integer moment sums.
  *
  * Scale shape: cost lines are O(components) (a bounded config-sized
  * frame); the rollup is a single window over that frame, upstream metering
  * aggregations are plain map-side-combined counts/sums over the corpus.
  */
object CostBudget {

  /** Annotate cost lines `(component, clazz, cost)` with share, budget
    * utilization, violation, and enforcement action. `clazz` is the
    * component class the action table keys on: "compute" scales down,
    * "storage" tiers to cold, anything else holds.
    */
  def evaluate(lines: DataFrame, monthlyBudget: Double): DataFrame = {
    val all = Window.partitionBy(lit(1))
    val total = sum(col("cost")).over(all)
    val violated = total > lit(monthlyBudget)
    lines.select(
        col("component"), col("clazz"),
        Quantize.r(col("cost"), 6).as("cost"),
        Quantize.r(lit(100.0) * col("cost") / total, 6).as("share_pct"),
        Quantize.r(total, 6).as("total_cost"),
        lit(monthlyBudget).as("budget"),
        Quantize.r(lit(100.0) * total / lit(monthlyBudget), 6)
          .as("utilization_pct"),
        violated.as("violated"),
        Quantize.r(lit(monthlyBudget) - total, 6).as("remaining"))
      .withColumn("action",
        when(!col("violated"), "none")
          .when(col("clazz") === "compute", "scale_down")
          .when(col("clazz") === "storage", "tier_to_glacier")
          .otherwise("hold"))
  }

  /** Meter the corpus into cost lines with exact binary-fraction rates:
    * per-event-type ingest/compute cost and per-source document storage
    * cost — the sandbox analogue of the reference's cost breakdown
    * (`cost_budget.py:33-42` keys: streaming, compute, storage tiers).
    */
  def meterCorpus(events: DataFrame, documents: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // exact binary-fraction $ rates: count × rate is an exact double
    val eventRates = Seq(
      ("purchase", 0.5), ("click", 0.25), ("view", 0.125),
      ("error", 1.0), ("signup", 0.25))
      .toDF("event_type", "rate")
    val ingest = events
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .join(broadcast(eventRates), Seq("event_type"), "left")
      .select(
        concat(lit("ingest_"), col("event_type")).as("component"),
        lit("compute").as("clazz"),
        (col("n").cast("double") * coalesce(col("rate"), lit(0.25))).as("cost"))
    // 2^-12 $ per char: sums of n_chars × 2^-12 are exact binary doubles
    val storage = documents
      .groupBy("source").agg(sum(col("n_chars")).as("chars"))
      .select(
        concat(lit("store_"), col("source")).as("component"),
        lit("storage").as("clazz"),
        (col("chars").cast("double") * lit(0.000244140625)).as("cost"))
    ingest.unionByName(storage)
  }
}
