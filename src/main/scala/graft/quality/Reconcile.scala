package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source reconciliation: row-level diff of two feeds that should
  * carry the same data (primary vs backup market-data vendor, raw vs
  * replicated store), rolled up to a per-group report. The reference's
  * pipeline trusts a single feed; a production desk runs exactly this
  * query whenever two sources disagree (the batch analogue of its
  * agg-vs-raw verification join, `sql/smartdb_contract.md` §verify).
  *
  * Shape: ONE full-outer equi-join on the record key (hash shuffle both
  * sides, AQE-skew-splittable) and ONE map-side-combined rollup — row
  * classification is a narrow projection in between. Never a sort, never
  * a window; at 100 TB the cost is the two key shuffles, which is the
  * floor for any row-level diff.
  */
object Reconcile {

  /** Per-`groupCol` reconciliation report. A row is classified
    * `only_a` / `only_b` when the key is absent on the other side,
    * `mismatch` when any compare column differs (null-safe), `match`
    * otherwise.
    */
  def report(
      feedA: DataFrame,
      feedB: DataFrame,
      key: Seq[String],
      groupCol: String,
      compareCols: Seq[String]): DataFrame = {
    val a = feedA.select(
      key.map(col) ++
        (lit(1).as("__in_a") +: col(groupCol).as("__g_a") +:
          compareCols.map(c => col(c).as(s"__a_$c"))): _*)
    val b = feedB.select(
      key.map(col) ++
        (lit(1).as("__in_b") +: col(groupCol).as("__g_b") +:
          compareCols.map(c => col(c).as(s"__b_$c"))): _*)
    val joined = a.join(b, key, "full_outer")
    val differs = compareCols
      .map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
      .reduce(_ || _)
    joined
      .select(
        coalesce(col("__g_a"), col("__g_b")).as(groupCol),
        when(col("__in_b").isNull, "only_a")
          .when(col("__in_a").isNull, "only_b")
          .when(differs, "mismatch")
          .otherwise("match").as("status"))
      .groupBy(groupCol)
      .agg(
        count(when(col("status") === "only_a", 1)).as("n_only_a"),
        count(when(col("status") === "only_b", 1)).as("n_only_b"),
        count(when(col("status") === "mismatch", 1)).as("n_mismatch"),
        count(when(col("status") === "match", 1)).as("n_match"))
  }
}
