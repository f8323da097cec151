package graft.quality

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population Stability Index — the binned drift metric risk teams read
  * alongside the KS test (KS answers "did the distribution shift?", PSI
  * answers "by how much, and where"). PSI = Σ_bins (p−q)·ln(p/q) with the
  * standard tiers: < 0.1 stable, < 0.25 moderate, ≥ 0.25 major.
  *
  * Cross-engine determinism, in order of the tricks that make the hash
  * oracle possible:
  *  - FIXED-WIDTH bins from the global [min, max] (both exact aggregates),
  *    never quantile bins — quantile interpolation is a last-ulp hazard
  *    that flips boundary assignments between engines;
  *  - add-one (Laplace) smoothing, so every proportion is a ratio of
  *    exact integers — both engines divide identical doubles;
  *  - the bin terms are folded IN BIN ORDER via an ordered array fold,
  *    not a float-accumulation-order-dependent SUM aggregate.
  *
  * Shape: one grouped count per bin (map-side combined) + a 1-row extent
  * broadcast; the fold runs over `bins` rows. Empty bins (no rows in
  * either sample) are omitted identically by both engines.
  */
object Psi {

  def psi(df: DataFrame, valueCol: String, groupCol: String,
      g1: String, g2: String, bins: Int = 10): DataFrame = {
    val f = df.filter(col(groupCol).isInCollection(Seq(g1, g2)) && col(valueCol).isNotNull)
    val ext = f.agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
    // coalesce INSIDE least: in the degenerate hi==lo case the division is
    // NULL, and least() skips NULLs in both engines — so the coalesce must
    // run first for every row to land in bin 0 as documented.
    val binned = f.crossJoin(broadcast(ext))
      .select(
        least(lit(bins - 1),
          coalesce(
            floor((col(valueCol) - col("lo")) /
              nullif((col("hi") - col("lo")) / lit(bins.toDouble), lit(0.0))).cast("int"),
            lit(0))).as("bin"),
        col(groupCol).as("g"))
    val counts = binned.groupBy("bin").agg(
      count(when(col("g") === g1, 1)).as("c1"),
      count(when(col("g") === g2, 1)).as("c2"))
    val totals = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val p = (col("c1") + lit(1)).cast("double") / (col("n1") + lit(bins)).cast("double")
    val q = (col("c2") + lit(1)).cast("double") / (col("n2") + lit(bins)).cast("double")
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n1"), col("n2"),
        ((p - q) * log(p / q)).as("term"))
      .agg(
        sort_array(collect_list(struct(col("bin"), col("term")))).as("ts"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"))
      .select(
        Quantize.r(
          aggregate(col("ts"), lit(0.0), (acc, t) => acc + t.getField("term")),
          6).as("psi"),
        col("n1"), col("n2"))
      // tiers compare the QUANTIZED psi so an ULP disagreement in ln()
      // cannot flip the tier across the oracle boundary
      .withColumn("drift",
        when(col("psi") >= 0.25, "major")
          .when(col("psi") >= 0.1, "moderate")
          .otherwise("stable"))
  }
}
