package graft.quality

import graft.functions.Quantize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov distribution-shift test, distributed:
  * D = max over observed values of |ECDF₁ − ECDF₂|, with the α=0.05
  * large-sample rejection threshold c·sqrt((n₁+n₂)/(n₁·n₂)), c = 1.358,
  * PLUS the asymptotic p-value and the reference's severity tiers.
  *
  * Reference: `src/quality/great_expectations_setup.py:319-340` (scipy
  * `ks_2samp` p-value; severity `critical` at p < 0.01, `warning` at
  * p < 0.05 — `:333-339`).
  *
  * p-value: the Kolmogorov limit distribution (scipy's `mode='asymp'`),
  * p = Q(λ) = 2 Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²} with λ = √(n₁n₂/(n₁+n₂))·D,
  * truncated at k = 100 (terms decay doubly-exponentially; for λ → 0 the
  * truncated alternating sum tends to ½ so 2·sum → 1, the correct limit)
  * and clamped to [0, 1]. The identical truncated series runs in the DuckDB
  * oracle, so `q_ks_test` stays hash-gated end to end.
  *
  * Shape: group by value (exact counts — ECDFs are step functions evaluated
  * after ties), one running-sum window over the distinct-value axis, one
  * final max-agg; the p-value series folds over a single row.
  */
object KsTest {

  /** @param df       input rows
    * @param valueCol numeric sample column
    * @param groupCol 2-valued group label column
    * @param g1,g2    the two group labels to compare
    */
  def dStatistic(df: DataFrame, valueCol: String, groupCol: String,
      g1: String, g2: String): DataFrame = {
    val pts = df
      .filter(col(groupCol).isInCollection(Seq(g1, g2)) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(
        count(when(col(groupCol) === g1, 1)).as("c1"),
        count(when(col(groupCol) === g2, 1)).as("c2"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .select(
        (sum(col("c1")).over(w)).as("r1"), (sum(col("c2")).over(w)).as("r2"),
        sum(col("c1")).over(Window.partitionBy()).as("n1"),
        sum(col("c2")).over(Window.partitionBy()).as("n2"))
      .agg(
        max(abs(col("r1").cast("double") / col("n1").cast("double") -
          col("r2").cast("double") / col("n2").cast("double"))).as("d"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"))
      .select(
        Quantize.r(col("d"), 6).as("d_statistic"),
        col("n1"), col("n2"),
        (col("d") > lit(1.358) *
          sqrt((col("n1") + col("n2")).cast("double") / (col("n1") * col("n2")).cast("double")))
          .as("shifted"),
        pValue(col("d"), col("n1"), col("n2")).as("__p"))
      .select(
        col("d_statistic"), col("n1"), col("n2"), col("shifted"),
        Quantize.r(col("__p"), 6).as("p_value"))
      // severity tiers compare the QUANTIZED p: both engines tier the exact
      // same 1e-6-rounded double, so an ULP difference in exp() between
      // libms cannot flip critical/warning across the oracle boundary
      .withColumn("severity",
        when(col("p_value") < 0.01, "critical")
          .when(col("p_value") < 0.05, "warning")
          .otherwise("ok"))
  }

  /** Asymptotic two-sample KS p-value: Kolmogorov Q(λ), λ = √(n₁n₂/(n₁+n₂))·D,
    * series truncated at k = 100, clamped to [0, 1]. One-row fold — the
    * interpreted higher-order function is off every hot path.
    */
  def pValue(d: Column, n1: Column, n2: Column): Column = {
    val lam = sqrt((n1 * n2).cast("double") / (n1 + n2).cast("double")) * d
    val series = aggregate(
      sequence(lit(1), lit(100)),
      lit(0.0),
      (acc, k) => acc + pow(lit(-1.0), k.cast("double") - 1.0) *
        exp(lit(-2.0) * k.cast("double") * k.cast("double") * lam * lam))
    // For λ → 0 the terms stop decaying within the truncation and the
    // alternating partial sum collapses toward 0 (at λ = 0 it IS 0) — the
    // true Q(λ) there is 1 to far beyond double precision (Q(0.1) ≈
    // 1 − 3e-87), so branch on λ < 0.1. λ is computed by the identical
    // IEEE ops in the DuckDB oracle, so both engines take the same branch.
    when(lam < 0.1, lit(1.0))
      .otherwise(least(lit(1.0), greatest(lit(0.0), lit(2.0) * series)))
  }
}
