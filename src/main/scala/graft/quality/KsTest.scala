package graft.quality

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov distribution-shift test, distributed:
  * D = max over observed values of |ECDF₁ − ECDF₂|, with the α=0.05
  * large-sample rejection threshold c·sqrt((n₁+n₂)/(n₁·n₂)), c = 1.358.
  *
  * Reference: `src/quality/great_expectations_setup.py:319-340` (scipy
  * `ks_2samp`, reject at p < 0.05 — equivalent to D above the threshold).
  *
  * Shape: group by value (exact counts — ECDFs are step functions evaluated
  * after ties), one running-sum window over the distinct-value axis, one
  * final max-agg. All integer counts and identical-order divisions, so the
  * result matches any engine bit-for-bit.
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
          .as("shifted"))
  }
}
