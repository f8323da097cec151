package graft.quality

import graft.functions.Quantize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chi-squared drift test for CATEGORICAL columns — the PSI/KS sibling:
  * has the category distribution shifted between two row populations
  * (here: the first vs second half of the time range)?
  *
  * Engine-portable by construction: cell counts are integers, each
  * expected count is one division, and the statistic folds over the cells
  * in (period, category) order — never a partition-order-dependent SUM.
  * Severity tiers on the QUANTIZED statistic (the KS/PSI discipline) at
  * the dof=1 critical values 3.841 (p=0.05) / 6.635 (p=0.01) — correct
  * for 2-period × 2-category tables like side ∈ {buy, sell}; pass
  * different cutoffs for wider tables.
  *
  * Shape: one keyed count aggregation (map-side combined) over cells
  * bounded by periods × categories, then window marginals over that tiny
  * frame (the unpartitioned windows run on O(cells) rows, not the corpus).
  */
object Chi2Drift {

  def compute(df: DataFrame, timeCol: String, catCol: String,
      warnAt: Double = 3.841, critAt: Double = 6.635): DataFrame = {
    val t = df.filter(col(catCol).isNotNull)
    val bounds = t.agg(
      min(unix_micros(col(timeCol))).as("lo"),
      max(unix_micros(col(timeCol))).as("hi"))
    val cells = t.crossJoin(broadcast(bounds))
      .select(
        when(unix_micros(col(timeCol)) <= col("lo") + (col("hi") - col("lo")) / 2,
          "p1").otherwise("p2").as("period"),
        col(catCol).as("cat"))
      .groupBy("period", "cat").agg(count(lit(1)).as("o"))
    val e: Column =
      sum(col("o")).over(Window.partitionBy("period")).cast("double") *
        sum(col("o")).over(Window.partitionBy("cat")) /
        sum(col("o")).over(Window.partitionBy())
    val terms = cells
      .withColumn("e", e)
      .withColumn("term", (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
    terms
      .agg(
        sort_array(collect_list(struct(col("period"), col("cat"), col("term"))))
          .as("cells"),
        countDistinct(col("period")).as("np"),
        countDistinct(col("cat")).as("ns"))
      .select(
        // empty input (no non-null categories): null chi2, matching SQL
        // aggregate semantics (DuckDB's list() over zero rows is NULL)
        when(size(col("cells")) > 0,
          Quantize.r(aggregate(col("cells"), lit(0.0),
            (acc, c) => acc + c.getField("term")), 6)).as("chi2"),
        ((col("np") - 1) * (col("ns") - 1)).as("dof"))
      .withColumn("severity",
        when(col("chi2") > critAt, "critical")
          .when(col("chi2") > warnAt, "warning")
          .otherwise("ok"))
  }
}
