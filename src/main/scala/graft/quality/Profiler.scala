package graft.quality

import graft.functions.Quantize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the schema-level completeness/cardinality
  * summary a dataset lands with before expectations are written against it
  * (the reference profiles tables to seed its expectation suites,
  * `src/quality/great_expectations_setup.py:60-120`).
  *
  * One wide aggregate row computes every column's null count, exact distinct
  * count, and min/max, then unpivots to one row per column. Multiple exact
  * COUNT(DISTINCT) aggregates plan through Catalyst's Expand (input rows
  * duplicated ×|cols| before the hash agg — still a single scan). At the
  * 100 TB tier swap `count_distinct` for `approx_count_distinct` (HLL): the
  * Expand multiplier disappears and the agg state is O(1) per column; exact
  * counts are kept here because the DuckDB oracle hash-checks them.
  *
  * min/max surface as typed pairs (`*_num` for numerics, `*_str` for
  * strings) — min/max of a column is one of its VALUES, no arithmetic, so
  * doubles compare exactly cross-engine with no quantization.
  */
object Profiler {

  /** `cols` maps column name → true if numeric (profiled into `*_num`).
    *
    * Exact form: ONE BRANCH PER COLUMN unioned, not one wide agg. Multiple
    * exact count_distincts in a single aggregate plan through Catalyst's
    * Expand — every input row duplicated ×|cols| through the first hash
    * aggregate (r17 measured 7 columns → a 7× row multiplication stage
    * dominating the query). Per-column branches each read ONE column
    * (parquet-pruned scan), run ONE distinct (two-level hash agg, no
    * Expand), and produce the same row the unpivot produced — branch
    * stages run concurrently under one job. Values are identical: the
    * same exact aggregates, regrouped.
    *
    * Caller contract: the input is scanned ONCE PER COLUMN. A win for a
    * column-pruned parquet scan (each branch reads one column); a caller
    * profiling an EXPENSIVE DERIVED frame pays |cols| recomputes of that
    * subtree and should stage it first (graft.core.Staging.stage) so the
    * branches read stored blocks.
    */
  def profile(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame = {
    val branches = cols.map { case (c, numeric) =>
      df.agg(
        count(lit(1)).as("__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("__nn"),
        count_distinct(col(c)).as("__nd"),
        min(col(c)).as("__min"),
        max(col(c)).as("__max"))
        .select(
          lit(c).as("column"),
          col("__n").as("n_rows"),
          col("__nn").as("n_nulls"),
          Quantize.r(col("__nn").cast("double") / col("__n").cast("double"), 6)
            .as("null_fraction"),
          col("__nd").as("n_distinct"),
          (if (numeric) col("__min").cast("double") else lit(null).cast("double"))
            .as("min_num"),
          (if (numeric) col("__max").cast("double") else lit(null).cast("double"))
            .as("max_num"),
          (if (numeric) lit(null).cast("string") else col("__min").cast("string"))
            .as("min_str"),
          (if (numeric) lit(null).cast("string") else col("__max").cast("string"))
            .as("max_str"))
    }
    branches.reduce(_ unionByName _)
  }

  /** The 100 TB form: `approx_count_distinct` (HLL++, relative error `rsd`)
    * replaces every exact distinct count, so the plan loses the Expand
    * entirely — ONE pass, no ×|cols| input multiplication, O(1) agg state
    * per column (plan-asserted in PlanSpec). Everything else (null counts,
    * fractions, min/max) is computed identically and stays exact.
    */
  def profileApprox(df: DataFrame, cols: Seq[(String, Boolean)],
      rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, cols: Seq[(String, Boolean)],
      distinctAgg: String => Column): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ cols.flatMap {
      case (c, _) =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
          distinctAgg(c).as(s"__nd_$c"),
          min(col(c)).as(s"__min_$c"),
          max(col(c)).as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { case (c, numeric) =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"),
        Quantize.r(col(s"__nn_$c").cast("double") / col("__n").cast("double"), 6)
          .as("null_fraction"),
        col(s"__nd_$c").as("n_distinct"),
        (if (numeric) col(s"__min_$c").cast("double") else lit(null).cast("double"))
          .as("min_num"),
        (if (numeric) col(s"__max_$c").cast("double") else lit(null).cast("double"))
          .as("max_num"),
        (if (numeric) lit(null).cast("string") else col(s"__min_$c").cast("string"))
          .as("min_str"),
        (if (numeric) lit(null).cast("string") else col(s"__max_$c").cast("string"))
          .as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
