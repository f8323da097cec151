package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-filled bucket grids — the TimescaleDB `time_bucket_gapfill(...)`
  * surface with its two fill modes, `locf(...)` and `interpolate(...)` (not
  * exercised by the reference's own schema, but part of the Timescale
  * feature set its users reach for the moment a chart needs a dense series
  * from sparse ticks).
  *
  * Shape (both modes): ONE `lead(bucket)` window pass over the SPARSE bars
  * gives each bar the half-open range it owns `[bucket, next_bucket)`; a
  * narrow `sequence` + `explode` then emits every grid bucket in that range
  * carrying the bar's values — the fill falls out of the ownership ranges
  * with no join and no second shuffle over the dense output. Cost: one
  * (shuffle + sort) of the sparse input + O(output) narrow explode. The
  * earlier join-the-grid design paid two shuffles of the DENSE grid and
  * benched 14.6 s at sf0.1; this one is the same rows for ~1/10 the wall.
  *
  * Semantics note: gap rows derive from whole neighboring rows (LOCF
  * inherits ALL of the previous observed row's `valueCols`; interpolate
  * blends previous and next); an explicit null in an observed bar is
  * emitted as-is, not skipped per-column. Aggregated bars never contain
  * nulls, so the two readings coincide on every producer in this engine.
  */
object GapFill {

  /** The shared grid expansion: attach `__orig` (bucket micros), `__next`
    * (next bar's bucket micros via one window pass — plus `__n_<c>` lead
    * values for each of `leadValueCols`), `__end` (last owned grid slot),
    * and explode `__bm` over `[__orig, __end]`. `greatest()` guards
    * mis-aligned inputs from producing a negative-length sequence.
    */
  private def densify(
      bars: DataFrame,
      micros: Long,
      keyCol: String,
      bucketCol: String,
      leadValueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
    bars
      .withColumn("__orig", unix_micros(col(bucketCol)))
      .select(col("*") +: (lead(col("__orig"), 1).over(w).as("__next") +:
        leadValueCols.map(c => lead(col(c), 1).over(w).as(s"__n_$c"))): _*)
      .withColumn("__end",
        greatest(coalesce(col("__next") - lit(micros), col("__orig")), col("__orig")))
      .withColumn("__bm", explode(sequence(col("__orig"), col("__end"), lit(micros))))
  }

  /** Densify `bars` to every `bucketSec` bucket between each key's first and
    * last bucket, carrying `valueCols` forward over the gaps
    * (last-observation-carried-forward). Adds a `filled` flag marking
    * synthesized rows. Buckets must be distinct per key and aligned to a
    * common `bucketSec` grid (any `window`/`time_bucket` aggregate output
    * qualifies).
    */
  def locf(
      bars: DataFrame,
      bucketSec: Long,
      valueCols: Seq[String],
      keyCol: String = "symbol",
      bucketCol: String = "bucket"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    densify(bars, bucketSec * 1000000L, keyCol, bucketCol, Nil).select(
      Seq(col(keyCol), timestamp_micros(col("__bm")).as(bucketCol)) ++
        valueCols.map(col) :+
        (col("__bm") =!= col("__orig")).as("filled"): _*)
  }

  /** Densify like [[locf]] but LINEARLY INTERPOLATE `valueCols` across each
    * gap — TimescaleDB's `interpolate()` mode. The one `lead` pass also
    * carries the NEXT bar's values, so every synthesized row computes
    * `v + (next_v - v) * gap_fraction` locally. All arithmetic is plain
    * IEEE double ops in a fixed order, so a SQL oracle evaluating the same
    * tree reproduces the values bit for bit (quantize downstream with
    * [[graft.functions.Quantize]] as usual). The grid ends at each key's
    * last observed bucket, so the "no next point" tail Timescale leaves
    * NULL never materializes here.
    */
  def interpolate(
      bars: DataFrame,
      bucketSec: Long,
      valueCols: Seq[String],
      keyCol: String = "symbol",
      bucketCol: String = "bucket"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val dense = densify(bars, bucketSec * 1000000L, keyCol, bucketCol, valueCols)
    val frac = (col("__bm") - col("__orig")).cast("double") /
      (col("__next") - col("__orig")).cast("double")
    val outVals = valueCols.map { c =>
      (col(c) + coalesce((col(s"__n_$c") - col(c)) * frac, lit(0.0))).as(c)
    }
    dense.select(
      Seq(col(keyCol), timestamp_micros(col("__bm")).as(bucketCol)) ++
        outVals :+
        (col("__bm") =!= col("__orig")).as("filled"): _*)
  }
}
