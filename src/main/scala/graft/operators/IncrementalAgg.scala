package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O(delta) incremental maintenance of keyed count/sum aggregates — the
  * materialized-view refresh that reads the CHANGE FEED, not the table.
  *
  * The maintained state is `(keys..., n_rows, sum_<col>...)` where every
  * summed column is an exact integer image (BIGINT — callers quantize
  * doubles first, [[graft.functions.Quantize.i]]): counts and integer sums
  * are commutative monoids, so `state ⊎ aggregate(delta)` equals a full
  * recompute for ANY split of the data into deltas — the algebra the
  * continuous-aggregate refresh in `StreamingFeatures.refreshAggregate`
  * applies to time buckets, here applied to commit-log versions
  * ([[graft.sources.VersionedTable.changes]]).
  *
  * Scale shape: each refresh shuffles O(delta groups) + O(state groups)
  * rows — the 100 TB history is never re-read. Averages and other ratios
  * derive from (sum, count) at read time; non-decomposable statistics
  * (medians, distinct counts) need sketches instead and are out of scope
  * here by design.
  */
object IncrementalAgg {

  /** Aggregate one delta into state shape: `n_rows` + `sum_<c>` per column. */
  def aggregate(delta: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    delta.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Monoid merge of two state frames (full outer on keys, null = zero). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = a.columns.filterNot(keys.contains)
    require(valueCols.sameElements(b.columns.filterNot(keys.contains)),
      s"state shapes differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val bb = valueCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    a.join(bb, keys, "full_outer")
      .select(keys.map(col) ++ valueCols.map(c =>
        (coalesce(col(c), lit(0L)) + coalesce(col(s"__b_$c"), lit(0L))).as(c)): _*)
  }

  /** Fold a sequence of deltas into final state — equivalent to one
    * aggregate over their union, by monoid associativity.
    */
  def refreshAll(deltas: Seq[DataFrame], keys: Seq[String], sumCols: Seq[String]): DataFrame =
    deltas.map(aggregate(_, keys, sumCols)).reduce(merge(_, _, keys))

  /** Aggregate one ROW-LEVEL CDF delta ([[graft.sources.VersionedTableOps
    * .changeFeed]] output: rows + `_change_type`) into state shape —
    * counts and sums become signed GROUPS (retractable monoids): inserts
    * and update post-images contribute +1/+x, deletes and update
    * pre-images −1/−x, so `merge(state, aggregateChanges(cdf))` stays
    * exactly equal to a full recompute across ANY sequence of append /
    * delete / update / merge commits — the incremental view never resyncs.
    * A fully-retracted group nets to `n_rows = 0`; [[compactState]] drops
    * those so the state frame stays O(live groups).
    */
  def aggregateChanges(cdf: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val sgn = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    cdf.groupBy(keys.map(col): _*)
      .agg(
        sum(sgn).as("n_rows"),
        sumCols.map(c => sum(col(c) * sgn).as(s"sum_$c")): _*)
  }

  /** Drop fully-retracted groups (`n_rows = 0`) — call after merging
    * retractable deltas so emptied groups don't accumulate forever.
    */
  def compactState(state: DataFrame): DataFrame =
    state.filter(col("n_rows") =!= 0L)
}
