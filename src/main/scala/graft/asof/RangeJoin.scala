package graft.asof

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded interval ("range") join: every left row matched to the right rows
  * with `rightTime ∈ [leftTime - lookbackSec, leftTime]` on the same key —
  * the enrichment shape behind the reference's "recent context" joins (news
  * sentiment within a staleness horizon, `sql/timescaledb_schema.sql:268-286`
  * + its 300 s async SLA, and the Flink interval-join enrichment in
  * `flink-jobs/market-realtime/anomaly_detection.py`). The as-of join
  * ([[AsOfJoin]]) answers "the LATEST right row ≤ t"; this answers "ALL right
  * rows within the window" — counts, averages, context sets.
  *
  * A naive theta-join (`r.time BETWEEN l.time - W AND l.time`) plans as
  * BroadcastNestedLoop / per-key cartesian — O(|L|·|R|) comparisons. Here
  * both sides bucket by `floor(time / W)`: a right row at time t only serves
  * left rows in bucket `floor(t/W)` or the one after (its W-second forward
  * span crosses at most one boundary), so the right side replicates exactly
  * 2× onto those bucket ids and the join becomes an EQUI-join on
  * (keys…, bucket) with the precise range predicate as a residual. Cost: one
  * shuffle of |L| + 2|R| rows on (key, bucket); comparisons bounded by
  * per-(key, window) density, never corpus size — the standard epsilon-join
  * decomposition expressed with stock operators, so AQE still handles skew.
  *
  * The left side is NOT replicated: each candidate (l, r) pair meets on
  * exactly one bucket id (the left row's own), so `"inner"` emits no
  * duplicates and `"left_outer"` surfaces unmatched left rows exactly once.
  */
object RangeJoin {

  /** @param keys        equi-join key columns present on both sides
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param lookbackSec window length W: match iff `lt - W <= rt <= lt`
    * @param rightPrefix prefix applied to right-side non-key output columns
    * @param joinType    "inner" or "left_outer"
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String = "time",
      rightTime: String = "time",
      lookbackSec: Long = 3600,
      rightPrefix: String = "r_",
      joinType: String = "inner"): DataFrame = {

    require(lookbackSec > 0, "lookbackSec must be positive")
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported joinType: $joinType")
    // the rename-wholesale disambiguation only holds if the prefixed right
    // value columns are actually disjoint from the left side's columns
    val clash = right.columns.filterNot(keys.contains)
      .map(rightPrefix + _).toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"right value columns collide with left columns after prefixing: " +
        s"${clash.mkString(", ")} — choose a distinct rightPrefix or rename")
    val wMicros = lookbackSec * 1000000L

    def bucketOf(t: Column): Column = floor(unix_micros(t) / wMicros).cast("long")

    val l = left.withColumn("__lb", bucketOf(col(leftTime)))
    // Right side renamed wholesale before the join — no shared column names,
    // so self-joins (left and right carved from the same source) resolve
    // without dataframe-reference disambiguation.
    val valueCols = right.columns.filterNot(keys.contains).toSeq
    val r = right
      .withColumn("__rb",
        explode(array(bucketOf(col(rightTime)), bucketOf(col(rightTime)) + 1)))
      .select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"__rk$i") } ++
        Seq(col("__rb")) ++
        valueCols.map(c => col(c).as(s"$rightPrefix$c")): _*)

    val rt = col(s"$rightPrefix$rightTime")
    val cond = keys.zipWithIndex.map { case (k, i) => col(k) === col(s"__rk$i") }
      .reduce(_ && _) &&
      col("__lb") === col("__rb") &&
      unix_micros(rt) <= unix_micros(col(leftTime)) &&
      unix_micros(rt) >= unix_micros(col(leftTime)) - wMicros

    l.join(r, cond, joinType)
      .select(left.columns.map(col) ++ valueCols.map(c => col(s"$rightPrefix$c")): _*)
  }
}
