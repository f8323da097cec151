package graft.asof

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left ("entity") row, attach the most recent
  * right ("feature") row with `rightTime <= leftTime` within the same key,
  * optionally bounded by a TTL (`rightTime >= leftTime - ttl`).
  *
  * This is the reference's central operator, appearing as
  *  - the 9× `ORDER BY time DESC LIMIT 1` CTEs in `feature_pit_snapshot`
  *    (`sql/timescaledb_schema.sql:313-409`),
  *  - the contract's equi+theta `LEFT JOIN f ON f.symbol = o.symbol AND
  *    f.time <= p_as_of_ts` (`sql/smartdb_contract.md:154-167`),
  *  - Feast's TTL-bounded `get_historical_features` PIT join
  *    (`tests/test_feast_pit_correctness.py:48-66`,
  *    `feast_repo/feature_definitions.py:37,93,145`).
  *
  * Spark has no native as-of join; a naive theta-join (`l.time >= r.time`)
  * explodes to O(|L|·|R|) rows per key. Instead we UNION both sides tagged,
  * sort each key partition once by (time, tag), and carry the latest feature
  * row forward with `last(payload, ignoreNulls)` over an unbounded-preceding
  * frame. Cost: ONE shuffle of |L|+|R| rows on the key — no row explosion, no
  * skew amplification beyond key cardinality; scales linearly across
  * executors. Feature rows get tag 0, entity rows tag 1, so an exactly
  * contemporaneous feature (rightTime == leftTime) is visible — matching the
  * `<=` no-future-leakage ("无未来数据泄露") PIT contract
  * (`sql/smartdb_contract.md:13`).
  */
object AsOfJoin {

  /** @param keys        equi-join key columns present on both sides
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param ttlSeconds  optional max staleness; older matches are nulled out
    * @param rightPrefix prefix applied to right-side output columns
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String = "time",
      rightTime: String = "time",
      ttlSeconds: Option[Long] = None,
      rightPrefix: String = ""): DataFrame =
    asOf(left, right, keys, leftTime, rightTime, ttlSeconds, rightPrefix,
      lookForward = false)

  /** Shared union+window machinery for both directions. Direction decides:
    * the tag pair (the RIGHT side must sort inside the frame at equal
    * timestamps — before left rows for `<=`, after them for `>=`), the
    * frame (trailing `last` vs leading `first`), and the TTL subtraction
    * order (staleness vs lead time).
    */
  private def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      ttlSeconds: Option[Long],
      rightPrefix: String,
      lookForward: Boolean): DataFrame = {

    val valueCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val leftCols  = left.columns.toSeq

    val payload     = struct(col(rightTime).as("__rt") +: valueCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val lrowType    = left.select(struct(leftCols.map(col): _*)).schema.head.dataType

    val (rightTag, leftTag) = if (lookForward) (1, 0) else (0, 1)

    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(rightTag).as("__tag"),
        payload.as("__payload"),
        lit(null).cast(lrowType).as("__lrow")): _*)

    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(leftTag).as("__tag"),
        lit(null).cast(payloadType).as("__payload"),
        struct(leftCols.map(col): _*).as("__lrow")): _*)

    val ordered = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
    val (w, pick) =
      if (lookForward)
        (ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__payload"), ignoreNulls = true))
      else
        (ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__payload"), ignoreNulls = true))

    val withMatch = rTagged.unionByName(lTagged)
      .withColumn("__m", pick.over(w))
      .filter(col("__tag") === leftTag)

    val ttlOk: Column = ttlSeconds match {
      case Some(s) =>
        val gap =
          if (lookForward) unix_micros(col("__m.__rt")) - unix_micros(col("__t"))
          else unix_micros(col("__t")) - unix_micros(col("__m.__rt"))
        col("__m").isNotNull && gap <= s * 1000000L
      case None => col("__m").isNotNull
    }

    withMatch.select(
      leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        Seq(when(ttlOk, col("__m.__rt")).as(s"${rightPrefix}matched_$rightTime")) ++
        valueCols.map(c => when(ttlOk, col(s"__m.$c")).as(s"$rightPrefix$c")): _*)
  }

  /** FORWARD as-of join: for every left row, the EARLIEST right row with
    * `rightTime >= leftTime` within the key (optionally within a TTL) —
    * the "next quote after the order" / reaction-window direction that
    * complements [[backward]]. Exact mirror: one union, one shuffle, a
    * forward-looking `first(payload, ignoreNulls)` frame. Left rows get
    * tag 0 and right rows tag 1, so a contemporaneous right row
    * (rightTime == leftTime) sits inside the frame — `>=` semantics, the
    * reflection of backward's `<=`.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String = "time",
      rightTime: String = "time",
      ttlSeconds: Option[Long] = None,
      rightPrefix: String = ""): DataFrame =
    asOf(left, right, keys, leftTime, rightTime, ttlSeconds, rightPrefix,
      lookForward = true)

  /** The contract's literal equi+theta formulation
    * (`sql/smartdb_contract.md:154-167`): equi-join on keys plus the
    * `rightTime <= leftTime` inequality, then keep the latest right row per
    * left row via `max_by`. Row count explodes to O(matching pairs) before
    * the re-aggregation, so this variant is ONLY for small left sides
    * (single snapshots, small entity frames) — [[backward]] is the scale
    * form. Kept because it exercises the join-based plan (broadcast left,
    * no window) and as a cross-check implementation.
    */
  def backwardViaJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String = "time",
      rightTime: String = "time",
      ttlSeconds: Option[Long] = None,
      rightPrefix: String = ""): DataFrame = {

    val valueCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val leftCols  = left.columns.toSeq
    val r = right.select(
      keys.map(c => col(c).as(s"__r_$c")) ++
        (col(rightTime).as("__rt") +: valueCols.map(c => col(c).as(s"__rv_$c"))): _*)

    val cond = keys.map(k => col(k) === col(s"__r_$k")).reduce(_ && _) &&
      col("__rt") <= col(leftTime) &&
      ttlSeconds.map(s =>
        unix_micros(col(leftTime)) - unix_micros(col("__rt")) <= s * 1000000L)
        .getOrElse(lit(true))

    broadcast(left).join(r, cond, "left_outer")
      .groupBy(leftCols.map(col): _*)
      .agg(
        max_by(col("__rt"), col("__rt")).as(s"${rightPrefix}matched_$rightTime"),
        valueCols.map(c => max_by(col(s"__rv_$c"), col("__rt")).as(s"$rightPrefix$c")): _*)
  }

  /** One right-side feature view for [[backwardMulti]]. */
  final case class FeatureView(
      df: DataFrame,
      timeCol: String,
      prefix: String,
      ttlSeconds: Option[Long] = None)

  /** Multi-view backward as-of join in ONE shuffle: all feature views and
    * the entity frame union into a single key-partitioned, time-sorted pass;
    * each view contributes its own payload column and its own
    * `last(ignoreNulls)` carry-forward — Spark evaluates all of them inside
    * one WindowExec (same partition/order spec), so N feature views cost the
    * same single sort-shuffle as one. This is the scale-critical form of the
    * Feast historical-features retrieval (N views × M entities on 100 TB:
    * shuffle volume |entities| + Σ|views|, once).
    */
  def backwardMulti(
      left: DataFrame,
      views: Seq[FeatureView],
      keys: Seq[String],
      leftTime: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val lrowType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType

    val viewMeta = views.zipWithIndex.map { case (v, i) =>
      val valueCols = v.df.columns.filterNot(c => keys.contains(c) || c == v.timeCol).toSeq
      val payload = struct(col(v.timeCol).as("__rt") +: valueCols.map(col): _*)
      val pType = v.df.select(payload).schema.head.dataType
      (v, i, valueCols, payload, pType)
    }

    def nullPayloads(except: Int): Seq[Column] =
      viewMeta.map { case (_, j, _, p, t) =>
        (if (j == except) p else lit(null).cast(t)).as(s"__p$j")
      }

    val taggedViews = viewMeta.map { case (v, i, _, _, _) =>
      v.df.select(
        keys.map(col) ++ Seq(col(v.timeCol).as("__t"), lit(0).as("__tag")) ++
          nullPayloads(except = i) :+ lit(null).cast(lrowType).as("__lrow"): _*)
    }
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__tag")) ++
        nullPayloads(except = -1) :+ struct(leftCols.map(col): _*).as("__lrow"): _*)

    val unioned = (taggedViews :+ taggedLeft).reduce(_ unionByName _)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withMatches = viewMeta.foldLeft(unioned) { case (df, (_, i, _, _, _)) =>
      df.withColumn(s"__m$i", last(col(s"__p$i"), ignoreNulls = true).over(w))
    }.filter(col("__tag") === 1)

    val outCols = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      viewMeta.flatMap { case (v, i, valueCols, _, _) =>
        val m = col(s"__m$i")
        val ttlOk: Column = v.ttlSeconds match {
          case Some(s) => m.isNotNull &&
            unix_micros(col("__t")) - unix_micros(m.getField("__rt")) <= s * 1000000L
          case None => m.isNotNull
        }
        when(ttlOk, m.getField("__rt")).as(s"${v.prefix}matched_${v.timeCol}") +:
          valueCols.map(c => when(ttlOk, m.getField(c)).as(s"${v.prefix}$c"))
      }
    withMatches.select(outCols: _*)
  }
}
