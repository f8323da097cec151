package graft.serving

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}

/** Feature-snapshot JSON export — parity with the reference's
  * `export_feature_snapshot_to_json` (`src/utils/helpers.py:123-147`): the
  * snapshot record serializes to a nested `{symbol, snapshot_time,
  * features{...}}` document with the same twelve feature keys.
  *
  * The renderer works on the already-computed 1-row snapshot frame
  * ([[graft.asof.PitSnapshot.snapshot]] output) — a driver-side formatting
  * step over one record, exactly like the reference's helper; nothing here
  * touches the cluster.
  */
object SnapshotExport {

  private val featureKeys = Seq(
    "ohlc_1m_open" -> "open", "ohlc_1m_high" -> "high",
    "ohlc_1m_low" -> "low", "ohlc_1m_close" -> "close",
    "sma_20" -> "sma_20", "ewm_12" -> "ewm_12",
    "volatility_1h" -> "volatility_1h", "vwap_5m" -> "vwap_5m",
    "large_trade_flag" -> "large_trade_flag",
    "bidask_spread" -> "bidask_spread",
    "trade_imbalance_5m" -> "trade_imbalance_5m",
    "regime_tag" -> "regime_tag")

  private def jsonValue(v: Any): String = v match {
    case null                => "null"
    case b: Boolean          => b.toString
    // Bare NaN/Infinity is not valid JSON — a degenerate feature (e.g. a
    // zero-variance volatility) must render as null, not corrupt the doc.
    case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
    case f: java.lang.Float if f.isNaN || f.isInfinite  => "null"
    case n: java.lang.Number => n.toString
    case other               => "\"" + escape(other.toString) + "\""
  }

  private def escape(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  /** Render one snapshot row to the reference's JSON document shape.
    * `snapshot_time` is the `as_of_ts` column in ISO-8601, matching the
    * reference's `snapshot.snapshot_time.isoformat()`.
    */
  def render(row: Row): String = {
    val symbol = row.getAs[String]("symbol")
    val asOf = row.getAs[java.sql.Timestamp]("as_of_ts")
    // datetime.isoformat() always emits seconds ("...T00:00:00");
    // LocalDateTime.toString drops them for whole-minute values — format
    // explicitly, appending fractional seconds only when present.
    val ldt = asOf.toLocalDateTime
    val base = ldt.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    val iso =
      if (ldt.getNano == 0) base
      else base + f".${ldt.getNano / 1000}%06d"
    val feats = featureKeys.map { case (key, colName) =>
      s"""    "$key": ${jsonValue(row.get(row.fieldIndex(colName)))}"""
    }.mkString(",\n")
    s"""{
       |  "symbol": ${jsonValue(symbol)},
       |  "snapshot_time": ${jsonValue(iso)},
       |  "features": {
       |$feats
       |  }
       |}""".stripMargin
  }

  /** Export the 1-row snapshot frame to `outputPath` (reference
    * `helpers.py:145-147`). Returns the rendered document.
    */
  def exportToJson(snapshot: DataFrame, outputPath: String): String = {
    val rows = snapshot.collect()
    require(rows.length == 1, s"expected exactly one snapshot row, got ${rows.length}")
    val doc = render(rows.head)
    Files.write(Paths.get(outputPath), (doc + "\n").getBytes("UTF-8"))
    doc
  }

  /** Round-trip check: parse a rendered document's scalar leaves back into
    * (path, value-string) pairs — enough to assert render/parse parity in
    * the spec without a JSON library dependency.
    */
  private[graft] def parseLeaves(doc: String): Map[String, String] =
    """"([a-z0-9_]+)":\s*("(?:[^"\\]|\\.)*"|[^,{}\s]+)""".r
      .findAllMatchIn(doc)
      .filterNot(_.group(2).startsWith("{"))
      .map(m => m.group(1) -> m.group(2).stripPrefix("\"").stripSuffix("\""))
      .toMap
}
