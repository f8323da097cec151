package graft.core

import org.apache.spark.sql.SparkSession

/** Engine-owned SparkSession defaults, defined ONCE.
  *
  * Every session the engine constructs (Bench, Verify, PlanDump, the SQL
  * catalog's isolated session, the test session) must agree on:
  *
  *   - `spark.sql.session.timeZone = UTC` — all corpus timestamps are
  *     event-time UTC; the oracle comparison and the NTZ→TZ casts in
  *     [[Tables.eventTime]] assume it.
  *   - `spark.sql.parquet.outputTimestampType = TIMESTAMP_MICROS` — INT64
  *     micros (not the INT96 legacy default): value-identical on
  *     read-back, and row groups carry ORDERED min/max stats, which is
  *     what lets the versioned commit path derive manifest stats from
  *     footers ([[graft.sources.FooterStats]]) instead of re-scanning
  *     every committed batch. A session that forgets this writes INT96
  *     and silently falls back to the scan path — correct but slow, which
  *     is why the default lives here and not copy-pasted per builder.
  *
  * (Exception: Verify's per-query OUTPUT dumps are explicitly flipped back
  * to INT96 at the dump site — the driver's pandas normalization requires
  * it. That is a reader-facing format choice, not an engine session
  * default.)
  */
object EngineSession {

  /** Apply the engine defaults to a session builder; chain as
    * `EngineSession.defaults(SparkSession.builder().master(...))....`
    */
  def defaults(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
}
