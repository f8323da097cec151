package graft

import java.sql.Timestamp

import graft.asof.{AsOfJoin, PitSnapshot}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** PIT correctness — the reference's central invariant suite
  * (`tests/test_pit_correctness.py:38-79`, `test_feast_pit_correctness.py`).
  */
class PitSpec extends SparkTestBase {

  private def trades = Tables.trades(spark, sf0001)

  test("no future leakage: snapshot equals snapshot over pre-truncated data") {
    val asOf = Timestamp.valueOf("2024-01-15 00:00:00")
    val full = PitSnapshot.snapshot(spark, trades, "3", asOf).collect()(0)
    // An engine that leaks future rows would differ when the future is
    // physically removed:
    val truncated = PitSnapshot.snapshot(
      spark, trades.filter(col("time") <= lit(asOf)), "3", asOf).collect()(0)
    assert(full === truncated)
  }

  test("determinism: same query twice gives identical records") {
    val asOf = Timestamp.valueOf("2024-01-20 00:00:00")
    val a = PitSnapshot.snapshot(spark, trades, "5", asOf).collect()(0)
    val b = PitSnapshot.snapshot(spark, trades, "5", asOf).collect()(0)
    assert(a === b)
  }

  test("versioned-table snapshot through the skipping tiers equals the full snapshot") {
    import graft.sources.VersionedTable
    import graft.sources.VersionedTable.{PointFilter, RangeFilter}
    import org.apache.spark.sql.functions.unix_micros
    val root = java.nio.file.Files.createTempDirectory("graft_pitvt_").toString
    val t = trades.select(col("time"), col("symbol"), col("price"),
      col("volume"), col("trade_id"), col("side"), col("bid"), col("ask"))
    // three chronological commits, each with time stats + a symbol bloom —
    // the layout a production ingest would write
    val b = t.agg(org.apache.spark.sql.functions.min(unix_micros(col("time"))),
      org.apache.spark.sql.functions.max(unix_micros(col("time")))).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val t1 = mn + (mx - mn) / 3
    val t2 = mn + 2 * ((mx - mn) / 3)
    def um = unix_micros(col("time"))
    for (tf <- Seq(um < t1, um >= t1 && um < t2, um >= t2))
      VersionedTable.commit(t.filter(tf), root, "append",
        statsCols = Seq("time"), bloomCols = Seq("symbol"))
    // an as-of inside the FIRST third: the two later dirs must be skipped
    val asOf = new Timestamp((t1 - 1) / 1000)
    val viaVersioned = PitSnapshot
      .snapshotVersioned(spark, root, "3", asOf).collect()(0)
    val full = PitSnapshot.snapshot(
      spark, VersionedTable.read(spark, root), "3", asOf).collect()(0)
    assert(viaVersioned === full,
      "skipping-tier snapshot must equal the full-table snapshot")
    // and the access path really skips: the pruned frame touches only dir 1
    val probe = VersionedTable.readFiltered(spark, root,
      Seq(PointFilter("symbol", "3"),
        RangeFilter("time", Double.NegativeInfinity, (t1 - 1).toDouble)))
    val files = probe.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("data/v00001")),
      s"PIT probe touched out-of-horizon dirs: ${files.mkString(",")}")
  }

  test("future as_of is rejected") {
    val now = Timestamp.valueOf("2024-01-30 00:00:00")
    assert(PitSnapshot.validateAsOf(Timestamp.valueOf("2024-02-01 00:00:00"), now).isLeft)
    assert(PitSnapshot.validateAsOf(Timestamp.valueOf("2024-01-29 00:00:00"), now).isRight)
  }

  test("snapshot JSON export round-trips every feature key (helpers.py:123-147 parity)") {
    import graft.serving.SnapshotExport
    val asOf = Timestamp.valueOf("2024-01-15 00:00:00")
    val snap = PitSnapshot.snapshot(spark, trades, "3", asOf)
    val out = java.nio.file.Files.createTempDirectory("graft_snapjson_")
      .resolve("snapshot.json").toString
    val doc = SnapshotExport.exportToJson(snap, out)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8").trim === doc.trim, "file matches render")
    val leaves = SnapshotExport.parseLeaves(doc)
    val row = snap.collect()(0)
    val expectedKeys = Seq("symbol", "snapshot_time", "ohlc_1m_open",
      "ohlc_1m_high", "ohlc_1m_low", "ohlc_1m_close", "sma_20", "ewm_12",
      "volatility_1h", "vwap_5m", "large_trade_flag", "bidask_spread",
      "trade_imbalance_5m", "regime_tag")
    assert(expectedKeys.forall(leaves.contains), s"missing keys: ${
      expectedKeys.filterNot(leaves.contains)}")
    assert(leaves("symbol") === "3")
    // datetime.isoformat() parity: seconds are ALWAYS present, even for
    // whole-minute snapshot times (LocalDateTime.toString would drop them).
    assert(leaves("snapshot_time") === "2024-01-15T00:00:00")
    assert(leaves("ohlc_1m_close") === row.getAs[Any]("close").toString)
    assert(leaves("sma_20") === row.getAs[Any]("sma_20").toString)
    assert(leaves("regime_tag") === row.getAs[String]("regime_tag"))
    assert(leaves("large_trade_flag") === row.getAs[Boolean]("large_trade_flag").toString)
  }

  test("snapshot JSON: non-finite features render as null; fractional seconds kept") {
    import graft.serving.SnapshotExport
    val df = spark.sql(
      """SELECT 'X' AS symbol, TIMESTAMP '2024-01-15 09:30:00.250000' AS as_of_ts,
        |  1.0 AS open, 2.0 AS high, 0.5 AS low, 1.5 AS close,
        |  CAST('NaN' AS DOUBLE) AS sma_20, double('Infinity') AS ewm_12,
        |  double('-Infinity') AS volatility_1h, 1.25 AS vwap_5m,
        |  false AS large_trade_flag, CAST(NULL AS DOUBLE) AS bidask_spread,
        |  0.0 AS trade_imbalance_5m, 'calm' AS regime_tag""".stripMargin)
    val doc = SnapshotExport.render(df.collect()(0))
    val leaves = SnapshotExport.parseLeaves(doc)
    assert(leaves("sma_20") === "null")
    assert(leaves("ewm_12") === "null")
    assert(leaves("volatility_1h") === "null")
    assert(leaves("bidask_spread") === "null")
    assert(leaves("snapshot_time") === "2024-01-15T09:30:00.250000")
    assert(!doc.contains("NaN") && !doc.contains("Infinity"), "no bare non-finite tokens")
  }

  test("as-of join: exact-time feature rows are visible (<= semantics), later ones are not") {
    import spark.implicits._
    val feature = Seq(
      ("A", Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      ("A", Timestamp.valueOf("2024-01-01 11:00:00"), 2.0),
      ("A", Timestamp.valueOf("2024-01-01 12:00:00"), 3.0))
      .toDF("symbol", "time", "v")
    val entity = Seq(
      ("A", Timestamp.valueOf("2024-01-01 09:00:00")), // before any feature
      ("A", Timestamp.valueOf("2024-01-01 11:00:00")), // exactly at #2
      ("A", Timestamp.valueOf("2024-01-01 11:30:00"))) // between #2 and #3
      .toDF("symbol", "ts")
    val out = AsOfJoin.backward(entity, feature, Seq("symbol"), "ts", "time")
      .orderBy("ts").select("v").collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 2.0)
    assert(out(2).getDouble(0) === 2.0)
  }

  test("as-of join TTL: matches older than the TTL are nulled") {
    import spark.implicits._
    val feature = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("symbol", "time", "v")
    val entity = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:30:00")), // 30 min later: in TTL
      ("A", Timestamp.valueOf("2024-01-01 02:30:00"))) // 2.5 h later: out
      .toDF("symbol", "ts")
    val out = AsOfJoin.backward(
      entity, feature, Seq("symbol"), "ts", "time", ttlSeconds = Some(3600))
      .orderBy("ts").select("v").collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(1).isNullAt(0))
  }

  test("forward as-of: earliest at-or-after match, >= semantics, TTL nulls far matches") {
    import spark.implicits._
    val feature = Seq(
      ("A", Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      ("A", Timestamp.valueOf("2024-01-01 11:00:00"), 2.0),
      ("A", Timestamp.valueOf("2024-01-01 15:00:00"), 3.0))
      .toDF("symbol", "time", "v")
    val entity = Seq(
      ("A", Timestamp.valueOf("2024-01-01 09:30:00")), // next is #1
      ("A", Timestamp.valueOf("2024-01-01 11:00:00")), // exactly at #2 (>= visible)
      ("A", Timestamp.valueOf("2024-01-01 11:30:00")), // next is #3, 3.5 h away
      ("A", Timestamp.valueOf("2024-01-01 16:00:00"))) // nothing after
      .toDF("symbol", "ts")
    val out = AsOfJoin.forward(
      entity, feature, Seq("symbol"), "ts", "time", ttlSeconds = Some(3600))
      .orderBy("ts").select("v").collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(1).getDouble(0) === 2.0, ">= must see the contemporaneous row")
    assert(out(2).isNullAt(0), "next match beyond TTL is nulled")
    assert(out(3).isNullAt(0), "no future row at all")
  }

  test("historical features sweep produces a value for every in-range entity row") {
    val t = trades
    val entities = t.select("symbol").distinct().limit(3)
      .crossJoin(spark.range(5).select(
        expr("timestampadd(DAY, CAST(id AS INT), TIMESTAMP'2024-01-10 00:00:00')")
          .as("event_timestamp")))
    val out = graft.asof.HistoricalFeatures.retrieve(entities, t)
    assert(out.count() === entities.count())
    // every row must have an OHLC close within the 7-day TTL (data is dense)
    assert(out.filter(col("ohlc_close").isNull).count() === 0)
  }
}
