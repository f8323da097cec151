package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** The footer-stats fast path must ENGAGE in a session built from the one
  * engine-defaults site (graft.core.EngineSession): the test session IS
  * such a session, so parquet it writes must carry stats the footer reader
  * accepts — including UTC-adjusted INT64-micros timestamps (the r18 NTZ
  * guard must not reject Spark's own TIMESTAMP_MICROS output). A session
  * that forgot the outputTimestampType default would silently fall back to
  * the scan path on every commit; this spec is the tripwire.
  */
class EngineSessionFooterSpec extends graft.SparkTestBase {

  test("footer fast path serves files written by a default engine session") {
    assert(spark.conf.get("spark.sql.parquet.outputTimestampType")
      === "TIMESTAMP_MICROS",
      "test session must carry the engine default (EngineSession.defaults)")
    val dir = Files.createTempDirectory("graft_engfoot_").toString + "/t"
    spark.range(0, 500).select(
        col("id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"),
        (col("id") * 1.5).cast("double").as("v"))
      .repartition(2)
      .write.parquet(dir)
    val files = Option(new File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName)
    assert(files.nonEmpty)
    val cols = Seq("id", "ts", "v")
    val res = FooterStats.read(
      spark.sparkContext.hadoopConfiguration, new File(dir), files, cols,
      physFor = cols.map(c => c -> c).toMap,
      typeFor = Map("id" -> LongType, "ts" -> TimestampType, "v" -> DoubleType))
    assert(res.isDefined,
      "footer path must accept the engine session's own parquet output " +
        "(INT64 micros, UTC-adjusted) — a None here means every commit " +
        "would pay the scan fallback")
    val (rows, stats) = res.get
    assert(rows === 500)
    // spot-check exactness against the scan the fallback would have run
    val tsMin = stats.filter(_.col == "ts").map(_.min).min
    assert(tsMin === 1700000000000000L.toDouble)
  }
}
