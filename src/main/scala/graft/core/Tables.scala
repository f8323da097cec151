package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders over the driver-provided parquet corpus, plus the canonical
  * `trades` view that maps the synthetic `events` table onto the reference's
  * `market_data_raw` fact schema (see /root/reference/sql/timescaledb_schema.sql:14-25):
  * (time, symbol, price, volume, trade_id, side, bid, ask).
  *
  * The mapping is pure, deterministic column arithmetic so the DuckDB oracle can
  * reproduce it bit-for-bit (see [[graft.registry.OracleSql.tradesCte]]):
  *   - `ts` -> `time` at microsecond precision, dtype-adaptive ([[eventTime]]):
  *     native parquet timestamps pass through, epoch-nanos INT64 is truncated
  *     to micros — both identical to DuckDB's `CAST(ts AS TIMESTAMP)`,
  *   - `user_id` -> `symbol` (string),
  *   - `value` -> `price`,
  *   - `1 + event_id % 100` -> `volume` (deterministic, integral-valued double so
  *     sums stay exact),
  *   - `event_type` purchase/click -> side buy/sell (CHECK-constraint domain,
  *     reference `sql/timescaledb_schema.sql:20`),
  *   - synthetic bid/ask around price with deterministic null holes (7- and
  *     11-cycles) to exercise the null-predicate filters the reference applies
  *     before spread computation (`flink-jobs/market-realtime/anomaly_detection.py:195`).
  */
object Tables {

  /** All timestamps in this corpus/engine are event-time in UTC. */
  def configure(spark: SparkSession): Unit = {
    // Early fixtures carried INT64 TIMESTAMP(NANOS) which Spark 4 refuses by
    // default; read nanos as long and let eventTime convert explicitly.
    // Harmless for the current timestamp[us] fixtures.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Loud fixture-drift gate shared by the typed loaders: every column the
    * engine depends on must exist with a type it knows how to handle, and
    * anything else fails at PLAN TIME naming the offending columns — never
    * a silent misread downstream (the events.ts lesson: the storage layer
    * DOES evolve fixture types between regenerations).
    */
  private def assertSchema(df: DataFrame, tableName: String,
      spec: Seq[(String, DataType => Boolean)]): DataFrame = {
    val bad = spec.flatMap { case (name, ok) =>
      df.schema.find(_.name == name) match {
        case None    => Some(s"$name: MISSING")
        case Some(f) => if (ok(f.dataType)) None
                        else Some(s"$name: unsupported ${f.dataType.simpleString}")
      }
    }
    if (bad.nonEmpty) throw new IllegalStateException(
      s"$tableName schema drifted beyond what the engine supports — " +
        s"[${bad.mkString("; ")}]; actual schema = ${df.schema.simpleString}")
    df
  }

  private val integral: DataType => Boolean =
    t => t == LongType || t == IntegerType
  private val dbl: DataType => Boolean = _ == DoubleType
  private val str: DataType => Boolean = _ == StringType
  // Dates ship as parquet timestamp[us]; Spark surfaces them as TIMESTAMP or
  // TIMESTAMP_NTZ depending on isAdjustedToUTC. Both are wall-clock-identical
  // under the pinned UTC session TZ ([[configure]]).
  private val ts: DataType => Boolean =
    t => t == TimestampType || t == TimestampNTZType
  // events.ts has historically shipped BOTH as epoch-nanos INT64 and as a
  // native timestamp — [[eventTime]] adapts; the gate admits exactly that set.
  private val eventTs: DataType => Boolean = t => integral(t) || ts(t)

  /** Every column the engine depends on, per table — the loud drift gate
    * ([[assertSchema]]) admits exactly the dtypes the query registry and the
    * DuckDB oracle handle identically; anything else fails AT PLAN TIME with
    * the column named (rounds 7-8 were lost to a silent fixture retype).
    */
  private val tableSpecs: Map[String, Seq[(String, DataType => Boolean)]] = Map(
    "lineitem" -> Seq(
      "l_orderkey" -> integral, "l_partkey" -> integral, "l_suppkey" -> integral,
      "l_linenumber" -> integral, "l_quantity" -> dbl, "l_extendedprice" -> dbl,
      "l_discount" -> dbl, "l_tax" -> dbl, "l_returnflag" -> str,
      "l_linestatus" -> str, "l_shipdate" -> ts),
    "orders" -> Seq(
      "o_orderkey" -> integral, "o_custkey" -> integral, "o_orderstatus" -> str,
      "o_totalprice" -> dbl, "o_orderdate" -> ts, "o_orderpriority" -> str),
    "customer" -> Seq(
      "c_custkey" -> integral, "c_name" -> str, "c_nationkey" -> integral,
      "c_acctbal" -> dbl, "c_mktsegment" -> str),
    "supplier" -> Seq(
      "s_suppkey" -> integral, "s_name" -> str, "s_nationkey" -> integral,
      "s_acctbal" -> dbl),
    "nation" -> Seq(
      "n_nationkey" -> integral, "n_name" -> str, "n_regionkey" -> integral),
    "region" -> Seq("r_regionkey" -> integral, "r_name" -> str),
    "part" -> Seq(
      "p_partkey" -> integral, "p_name" -> str, "p_brand" -> str,
      "p_type" -> str, "p_size" -> integral, "p_retailprice" -> dbl),
    "events" -> Seq(
      "event_id" -> integral, "ts" -> eventTs, "user_id" -> integral,
      "event_type" -> str, "value" -> dbl, "props" -> str))

  private def gated(spark: SparkSession, dir: String, name: String): DataFrame =
    assertSchema(table(spark, dir, name), name, tableSpecs(name))

  def lineitem(spark: SparkSession, dir: String): DataFrame  = gated(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = gated(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = gated(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = gated(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame    = gated(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = gated(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame      = gated(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame    = gated(spark, dir, "events")

  def documents(spark: SparkSession, dir: String): DataFrame =
    assertSchema(table(spark, dir, "documents"), "documents", Seq(
      "doc_id" -> integral,
      "text" -> (_ == StringType),
      "lang" -> (_ == StringType),
      "source" -> (_ == StringType),
      "n_chars" -> integral))

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    assertSchema(table(spark, dir, "embeddings"), "embeddings", Seq(
      "vec_id" -> integral,
      "embedding" -> {
        case ArrayType(FloatType | DoubleType, _) => true
        case _                                    => false
      },
      "label" -> integral))

  /** Dtype-adaptive event-time column over `events.ts`. The storage layer has
    * shipped `ts` both as epoch-nanos INT64 (early fixtures) and as a native
    * parquet timestamp[us] (current fixtures, surfaced by Spark as
    * TIMESTAMP_NTZ); the reference's own jobs tolerate storage-side drift
    * (`spark/streaming_feature_updates.py:28` schemaInference,
    * `spark/batch_feature_calculation.py:64` mergeSchema) and this engine must
    * too. Session TZ is pinned to UTC ([[configure]]), so NTZ→TZ casts are
    * wall-clock-preserving and match DuckDB's naive-timestamp semantics.
    * Unsupported dtypes fail LOUDLY here — never a silent misread.
    */
  def eventTime(events: DataFrame): Column = {
    val tsField = events.schema.find(_.name == "ts").getOrElse(
      throw new IllegalStateException(
        s"events is missing the `ts` column; schema = ${events.schema.simpleString}"))
    tsField.dataType match {
      case LongType | IntegerType => expr("timestamp_micros(ts DIV 1000)")
      case TimestampType          => col("ts")
      case TimestampNTZType       => col("ts").cast(TimestampType)
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type ${other.simpleString}: expected epoch-nanos " +
          "INT64 or timestamp — refusing to guess (a wrong guess silently corrupts " +
          "every event time downstream)")
    }
  }

  /** Loud fixture-drift gate: asserts the full events schema is one this
    * engine knows how to project, naming every offending column. Called once
    * per [[projectTrades]] construction (plan build, not per row).
    */
  def assertEventsSchema(events: DataFrame): Unit = {
    assertSchema(events, "events", Seq(
      "event_id" -> integral,
      "ts" -> (t => t == LongType || t == IntegerType ||
        t == TimestampType || t == TimestampNTZType),
      "user_id" -> integral,
      "event_type" -> (_ == StringType),
      "value" -> (_ == DoubleType)))
    ()
  }

  /** The trades projection over any (batch or streaming) events-shaped frame.
    * Pure deterministic column arithmetic shared by [[trades]] and the
    * streaming source so batch and stream can never diverge.
    */
  def projectTrades(events: DataFrame): DataFrame = {
    assertEventsSchema(events)
    events.select(
      eventTime(events).as("time"),
      col("user_id").cast("string").as("symbol"),
      col("value").as("price"),
      expr("CAST(1 + event_id % 100 AS DOUBLE)").as("volume"),
      col("event_id").cast("string").as("trade_id"),
      expr("CASE WHEN event_type = 'purchase' THEN 'buy' WHEN event_type = 'click' THEN 'sell' END")
        .as("side"),
      expr("CASE WHEN event_id % 7 <> 0 THEN value - (1 + event_id % 10) / CAST(100 AS DOUBLE) END")
        .as("bid"),
      expr("CASE WHEN event_id % 11 <> 0 THEN value + (1 + event_id % 10) / CAST(100 AS DOUBLE) END")
        .as("ask"))
  }

  /** The trade-tick fact stream (event-time ordered per symbol). */
  def trades(spark: SparkSession, dir: String): DataFrame =
    projectTrades(events(spark, dir))
}
