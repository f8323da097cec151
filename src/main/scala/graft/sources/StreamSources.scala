package graft.sources

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming sources. The Kafka/Avro paths mirror the reference's ingest
  * topology but are *builders only* in this environment (no Kafka broker, no
  * spark-sql-kafka / spark-avro jars in the zero-egress image); the file
  * source is the tested equivalent — the reference itself re-streams its raw
  * Delta directory as the second-stage source
  * (`spark/streaming_feature_updates.py:102`), which is exactly this shape.
  */
object StreamSources {

  /** Epoch-nanos long form of the events schema — the EARLY fixture layout,
    * kept for synthetic long-form test inputs. Never impose this over real
    * files: [[tradeFileStream]] reads the schema from the parquet footer so
    * storage-side type evolution (int64 → timestamp[us]) can't be misread.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over the events parquet, projected to the
    * trades view — the tested stand-in for the Kafka topic. The streaming
    * source needs an explicit schema; sniff it from the actual file footers
    * (a driver-side metadata read, no data scan) instead of hard-coding a
    * layout — the drift-tolerance posture of the reference's own readers
    * (`spark/streaming_feature_updates.py:28` schemaInference).
    */
  /** The trades stream delivered as `batches` FORCED chronological
    * micro-batches (maxFilesPerTrigger=1 over a time-split of the corpus) —
    * the replay harness the event-time-ORDERED processors are gated under.
    * A single input file replays as one micro-batch, which an arrival-order
    * fold happens to survive; this source makes the oracle gate exercise the
    * multi-batch shape the production Kafka topic actually has (the
    * reference's Flink jobs consume an unbounded keyed stream —
    * `flink-jobs/market-realtime/anomaly_detection.py:40-149`).
    *
    * The split is distributed and sort-free: exact `percentile` cutoffs on
    * `ts` (one aggregation pass — no global row_number, which planned as a
    * single-partition window sort of the whole corpus) bound each batch,
    * and every row with the same timestamp lands on the same side of every
    * cutoff, so no batch boundary ever splits an event time — a later
    * batch carries only rows STRICTLY above the previous batch's maximum,
    * keeping a chronological replay late-free. Each split is written as one
    * parquet file in ascending mtime order, which is the file source's
    * processing order under `latestFirst=false`.
    */
  def chronoBatchedTradeStream(spark: SparkSession, path: String,
      batches: Int = 3): DataFrame =
    chronoStream(spark, chronoSplitDir(spark, path, batches))

  /** The file-per-batch split behind [[chronoBatchedTradeStream]], exposed
    * so a caller can replay the SAME split twice (e.g. the chaos
    * kill-and-restart tests, which resume a second query on the first
    * query's checkpoint over one fixed source dir).
    *
    * The split is deterministic for a given (corpus path, batch count) —
    * exact percentile cutoffs over immutable input — so it is computed ONCE
    * per JVM and shared: without the cache each of the three promoted
    * stream primaries paid the percentile scan + full corpus rewrite again
    * (the top of the r11 registry profile). Keyed by the CANONICAL path so
    * aliases hit; revalidated on every hit (a vanished temp dir rebuilds
    * instead of streaming from nothing).
    */
  def chronoSplitDir(spark: SparkSession, path: String, batches: Int = 3): String = {
    val key = (new java.io.File(path).getCanonicalPath, batches)
    splitCache.synchronized {
      splitCache.get(key).filter(d => new java.io.File(d).isDirectory) match {
        case Some(dir) => dir
        case None =>
          val dir = buildChronoSplit(spark, path, batches)
          splitCache(key) = dir
          dir
      }
    }
  }

  private val splitCache =
    scala.collection.mutable.Map.empty[(String, Int), String]

  private def buildChronoSplit(spark: SparkSession, path: String, batches: Int): String = {
    require(batches >= 1, s"need at least one batch, got $batches")
    Tables.configure(spark)
    val ev = spark.read.parquet(path)
    // ts drifts across fixture regenerations (epoch-long vs timestamp);
    // percentile needs a numeric, so normalize without imposing a schema.
    val tsNum = ev.schema("ts").dataType match {
      case LongType => col("ts")
      // NTZ needs an explicit cast (session TZ is pinned UTC by configure)
      case _ => unix_micros(col("ts").cast(TimestampType))
    }
    val cuts: Seq[Double] =
      if (batches == 1) Seq.empty
      else {
        val fracs = (1 until batches).map(_.toDouble / batches)
        val row = ev.select(tsNum.as("__t"))
          .agg(call_function("percentile", col("__t"),
            array(fracs.map(lit): _*)).as("__c"))
          .head()
        if (row.isNullAt(0)) Seq.empty // empty corpus: everything in batch 0
        else row.getSeq[Double](0)
      }
    def inBatch(b: Int): Column = {
      val lower = if (b == 0 || cuts.isEmpty) lit(true)
        else tsNum > lit(cuts(b - 1))
      val upper = if (b >= cuts.length) lit(true)
        else tsNum <= lit(cuts(b))
      lower && upper
    }
    val srcDir = java.nio.file.Files.createTempDirectory("graft_chrono_").toString
    (0 until batches).foreach { b =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_chrono_part_").toString
      // repartition(1), not coalesce(1): coalesce would collapse the whole
      // scan+filter into ONE task; the shuffle boundary keeps the corpus
      // scan parallel and only the final file write single-task.
      ev.filter(inBatch(b))
        .repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/f$b.parquet"))
    }
    srcDir
  }

  /** One-file-per-micro-batch trades stream over a [[chronoSplitDir]]. */
  def chronoStream(spark: SparkSession, srcDir: String): DataFrame = {
    val raw = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(srcDir)
    projectTrades(raw)
  }

  def tradeFileStream(spark: SparkSession, path: String): DataFrame = {
    Tables.configure(spark)
    val onDisk = spark.read.parquet(path).schema
    // The file source wants a directory; when handed a single file, stream
    // its parent with a glob pinned to that file name.
    val f = new java.io.File(path)
    val raw =
      if (f.isFile)
        spark.readStream.schema(onDisk)
          .option("pathGlobFilter", f.getName).parquet(f.getParent)
      else spark.readStream.schema(onDisk).parquet(path)
    projectTrades(raw)
  }

  /** The same trades projection as [[Tables.trades]], applicable to any
    * (batch or streaming) frame with the events schema — dtype-adaptive on
    * `ts` and loud on unsupported drift (see [[Tables.projectTrades]]).
    */
  def projectTrades(events: DataFrame): DataFrame =
    Tables.projectTrades(events)

  /** Schema of the landed trades table (what [[projectTrades]] emits) — used
    * to re-stream the raw directory as a second-stage source, the
    * reference's two-stage topology (`spark/streaming_feature_updates.py:102`:
    * the OHLC query streams the raw Delta dir, not Kafka).
    */
  val tradesSchema: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("symbol", StringType),
    StructField("price", DoubleType),
    StructField("volume", DoubleType),
    StructField("trade_id", StringType),
    StructField("side", StringType),
    StructField("bid", DoubleType),
    StructField("ask", DoubleType)))

  /** Second-stage streaming scan over a landed raw-trades directory. */
  def rawTradesStream(spark: SparkSession, rawDir: String): DataFrame =
    spark.readStream.schema(tradesSchema).parquet(rawDir)

  /** Option assembly for the Kafka source (reference
    * `spark/streaming_feature_updates.py:55-62`; Flink exactly-once variant
    * reads committed only, `enhanced_anomaly_detection.py:231-260`). Pure —
    * unit-tested in StreamingSpec even though no broker exists in this image.
    */
  def kafkaSourceOptions(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "latest",
      readCommitted: Boolean = true): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false")
    if (readCommitted) base + ("kafka.isolation.level" -> "read_committed") else base
  }

  /** Option assembly for the Kafka sink (transactional anomaly publisher,
    * `enhanced_anomaly_detection.py:267-281`). Pure — unit-tested.
    */
  def kafkaSinkOptions(
      bootstrapServers: String,
      topic: String,
      checkpointLocation: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "topic" -> topic,
    "checkpointLocation" -> checkpointLocation)

  /** Wire schema of the JSON trade messages: `time` arrives as epoch MILLIS
    * (`streaming_feature_updates.py:64-75`).
    */
  val kafkaWireSchema: StructType = StructType(Seq(
    StructField("time", LongType), StructField("symbol", StringType),
    StructField("price", DoubleType), StructField("volume", DoubleType),
    StructField("trade_id", StringType), StructField("side", StringType),
    StructField("bid", DoubleType), StructField("ask", DoubleType)))

  /** Deserialize a Kafka-shaped frame (`value` bytes/string + `timestamp`)
    * into the trades view: JSON parse + epoch-millis → timestamp. Pure
    * column transform — unit-tested on literal frames (corrupt JSON rows
    * yield all-NULL payloads, ready for DLQ routing).
    */
  def parseKafkaWire(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value").cast("string"), kafkaWireSchema).as("data"),
        col("timestamp").as("kafka_timestamp"))
      .select(col("data.*"), col("kafka_timestamp"))
      .withColumn("time", to_timestamp(col("time") / 1000))

  /** Serialize a trades-shaped frame to Kafka key/value: key = symbol,
    * value = the full row as JSON. Pure column transform — unit-tested.
    */
  def toKafkaJson(df: DataFrame): DataFrame =
    df.select(
      col("symbol").cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Kafka sink builder: anomaly records serialized to JSON and published to
    * a topic — the reference's transactional anomaly sink
    * (`flink-jobs/market-realtime/anomaly_detection.py:199-215`,
    * idempotent/transactional variant `enhanced_anomaly_detection.py:267-281`).
    * NOT startable here (no broker/connector jar); the value/key transform
    * and option assembly are the tested pieces.
    */
  def kafkaJsonSink(
      df: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpointLocation: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    toKafkaJson(df)
      .writeStream
      .format("kafka")
      .options(kafkaSinkOptions(bootstrapServers, topic, checkpointLocation))

  /** Kafka source builder. NOT runnable here — no broker and no kafka
    * connector jar in the image; kept as the production code path, with the
    * option assembly and wire deserialization unit-tested separately.
    */
  def kafkaJsonStream(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "latest",
      readCommitted: Boolean = true): DataFrame =
    parseKafkaWire(
      spark.readStream
        .format("kafka")
        .options(kafkaSourceOptions(bootstrapServers, Seq(topic), startingOffsets, readCommitted))
        .load())
}
