package graft.sources

import java.io.ByteArrayOutputStream
import java.math.{BigDecimal => JBigDecimal, MathContext}
import java.nio.ByteBuffer

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Avro (de)serialization of trade records with decimal logical types — the
  * reference's wire format (`schemas/market_data.v1.avsc`: timestamp-millis
  * `time`, `bytes`-decimal(20,8) price / decimal(20,2) volume, nullable enum
  * side; producer/consumer `src/kafka/market_data_producer.py:18-190`).
  *
  * The image carries avro-core but not the spark-avro connector, so this is
  * a hand-rolled binary codec applied partition-parallel via mapPartitions —
  * the writer/reader are created once per partition (the per-batch shape a
  * Schema-Registry client would use), and the bytes are standard Avro binary
  * so any Avro consumer can read them.
  */
object AvroCodec extends Serializable {

  val SchemaJson: String = {
    val b = SchemaBuilder.record("MarketData").namespace("graft").fields()
    val tsType = LogicalTypes.timestampMillis()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val priceType = LogicalTypes.decimal(20, 8)
      .addToSchema(Schema.create(Schema.Type.BYTES))
    val volType = LogicalTypes.decimal(20, 2)
      .addToSchema(Schema.create(Schema.Type.BYTES))
    b.name("time").`type`(tsType).noDefault()
      .name("symbol").`type`().stringType().noDefault()
      .name("price").`type`(priceType).noDefault()
      .name("volume").`type`(volType).noDefault()
      .name("trade_id").`type`().stringType().noDefault()
      .name("side").`type`().optional().stringType()
      .endRecord().toString
  }

  private def decimalBytes(v: Double, scale: Int): ByteBuffer = {
    val bd = new JBigDecimal(v, MathContext.DECIMAL64).setScale(scale, java.math.RoundingMode.HALF_UP)
    ByteBuffer.wrap(bd.unscaledValue().toByteArray)
  }

  private def bytesToDecimal(bb: ByteBuffer, scale: Int): JBigDecimal = {
    val bytes = new Array[Byte](bb.remaining())
    bb.duplicate().get(bytes)
    new JBigDecimal(new java.math.BigInteger(bytes), scale)
  }

  /** trades frame → (trade_id, avro binary) — partition-parallel encode. */
  def encode(trades: DataFrame): DataFrame = {
    val spark = trades.sparkSession
    import spark.implicits._
    val in = trades.select(
      unix_millis(col("time")).as("t"), col("symbol"), col("price"),
      col("volume"), col("trade_id"), col("side"))
    val schemaJson = SchemaJson
    in.as[(Long, String, Double, Double, String, Option[String])]
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        it.map { case (t, symbol, price, volume, tradeId, side) =>
          val rec = new GenericData.Record(schema)
          rec.put("time", t)
          rec.put("symbol", symbol)
          rec.put("price", decimalBytes(price, 8))
          rec.put("volume", decimalBytes(volume, 2))
          rec.put("trade_id", tradeId)
          rec.put("side", side.orNull)
          val bos = new ByteArrayOutputStream()
          val enc = EncoderFactory.get().binaryEncoder(bos, null)
          writer.write(rec, enc)
          enc.flush()
          (tradeId, bos.toByteArray)
        }
      }.toDF("trade_id", "avro_value")
  }

  /** Registry-framed encode: register the writer schema under `subject`
    * (compat-gated), then ship magic+id-framed Avro — the reference
    * producer's wire path (`market_data_producer.py:38-59`). The header is a
    * per-run constant, so the framing itself is a codegen'd binary concat —
    * no second pass over the payload bytes.
    */
  def encodeFramed(
      trades: DataFrame,
      registry: SchemaRegistry,
      subject: String = "market-data-value"): DataFrame = {
    val id = registry.register(subject, SchemaJson)
    encode(trades).select(
      col("trade_id"),
      concat(lit(SchemaRegistry.header(id)), col("avro_value")).as("avro_value"))
  }

  /** Registry-framed decode with schema RESOLUTION: each frame's writer
    * schema is looked up by its id (from the registry snapshot shipped in
    * the closure) and read against `readerSchemaJson` — old frames stay
    * readable after evolution, added-with-default fields fill in.
    */
  def decodeFramed(
      frames: DataFrame,
      registry: SchemaRegistry,
      readerSchemaJson: String = SchemaJson,
      valueCol: String = "avro_value"): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val byId = registry.snapshot
    frames.select(col(valueCol)).as[Array[Byte]]
      .mapPartitions { it =>
        val reader = new Schema.Parser().parse(readerSchemaJson)
        val writerCache = scala.collection.mutable.Map[Int, GenericDatumReader[GenericRecord]]()
        it.map { framed =>
          val (id, bytes) = SchemaRegistry.unframe(framed)
          val datumReader = writerCache.getOrElseUpdate(id, {
            val writerJson = byId.getOrElse(id,
              throw new IllegalArgumentException(s"unknown schema id $id"))
            new GenericDatumReader[GenericRecord](
              new Schema.Parser().parse(writerJson), reader)
          })
          val dec = DecoderFactory.get().binaryDecoder(bytes, null)
          val rec = datumReader.read(null, dec)
          val side = Option(rec.get("side")).map(_.toString)
          (rec.get("time").asInstanceOf[Long],
            rec.get("symbol").toString,
            bytesToDecimal(rec.get("price").asInstanceOf[ByteBuffer], 8).doubleValue(),
            bytesToDecimal(rec.get("volume").asInstanceOf[ByteBuffer], 2).doubleValue(),
            rec.get("trade_id").toString,
            side)
        }
      }.toDF("time_millis", "symbol", "price", "volume", "trade_id", "side")
      .select(
        timestamp_millis(col("time_millis")).as("time"),
        col("symbol"), col("price"), col("volume"), col("trade_id"), col("side"))
  }

  /** (key, avro binary) → trades columns — partition-parallel decode. */
  def decode(frames: DataFrame, valueCol: String = "avro_value"): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val schemaJson = SchemaJson
    frames.select(col(valueCol)).as[Array[Byte]]
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        it.map { bytes =>
          val dec = DecoderFactory.get().binaryDecoder(bytes, null)
          val rec = reader.read(null, dec)
          val side = Option(rec.get("side")).map(_.toString)
          (rec.get("time").asInstanceOf[Long],
            rec.get("symbol").toString,
            bytesToDecimal(rec.get("price").asInstanceOf[ByteBuffer], 8).doubleValue(),
            bytesToDecimal(rec.get("volume").asInstanceOf[ByteBuffer], 2).doubleValue(),
            rec.get("trade_id").toString,
            side)
        }
      }.toDF("time_millis", "symbol", "price", "volume", "trade_id", "side")
      .select(
        timestamp_millis(col("time_millis")).as("time"),
        col("symbol"), col("price"), col("volume"), col("trade_id"), col("side"))
  }
}
