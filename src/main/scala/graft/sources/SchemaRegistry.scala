package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType

/** Schema-Registry wire semantics — the missing half of the reference's
  * producer path (`src/kafka/market_data_producer.py:38-59`: register the
  * schema, ship registry-framed Avro):
  *
  *  - **Wire framing**: magic byte `0x00` + big-endian 4-byte schema id +
  *    Avro binary payload (the Confluent frame layout — public wire format).
  *  - **Registration**: versions per subject; re-registering an identical
  *    schema returns its existing id; a NEW version must be
  *    backward-compatible (new reader reads data written with every prior
  *    version) — gated with Avro's own `SchemaCompatibility`, the same
  *    check the reference's CI gate runs (`schema_compatibility.py:185-222`;
  *    the Spark-StructType twin of that gate is [[SchemaCompat]]).
  *  - **Resolution**: consumers look the WRITER schema up by the frame id
  *    and decode with (writer, reader) schema resolution, so old frames
  *    remain readable after evolution (added-with-default fields fill in).
  *
  * In-memory registry (no registry service in the zero-egress image); the
  * id→schema table snapshots to an immutable map that ships inside task
  * closures, so executors resolve ids without a network hop — the shape a
  * registry CLIENT's local cache has anyway.
  */
final class SchemaRegistry extends Serializable {

  private val byId = scala.collection.mutable.LinkedHashMap[Int, String]()
  private val bySubject = scala.collection.mutable.LinkedHashMap[String, List[Int]]()
  private var nextId = 1

  /** Register (or look up) `schemaJson` under `subject`; returns its id.
    * Throws on a backward-incompatible new version, like the reference's
    * CI-blocking gate.
    */
  def register(subject: String, schemaJson: String): Int = synchronized {
    val parsed = new Schema.Parser().parse(schemaJson)
    val versions = bySubject.getOrElse(subject, Nil)
    versions.find(id => new Schema.Parser().parse(byId(id)) == parsed) match {
      case Some(id) => id
      case None =>
        versions.foreach { oldId =>
          val old = new Schema.Parser().parse(byId(oldId))
          val res = SchemaCompatibility.checkReaderWriterCompatibility(parsed, old)
          require(res.getType == SchemaCompatibilityType.COMPATIBLE,
            s"schema evolution rejected for $subject (not backward-compatible " +
              s"with version id=$oldId): ${res.getDescription}")
        }
        val id = nextId
        nextId += 1
        byId(id) = schemaJson
        bySubject(subject) = versions :+ id
        id
    }
  }

  def schemaById(id: Int): Option[String] = synchronized(byId.get(id))

  /** Latest (id, schema) registered under `subject`. */
  def latest(subject: String): Option[(Int, String)] = synchronized(
    bySubject.get(subject).flatMap(_.lastOption).map(id => (id, byId(id))))

  /** Immutable id→schema snapshot for task closures. */
  def snapshot: Map[Int, String] = synchronized(byId.toMap)
}

object SchemaRegistry {

  val MagicByte: Byte = 0x00

  /** Confluent wire frame: magic + big-endian id + payload. */
  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + payload.length)
    bb.put(MagicByte).putInt(schemaId).put(payload)
    bb.array()
  }

  /** The 5-byte header alone — lets Spark prepend it with a binary concat. */
  def header(schemaId: Int): Array[Byte] =
    ByteBuffer.allocate(5).put(MagicByte).putInt(schemaId).array()

  /** Split a framed message into (schema id, Avro payload). */
  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5 && bytes(0) == MagicByte,
      s"not a registry-framed message (len=${bytes.length}, " +
        s"magic=${if (bytes.nonEmpty) bytes(0) else "∅"})")
    val bb = ByteBuffer.wrap(bytes)
    bb.get()
    val id = bb.getInt()
    (id, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }
}
