package graft.sources

import org.apache.spark.sql.types._

/** Schema-evolution compatibility checker — the Spark-schema port of the
  * reference's Schema-Registry gate (`src/kafka/schema_compatibility.py:22-151`,
  * CI-blocking at `:185-222`):
  *
  *  - BACKWARD (new reader, old data): every field the new schema adds must
  *    be nullable-or-defaulted; removed fields are fine; type changes only
  *    along widening promotions.
  *  - FORWARD (old reader, new data): the new schema must not remove fields
  *    the old one requires; additions are fine.
  *  - Promotions allowed (both directions of check, one direction of type):
  *    int→long, float→double, int/long→double, decimal scale/precision
  *    widening — the Avro promotion set the reference enforces.
  *
  * Pure metadata logic (no Spark session) so it can gate CI and be called
  * from `mergeSchema`-style ingestion before any data moves.
  */
object SchemaCompat {

  final case class Incompatibility(field: String, reason: String)

  def isPromotion(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (IntegerType, DoubleType) => true
    case (LongType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.precision >= a.precision && b.scale >= a.scale &&
        (b.precision - b.scale) >= (a.precision - a.scale)
    case (ArrayType(a, an), ArrayType(b, bn)) => isPromotion(a, b) && (bn || !an)
    case (a: StructType, b: StructType) => backward(a, b).isEmpty
    case _ => false
  }

  /** Violations preventing a reader of `newSchema` from reading `oldSchema` data. */
  def backward(oldSchema: StructType, newSchema: StructType): Seq[Incompatibility] = {
    val oldFields = oldSchema.fields.map(f => f.name -> f).toMap
    newSchema.fields.toSeq.flatMap { nf =>
      oldFields.get(nf.name) match {
        case None if !nf.nullable =>
          Some(Incompatibility(nf.name, "added field must be nullable (no default for old rows)"))
        case None => None
        case Some(of) if !isPromotion(of.dataType, nf.dataType) =>
          Some(Incompatibility(nf.name,
            s"type change ${of.dataType.simpleString} -> ${nf.dataType.simpleString} is not a widening promotion"))
        case Some(of) if of.nullable && !nf.nullable =>
          Some(Incompatibility(nf.name, "nullable field cannot become required"))
        case _ => None
      }
    }
  }

  /** Violations preventing a reader of `oldSchema` from reading `newSchema` data. */
  def forward(oldSchema: StructType, newSchema: StructType): Seq[Incompatibility] = {
    val newFields = newSchema.fields.map(f => f.name -> f).toMap
    oldSchema.fields.toSeq.flatMap { of =>
      newFields.get(of.name) match {
        case None if !of.nullable =>
          Some(Incompatibility(of.name, "required field removed (old readers break)"))
        case None => None
        case Some(nf) if !isPromotion(of.dataType, nf.dataType) =>
          Some(Incompatibility(of.name,
            s"type change ${of.dataType.simpleString} -> ${nf.dataType.simpleString} is not readable by old readers"))
        case _ => None
      }
    }
  }

  def isFullyCompatible(oldSchema: StructType, newSchema: StructType): Boolean =
    backward(oldSchema, newSchema).isEmpty && forward(oldSchema, newSchema).isEmpty

  /** CI gate: throw (blocking) on incompatibility, like the reference's
    * `check_compatibility_or_fail`.
    */
  def requireCompatible(oldSchema: StructType, newSchema: StructType): Unit = {
    val problems = backward(oldSchema, newSchema) ++ forward(oldSchema, newSchema)
    require(problems.isEmpty,
      s"schema evolution rejected: ${problems.map(p => s"${p.field}: ${p.reason}").mkString("; ")}")
  }
}
