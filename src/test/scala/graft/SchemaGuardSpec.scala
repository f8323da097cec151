package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType}

/** Static output-schema guard for the whole registry.
  *
  * The corpus has NO decimal columns, so a DecimalType anywhere in a
  * registered query's output schema is always the same bug: a fractional
  * literal in Spark SQL (`/ 100.0`) typing a quotient as DECIMAL while the
  * DuckDB oracle computes DOUBLE — value-equal but hash-RED at the
  * driver's strict gate. This burned the gate in r13 (three SQL-DML
  * queries) and AGAIN in r14 (`q_zorder_sql`), both times with the fix
  * rule already documented in-source. This sweep makes a third recurrence
  * impossible: every query's DataFrame is constructed (schema is
  * plan-time; nothing is collected here beyond what construction itself
  * runs) and its schema recursively searched for DecimalType.
  */
class SchemaGuardSpec extends SparkTestBase {

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(path)
    case s: StructType =>
      s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
    case a: org.apache.spark.sql.types.ArrayType =>
      decimalPaths(a.elementType, s"$path[]")
    case m: org.apache.spark.sql.types.MapType =>
      decimalPaths(m.keyType, s"$path<key>") ++ decimalPaths(m.valueType, s"$path<val>")
    case _ => Nil
  }

  test("no registered query's output schema contains a DecimalType") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val schema =
          try mk(spark, sf0001).schema
          catch {
            case e: Throwable =>
              fail(s"$name failed to construct at sf0.001: ${e.getMessage}", e)
          }
        decimalPaths(schema, name)
    }
    assert(offenders.isEmpty,
      s"DECIMAL in output schema (fractional Spark SQL literal? use 1e2-style " +
        s"scientific notation — see SqlCatalogQueries.statusRollup doc): " +
        offenders.mkString(", "))
  }
}
