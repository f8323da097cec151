package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** OpenLineage-style lineage records per query — the engine analogue of the
  * reference's run-event tracker (`src/observability/openlineage_tracker.py`,
  * Marquez setup at `marquez_setup.py`): for every registered query the
  * runner emits one event naming the job, its INPUT datasets (resolved from
  * the analyzed plan's file relations — not declared by hand, so the record
  * cannot drift from the actual read set), its OUTPUT dataset, and a schema
  * facet (column names:types plus a stable hash for cheap change detection).
  *
  * Kept deliberately dependency-free: one JSON line per event, the
  * OpenLineage COMPLETE run-event field subset (eventType, job, inputs,
  * outputs, schema facet) — a downstream Marquez shipper is a `curl` away.
  */
object Lineage {

  final case class Event(
      job: String,
      inputs: Seq[String],
      output: String,
      schemaHash: String,
      columns: Seq[(String, String)])

  /** Input datasets of a frame: every file-backed relation in the ANALYZED
    * plan (pre-optimization, so pruned-away branches still count as reads
    * the query declared). Paths are deduplicated and sorted for stable
    * records.
    */
  def inputsOf(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.distinct.sorted

  /** Stable schema facet hash: md5 of the canonical `name:dataType` list —
    * the same evolution signal the reference's SchemaDatasetFacet carries.
    */
  def schemaHash(df: DataFrame): String = {
    val canon = df.schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def capture(job: String, df: DataFrame, output: String): Event =
    Event(job, inputsOf(df), output, schemaHash(df),
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)

  /** Reproducibility fingerprint of a dataset — the reference's training
    * provenance hashes (`src/modeling/train_reproducible.py:53-82`:
    * `compute_data_hash` + `compute_schema_hash`) as a one-row query:
    * (dataset, n_rows, content_hash, schema_hash).
    *
    * The content hash must be ORDER-INDEPENDENT (partitioning and task
    * order are not reproducible; the data is): each row's caller-provided
    * canonical key string hashes to a 60-bit integer (first 15 md5 hex
    * digits — positive in a BIGINT on every engine) and rows combine with
    * BIT_XOR, which is associative-commutative-exact. The key must be
    * built from engine-portable atoms (strings, integers, 1e6-scaled
    * quantized images — never raw float-to-string casts, whose formatting
    * is engine-specific).
    */
  def datasetFingerprint(df: DataFrame, name: String,
      key: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(
        conv(substring(md5(key), 1, 15), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.expr("bit_xor(h)").as("content_hash"))
      .select(lit(name).as("dataset"), col("n_rows"), col("content_hash"),
        lit(schemaHash(df)).as("schema_hash"))
  }

  /** One OpenLineage-flavoured JSON line (COMPLETE run event subset). */
  def toJson(e: Event): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val ins = e.inputs.map(p => s"""{"name":${q(p)}}""").mkString("[", ",", "]")
    val fields = e.columns
      .map { case (n, t) => s"""{"name":${q(n)},"type":${q(t)}}""" }
      .mkString("[", ",", "]")
    s"""{"eventType":"COMPLETE","job":{"name":${q(e.job)}},"inputs":$ins,""" +
      s""""outputs":[{"name":${q(e.output)},"facets":{"schema":{"hash":${q(e.schemaHash)},""" +
      s""""fields":$fields}}}]}"""
  }
}
