package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // UTC + INT64-micros parquet from the ONE engine-defaults site
    // (graft.core.EngineSession — the footer-stats fast path depends on it)
    val spark = graft.core.EngineSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q_a,q_b restricts the dump (local iteration
    // only — the driver sets nothing and gets the full registry). An empty
    // value means no filter, and unknown names fail loudly instead of
    // silently dumping nothing.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_VERIFY_ONLY names not in registry: $unknown")
    }
    // Per-query OpenLineage-style records (inputs resolved from the actual
    // analyzed plan, output path, schema facet hash) — the reference's
    // openlineage_tracker.py surface, emitted by the runner itself.
    val lineage = new StringBuilder
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // The DUMP stays INT96: the driver's pandas normalization reads
        // INT96 as tz-naive timestamps (the historical encoding of these
        // artifacts); TIMESTAMP_MICROS(adjustedToUTC) arrives tz-AWARE and
        // breaks its astype. Engine-internal commits (which run eagerly
        // inside fn) keep the session's TIMESTAMP_MICROS fast path; only
        // this output write flips back.
        val tsKey = "spark.sql.parquet.outputTimestampType"
        spark.conf.set(tsKey, "INT96")
        try df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        finally spark.conf.set(tsKey, "TIMESTAMP_MICROS")
        lineage.append(graft.quality.Lineage.toJson(
          graft.quality.Lineage.capture(name, df, s"$outDir/$name"))).append('\n')
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/lineage.jsonl"), lineage.toString)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
