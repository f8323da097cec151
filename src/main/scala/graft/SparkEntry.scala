package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one named query per implemented
  * SURVEY §2 operator), assembled from the per-module registries; `oracleSql`
  * carries the DuckDB-equivalent SQL for every hash-checkable query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's flagship entry point — a full PIT feature snapshot
    * (`sql/smartdb_contract.md:113-119`).
    */
  def entry(spark: SparkSession): DataFrame =
    registry.FeatureQueries.queries("q_pit_snapshot")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.CoreQueries.queries ++
      registry.FeatureQueries.queries ++
      registry.ExtQueries.queries ++
      registry.QualityQueries.queries ++
      registry.StreamQueries.queries ++
      registry.SqlCatalogQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows/schema-only check.
    */
  def oracleSql: Map[String, String] =
    registry.CoreQueries.oracles ++
      registry.FeatureQueries.oracles ++
      registry.ExtQueries.oracles ++
      registry.QualityQueries.oracles ++
      registry.StreamQueries.oracles ++
      registry.SqlCatalogQueries.oracles
}
