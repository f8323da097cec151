package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate-robustness harness for the SQL-catalog registry queries — the r13
  * regression: `q_versioned_sql_{delete,update,merge}` recorded
  * `hash_match: false` at the driver's sf0.01 gate while passing every
  * serial replication, i.e. a harness-order/session-state dependency, not
  * a value bug. This spec recreates the hostile conditions inside one JVM:
  *
  *   - every SQL-catalog query runs TWICE, interleaved with its library
  *     twin, and both passes must be value-identical;
  *   - the second pass runs with a FOREIGN session (no extensions, no
  *     graft catalog) set as the thread's active session before each
  *     query — any `SparkSession.active` resolution inside the catalog
  *     path would now resolve against a session that cannot even see the
  *     graft provider;
  *   - the three SQL DML twins must be value-identical to their library
  *     twins (`q_versioned_delete/update/merge`), which share corpus,
  *     kernel, and rollup — the exact equivalence the driver's DuckDB
  *     oracle checks, asserted here without DuckDB.
  */
class SqlSessionStressSpec extends SparkTestBase {

  /** Canonical value image, mirroring the driver's compare: columns
    * sorted by name, rows sorted, exact string rendering (the rollups'
    * doubles are bigint/10^k quotients — bit-stable across passes).
    */
  private def canon(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private val libraryTwin = Map(
    "q_versioned_sql_delete" -> "q_versioned_delete",
    "q_versioned_sql_update" -> "q_versioned_update",
    "q_versioned_sql_merge" -> "q_versioned_merge")

  test("SQL-catalog queries: two interleaved passes, foreign active session, library-twin equality") {
    val names = registry.SqlCatalogQueries.queries.keySet.toSeq.sorted
    // a session that knows nothing of graft: extensions not injected,
    // session catalog is the stock one
    val foreign = spark.newSession()
    val prevActive = SparkSession.getActiveSession
    try {
      val pass1 = names.map { n =>
        val got = canon(SparkEntry.queries(n)(spark, sf0001))
        // interleave: the library twin runs between SQL-catalog queries,
        // churning the harness session exactly like the driver's sweep
        libraryTwin.get(n).foreach { twin =>
          val lib = canon(SparkEntry.queries(twin)(spark, sf0001))
          assert(got === lib,
            s"$n diverged from its library twin $twin on pass 1")
        }
        n -> got
      }.toMap
      val pass2 = names.map { n =>
        SparkSession.setActiveSession(foreign) // hostile thread state
        n -> canon(SparkEntry.queries(n)(spark, sf0001))
      }.toMap
      for (n <- names)
        assert(pass1(n) === pass2(n),
          s"$n is not stable across interleaved passes (foreign active session)")
    } finally {
      SparkSession.clearActiveSession()
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("catalog session self-heals when its cached session's context is foreign") {
    // the cached catalog session must be keyed to the LIVE context: asking
    // for it twice hands back one session, and it is never the foreign one
    val s1 = registry.SqlCatalogQueries.session(spark)
    val s2 = registry.SqlCatalogQueries.session(spark)
    assert(s1 eq s2, "catalog session must be cached")
    assert(s1.sparkContext eq spark.sparkContext)
    assert(s1.conf.get("spark.sql.catalog.spark_catalog")
      .contains("GraftCatalog"))
  }
}
