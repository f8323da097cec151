package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-integrity invariants — no Spark session needed. Guards the
  * split-by-tier registry composition (FeatureQueries = base ++
  * PortfolioQueries ++ IndicatorQueries): a dropped query, a dangling
  * oracle, or a key captured by two modules fails HERE with names, not as
  * a silent hole in the correctness gate.
  */
class RegistrySpec extends AnyFunSuite {

  test("every registered query has an oracle and every oracle a query") {
    // Deliberately rows-only (driver records rows/schema, no value hash):
    // sketch outputs whose estimates aren't cross-engine exact. Keep this
    // list EXPLICIT — a query missing its oracle by accident must fail here.
    val rowsOnly = Set("q_profile_approx")
    val q = SparkEntry.queries.keySet -- rowsOnly
    val o = SparkEntry.oracleSql.keySet
    assert((rowsOnly -- SparkEntry.queries.keySet).isEmpty,
      "rows-only allowlist names an unregistered query")
    assert((rowsOnly & o).isEmpty,
      "rows-only query grew an oracle — remove it from the allowlist")
    assert((q diff o).isEmpty, s"queries without oracle: ${(q diff o).toSeq.sorted}")
    assert((o diff q).isEmpty, s"oracles without query: ${(o diff q).toSeq.sorted}")
  }

  test("module registries are pairwise disjoint (no key silently shadowed)") {
    val mods = Seq(
      "core" -> registry.CoreQueries.queries.keySet,
      "feature" -> registry.FeatureQueries.queries.keySet,
      "ext" -> registry.ExtQueries.queries.keySet,
      "quality" -> registry.QualityQueries.queries.keySet,
      "stream" -> registry.StreamQueries.queries.keySet,
      "sqlcatalog" -> registry.SqlCatalogQueries.queries.keySet)
    for (Seq((na, a), (nb, b)) <- mods.combinations(2)) {
      val overlap = a intersect b
      assert(overlap.isEmpty, s"$na and $nb both register: ${overlap.toSeq.sorted}")
    }
  }

  test("the tier split preserved the full feature registry") {
    // names that must exist after the FeatureQueries split (one sentinel
    // per tier: base / portfolio / indicator)
    val q = registry.FeatureQueries.queries.keySet
    for (k <- Seq("q_pit_snapshot", "q_beta", "q_pair_corr", "q_cs_momentum",
        "q_bipower", "q_higher_moments", "q_autocorr", "q_bollinger",
        "q_hampel", "q_vpin", "q_kyle_lambda", "q_session_stats"))
      assert(q.contains(k), s"tier split lost $k")
    // 214 = r16's 212 + the r17 drift-triggered re-cluster policy
    // (q_recluster_policy) + SQL-declared maintenance (q_policy_sql);
    // raise this floor whenever a query is added, never lower it
    assert(SparkEntry.queries.size >= 214,
      s"registry shrank: ${SparkEntry.queries.size} < 214")
  }
}
