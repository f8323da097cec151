package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level security: a mandatory tenant predicate injected onto every
  * fact-table access — the Spark-library analogue of the reference's
  * Postgres RLS policies (`sql/timescaledb_schema.sql:417-436`,
  * `src/security/rls_encryption_audit.py:13-44`,
  * `get_user_tenants()` helper `:425-431`).
  *
  * In a DB the policy rides on `current_setting('app.current_tenant')`; here
  * the API layer holds the session tenant and every reader goes through
  * `withTenant`, so the predicate lands INSIDE the scan (pushed filter +
  * partition pruning when data is tenant-partitioned).
  */
object Rls {

  /** Deterministic symbol→tenant assignment used by the demo corpus: tenant
    * id = symbol (as int) mod 3.
    */
  def tenantOf(symbol: Column): Column = pmod(symbol.cast("long"), lit(3L))

  /** Enforce: only rows belonging to `tenant` are visible. */
  def withTenant(df: DataFrame, tenant: Long, symbolCol: String = "symbol"): DataFrame =
    df.filter(tenantOf(col(symbolCol)) === tenant)

  /** Multi-tenant membership: only rows belonging to ANY of the session's
    * tenants are visible — the reference's `get_user_tenants()` array
    * policy (`sql/timescaledb_schema.sql:425-436`: `tenant_id = ANY(...)`).
    */
  def withTenants(df: DataFrame, tenants: Seq[Long], symbolCol: String = "symbol"): DataFrame =
    df.filter(tenantOf(col(symbolCol)).isInCollection(tenants))
}
