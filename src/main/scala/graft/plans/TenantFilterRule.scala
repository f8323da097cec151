package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EqualTo, In, Literal, Pmod}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Row-level security as a Catalyst rule: when `spark.graft.rls.tenant` is
  * set, every scan of the trade-event source gets a mandatory tenant
  * predicate injected directly above the relation — the planner-level
  * equivalent of the reference's Postgres RLS policies
  * (`sql/timescaledb_schema.sql:417-436`, `current_setting('app.current_tenant')`
  * + `get_user_tenants()` `:425-431`).
  *
  * Because the predicate lands at the scan, Catalyst's pushdown carries it
  * into the parquet reader (row-group skipping / partition pruning when data
  * is tenant-partitioned) — the API-layer alternative
  * ([[graft.operators.Rls.withTenant]]) relies on callers remembering to
  * apply it; this rule makes the session itself incapable of seeing other
  * tenants' rows.
  *
  * Tenant assignment matches [[graft.operators.Rls.tenantOf]]:
  * `user_id mod 3`.
  */
class TenantFilterRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import TenantFilterRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    spark.conf.getOption(TenantConfKey) match {
      case None => plan
      case Some(tenantCsv) =>
        // single tenant ("1") or membership list ("0,2") — the reference's
        // `tenant_id = ANY(get_user_tenants())` membership shape. An empty
        // list (a user with NO tenants — get_user_tenants() can legitimately
        // return none) must deny everything, not blow up the optimizer.
        val tenants = tenantCsv.split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.toLong).toSeq
        plan.transformUp {
          case rel: LogicalRelation if isTradeSource(rel) && rel.getTagValue(Applied).isEmpty =>
            rel.setTagValue(Applied, true)
            val userId = rel.output.find(_.name == "user_id").get
            val tenantOf = Pmod(userId, Literal(3L))
            val pred = tenants match {
              case Seq()    => Literal.FalseLiteral
              case Seq(one) => EqualTo(tenantOf, Literal(one))
              case many     => In(tenantOf, many.map(Literal(_)))
            }
            Filter(pred, rel)
        }
    }

  private def isTradeSource(rel: LogicalRelation): Boolean =
    rel.output.exists(_.name == "user_id") && (rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.contains("events"))
      case _ => false
    })
}

object TenantFilterRule {

  val TenantConfKey = "spark.graft.rls.tenant"

  private val Applied = TreeNodeTag[Boolean]("graft.rls.applied")

  /** Install the rule on a live session (also injectable at build time via
    * [[GraftExtensions]]) and scope the session to `tenant`.
    */
  def enable(spark: SparkSession, tenant: Long): Unit = enable(spark, Seq(tenant))

  /** Multi-tenant session: the scan predicate becomes a membership filter
    * over all of the session's tenants (`get_user_tenants()` semantics).
    */
  def enable(spark: SparkSession, tenants: Seq[Long]): Unit = {
    spark.conf.set(TenantConfKey, tenants.mkString(","))
    val already = spark.experimental.extraOptimizations.exists(_.isInstanceOf[TenantFilterRule])
    if (!already)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new TenantFilterRule(spark)
  }

  def disable(spark: SparkSession): Unit = spark.conf.unset(TenantConfKey)
}
