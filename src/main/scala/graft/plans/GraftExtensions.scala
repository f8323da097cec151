package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions entry point: register the engine's native expressions
  * at session build time —
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Kept deliberately small: per SURVEY §4 the reference requires zero custom
  * optimizer rules (Catalyst's pushdown/pruning/reorder cover it); the only
  * planner-level code this engine carries is the codegen'd expression layer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSimilarity.name),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.name),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectOptimizerRule(spark => new TenantFilterRule(spark))
  }
}
