package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` injection point — the config-driven way to ship
  * graft's native functions to a cluster where the application code never
  * calls [[GraftFunctions.register]]:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * Injected functions live in the session's catalog from the first query,
  * including sessions created by thrift/Connect servers that graft code
  * never touches. Two tiers are injected: native functions
  * (injectFunction — fnv64, ngrams) and the one whole-operator strategy
  * (injectPlannerStrategy — [[graft.plans.TopKPerKeyStrategy]], the
  * (c)-tier custom LogicalPlan/SparkPlan pair; every other operator is
  * deliberately expressible in stock Catalyst plans, SURVEY.md §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // SQL MERGE INTO / UPDATE on graft tables as atomic DV merges.
    ext.injectPlannerStrategy(_ => graft.connector.GraftMergeStrategy)
    // Auto-rewrite Filter(row_number <= k, Window(...)) into the bounded-
    // heap operator, so plain window-top-k user queries get the pruned
    // exchange without calling the TopK API.
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    // Re-expose V1Scan statistics hidden by Spark's V1ScanWrapper, so
    // graft snapshot scans feed real sizes into join selection.
    ext.injectOptimizerRule(_ => graft.connector.StatsPropagationRule)
    // Answer a GROUP BY matching a registered fresh materialized view
    // from the view table (scan avoidance; staleness falls back).
    ext.injectOptimizerRule(_ => graft.connector.MvRewriteRule)
    // SELECT from warehouse-persisted v2 views (stock Spark resolves
    // views only in the session catalog).
    ext.injectResolutionRule(s => graft.connector.ResolveGraftViews(s))
    ext.injectFunction((
      FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[FnvHash64].getName, "fnv64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FnvHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NGrams(exprs.head, exprs(1))))
  }
}
