package graft.connector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog}

/** Resolves `SELECT ... FROM <cat>.<ns>.<view>` against a [[ViewCatalog]]
  * (e.g. [[GraftCatalog]]'s warehouse-persisted SQL views).
  *
  * Stock Spark 4.1 has the ViewCatalog API but no analyzer support for
  * READING such views: `ResolveSessionCatalog` raises
  * MISSING_CATALOG_ABILITY for CREATE VIEW on every v2 catalog, and
  * relation resolution never consults `loadView` — the same gap Iceberg
  * fills with its own extension rules. This rule closes the read half:
  * an [[UnresolvedRelation]] whose explicit catalog implements
  * [[ViewCatalog]] and whose identifier names a stored view expands into
  * the parsed view body, so persisted views compose with every other
  * operator (joins, subqueries, other views) from plain SQL.
  *
  * Contracts, stated rather than silent:
  *  - Only FULLY QUALIFIED references (`cat.ns.v`) resolve. A view's own
  *    body may use relative names — they are re-qualified against the
  *    view's STORED currentCatalog/currentNamespace (captured at
  *    creation), so a view follows its definition site, not the reader's
  *    `USE` context. CTE names defined inside the body are left alone.
  *  - Stored column aliases apply positionally
  *    ([[UnresolvedSubqueryColumnAliases]] — the `AS v(a, b)` node), and
  *    the result is wrapped in a [[SubqueryAlias]] carrying the view
  *    name, so `v.col` qualifies in the reader's query.
  *  - View creation stays on the connector API ([[GraftCatalog.createView]]);
  *    SQL `CREATE VIEW` against a v2 catalog is refused upstream by
  *    Spark itself before any extension rule can see it.
  *  - A cyclic view chain fails on the analyzer's fixed-point iteration
  *    limit rather than looping forever (each pass expands one layer).
  */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def viewCatalog(name: String): Option[ViewCatalog] =
    try spark.sessionState.catalogManager.catalog(name) match {
      case vc: ViewCatalog => Some(vc)
      case _ => None
    } catch { case _: Exception => None }

  /** Table-or-CTE names the body defines locally — never re-qualified. */
  private def cteNames(body: LogicalPlan): Set[String] = {
    val names = scala.collection.mutable.Set[String]()
    body.foreach {
      case w: UnresolvedWith => names ++= w.cteRelations.map(_._1)
      case _ => ()
    }
    names.toSet
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming &&
          u.multipartIdentifier.size >= 3 =>
        val parts = u.multipartIdentifier
        viewCatalog(parts.head) match {
          case Some(vc) =>
            val ident = Identifier.of(
              parts.slice(1, parts.size - 1).toArray, parts.last)
            if (vc.viewExists(ident)) expand(vc, ident, parts.last) else u
          case None => u
        }
    }

  private def expand(vc: ViewCatalog, ident: Identifier,
                     name: String): LogicalPlan = {
    val v = vc.loadView(ident)
    val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
    val locals = cteNames(parsed)
    // The analyzer's Substitution batch (which turns WITH into
    // CTERelationDef/Ref structure) ran BEFORE this resolution-batch
    // expansion — apply it explicitly, or a view body's CTE names would
    // reach CheckAnalysis as unresolved relations.
    val body = org.apache.spark.sql.catalyst.analysis.CTESubstitution(parsed)
    // Re-qualify the body's relative relation references against the
    // view's stored definition context (1-part = ns-relative table,
    // 2-part = catalog-relative ns.table); explicit 3-part names and
    // locally-defined CTE names pass through.
    val qualified = body transform {
      case r: UnresolvedRelation if !r.isStreaming &&
          r.multipartIdentifier.size == 1 &&
          !locals.contains(r.multipartIdentifier.head) =>
        r.copy(multipartIdentifier =
          v.currentCatalog +: (v.currentNamespace.toSeq :+
            r.multipartIdentifier.head))
      case r: UnresolvedRelation if !r.isStreaming &&
          r.multipartIdentifier.size == 2 =>
        r.copy(multipartIdentifier =
          v.currentCatalog +: r.multipartIdentifier)
    }
    val aliased =
      if (v.columnAliases != null && v.columnAliases.nonEmpty)
        UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq, qualified)
      else qualified
    SubqueryAlias(name, aliased)
  }
}
