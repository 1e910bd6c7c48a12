package graft.governance

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, SubqueryAlias}

/** PII governance gate (SURVEY §2.8) — the load-bearing operator of the
  * reference engine (`_check_pii_violation`, sap_sql_engine.py:1202-1259),
  * reimplemented on the **analyzed LogicalPlan** instead of regexing SQL
  * text: strictly stronger (immune to aliasing/formatting evasion) and
  * applies to DataFrame-API queries too, not only SQL strings.
  *
  * Policy (mirrors the reference): a query touching a protected HR/PAY/BEN
  * table is allowed only if
  *   1. an Aggregate sits above the protected relation (GROUP BY present),
  *   2. at least one aggregate function appears in the output, and
  *   3. no PII column reaches the output un-aggregated.
  */
object PiiGate {

  /** Protected tables (reference list, sap_sql_engine.py:1211-1215). */
  val ProtectedTables: Set[String] = Set(
    "PA0001", "PA0002", "PA0006", "PA0008", "PA0014", "PA0167", "PA0168",
    "PA0169", "HRPY_RGDIR", "T511", "T512T")

  /** PII columns (reference list, sap_sql_engine.py:1244-1257). */
  val PiiColumns: Set[String] = Set("PERNR", "ENAME", "NACHN", "VORNA", "GBDAT", "PERID")

  final case class Violation(reason: String, table: String)
    extends RuntimeException(
      s"governance_block: $reason (protected table $table). " +
        "HR/PAY/BEN data may only be queried in aggregate form " +
        "without exposing PII columns.")

  private def protectedTablesIn(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case SubqueryAlias(id, _) if ProtectedTables.contains(id.name.toUpperCase) =>
        id.name.toUpperCase
    }.distinct

  /** ExprIds carrying PII: the PII attributes of protected relations, plus
    * every alias derived (transitively) from a tainted attribute — so
    * `SELECT ename AS harmless` stays tainted through any renaming. */
  private def taintedIds(plan: LogicalPlan): Set[org.apache.spark.sql.catalyst.expressions.ExprId] = {
    var tainted = Set.empty[org.apache.spark.sql.catalyst.expressions.ExprId]
    plan.foreachUp { node =>
      node match {
        case sa @ SubqueryAlias(id, _) if ProtectedTables.contains(id.name.toUpperCase) =>
          tainted ++= sa.output
            .filter(a => PiiColumns.contains(a.name.toUpperCase)).map(_.exprId)
        case _ =>
      }
      // an alias is tainted only by references OUTSIDE aggregate functions —
      // `count(distinct pernr) AS n` is the allowed aggregated form and must
      // not propagate taint
      def nakedRefs(e: Expression): Seq[AttributeReference] = e match {
        case _: AggregateExpression => Nil
        case a: AttributeReference => Seq(a)
        case other => other.children.flatMap(nakedRefs)
      }
      node.expressions.foreach(_.foreach {
        case al: org.apache.spark.sql.catalyst.expressions.Alias
            if nakedRefs(al.child).exists(r => tainted.contains(r.exprId)) =>
          tainted += al.exprId
        case _ =>
      })
    }
    tainted
  }

  /** Tainted attributes referenced outside any aggregate function within the
    * given named expressions. */
  private def nakedPii(exprs: Seq[NamedExpression],
      tainted: Set[org.apache.spark.sql.catalyst.expressions.ExprId]): Seq[String] = {
    def walk(e: Expression): Seq[String] = e match {
      case _: AggregateExpression => Nil // anything inside an aggregate is fine
      case a: AttributeReference
          if PiiColumns.contains(a.name.toUpperCase) || tainted.contains(a.exprId) =>
        Seq(a.name.toUpperCase)
      case other => other.children.flatMap(walk)
    }
    exprs.flatMap(walk)
  }

  /** Throws [[Violation]] when the plan breaks the aggregate-only policy;
    * returns the DataFrame unchanged otherwise. Wire in front of every
    * execution entry point (graft.Engine does), or install session-wide as
    * an analyzer check rule via [[graft.GraftExtensions]]. */
  def check(df: DataFrame): DataFrame = {
    checkPlan(df.queryExecution.analyzed)
    df
  }

  /** Plan-level entry point (used by the injected analyzer check rule). */
  def checkPlan(plan: LogicalPlan): Unit = {
    val touched = protectedTablesIn(plan)
    if (touched.isEmpty) return

    // find Aggregates that sit above a protected relation
    val aggs = plan.collect {
      case a: Aggregate if protectedTablesIn(a.child).nonEmpty => a
    }
    if (aggs.isEmpty)
      throw Violation("query has no aggregation over protected table", touched.head)
    val withAggFn = aggs.filter(_.aggregateExpressions.exists(_.exists {
      case _: AggregateExpression => true
      case _ => false
    }))
    if (withAggFn.isEmpty)
      throw Violation("no aggregate function over protected table", touched.head)
    val tainted = taintedIds(plan)
    val naked = aggs.flatMap(a => nakedPii(a.aggregateExpressions, tainted)).distinct
    if (naked.nonEmpty)
      throw Violation(s"PII column(s) ${naked.mkString(", ")} exposed un-aggregated",
        touched.head)
    // the final output must not surface PII either by name or by lineage
    val outPii = plan.output
      .filter(a => PiiColumns.contains(a.name.toUpperCase) || tainted.contains(a.exprId))
      .map(_.name.toUpperCase)
    if (outPii.nonEmpty)
      throw Violation(s"PII column(s) ${outPii.mkString(", ")} in result schema",
        touched.head)
  }

  def isAllowed(df: DataFrame): Boolean =
    try { check(df); true } catch { case _: Violation => false }
}
