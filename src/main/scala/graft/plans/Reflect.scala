package graft.plans

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/** Plan→SQL reflection: render an analyzed logical plan back to a SQL
  * text that re-plans to the same optimized shape and the same result.
  *
  * Mirrors the reference's `doradb-plan/src/lgc/reflect.rs` (1,677 LoC),
  * which reconstructs SQL from its logical plans so optimizer outputs
  * can be round-tripped through the parser. The scope here is the block
  * chain its shape API names — Limit→Offset→Sort→Proj→Filt→Aggr→
  * Join/Scan (+ Distinct/Union) — with a generic subquery fallback:
  * any node combination outside the chain is wrapped as a derived
  * table, so reflection is total over plans whose leaves are named
  * (catalog/temp-view) relations. Catalyst `Expression.sql` provides
  * the expression text (backtick-quoted, so even synthesized names like
  * `sum(x)` re-parse).
  *
  * Reflection reads the ANALYZED plan (it still carries the view names
  * and user aliases the optimizer erases); the round-trip proof in
  * `ReflectSpec` asserts the reflected text re-plans to an optimized
  * shape equal to the original's and returns identical rows.
  */
object Reflect {

  def toSql(df: DataFrame): String = {
    val counter = new AtomicInteger(0)
    query(df.queryExecution.analyzed, counter)
  }

  /** Expression text with attribute QUALIFIERS stripped: `Expression.sql`
    * qualifies attributes by their source relation (`lineitem.l_quantity`),
    * which stops resolving once reflection introduces a derived-table
    * alias. Bare (backtick-quoted) names resolve in every scope this
    * printer emits; plans whose join sides share a column name are
    * outside the reflected chain's scope (they reach the subquery
    * fallback, where each side is aliased and projects unique names). */
  private def sqlOf(e: Expression): String =
    e.transform { case a: AttributeReference => a.withQualifier(Seq.empty) }.sql

  /** Full SELECT statement for `p`. */
  private def query(p: LogicalPlan, c: AtomicInteger): String = p match {
    case GlobalLimit(Literal(n, _), LocalLimit(_, child)) =>
      s"${query(child, c)} limit $n"
    case Offset(Literal(n, _), child) =>
      s"${query(child, c)} offset $n"
    case Sort(order, true, child, _) =>
      s"${query(child, c)} order by ${order.map(sqlOf).mkString(", ")}"
    case Distinct(child) =>
      val q = query(child, c)
      // Push DISTINCT into the select head only when the child PLAN is a
      // plain projection/aggregate: textually prefixing a rendering that
      // ends in LIMIT/ORDER BY/OFFSET would move the DISTINCT to the
      // wrong side of that clause ("select distinct ... limit n" limits
      // AFTER distinct, but Distinct(Limit(...)) distincts AFTER limit).
      child match {
        case _: Project | _: Aggregate if q.startsWith("select ") =>
          "select distinct " + q.stripPrefix("select ")
        case _ => s"select distinct * from ${wrap(q, c)}"
      }
    case Union(children, false, false) =>
      children.map(ch => s"(${query(ch, c)})").mkString(" union all ")
    // Proj/Aggr directly over Filt keep the WHERE in the same block, so
    // the FROM stays a named relation instead of a derived table
    case Project(list, Filter(cond, child)) =>
      s"select ${exprList(list)} from ${rel(child, c)} where ${sqlOf(cond)}"
    case Aggregate(groups, aggs, Filter(cond, child), _) =>
      s"select ${exprList(aggs)} from ${rel(child, c)} where ${sqlOf(cond)}" +
        groupBy(groups)
    case Project(list, child) =>
      s"select ${exprList(list)} from ${rel(child, c)}"
    case Aggregate(groups, aggs, child, _) =>
      s"select ${exprList(aggs)} from ${rel(child, c)}" + groupBy(groups)
    case Filter(cond, child) =>
      s"select * from ${rel(child, c)} where ${sqlOf(cond)}"
    // only hand over nodes rel() itself handles — an unguarded fallback
    // here would bounce unsupported nodes between query() and rel()
    // forever (StackOverflow instead of a diagnosable error)
    case other @ (_: SubqueryAlias | _: Join) =>
      s"select * from ${rel(other, c)}"
    case other =>
      throw new UnsupportedOperationException(
        s"Reflect: unsupported plan node ${other.nodeName} — " +
          "extend query()/rel() before reflecting this shape")
  }

  private def groupBy(groups: Seq[Expression]): String =
    if (groups.isEmpty) ""
    else s" group by ${groups.map(sqlOf).mkString(", ")}"

  /** FROM-clause fragment for `p`: a bare table name, a join tree, a
    * filtered relation, or a parenthesized derived table. */
  private def rel(p: LogicalPlan, c: AtomicInteger): String = p match {
    case SubqueryAlias(id, child) if isLeafRelation(child) => id.name
    case SubqueryAlias(id, child) =>
      s"(${query(child, c)}) as ${id.name}"
    case Join(l, r, Inner, Some(cond), _) =>
      s"${rel(l, c)} join ${rel(r, c)} on ${sqlOf(cond)}"
    case Join(l, r, Inner, None, _) =>
      s"${rel(l, c)} cross join ${rel(r, c)}"
    case Join(l, r, Cross, _, _) =>
      s"${rel(l, c)} cross join ${rel(r, c)}"
    case Filter(cond, child) =>
      // filter in FROM position: fold into a derived table
      wrap(s"select * from ${rel(child, c)} where ${sqlOf(cond)}", c)
    // the mirror guard of query()'s fallback: only query-shaped nodes
    // become derived tables; anything else fails loudly
    case other @ (_: GlobalLimit | _: Offset | _: Sort | _: Distinct |
        _: Union | _: Project | _: Aggregate) =>
      wrap(query(other, c), c)
    case other =>
      throw new UnsupportedOperationException(
        s"Reflect: unsupported plan node ${other.nodeName} — " +
          "extend query()/rel() before reflecting this shape")
  }

  private def wrap(sql: String, c: AtomicInteger): String =
    s"($sql) as __q${c.incrementAndGet()}"

  /** A node that a SubqueryAlias directly names as a scan: catalog or
    * file relation, possibly behind a View wrapper. */
  private def isLeafRelation(p: LogicalPlan): Boolean = p match {
    case v: View => true
    case _ if p.children.isEmpty && p.nodeName.contains("Relation") => true
    case _ => false
  }

  // sqlOf, not raw .sql: a qualified name like `lineitem`.`l_quantity`
  // does not re-resolve inside a derived-table alias scope
  private def exprList(list: Seq[Expression]): String =
    list.map(sqlOf).mkString(", ")
}
