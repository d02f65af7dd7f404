package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Plan-shape introspection mirroring the reference's `LgcPlan::shape()`
  * (doradb-plan/src/lgc/mod.rs:49-65), which its unit tests assert on
  * (e.g. "select 1 from t1" → [Proj, Table], lgc/mod.rs:115-250).
  *
  * Returns the preorder operator sequence of the OPTIMIZED logical plan,
  * named in the reference's vocabulary (doradb-plan/src/lgc/op.rs:162-216)
  * so shape tests read the same as the reference's.
  */
object PlanShape {

  def shape(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect { case n => name(n) }

  /** Raw Catalyst node names (preorder), for debugging. */
  def catalystShape(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect { case n => n.nodeName }

  private def name(n: LogicalPlan): String = n match {
    case _: Project => "Proj"
    case _: Filter => "Filt"
    case _: Aggregate => "Aggr"
    case j: Join => s"Join(${j.joinType.sql})"
    case _: Sort => "Sort"
    case _: GlobalLimit | _: LocalLimit | _: Offset => "Limit"
    case _: Union => "Setop(Union)"
    case _: Except => "Setop(Except)"
    case _: Intersect => "Setop(Intersect)"
    case _: Window => "Window"
    case _: OneRowRelation => "Row"
    case _: LocalRelation => "Empty" // optimizer-propagated empty/const relation
    case _: Distinct => "Distinct"
    case _: WithCTE => "With"
    case _: SubqueryAlias => "Query"
    case l if l.nodeName.contains("Relation") => "Scan"
    case other => other.nodeName
  }
}
