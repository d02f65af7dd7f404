package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.tpch.RefSchema

/** Plan-shape assertions for the verbatim TPC-H texts on the synthesized
  * canonical schema: the 100 TB properties (pushdown to the scan,
  * broadcast of dimensions, partial aggregation, no cartesian fallback)
  * must fire for the unmodified reference SQL exactly as they do for the
  * fixture-adapted entries. */
class RefPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(n: Int): DataFrame = {
    RefSchema.ensureRegistered(spark, TestSpark.Sf)
    spark.sql(RefSchema.verbatim(n))
  }

  private def plan(n: Int): String =
    df(n).queryExecution.executedPlan.toString

  test("verbatim q1: shipdate filter pushed to the parquet scan + partial agg") {
    val p = plan(1)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushdown in:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg in:\n$p")
  }

  test("verbatim q5: six-way join broadcasts the dimension tables") {
    val p = plan(5)
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian fallback in:\n$p")
  }

  test("verbatim q9: five-way join with LIKE filter avoids cartesian product") {
    val p = plan(9)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop fallback in:\n$p")
  }

  test("verbatim q21: correlated EXISTS/NOT EXISTS plan as semi/anti joins") {
    val p = plan(21)
    assert(p.contains("LeftSemi") || p.contains("ExistenceJoin"),
      s"no semi join in:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join in:\n$p")
  }

  test("verbatim q3: top-k with limit does not sort the full join output") {
    val p = plan(3)
    assert(p.contains("TakeOrderedAndProject"), s"no top-k fusion in:\n$p")
  }
}
