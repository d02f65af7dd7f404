package graft

import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
import org.scalatest.funsuite.AnyFunSuite

/** Remaining reference-rule parity proofs (SURVEY §4.1): each test pins
  * one reference rewrite to the Catalyst rule that performs it.
  * - `outerjoin_reduce` (rule/outerjoin_reduce.rs, 469 LoC): a
  *   null-rejecting predicate over the nullable side converts the outer
  *   join to inner → `EliminateOuterJoin`.
  * - `op_eliminate` (rule/op_eliminate.rs): ORDER BY inside an
  *   unlimited subquery is dropped → `EliminateSorts`; nested LIMITs
  *   collapse → `EliminateLimits`.
  * - `derived_unfold` (rule/derived_unfold.rs, 567 LoC): derived tables
  *   flatten into the parent → `CollapseProject`. */
class RuleParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def optimized(sql: String) = {
    Tables.registerAll(spark, TestSpark.Sf)
    spark.sql(sql).queryExecution.optimizedPlan
  }

  test("outerjoin_reduce: null-rejecting filter turns LEFT into INNER") {
    val p = optimized(
      """select c_custkey, o_orderkey
        |from customer left join orders on c_custkey = o_custkey
        |where o_totalprice > 1000""".stripMargin).toString
    assert(p.contains("Join Inner"), p)
    assert(!p.contains("LeftOuter"), p)
  }

  test("op_eliminate: ORDER BY in an unlimited subquery is dropped") {
    val p = optimized(
      """select count(*) as n from (
        |  select * from nation order by n_name) t""".stripMargin)
    assert(p.collect { case s: Sort => s }.isEmpty, p.toString)
  }

  test("op_eliminate: nested LIMITs collapse to the smaller one") {
    val p = optimized(
      "select * from (select n_name from nation limit 10) t limit 5").toString
    assert("GlobalLimit".r.findAllIn(p).size == 1, p)
    assert(p.contains("GlobalLimit 5"), p)
  }

  test("derived_unfold: stacked derived-table projections collapse to one") {
    val p = optimized(
      """select a + 1 as b from (
        |  select n_nationkey + 1 as a from nation) t""".stripMargin)
    assert(p.collect { case pr: Project => pr }.size == 1, p.toString)
  }
}
