package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proof that Catalyst performs the reference's `expr_simplify` rewrites
  * (rule/expr_simplify.rs, 2,315 LoC; typed const folds in
  * doradb-expr/src/fold/{add,sub,neg,not,cmp}.rs) — SURVEY §4.1 claims
  * these come free from ConstantFolding / BooleanSimplification /
  * NullPropagation / ConstantPropagation; each test pins one claimed
  * equivalence to an optimized-plan observation. */
class ExprSimplifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def optimized(sql: String): String = {
    Tables.registerAll(spark, TestSpark.Sf)
    spark.sql(sql).queryExecution.optimizedPlan.toString
  }

  test("constant folding: arithmetic on literals collapses before pushdown") {
    val p = optimized(
      "select n_name from nation where n_nationkey < 1 + 2 * 3")
    assert(p.contains("< 7") && !p.contains("2 * 3"), p)
  }

  test("null propagation: null-strict expression folds to literal null") {
    val p = optimized(
      "select n_nationkey + cast(null as int) as x from nation")
    assert(p.contains("null AS x") || p.contains("null as x"), p)
  }

  test("NOT elimination: double negation vanishes from the filter") {
    val p = optimized(
      "select n_name from nation where not(not(n_nationkey > 3))")
    assert(p.contains("> 3") && !p.toLowerCase.contains("not "), p)
  }

  test("tautology elimination: OR true removes the filter entirely") {
    val p = optimized(
      "select n_name from nation where n_nationkey > 3 or true")
    assert(!p.contains("Filter"), p)
  }

  test("constant propagation through an equality conjunction") {
    val p = optimized(
      """select n_name from nation
        |where n_nationkey = 5 and n_regionkey = n_nationkey + 1""".stripMargin)
    assert(p.contains("= 6"), p)
  }

  test("3VL WHERE: literal NULL predicate folds to an empty relation") {
    val p = optimized(
      "select n_name from nation where cast(null as boolean)")
    assert(p.contains("LocalRelation") && !p.contains("Relation ["), p)
  }
}
