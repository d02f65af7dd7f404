package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanShape

/** Shape tests in the reference's own style (doradb-plan/src/lgc/mod.rs
  * tests assert preorder op sequences for small SQL strings). Catalyst
  * legitimately simplifies harder than the reference's builder, so the
  * expectations encode the OPTIMIZED shape.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shapeOf(sql: String): Seq[String] = {
    Tables.registerAll(spark, TestSpark.Sf)
    PlanShape.shape(spark.sql(sql))
  }

  test("select 1 from lineitem → [Proj, Scan] (reference lgc/mod.rs test)") {
    assert(shapeOf("select 1 from lineitem") == Seq("Proj", "Scan"))
  }

  test("filter folds into scan-side shape: Proj/Filt/Scan") {
    assert(shapeOf("select l_orderkey from lineitem where l_quantity > 10")
      == Seq("Proj", "Filt", "Scan"))
  }

  test("group-by produces Aggr over pruned Scan") {
    assert(shapeOf("select l_returnflag, count(*) from lineitem group by l_returnflag")
      == Seq("Aggr", "Proj", "Scan"))
  }

  test("order-by + limit fuse into Limit over Sort") {
    val s = shapeOf("select o_orderkey from orders order by o_orderkey limit 5")
    assert(s.head == "Limit" && s.contains("Sort"), s.toString)
  }

  test("inner join of two scans") {
    val s = shapeOf(
      "select n_name, r_name from nation join region on n_regionkey = r_regionkey")
    assert(s.count(_ == "Scan") == 2 && s.exists(_.startsWith("Join(INNER)")), s.toString)
  }

  test("EXISTS subquery is unnested to a semi join (reference only planned this)") {
    val s = shapeOf(
      """select c_custkey from customer
        |where exists (select 1 from orders where o_custkey = c_custkey)""".stripMargin)
    assert(s.exists(_ == "Join(LEFT SEMI)"), s.toString)
  }

  test("false predicate propagates to an empty relation (op_eliminate parity)") {
    assert(shapeOf("select l_orderkey from lineitem where 1 = 0") == Seq("Empty"))
  }

  test("LIMIT 0 collapses to empty (op_eliminate case, rule/op_eliminate.rs)") {
    assert(shapeOf("select l_orderkey from lineitem limit 0") == Seq("Empty"))
  }

  test("SELECT DISTINCT plans as aggregation, like the reference's Aggr rewrite") {
    val s = shapeOf("select distinct o_orderstatus from orders")
    assert(s.head == "Aggr", s.toString)
  }
}
