package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{PlanShape, Reflect}

/** Round-trip proof for plan→SQL reflection (reference
  * doradb-plan/src/lgc/reflect.rs): for each block-chain shape, the
  * reflected SQL re-plans to the SAME optimized shape and returns the
  * SAME rows as the original query. */
class ReflectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def roundTrip(sql: String): Unit = {
    Tables.registerAll(spark, TestSpark.Sf)
    val orig = spark.sql(sql)
    val reflected = Reflect.toSql(orig)
    val back = spark.sql(reflected)
    assert(PlanShape.shape(back) == PlanShape.shape(orig),
      s"shape drift for reflected SQL:\n$reflected")
    assert(back.collect().toSeq == orig.collect().toSeq,
      s"row drift for reflected SQL:\n$reflected")
  }

  test("Filt→Aggr chain reflects (q6 shape)") {
    roundTrip(
      """select sum(l_quantity) as s, count(*) as n from lineitem
        |where l_quantity < 24 and l_returnflag = 'R'""".stripMargin)
  }

  test("Limit→Sort→Proj→Filt chain reflects (top-k shape)") {
    roundTrip(
      """select o_orderkey, o_totalprice from orders
        |where o_orderstatus = 'F'
        |order by o_totalprice desc, o_orderkey limit 7""".stripMargin)
  }

  test("Aggr over Join reflects with grouping") {
    roundTrip(
      """select c_mktsegment, count(*) as cnt, sum(o_totalprice) as tp
        |from customer join orders on c_custkey = o_custkey
        |group by c_mktsegment order by c_mktsegment""".stripMargin)
  }

  test("derived table and DISTINCT reflect via subquery fallback") {
    roundTrip(
      """select distinct n_regionkey from (
        |  select n_regionkey from nation where n_nationkey > 2) t
        |order by n_regionkey""".stripMargin)
  }

  test("UNION ALL reflects") {
    roundTrip(
      """select n_name from nation where n_nationkey < 3
        |union all
        |select r_name from region""".stripMargin)
  }

  test("CTE referenced twice reflects with alias-qualified attributes") {
    // both reads are CTERelationRef leaves; bare attribute names would
    // be ambiguous (a.k = b.k must not collapse to k = k)
    roundTrip(
      """with q as (select n_nationkey as k, n_name from nation)
        |select a.n_name as an, b.n_name as bn
        |from q a join q b on a.k = b.k
        |where a.k < 5 order by an, bn""".stripMargin)
  }

  test("all 22 verbatim TPC-H plans round-trip through reflection") {
    // Reference scope: doradb-plan/tests/reflect.rs:9-27 round-trips its
    // TPC-H plan corpus through reflect → re-plan. Same here, at full
    // width: every reflected text must re-plan to the SAME optimized
    // shape and return the SAME rows as the verbatim original.
    graft.tpch.RefSchema.ensureRegistered(spark, TestSpark.Sf)
    val failures = (1 to 22).flatMap { n =>
      try {
        val orig = spark.sql(graft.tpch.RefSchema.verbatim(n))
        val reflected = Reflect.toSql(orig)
        val back = spark.sql(reflected)
        if (PlanShape.shape(back) != PlanShape.shape(orig))
          Some(s"q$n: shape drift")
        else if (back.collect().toSeq != orig.collect().toSeq)
          Some(s"q$n: row drift")
        else None
      } catch {
        case e: Exception => Some(s"q$n: ${e.getClass.getSimpleName} " +
          e.getMessage.linesIterator.take(1).mkString)
      }
    }
    assert(failures.isEmpty, s"reflect round-trip failed for:\n" +
      failures.mkString("\n"))
  }
}
