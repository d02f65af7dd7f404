package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL dialect surface: MySQL-style backtick identifier quoting (the
  * reference's second dialect — doradb-sql/src/parser/dialect.rs:13-60)
  * and recursive CTEs (parsed but rejected by the reference,
  * lgc/builder.rs:272-274 — Spark 4 executes them, exceeding it). */
class DialectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("MySQL backtick identifier quoting is accepted") {
    Tables.registerAll(spark, TestSpark.Sf)
    val n = spark.sql(
      "select `n_name` from `nation` where `n_regionkey` = 1").count()
    assert(n > 0)
  }

  test("recursive CTE executes (reference only parses, then rejects)") {
    val rows = spark.sql(
      """with recursive t(n) as (
        |  select 1
        |  union all
        |  select n + 1 from t where n < 10)
        |select n from t order by n""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    assert(rows == (1 to 10))
  }
}
