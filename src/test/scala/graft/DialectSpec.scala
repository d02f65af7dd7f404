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

  test("apostrophes inside comments do not open string regions") {
    import graft.server.Dialect
    // an unpaired ' in a comment must not swallow the rest of the
    // statement: the "name" after it still normalizes
    assert(Dialect.ansiQuotes("select /* don't */ \"name\" from t") ==
      "select /* don't */ `name` from t")
    assert(Dialect.ansiQuotes("select \"a\", -- can't\n\"b\" from t") ==
      "select `a`, -- can't\n`b` from t")
    // and in the MySQL direction double-quoted strings after a
    // commented apostrophe still pin to single-quoted form
    assert(Dialect.mysqlQuotes("select /* won't */ \"s\" as v") ==
      "select /* won't */ 's' as v")
  }

  test("ANSI double-quoted identifiers normalize to backtick form") {
    import graft.server.Dialect
    // plain identifiers
    assert(Dialect.ansiQuotes("""select "a" from "t" where "b" = 1""") ==
      "select `a` from `t` where `b` = 1")
    // string literals pass through untouched — including embedded
    // double quotes, '' doubling, and backslash escapes
    assert(Dialect.ansiQuotes("""select 'say "hi"' as s""") ==
      """select 'say "hi"' as s""")
    assert(Dialect.ansiQuotes("""select 'it''s "x"', "c"""") ==
      """select 'it''s "x"', `c`""")
    assert(Dialect.ansiQuotes("""select '\' "not an ident' as s""") ==
      """select '\' "not an ident' as s""")
    // "" undoubles inside the identifier; embedded backticks double
    assert(Dialect.ansiQuotes("""select "we""ird"""") ==
      "select `we\"ird`")
    assert(Dialect.ansiQuotes("select \"a`b\"") == "select `a``b`")
    // already-backticked identifiers are untouched
    assert(Dialect.ansiQuotes("select `x`, \"y\"") == "select `x`, `y`")
    // idempotent: a second pass is a no-op (EXECUTE after PREPARE)
    val once = Dialect.ansiQuotes("""select "a", 'b "c"' from "t"""")
    assert(Dialect.ansiQuotes(once) == once)
    // unterminated double quote passes through VERBATIM — the parser
    // owns the syntax error; auto-closing would mask a client bug
    assert(Dialect.ansiQuotes("select \"abc") == "select \"abc")
    assert(Dialect.mysqlQuotes("select \"abc") == "select \"abc")
    assert(Dialect.ansiQuotes("select `x`, \"ab") == "select `x`, \"ab")
    // the sql_mode value parser
    assert(Dialect.modeEnablesAnsiQuotes("ANSI_QUOTES"))
    assert(Dialect.modeEnablesAnsiQuotes("'STRICT_TRANS_TABLES,ANSI_QUOTES'"))
    assert(Dialect.modeEnablesAnsiQuotes("ansi"))
    assert(!Dialect.modeEnablesAnsiQuotes("STRICT_TRANS_TABLES"))
    assert(!Dialect.modeEnablesAnsiQuotes(""))
  }

  test("MySQL default mode: double-quoted strings pin to single-quoted") {
    import graft.server.Dialect
    assert(Dialect.mysqlQuotes("select \"abc\" as s") == "select 'abc' as s")
    // embedded single quote doubles; "" undoubles to a literal "
    assert(Dialect.mysqlQuotes("select \"it's\" as s") ==
      "select 'it''s' as s")
    assert(Dialect.mysqlQuotes("select \"say \"\"hi\"\"\" as s") ==
      "select 'say \"hi\"' as s")
    // single-quoted strings and backticked identifiers untouched
    assert(Dialect.mysqlQuotes("select 'a\"b', `c` from t") ==
      "select 'a\"b', `c` from t")
    // idempotent (EXECUTE after PREPARE re-normalizes)
    val once = Dialect.mysqlQuotes("select \"it's\", 'x' from `t`")
    assert(Dialect.mysqlQuotes(once) == once)
  }

  test("normalized ANSI statement executes against the catalog") {
    import graft.server.Dialect
    Tables.registerAll(spark, TestSpark.Sf)
    val n = spark.sql(Dialect.ansiQuotes(
      """select "n_name" from "nation" where "n_regionkey" = 1""")).count()
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
