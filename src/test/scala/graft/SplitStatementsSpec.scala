package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.server.MysqlServer.splitStatements

/** Properties of the multi-statement splitter the wire front applies
  * to CLIENT_MULTI_STATEMENTS COM_QUERY text. The invariants: a `;`
  * inside any lexical island (quoted run of the three forms, line
  * comment, block comment) never splits; statements joined with ';'
  * come back exactly; comment-only and whitespace-only parts vanish;
  * and the splitter is total (never throws) on adversarial
  * metacharacter soup. */
class SplitStatementsSpec extends AnyFunSuite {

  test("semicolons inside lexical islands never split") {
    val cases = Seq(
      "select 'a;b' as x" -> 1,
      "select \"a;b\" as x" -> 1,
      "select `a;b` from t" -> 1,
      "select 1 /* ; ; */ + 1" -> 1,
      "select 1 -- tail; comment" -> 1,
      "select 1 # tail; comment" -> 1,
      "select '\\';' as tricky" -> 1, // escaped quote keeps the run open
      "select 1; select 2" -> 2,
      "select 'a;b'; select \"c;d\"" -> 2)
    cases.foreach { case (sql, n) =>
      val parts = splitStatements(sql)
      assert(parts.length == n, s"'$sql' split into $parts")
    }
  }

  test("round-trip: joining real statements with ';' returns them exactly") {
    val stmts = Seq(
      "select 1 as a",
      "select 'x;y' as b",
      "update t set v = 2 where k = 'a;b'",
      "select /* c;c */ 3")
    assert(splitStatements(stmts.mkString("; ")) == stmts)
    // trailing separator and trailing comment both vanish
    assert(splitStatements(stmts.mkString(";") + "; -- done") == stmts)
    assert(splitStatements(stmts.mkString(";") + ";") == stmts)
  }

  test("'--' at end of input and CR-opened '--' comments lex as comments") {
    // bare trailing '--' is whitespace to mysqld, not an executable part
    assert(splitStatements("select 1; --") == Seq("select 1"))
    assert(splitStatements("--") == Seq.empty)
    // '\r' counts as the comment-opening whitespace (CRLF clients): a
    // ';' later on the commented line must NOT split
    assert(splitStatements("select 1 --\r; all commented ;\nselect 2")
      .length == 1)
    assert(splitStatements("select 1; --\r\nselect 2").length == 2)
    // '--' followed by a non-whitespace char is still code (mysqld rule)
    assert(splitStatements("select 1 --2; select 3").length == 2)
  }

  test("comment-only and empty inputs yield no statements") {
    Seq("", "  ", ";", ";;  ;", "-- only a comment", "# note",
      "/* block */", "/* a */ ; -- b \n; # c").foreach { sql =>
      assert(splitStatements(sql).isEmpty, s"'$sql' produced statements")
    }
  }

  test("total on adversarial metacharacter soup; parts never contain " +
      "a top-level semicolon") {
    val meta =
      Gen.oneOf(";", "'", "\"", "`", "\\", "-", "-- ", "#", "/*", "*/",
        "\n", " ", "a", "1")
    val g = Gen.listOfN(400, Gen.listOfN(12, meta).map(_.mkString))
    val inputs = g(Gen.Parameters.default, Seed(11L)).get
    inputs.foreach { sql =>
      val parts = splitStatements(sql) // must not throw
      parts.foreach { p =>
        // re-splitting a single part must not split it further: every
        // top-level ';' was consumed (a part may still END inside an
        // unterminated island, which is fine — the parser owns that)
        assert(splitStatements(p).length <= 1,
          s"part '$p' of '$sql' re-splits")
      }
    }
  }
}
