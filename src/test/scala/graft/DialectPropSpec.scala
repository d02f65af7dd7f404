package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.server.Dialect

/** Properties of the hand-rolled quote lexers in [[Dialect]]: for
  * arbitrary content (including quotes, backslashes, and doubled-quote
  * sequences), the rewrites agree with the closed-form re-quoting of
  * the same content, leave the other quote forms untouched, and are
  * idempotent — the invariants the wire front relies on when it
  * re-normalizes a prepared statement's text at EXECUTE time. */
class DialectPropSpec extends AnyFunSuite {

  /** Content generator: heavy on the metacharacters that stress the
    * scanners ('"', '\'', '`', '\\') mixed with plain text. */
  private def contents(seed: Long, n: Int): List[String] = {
    val meta = Gen.oneOf("\"", "'", "`", "\\", "a", "b ", "x,y", "1")
    val g = Gen.listOfN(n, Gen.listOfN(8, meta).map(_.mkString))
    g(Gen.Parameters.default, Seed(seed)).get
  }

  // closed-form quoting of raw content into each delimiter style;
  // backslashes are doubled wherever backslash-escapes are live (the
  // string forms), so the quoted text is unambiguous
  private def ansiIdent(s: String) = "\"" + s.replace("\"", "\"\"") + "\""
  private def backtickIdent(s: String) = "`" + s.replace("`", "``") + "`"
  private def dqString(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\"\"") + "\""
  private def sqString(s: String) =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  test("ansiQuotes: quoted identifier content survives into backtick form") {
    for (s <- contents(11L, 200)) {
      val in = s"select ${ansiIdent(s)} from t"
      val out = s"select ${backtickIdent(s)} from t"
      assert(Dialect.ansiQuotes(in) == out, s"content=${s.toList}")
    }
  }

  test("mysqlQuotes: double-quoted string content survives into '…' form") {
    for (s <- contents(13L, 200)) {
      val in = s"select ${dqString(s)} as v"
      val out = s"select ${sqString(s)} as v"
      assert(Dialect.mysqlQuotes(in) == out, s"content=${s.toList}")
    }
  }

  test("both rewrites leave single-quoted strings and backticks untouched") {
    for (s <- contents(17L, 200)) {
      val in = s"select ${sqString(s)}, ${backtickIdent(s.replace("`", ""))} from t"
      assert(Dialect.ansiQuotes(in) == in, s"content=${s.toList}")
      assert(Dialect.mysqlQuotes(in) == in, s"content=${s.toList}")
    }
  }

  test("both rewrites are idempotent on their own output") {
    for (s <- contents(19L, 200)) {
      val a = Dialect.ansiQuotes(s"select ${ansiIdent(s)}, ${sqString(s)}")
      assert(Dialect.ansiQuotes(a) == a, s"content=${s.toList}")
      val m = Dialect.mysqlQuotes(s"select ${dqString(s)}, ${sqString(s)}")
      assert(Dialect.mysqlQuotes(m) == m, s"content=${s.toList}")
    }
  }
}
