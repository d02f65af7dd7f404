package graft.server

/** SQL dialect normalization for the wire front.
  *
  * The reference's parser is dialect-parameterized: ANSI mode lexes
  * `"…"` as a quoted IDENTIFIER, MySQL mode lexes it as a string and
  * uses `` `…` `` for identifiers (doradb-sql/src/parser/dialect.rs:
  * 13-60 — the two dialect impls differ exactly in their quote-ident
  * rules). Spark's lexer is the MySQL shape (backticks). This object
  * closes the ANSI half: a quote-aware scan rewriting double-quoted
  * identifiers to backtick form so an ANSI-dialect client's statements
  * parse unchanged.
  *
  * Activation mirrors mysqld: the server flips per connection on
  * `SET sql_mode = 'ANSI_QUOTES'` (or any mode list containing ANSI /
  * ANSI_QUOTES), because in default MySQL mode `"x"` is the string
  * literal 'x' and rewriting it unconditionally would corrupt data.
  */
object Dialect {

  /** Rewrite every ANSI double-quoted identifier to backtick quoting.
    *
    * Scan rules (all single-pass, no regex — quoting is not regular):
    *  - `'…'` string literals pass through untouched, honoring both
    *    `''` doubling and backslash escapes (Spark/MySQL lexing).
    *  - `` `…` `` identifiers pass through untouched (`` `` `` doubling).
    *  - `"…"` becomes `` `…` ``: an embedded `""` undoubles to a
    *    literal `"`, and any embedded backtick doubles (Spark escapes a
    *    backtick inside a quoted identifier by doubling it).
    *  - An unterminated quote passes the remainder through verbatim —
    *    the downstream parser owns the error message.
    */
  def ansiQuotes(sql: String): String = {
    val out = new java.lang.StringBuilder(sql.length + 8)
    var i = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case '\'' =>
          // string literal: copy through '' doubling and \-escapes
          out.append('\'')
          i += 1
          var done = false
          while (i < n && !done) {
            val c = sql.charAt(i)
            if (c == '\\' && i + 1 < n) {
              out.append(c).append(sql.charAt(i + 1)); i += 2
            } else if (c == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') {
              out.append("''"); i += 2
            } else if (c == '\'') {
              out.append(c); i += 1; done = true
            } else { out.append(c); i += 1 }
          }
        case '`' =>
          // already-backticked identifier: copy through `` doubling
          out.append('`')
          i += 1
          var done = false
          while (i < n && !done) {
            val c = sql.charAt(i)
            if (c == '`' && i + 1 < n && sql.charAt(i + 1) == '`') {
              out.append("``"); i += 2
            } else if (c == '`') {
              out.append(c); i += 1; done = true
            } else { out.append(c); i += 1 }
          }
        case '"' =>
          // ANSI identifier → backtick form
          out.append('`')
          i += 1
          var done = false
          while (i < n && !done) {
            val c = sql.charAt(i)
            if (c == '"' && i + 1 < n && sql.charAt(i + 1) == '"') {
              out.append('"'); i += 2 // "" undoubles inside the ident
            } else if (c == '"') {
              out.append('`'); i += 1; done = true
            } else if (c == '`') {
              out.append("``"); i += 1
            } else { out.append(c); i += 1 }
          }
          if (!done) out.append('`') // unterminated: close for the parser
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Rewrite every MySQL double-quoted STRING literal to single-quoted
    * form — the DEFAULT-dialect counterpart of [[ansiQuotes]].
    *
    * Why the server rewrites in default mode too: the shared
    * SparkSession's lexing of `"…"` is conf-dependent
    * (`spark.sql.ansi.doubleQuotedIdentifiers` is flipped on by the
    * ref-schema registrar and stays set), so passing the text through
    * verbatim would make wire semantics depend on which queries ran
    * earlier in the session. Normalizing to the explicit form pins
    * MySQL behavior — `"x"` is the string 'x' — regardless of session
    * state.
    *
    * Scan rules: `'…'` and `` `…` `` regions pass through untouched
    * (same lexing as [[ansiQuotes]]); a `"…"` region becomes `'…'`
    * with `""` undoubled to a literal `"`, embedded `'` doubled, and
    * backslash escapes copied verbatim (valid in both quote forms). */
  def mysqlQuotes(sql: String): String = {
    val out = new java.lang.StringBuilder(sql.length + 8)
    var i = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case '\'' =>
          out.append('\'')
          i += 1
          var done = false
          while (i < n && !done) {
            val c = sql.charAt(i)
            if (c == '\\' && i + 1 < n) {
              out.append(c).append(sql.charAt(i + 1)); i += 2
            } else if (c == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') {
              out.append("''"); i += 2
            } else if (c == '\'') {
              out.append(c); i += 1; done = true
            } else { out.append(c); i += 1 }
          }
        case '`' =>
          out.append('`')
          i += 1
          var done = false
          while (i < n && !done) {
            val c = sql.charAt(i)
            if (c == '`' && i + 1 < n && sql.charAt(i + 1) == '`') {
              out.append("``"); i += 2
            } else if (c == '`') {
              out.append(c); i += 1; done = true
            } else { out.append(c); i += 1 }
          }
        case '"' =>
          // MySQL default: a double-quoted STRING literal → '…'
          out.append('\'')
          i += 1
          var done = false
          while (i < n && !done) {
            val c = sql.charAt(i)
            if (c == '\\' && i + 1 < n) {
              out.append(c).append(sql.charAt(i + 1)); i += 2
            } else if (c == '"' && i + 1 < n && sql.charAt(i + 1) == '"') {
              out.append('"'); i += 2 // "" undoubles to a literal "
            } else if (c == '"') {
              out.append('\''); i += 1; done = true
            } else if (c == '\'') {
              out.append("''"); i += 1
            } else { out.append(c); i += 1 }
          }
          if (!done) out.append('\'') // unterminated: close for the parser
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Does a `SET sql_mode = …` value enable ANSI identifier quoting?
    * Matches mysqld: ANSI_QUOTES directly, or the ANSI combination
    * mode which implies it. */
  def modeEnablesAnsiQuotes(modes: String): Boolean =
    modes.toUpperCase(java.util.Locale.ROOT)
      .split("[,\\s'\"]+").exists(m => m == "ANSI_QUOTES" || m == "ANSI")
}
