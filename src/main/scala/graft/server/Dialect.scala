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
  *
  * Shared scan rules (single-pass, no regex — quoting is not regular):
  *  - `'…'` string literals pass through untouched, honoring both
  *    `''` doubling and backslash escapes (Spark/MySQL lexing).
  *  - `` `…` `` identifiers pass through untouched (`` `` `` doubling).
  *  - A `"…"` region transforms per dialect (see each function).
  *  - An UNTERMINATED `"` region passes through verbatim from its
  *    opening quote — the downstream parser owns the syntax error, and
  *    auto-closing would turn a client's lost-quote bug into a
  *    silently-successful statement.
  */
object Dialect {

  /** Copy a quote-delimited region (opening delimiter at `i`) into
    * `out` unchanged, honoring doubled-delimiter escapes and (when
    * `backslash`) backslash escapes. Returns the index just past the
    * closing delimiter, or `n` if the region never closes (everything
    * was copied verbatim either way). */
  private def copyRegion(sql: String, start: Int, out: java.lang.StringBuilder,
      delim: Char, backslash: Boolean): Int = {
    val n = sql.length
    out.append(delim)
    var i = start + 1
    while (i < n) {
      val c = sql.charAt(i)
      if (backslash && c == '\\' && i + 1 < n) {
        out.append(c).append(sql.charAt(i + 1)); i += 2
      } else if (c == delim && i + 1 < n && sql.charAt(i + 1) == delim) {
        out.append(delim).append(delim); i += 2
      } else if (c == delim) {
        out.append(c); return i + 1
      } else { out.append(c); i += 1 }
    }
    n
  }

  /** Transform the `"…"` region opening at `i`: append the rewritten
    * form via the three char-level callbacks, or — if the region never
    * closes — append the ORIGINAL text verbatim. Returns the index just
    * past the region. `backslash` controls whether `\x` pairs are
    * escape sequences inside the region (true for MySQL strings, false
    * for ANSI identifiers). */
  private def transformDoubleQuoted(sql: String, start: Int,
      out: java.lang.StringBuilder, open: Char, close: Char,
      backslash: Boolean)(emit: (java.lang.StringBuilder, Char) => Unit): Int = {
    val n = sql.length
    val body = new java.lang.StringBuilder()
    var i = start + 1
    while (i < n) {
      val c = sql.charAt(i)
      if (backslash && c == '\\' && i + 1 < n) {
        body.append(c).append(sql.charAt(i + 1)); i += 2
      } else if (c == '"' && i + 1 < n && sql.charAt(i + 1) == '"') {
        emit(body, '"'); i += 2 // "" undoubles to a literal "
      } else if (c == '"') {
        out.append(open).append(body).append(close)
        return i + 1
      } else { emit(body, c); i += 1 }
    }
    // unterminated: the transformed body is discarded and the raw text
    // from the opening quote passes through for the parser to reject
    out.append(sql, start, n)
    n
  }

  /** Rewrite every ANSI double-quoted identifier to backtick quoting:
    * `""` undoubles to a literal `"`, and any embedded backtick doubles
    * (Spark escapes a backtick inside a quoted identifier by doubling).
    * No backslash escapes inside ANSI identifiers. */
  def ansiQuotes(sql: String): String =
    rewrite(sql) { (out, i) =>
      transformDoubleQuoted(sql, i, out, '`', '`', backslash = false) {
        (b, c) => if (c == '`') b.append("``") else b.append(c)
      }
    }

  /** Rewrite every MySQL double-quoted STRING literal to single-quoted
    * form — the DEFAULT-dialect counterpart of [[ansiQuotes]]: `""`
    * undoubles to a literal `"`, embedded `'` doubles, and backslash
    * escapes copy verbatim (valid in both quote forms).
    *
    * Why the server rewrites in default mode too: the shared
    * SparkSession's lexing of `"…"` is conf-dependent
    * (`spark.sql.ansi.doubleQuotedIdentifiers` is flipped on by the
    * ref-schema registrar and stays set), so passing the text through
    * verbatim would make wire semantics depend on which queries ran
    * earlier in the session. Normalizing to the explicit form pins
    * MySQL behavior — `"x"` is the string 'x' — regardless of session
    * state. */
  def mysqlQuotes(sql: String): String =
    rewrite(sql) { (out, i) =>
      transformDoubleQuoted(sql, i, out, '\'', '\'', backslash = true) {
        (b, c) => if (c == '\'') b.append("''") else b.append(c)
      }
    }

  /** The shared outer scan: copy plain text, comments, and the two
    * untouched quote forms; hand `"` regions to the dialect-specific
    * transform. COMMENT-AWARE: an apostrophe inside a line or block
    * comment (`-- don't`) must not open a bogus string region that
    * swallows the rest of the statement — mysqld lexes comments before
    * strings, and so does this scan. */
  private def rewrite(sql: String)(
      onDoubleQuote: (java.lang.StringBuilder, Int) => Int): String = {
    val out = new java.lang.StringBuilder(sql.length + 8)
    var i = 0
    val n = sql.length
    def copyLineComment(): Unit =
      while (i < n && sql.charAt(i) != '\n') { out.append(sql.charAt(i)); i += 1 }
    while (i < n) {
      val c = sql.charAt(i)
      // mysqld's rule: '--' opens a line comment only when followed by
      // whitespace/control or end of input — 'SELECT 1--2' is double
      // negation and its tail must still be rewritten.
      if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-' &&
          (i + 2 >= n || sql.charAt(i + 2) <= ' ')) copyLineComment()
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        // Not a comment under mysqld's rule — but Spark's lexer starts a
        // comment at ANY '--', so adjacent minus operators must be
        // split ('1--2' → '1- -2') to keep mysqld's double-negation
        // semantics through spark.sql. One dash at a time: the next
        // loop pass re-applies the comment rule at the following dash
        // ('1--- 2' correctly becomes '1- ' + a real comment).
        out.append("- "); i += 1
      }
      else if (c == '#') copyLineComment()
      else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        out.append("/*"); i += 2
        while (i + 1 < n &&
          !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) {
          out.append(sql.charAt(i)); i += 1
        }
        if (i + 1 < n) { out.append("*/"); i += 2 }
        else { while (i < n) { out.append(sql.charAt(i)); i += 1 } }
      } else c match {
        case '\'' => i = copyRegion(sql, i, out, '\'', backslash = true)
        case '`'  => i = copyRegion(sql, i, out, '`', backslash = false)
        case '"'  => i = onDoubleQuote(out, i)
        case ch   => out.append(ch); i += 1
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
