package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents pipeline: token
  * counting, shingling, language-ID heuristic, quality scoring,
  * fingerprinting. All built from codegen'd Spark SQL functions (split,
  * transform, filter, aggregate, xxhash64) — no UDFs — so they run
  * inside whole-stage codegen and scale linearly with partitions.
  */
object Text {

  /** Whitespace tokens (fixture text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token estimate: word pieces + standalone punctuation. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]")).cast("long")

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup.
    *
    * Implemented as ONE regex pass extracting overlapping n-grams via a
    * lookahead capture: `(?=(g))t ` (g = n `[^ ]*` tokens joined by
    * single spaces, t = one token) matches at every token start with n
    * tokens remaining, captures the n-gram, and consumes token+space to
    * land on the next token start — a single linear scan. The equivalent
    * higher-order-function chain (transform over sequence + element_at +
    * concat_ws) produces identical output but is interpreted per element
    * (Spark HOFs don't participate in codegen), which made shingling the
    * dominant cost of every dedup operator.
    *
    * TOKENIZATION CONTRACT: tokens are maximal `[^ ]*` runs between
    * single-space separators, keeping empty tokens (leading, trailing,
    * and between adjacent spaces) — exactly `split(text, ' ', -1)` /
    * DuckDB `string_split(text, ' ')` semantics. [[graft.operators.Dedup]]'s
    * primitive kernels (`shingleHashArrays`, `minhashSignatures`) and
    * every DuckDB oracle derive their shingles from the same contract;
    * all three paths agree on any input, including runs of spaces
    * (a mid-run position starts an empty token, so "a  b" yields the
    * trigrams "a  b" and " b c" for "a  b c"). A position where fewer
    * than n tokens remain cannot match, and no mid-token position can
    * match when its token start could not (it sees a suffix with the
    * same or fewer separators), so the scan never emits a bogus gram.
    * Docs shorter than n tokens yield an empty set.
    *
    * Requires n >= 2: the scan consumes `token + space` per match, so
    * the FINAL token (which has no trailing space) can never be a match
    * start — correct for n >= 2, where the last token is never a gram
    * start, but silently wrong for n = 1 (unigrams over "a b" would
    * yield only ["a"]). Unigrams are plain `split` + distinct, not a
    * shingle, so the contract is enforced rather than special-cased. */
  def shingles(text: Column, n: Int): Column = {
    require(n >= 2,
      s"shingles requires n >= 2 (got $n); use array_distinct(split(...)) for unigrams")
    val gram = Seq.fill(n)("[^ ]*").mkString(" ")
    array_distinct(regexp_extract_all(text, lit(s"(?=($gram))[^ ]* "), lit(1)))
  }

  /** DuckDB fragment: the overlapping word-trigram list of a token-list
    * expression `t` (NON-distinct; wrap in list_distinct / select
    * distinct as needed) — the single SQL mirror of [[shingles]] n=3
    * shared by every trigram oracle (jaccard, clusters, decontamination,
    * repetition), so a tokenization-contract change cannot silently
    * diverge between them. */
  def sqlTrigramList(t: String): String =
    s"list_transform(range(1, len($t) - 1), " +
      s"i -> $t[i] || ' ' || $t[i+1] || ' ' || $t[i+2])"

  /** DuckDB fragment: the full 64-bit FNV-1a of a string expression `s`
    * as a hugeint in [0, 2⁶⁴) — the single SQL mirror of [[fnv64]]
    * (Java's wrap-to-2⁶⁴ long arithmetic emulated with modular hugeint
    * steps; the ×0x100000001b3 multiply decomposes as ×435 + ×2⁴⁰ of
    * the low 24 bits), shared by every hash oracle (simhash, rolling
    * fingerprint, winnowing, span hashes, minhash signatures) so a
    * hash-contract change cannot silently diverge between them. Append
    * `% 2³²` / `% 2⁶³` at the call site for masked variants — both
    * divide 2⁶⁴, so composing the mods is exact. Uses lambda variables
    * `i`, `acc`, `c`: don't shadow them at the call site.
    *
    * CONTRACT LIMIT — BMP text only: the JVM side folds UTF-16 units
    * while DuckDB's substring/ascii walk CODEPOINTS, and the low-16-bit
    * xor decomposition assumes c < 2¹⁶; an astral character (emoji,
    * rare CJK) hashes differently on the two sides. The fixtures are
    * ASCII; a corpus with astral text needs the hash computed on one
    * side only (or a UTF-16 re-encoding step in the oracle) before
    * these oracles remain valid. */
  def sqlFnv64(s: String): String = {
    val step =
      s"""((acc - acc % 65536 + xor((acc % 65536)::bigint, c::bigint)::hugeint) * 435
         |       + ((acc - acc % 65536 + xor((acc % 65536)::bigint, c::bigint)::hugeint)
         |          % 16777216) * 1099511627776::hugeint
         |      ) % 18446744073709551616::hugeint""".stripMargin
    s"""list_reduce(
       |  list_prepend(14695981039346656037::hugeint,
       |    list_transform(range(1, length($s) + 1),
       |                   i -> ascii(substring($s, i, 1))::hugeint)),
       |  (acc, c) -> $step)""".stripMargin
  }

  /** FNV-1a 64-bit over UTF-16 units — the stable, dependency-free
    * string hash shared by the dedup kernels (MinHash bases, SimHash
    * token hashes) and the rolling fingerprint. Chosen over an
    * engine-internal hash (xxhash64) because pure wraparound arithmetic
    * is EMULABLE IN SQL (hugeint mod-2^64 — see the simhash/rolling
    * oracles), which is what lets those operators be oracle-checked. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Karp–Rabin-style rolling fingerprint of one token stream: fold-left
    * acc*31 + (fnv64(token) mod 2^32), all mod 2^40. Bounded modular
    * accumulation keeps every step exact in a signed long (max
    * 2^45 + 2^32); deterministic, order-sensitive, and — because the
    * token hash is [[fnv64]] — reproducible in the DuckDB oracle. */
  def rollingFingerprint(tokens: Array[String]): Long = {
    var acc = 0L
    var i = 0
    while (i < tokens.length) {
      acc = (acc * 31L + (fnv64(tokens(i)) & 0xFFFFFFFFL)) % (1L << 40)
      i += 1
    }
    acc
  }

  /** Content fingerprint as md5 of the lowercased text (exact dedup key;
    * identical hex in any engine). */
  def md5Fingerprint(text: Column): Column = md5(lower(text).cast("binary"))

  // ---- Language ID (n-gram/stopword heuristic) --------------------------

  /** Tiny per-language stopword lists; membership counts over tokens. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "un", "une", "est", "et"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "se", "no"))

  def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t =>
      t.isin(stopwords(lang).map(x => x: Any): _*))).cast("long")

  /** Argmax over language scores with fixed tie-break order en>de>fr>es;
    * 'und' (undetermined) when no stopword hits at all. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en")
    val de = stopwordHits(text, "de")
    val fr = stopwordHits(text, "fr")
    val es = stopwordHits(text, "es")
    when(en === 0 && de === 0 && fr === 0 && es === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** SQL mirror of [[langId]]/[[stopwordHits]] for the DuckDB oracle. */
  def sqlStopwordHits(textCol: String, lang: String): String = {
    val list = stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"cast(len(list_filter(str_split($textCol, ' '), t -> t in ($list))) as bigint)"
  }

  // ---- Quality scoring ---------------------------------------------------

  /** Punctuation characters count. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^\\w\\s]")).cast("long")

  /** Mean token length: (chars - separators) / tokens, as double. */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text).cast("long") - (n - 1)).cast("double") / n.cast("double")
  }

  /** Heuristic document quality in [0,1]: length band + word-shape band +
    * stopword density, fixed-order double arithmetic (oracle-exact). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val stopRatio = stopwordHits(text, "en").cast("double") / n.cast("double")
    when(n.between(20, 1000), lit(0.4)).otherwise(lit(0.0)) +
      when(avgTokenLen(text).between(3.0, 10.0), lit(0.3)).otherwise(lit(0.0)) +
      stopRatio * 0.3
  }
}
