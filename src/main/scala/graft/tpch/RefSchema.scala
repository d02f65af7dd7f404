package graft.tpch

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Canonical TPC-H schema (reference `sql/tpch_ddl.sql`) synthesized
  * deterministically from the fixture tables, so the reference's 22
  * VERBATIM query texts (`sql/tpch1.sql..tpch22.sql`, the corpus
  * `doradb-tpch-tests/tests/rule_optimize.rs:164-181` plans) execute
  * end-to-end with data flowing through them — not just parse/optimize
  * as in `ReferenceSqlSpec`.
  *
  * The fixtures lack `partsupp` and several canonical columns
  * (l_commitdate/receiptdate/shipmode/shipinstruct, o_clerk/comment,
  * p_mfgr/container, canonical nation names, phones...), and their date
  * range (1995–2001) misses the canonical predicates (1992–1998). Every
  * missing value is derived from the PRESENT fixture keys with pure
  * arithmetic (`%`, CASE, `floor`, date + n·interval) — no engine hash
  * functions — so ONE generation SQL text evaluates bit-identically in
  * Spark (which materializes the tables) and in DuckDB (where the
  * oracle recomputes them as CTEs from the same fixture parquet).
  *
  * Exactness design: every money value is quantized onto a binary
  * fraction grid (price/balance/cost → multiples of 1/4, rates →
  * multiples of 1/64). All products the 22 queries form are then exactly
  * representable doubles, and every partial sum stays far below 2^53 /
  * grid, so double aggregation is EXACT and order-independent — Spark's
  * partial aggregates and DuckDB's sequential sums produce bit-identical
  * results with no decimal-cast wrapper around the verbatim text. (At
  * 100 TB the same texts would run against decimal columns instead; the
  * grid trick is what makes verbatim doubles hash-comparable.)
  *
  * partsupp derives from the distinct (l_partkey, l_suppkey) pairs
  * (~26 suppliers/part at sf0.01), availqty/supplycost from the pair
  * keys. Orders with >= 7 lineitems get quantities boosted into 44..50
  * so q18's `sum(l_quantity) > 300` threshold is reachable in a fixture
  * whose orders average 4 lines. Orders of customers with
  * `custkey % 10 = 7` are folded onto the neighboring customer, giving
  * ~10% of customers NO orders (canonical TPC-H has 1/3): q13 gets its
  * zero-order bucket and q22's `not exists(orders)` branch is non-empty
  * (every fixture customer otherwise has ~10 orders).
  */
object RefSchema {

  /** Canonical 25 nations with canonical region keys; the fixture's
    * region table already carries the canonical region names in the
    * same key order (AFRICA 0, AMERICA 1, ASIA 2, EUROPE 3,
    * MIDDLE EAST 4). */
  private val nations: Seq[(String, Int)] = Seq(
    "ALGERIA" -> 0, "ARGENTINA" -> 1, "BRAZIL" -> 1, "CANADA" -> 1,
    "EGYPT" -> 4, "ETHIOPIA" -> 0, "FRANCE" -> 3, "GERMANY" -> 3,
    "INDIA" -> 2, "INDONESIA" -> 2, "IRAN" -> 4, "IRAQ" -> 4,
    "JAPAN" -> 2, "JORDAN" -> 4, "KENYA" -> 0, "MOROCCO" -> 0,
    "MOZAMBIQUE" -> 0, "PERU" -> 1, "CHINA" -> 2, "ROMANIA" -> 3,
    "SAUDI ARABIA" -> 4, "VIETNAM" -> 2, "RUSSIA" -> 3,
    "UNITED KINGDOM" -> 3, "UNITED STATES" -> 1)

  private def caseOver(key: String, arms: Seq[String]): String =
    arms.zipWithIndex
      .map { case (v, i) => s"when $i then '$v'" }
      .mkString(s"case $key ", " ", " end")

  private val colors = Seq(
    "forest", "green", "blue", "red", "ivory", "salmon", "peach", "linen")
  private val types1 = Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
  private val types2 = Seq("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
  private val types3 = Seq("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
  private val cont1 = Seq("SM", "MED", "LG", "JUMBO", "WRAP")
  private val cont2 = Seq("CASE", "BOX", "PACK", "PKG", "BAG", "JAR", "DRUM", "CAN")
  private val modes = Seq("AIR", "MAIL", "SHIP", "AIR", "RAIL", "TRUCK", "FOB", "REG AIR")

  /** 1/4-grid money quantization (exact in double, identical both engines:
    * *4 is a pure exponent shift, floor is deterministic, /4 exact). */
  private def q4(col: String) = s"floor($col * 4) / 4"
  /** 1/64-grid rate quantization. */
  private def q64(col: String) = s"floor($col * 64) / 64"
  /** Deterministic date: base 1992-01-01 + n days, normalized to DATE in
    * both dialects (DATE + INTERVAL yields TIMESTAMP in one of them). */
  private def dplus(base: String, n: String) =
    s"cast($base + ($n) * interval '1' day as date)"

  /** Ordered (cteName, body) generation SQL — valid in BOTH Spark SQL
    * and DuckDB, reading the fixture view names; later CTEs may read
    * earlier ones (ref_lineitem joins ref_orders for the remapped
    * order date). */
  val genTables: Seq[(String, String)] = Seq(
    "ref_region" ->
      """select r_regionkey, r_name,
        |  concat('region comment ', cast(r_regionkey as varchar(4))) as r_comment
        |from region""".stripMargin,
    "ref_nation" ->
      s"""select n_nationkey,
         |  ${caseOver("n_nationkey", nations.map(_._1))} as n_name,
         |  ${nations.map(_._2).zipWithIndex
               .map { case (r, i) => s"when $i then $r" }
               .mkString("case n_nationkey ", " ", " end")} as n_regionkey,
         |  concat('nation comment ', cast(n_nationkey as varchar(4))) as n_comment
         |from nation""".stripMargin,
    "ref_supplier" ->
      s"""select s_suppkey, s_name,
         |  concat('Address s', cast(s_suppkey as varchar(10))) as s_address,
         |  s_nationkey,
         |  concat(cast(10 + s_nationkey as varchar(4)), '-',
         |         cast(100 + (s_suppkey * 7) % 900 as varchar(4)), '-',
         |         cast(100 + (s_suppkey * 11) % 900 as varchar(4)), '-',
         |         cast(1000 + (s_suppkey * 13) % 9000 as varchar(6))) as s_phone,
         |  ${q4("s_acctbal")} as s_acctbal,
         |  case when s_suppkey % 13 = 0
         |    then 'sleep quickly. Customer noted Complaints about packages'
         |    else 'quiet routine supplier notes' end as s_comment
         |from supplier""".stripMargin,
    "ref_customer" ->
      s"""select c_custkey, c_name,
         |  concat('Address c', cast(c_custkey as varchar(10))) as c_address,
         |  c_nationkey,
         |  concat(cast(10 + c_nationkey as varchar(4)), '-',
         |         cast(100 + (c_custkey * 7) % 900 as varchar(4)), '-',
         |         cast(100 + (c_custkey * 11) % 900 as varchar(4)), '-',
         |         cast(1000 + (c_custkey * 13) % 9000 as varchar(6))) as c_phone,
         |  ${q4("c_acctbal")} as c_acctbal,
         |  c_mktsegment,
         |  'steady customer account notes' as c_comment
         |from customer""".stripMargin,
    "ref_part" ->
      s"""select p_partkey,
         |  concat(${caseOver("p_partkey % 8", colors)}, ' ',
         |         ${caseOver("(p_partkey % 23) % 8", colors)}, ' ',
         |         ${caseOver("(p_partkey % 29) % 8", colors)}) as p_name,
         |  concat('Manufacturer#', cast(1 + p_partkey % 5 as varchar(2))) as p_mfgr,
         |  concat('Brand#', cast(1 + p_partkey % 5 as varchar(2)),
         |         cast(1 + (p_partkey % 7) % 5 as varchar(2))) as p_brand,
         |  concat(${caseOver("p_partkey % 6", types1)}, ' ',
         |         ${caseOver("(p_partkey % 11) % 5", types2)}, ' ',
         |         ${caseOver("(p_partkey % 13) % 5", types3)}) as p_type,
         |  p_size,
         |  concat(${caseOver("(p_partkey % 17) % 5", cont1)}, ' ',
         |         ${caseOver("(p_partkey % 19) % 8", cont2)}) as p_container,
         |  ${q4("p_retailprice")} as p_retailprice,
         |  'generated part comment' as p_comment
         |from part""".stripMargin,
    "ref_orders" ->
      s"""select o_orderkey,
         |  case when o_custkey % 10 = 7 and o_custkey > 0
         |    then o_custkey - 1 else o_custkey end as o_custkey,
         |  o_orderstatus,
         |  ${q4("o_totalprice")} as o_totalprice,
         |  ${dplus("date '1992-01-01'", "(o_orderkey * 653) % 2406")} as o_orderdate,
         |  o_orderpriority,
         |  concat('Clerk#', cast(1 + o_orderkey % 1000 as varchar(6))) as o_clerk,
         |  0 as o_shippriority,
         |  case when o_orderkey % 11 = 0
         |    then 'was special handling requests noted'
         |    else 'plain order notes' end as o_comment
         |from orders""".stripMargin,
    "ref_lineitem" ->
      s"""select l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
         |  case when lc.n >= 7
         |    then cast(44 + (l.l_linenumber * 5) % 7 as double)
         |    else l.l_quantity end as l_quantity,
         |  ${q4("l.l_extendedprice")} as l_extendedprice,
         |  ${q64("l.l_discount")} as l_discount,
         |  ${q64("l.l_tax")} as l_tax,
         |  l.l_returnflag, l.l_linestatus,
         |  ${dplus("o.o_orderdate",
                    "1 + (l.l_orderkey * 7 + l.l_linenumber * 11) % 121")} as l_shipdate,
         |  ${dplus("o.o_orderdate",
                    "30 + (l.l_orderkey * 5 + l.l_linenumber * 13) % 61")} as l_commitdate,
         |  ${dplus("o.o_orderdate",
                    "2 + (l.l_orderkey * 7 + l.l_linenumber * 11) % 121" +
                    " + (l.l_orderkey * 3 + l.l_linenumber * 17) % 30")} as l_receiptdate,
         |  case when (l.l_orderkey * 3 + l.l_linenumber) % 2 = 0
         |    then 'DELIVER IN PERSON'
         |    else ${caseOver("(l.l_orderkey + l.l_linenumber) % 3",
                              Seq("COLLECT COD", "NONE", "TAKE BACK RETURN"))}
         |  end as l_shipinstruct,
         |  ${caseOver("(l.l_orderkey * 13 + l.l_linenumber * 7) % 8", modes)} as l_shipmode,
         |  'generated line comment' as l_comment
         |from lineitem l
         |join ref_orders o on l.l_orderkey = o.o_orderkey
         |join (select l_orderkey as k, count(*) as n
         |      from lineitem group by l_orderkey) lc on lc.k = l.l_orderkey""".stripMargin,
    "ref_partsupp" ->
      """select ps_partkey, ps_suppkey,
        |  cast(1 + (ps_partkey * 13 + ps_suppkey * 7) % 9999 as int) as ps_availqty,
        |  cast(1 + (ps_partkey * 31 + ps_suppkey * 17) % 3996 as double) * 0.25
        |    as ps_supplycost,
        |  'generated partsupp comment' as ps_comment
        |from (select distinct l_partkey as ps_partkey, l_suppkey as ps_suppkey
        |      from lineitem) t""".stripMargin)

  val canonicalNames: Seq[String] = Seq(
    "region", "nation", "supplier", "customer", "part", "orders",
    "lineitem", "partsupp")

  /** WITH-clause text deriving all eight canonical tables from the
    * fixture views (shared verbatim between the Spark materializer and
    * every DuckDB oracle). */
  def prelude: String =
    genTables.map { case (n, b) => s"$n as (\n$b)" }.mkString("with ", ",\n", "")

  /** The reference's verbatim query text, read from the public corpus at
    * runtime (same handling as ReferenceSqlSpec — never vendored). */
  def verbatim(n: Int): String = {
    val p = Paths.get(s"/root/reference/sql/tpch$n.sql")
    new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The verbatim text with canonical table names renamed to the ref_*
    * CTE names — the ONLY transformation the oracle applies (CTEs cannot
    * shadow the fixture views DuckDB already has under the canonical
    * names). Word-boundary + case-sensitive, so column prefixes
    * (p_partkey), suffixed aliases (supplier_cnt, all_nations) and
    * capitalized literals ('%Customer%Complaints%') are untouched. */
  def renamed(sql: String): String =
    sql.replaceAll(
      "\\b(customer|orders|lineitem|supplier|nation|region|partsupp|part)\\b",
      "ref_$1")

  /** Full DuckDB oracle for query n: generation CTEs + renamed verbatim
    * text (merging the verbatim's own WITH clause when present, q15). */
  def oracleFor(n: Int): String = {
    val r = renamed(verbatim(n)).trim
    if (r.toLowerCase.startsWith("with "))
      prelude + ",\n" + r.substring(5)
    else prelude + "\n" + r
  }

  // ---- Spark-side materialization ----------------------------------------

  private val GuardKey = "graft.ref.dir"

  /** Bump when [[genTables]] changes — keys the materialization path so
    * a stale parquet cache from an older generator is never reused. */
  private val GenVersion = 2

  /** Content key over the fixture parquet files (name, size, mtime):
    * regenerated fixtures at the SAME path get a fresh cache directory,
    * so the synthesized tables can never go stale against the fixtures
    * the oracle reads directly. */
  private def fixtureKey(dir: String): String = {
    val d = Paths.get(dir)
    val sig =
      if (!Files.isDirectory(d)) s"missing:$dir"
      else {
        val s = Files.list(d)
        try s.iterator().asScala.toSeq
          .filter(_.toString.endsWith(".parquet")).sortBy(_.toString)
          .map(p => s"${p.getFileName}:${Files.size(p)}:" +
            s"${Files.getLastModifiedTime(p).toMillis}")
          .mkString("|")
        finally s.close()
      }
    java.lang.Long.toHexString(graft.functions.Text.fnv64(sig))
  }

  /** Materialize the canonical tables to parquet once per (session, dir)
    * and register them as temp views under the CANONICAL names. The
    * verbatim texts then run unmodified through the SQL front door.
    * Fixture-based entries re-register the fixture views on their own
    * runs (Q.shared → Tables.registerAll), so the name reuse is safe.
    *
    * Also enables ANSI double-quoted identifiers for this session: the
    * reference's q11 aliases `as "value"`, which Spark otherwise parses
    * as a string literal. No other entry uses double quotes in SQL. */
  def ensureRegistered(spark: SparkSession, dir: String): Unit = synchronized {
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    val dirKey = s"${dir.replaceAll("[^A-Za-z0-9.]", "_")}-${fixtureKey(dir)}"
    val outBase = s"target/ref_tpch/v$GenVersion/$dirKey"
    if (!spark.conf.getOption(GuardKey).contains(dirKey)) {
      Tables.registerAll(spark, dir)
      // DataFrames capture the fixture plans at analysis time, so
      // re-pointing the canonical view names below cannot loop back.
      genTables.foreach { case (cte, _) =>
        val name = cte.stripPrefix("ref_")
        if (!Files.exists(Paths.get(s"$outBase/$name/_SUCCESS"))) {
          spark.sql(s"$prelude\nselect * from $cte")
            .coalesce(4)
            .write.mode("overwrite").parquet(s"$outBase/$name")
        }
      }
      spark.conf.set(GuardKey, dirKey)
      spark.conf.set(Tables.ViewsKey, "") // views about to change owner
    }
    if (!spark.conf.getOption(Tables.ViewsKey).contains(s"ref:$dir")) {
      canonicalNames.foreach { name =>
        spark.read.parquet(s"$outBase/$name").createOrReplaceTempView(name)
      }
      spark.conf.set(Tables.ViewsKey, s"ref:$dir")
    }
  }
}
