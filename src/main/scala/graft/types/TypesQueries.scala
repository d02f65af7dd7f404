package graft.types

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Driver-checkable surface for the type-mapping layer: values spanning
  * each unsigned range flow losslessly through [[TypeMap]]'s widened
  * Spark types. The oracle spells the same widened types in DuckDB
  * (which has native unsigned types but identical widened semantics).
  */
object TypesQueries {
  import TypeMap.PreciseType

  val typesUnsignedWidening: Q = Q.df(
    "types_unsigned_widening",
    """select doc_id,
      |  cast(doc_id % 256 as smallint) as u8_w,
      |  cast(doc_id % 65536 as int) as u16_w,
      |  cast(doc_id % 4294967296 as bigint) as u32_w,
      |  cast(cast(doc_id as decimal(20,0)) as varchar) as u64_w
      |from documents order by doc_id""".stripMargin) { (s, dir) =>
    def w(bytes: Int) = TypeMap.toSpark(PreciseType.Int(bytes, unsigned = true))
    Tables.df(s, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 256).cast(w(1)).as("u8_w"),
        (col("doc_id") % 65536).cast(w(2)).as("u16_w"),
        (col("doc_id") % 4294967296L).cast(w(4)).as("u32_w"),
        // surfaced as string: a decimal(20,0) column survives the engine
        // exactly but harness-side dataframe libraries coerce it to
        // float and corrupt the compare; the string form is lossless
        col("doc_id").cast(w(8)).cast("string").as("u64_w"))
      .orderBy(col("doc_id"))
  }

  /** Binary collation surface: the reference maps its Binary collation
    * to raw-byte comparison semantics (doradb-datatype/src/lib.rs:201-203,
    * 466-470 — Ascii/Utf8mb4/Binary; repo mapping TypeMap.scala). Spark
    * BinaryType and DuckDB BLOB both compare/group/order by unsigned
    * lexicographic bytes, proven here by grouping AND ordering AND
    * comparing on a binary-cast column against the BLOB oracle. */
  val typesBinaryCollation: Q = Q.df(
    "types_binary_collation",
    // Grouping, ordering, and the > comparison all run on the BLOB/BINARY
    // column (the collation semantics under test); only the SURFACED key
    // is hex text, because the driver's pandas compare cannot factorize
    // raw bytes (TypeError: unhashable 'bytearray').
    """select lower(hex(b_key)) as b_key_hex, cast(count(*) as bigint) as cnt,
      |  min(doc_id) as first_id,
      |  (b_key > encode('m')) as after_m
      |from (select doc_id, encode(substring(text, 1, 8)) as b_key
      |      from documents)
      |group by b_key order by b_key""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(col("doc_id"),
        substring(col("text"), 1, 8).cast("binary").as("b_key"))
      .groupBy(col("b_key"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("first_id"))
      .withColumn("after_m", col("b_key") > lit("m").cast("binary"))
      .orderBy(col("b_key"))
      .select(lower(hex(col("b_key"))).as("b_key_hex"), col("cnt"),
        col("first_id"), col("after_m"))
  }

  /** Non-binary (case-insensitive) collation compare + sort — the
    * Utf8mb4 side of the reference's collation enum
    * (doradb-datatype/src/lib.rs:466-470; MySQL's utf8mb4 default
    * collation is case-insensitive, unlike Spark's UTF8_BINARY
    * default). Spark 4 collated strings (`collate(s, 'UTF8_LCASE')`)
    * give the engine-native CI comparison; DuckDB's NOCASE is the
    * oracle-side equivalent (identical on the fixtures' ASCII data).
    * The entry derives a mixed-case column, then pins: CI equality
    * across case, binary equality differing, CI ordering vs a
    * mixed-case literal, and a CI sort surfaced as a rank (tie-broken
    * by key so the output is deterministic while the ORDER BY itself
    * runs on the collated column). The rank's input is bounded FIRST
    * (c_custkey < 500, pushed to the scan) because a total order is
    * inherently a single-partition WindowExec — constant-size input
    * keeps the semantics pin scale-safe; unbounded CI ordering at scale
    * is a sort, not a window. */
  val typesCollationCi: Q = Q.df(
    "types_collation_ci",
    """with b as (select c_custkey,
      |  case when c_custkey % 2 = 0 then upper(c_mktsegment)
      |       else lower(c_mktsegment) end as s,
      |  lower(c_mktsegment) as t from customer
      |  where c_custkey < 500)
      |select c_custkey, s,
      |  (s collate nocase) = t as ci_eq,
      |  s = t as bin_eq,
      |  (s collate nocase) < 'HOUSEhold' as ci_lt,
      |  rank() over (order by s collate nocase, c_custkey) as ci_rank
      |from b order by c_custkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val mixed = when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
      .otherwise(lower(col("c_mktsegment")))
    val ci = collate(col("s"), "UTF8_LCASE")
    Tables.df(s, dir, "customer")
      .filter(col("c_custkey") < 500)
      .select(col("c_custkey"), mixed.as("s"),
        lower(col("c_mktsegment")).as("t"))
      .select(col("c_custkey"), col("s"),
        (ci === col("t")).as("ci_eq"),
        (col("s") === col("t")).as("bin_eq"),
        (ci < lit("HOUSEhold")).as("ci_lt"),
        rank().over(Window.orderBy(ci, col("c_custkey")))
          .cast("long").as("ci_rank"))
      .orderBy(col("c_custkey"))
  }

  /** CI collation under GROUP BY and DISTINCT — the aggregation half of
    * collation semantics: grouping on `collate(s, 'UTF8_LCASE')` merges
    * case variants into one group (5 segments instead of 10). The
    * surfaced group key is `lower(min(s))` — min under BINARY collation
    * picks the uppercase variant deterministically in both engines, so
    * the output never depends on which member the CI group happens to
    * expose. At scale this is one hash aggregate on a normalized-width
    * key; no extra shuffle vs a binary group-by. */
  val typesCollationCiGroup: Q = Q.df(
    "types_collation_ci_group",
    """with b as (select c_custkey,
      |  case when c_custkey % 2 = 0 then upper(c_mktsegment)
      |       else lower(c_mktsegment) end as s from customer)
      |select lower(min(s)) as seg, cast(count(*) as bigint) as cnt,
      |  cast(count(distinct s) as bigint) as n_case_variants
      |from b group by s collate nocase order by seg""".stripMargin) {
    (s, dir) =>
      val mixed = when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
        .otherwise(lower(col("c_mktsegment")))
      Tables.df(s, dir, "customer")
        .select(col("c_custkey"), mixed.as("s"))
        .groupBy(collate(col("s"), "UTF8_LCASE"))
        .agg(lower(min(col("s"))).as("seg"),
          count(lit(1)).as("cnt"),
          countDistinct(col("s")).as("n_case_variants"))
        .select(col("seg"), col("cnt"), col("n_case_variants"))
        .orderBy(col("seg"))
  }

  /** Decimal arithmetic parity — the money-type semantics the reference
    * carries in its datatype module (doradb-datatype decimal), pinned
    * end to end: scale propagation through ×, round-half-away-from-zero
    * on ties (Java HALF_UP == DuckDB's away-from-zero — shown on BOTH
    * signs via the ±x·0.125 columns, whose 3-decimal products hit the
    * .xx5 tie grid), and exact decimal sums surfaced as doubles. All
    * arithmetic is decimal until the final cast, so partial-aggregation
    * order cannot perturb a bit. Shared text: every construct parses
    * identically in Spark SQL and DuckDB. */
  val typesDecimalArith: Q = Q.shared(
    "types_decimal_arith",
    """select l_returnflag,
      |  cast(sum(cast(l_extendedprice as decimal(12,2))
      |           * (1 - cast(l_discount as decimal(4,2)))) as double)
      |    as sum_rev,
      |  cast(sum(round(cast(l_extendedprice as decimal(12,2))
      |                 * cast(0.125 as decimal(4,3)), 2)) as double)
      |    as sum_eighth,
      |  cast(sum(round(cast(-l_extendedprice as decimal(12,2))
      |                 * cast(0.125 as decimal(4,3)), 2)) as double)
      |    as sum_neg_eighth
      |from lineitem
      |group by l_returnflag
      |order by l_returnflag""".stripMargin)

  val queries: Seq[Q] = Seq(typesUnsignedWidening, typesBinaryCollation,
    typesCollationCi, typesCollationCiGroup, typesDecimalArith)
}
