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

  val queries: Seq[Q] = Seq(typesUnsignedWidening, typesBinaryCollation)
}
