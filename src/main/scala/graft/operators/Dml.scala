package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** DML execution surface: CTAS + INSERT INTO (both insert-select and
  * VALUES), executed end-to-end and read back oracle-checked.
  *
  * The reference PARSES the full DML surface
  * (doradb-sql/src/ast.rs:22-34,53-89 — InsertInto/Update/Delete) but
  * its physical layer executes none of it; here the statements actually
  * run through Spark's SQL front door against a managed parquet table,
  * exceeding the reference on a parse-only surface (same pattern as
  * recursive CTE). UPDATE/DELETE on parquet tables are format-level
  * non-goals in stock Spark (they need a transactional table format —
  * the lakehouse formats layer them on top of exactly this path), so the
  * entry covers what the engine can genuinely execute: CTAS, INSERT ...
  * SELECT, INSERT ... VALUES.
  *
  * Scale note: INSERT INTO a parquet table is an append of new files —
  * no shuffle beyond the SELECT's own plan, executor-parallel writes,
  * and the same partitioning story as any other sink in the repo.
  */
object Dml {

  private val Table = "graft_dml_docs"

  val dmlCtasInsert: Q = Q.df(
    "dml_ctas_insert",
    s"""select doc_id, source, n_tokens from (
       |  select doc_id, source,
       |    cast(len(string_split(text, ' ')) as bigint) as n_tokens
       |  from documents where source in ('src0', 'src1')
       |  union all
       |  select cast(9999999 as bigint), 'manual', cast(42 as bigint)
       |) t order by doc_id, source""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    // Managed table in the session catalog: DROP removes data too, so
    // the entry is idempotent across runs in one session.
    s.sql(s"drop table if exists $Table")
    s.sql(
      s"""create table $Table using parquet as
         |select doc_id, source,
         |  cast(size(split(text, ' ')) as bigint) as n_tokens
         |from documents where source = 'src0'""".stripMargin)
    s.sql(
      s"""insert into $Table
         |select doc_id, source,
         |  cast(size(split(text, ' ')) as bigint) as n_tokens
         |from documents where source = 'src1'""".stripMargin)
    s.sql(s"insert into $Table values (cast(9999999 as bigint), 'manual', " +
      "cast(42 as bigint))")
    s.sql(s"select doc_id, source, n_tokens from $Table")
      .orderBy(col("doc_id"), col("source"))
  }

  val queries: Seq[Q] = Seq(dmlCtasInsert)
}
