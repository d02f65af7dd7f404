package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark builder plus (optionally) the ANSI-SQL
  * oracle the driver runs in DuckDB on the same parquet tables. Column
  * names and row ordering must match the oracle exactly (driver compares
  * by sorted column name + value hash).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracleThunk: Option[() => String]) {

  /** Oracle text, evaluated on READ: most entries close over a constant
    * string, but an oracle may embed literals derived from the run
    * itself (the trained-IVF centroids), so Verify reads oracles only
    * AFTER executing every query. */
  def oracle: Option[String] = oracleThunk.map(_())

  def tuple: (String, (SparkSession, String) => DataFrame) = name -> run
}

object Q {
  /** A query whose text is valid in BOTH Spark SQL and DuckDB: Spark
    * executes the same string the oracle does. Used for subquery-heavy
    * shapes the DataFrame API cannot express (correlated scalar/EXISTS). */
  def shared(name: String, sql: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) },
      Some(() => sql))

  /** DataFrame-built query with a separate oracle text (by-name: late-
    * bound oracles re-evaluate on each read). */
  def df(name: String, oracle: => String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(() => oracle))

  /** Query with no SQL-expressible oracle (driver does rows-only check). */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
