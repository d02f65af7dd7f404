package graft.plans

import org.apache.spark.sql.SparkSession

/** EXPLAIN as a user feature — the reference parses `EXPLAIN <stmt>`
  * into its AST (doradb-sql/src/ast.rs:1556-1562) but cannot go
  * further; here the SQL front door's EXPLAIN executes end-to-end and
  * returns the plan text. Modes mirror Spark SQL: formatted | extended
  * | codegen | cost | logical.
  */
object Explain {
  def explainSql(spark: SparkSession, sql: String,
      mode: String = "formatted"): String =
    spark.sql(s"EXPLAIN $mode $sql").collect()
      .map(_.getString(0)).mkString("\n")
}
