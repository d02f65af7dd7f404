package graft.plans

import org.apache.spark.sql.SparkSession

/** EXPLAIN as a user feature — the reference parses `EXPLAIN <stmt>`
  * into its AST (doradb-sql/src/ast.rs:1556-1562) but cannot go
  * further; here the SQL front door's EXPLAIN executes end-to-end and
  * returns the plan text. Modes are exactly the set Spark SQL's parser
  * accepts: formatted | extended | codegen | cost (plus bare EXPLAIN) —
  * `logical` is NOT a Spark EXPLAIN mode and is rejected here rather
  * than interpolated into the statement unvalidated.
  */
object Explain {
  private val Modes = Set("", "formatted", "extended", "codegen", "cost")

  def explainSql(spark: SparkSession, sql: String,
      mode: String = "formatted"): String = {
    val m = mode.trim.toLowerCase(java.util.Locale.ROOT)
    require(Modes.contains(m),
      s"unsupported EXPLAIN mode '$mode' (one of: ${Modes.mkString(", ")})")
    spark.sql(s"EXPLAIN $m $sql").collect()
      .map(_.getString(0)).mkString("\n")
  }
}
