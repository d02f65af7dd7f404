package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every verifiable query the engine exposes (grows per SURVEY.md §2). */
  def allQueries: Seq[Q] =
    graft.tpch.Tpch.queries ++
      graft.tpch.RefTpch.queries ++
      graft.operators.Relational.queries ++
      graft.operators.Skew.queries ++
      graft.operators.Approx.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.Cluster.queries ++
      graft.operators.Quantize.queries ++
      graft.operators.TextAnalysis.queries ++
      graft.operators.Pipeline.queries ++
      graft.operators.Corpus.queries ++
      graft.operators.Dml.queries ++
      graft.operators.Multimodal.queries ++
      graft.operators.Temporal.queries ++
      graft.operators.Graph.queries ++
      graft.operators.Analytics.queries ++
      graft.streaming.EventsStream.queries ++
      graft.types.TypesQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.tpch.Tpch.q1.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(_.tuple).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
