package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap shared by Bench, Verify and the spec suite.
  *
  * Everything here is chosen for the 100 TB design point and mirrors the
  * reference's optimizer surface (SURVEY §4):
  * - CBO + cost-based join reorder ON: the Spark counterpart of the
  *   reference's join-reorder algorithms (doradb-plan/src/join/reorder/
  *   {greedy,dpsize,dphyp}.rs) — Catalyst's CostBasedJoinReorder is
  *   itself a DP over the join graph, driven by ANALYZE statistics
  *   (registered per-table in [[Tables.registerStats]]).
  * - Histogram stats ON so ANALYZE ... FOR COLUMNS builds equi-height
  *   histograms (better selectivity estimates for the reorder cost).
  * - shuffle.partitions sized to local cores (not the 200 default); on a
  *   real cluster this would be executors×cores with AQE coalescing.
  * - UTC so date/timestamp semantics match the DuckDB oracle.
  * - nanosAsLong set ONCE here (the events fixture is TIMESTAMP(NANOS)),
  *   not mutated per table read.
  */
object Session {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(graft.functions.DotProduct.inject)
      .withExtensions(graft.functions.Bloom.inject)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.statistics.histogram.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
}
