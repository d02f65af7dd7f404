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
  * - Histogram stats OFF (rowCount + per-column NDV/min/max only).
  *   Measured on the 6-table reorder query: equi-height histograms add
  *   ~1.3 s of optimizer time at plan AND ~1.4 s more inside AQE's
  *   re-planning per execution (0.09 s plan / 0.17 s exec without →
  *   1.42 / 1.62 with), a 10× driver-side tax charged to EVERY query
  *   planned against the stats catalog. They buy selectivity precision
  *   only for range predicates over stat'd columns — and the date
  *   columns, the one range-filtered family, are excluded from stats
  *   anyway (TimestampNTZ FilterEstimation MatchError, Tables.scala).
  *   Join reorder itself is driven by rowCount + NDV and still fires
  *   (CboPlanSpec asserts it). The reference's cost model is likewise
  *   cardinality-based (doradb-plan/src/join/estimate.rs) — histograms
  *   were sophistication beyond both engines' needs at real cost.
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
      .withExtensions(graft.functions.UnicodeNormalize.inject)
      .withExtensions(graft.plans.AsOfJoinNative.inject)
      .withExtensions(graft.plans.NormalizeRules.inject)
      .withExtensions(graft.plans.MvRewrite.inject)
      .withExtensions(graft.plans.MvJoinRewrite.inject)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      // DP join-reorder bound: Catalyst's default threshold of 12
      // relations silently degrades wider graphs to left-deep
      // heuristics. The reference's reorder handles up to 31 relations
      // (doradb-plan/src/join/graph.rs:10-15) via DPhyp's
      // connected-subgraph enumeration; Catalyst's DP is subset-based,
      // so matching 31 would make planning itself the bottleneck — 16
      // covers real snowflakes with role-playing dims (join_reorder_wide
      // is 13 relations, plan-asserted to cost-reorder) while keeping
      // optimizer time bounded.
      .config("spark.sql.cbo.joinReorder.dp.threshold", "16")
      .config("spark.sql.statistics.histogram.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      // V2 catalog plugin: graft_cat.gen.range_<N> resolves through
      // Catalyst's identifier machinery to the DSv2 range source
      .config("spark.sql.catalog.graft_cat",
        classOf[graft.sources.GenCatalog].getName)
}
