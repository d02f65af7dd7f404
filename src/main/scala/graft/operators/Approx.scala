package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Approximate aggregates as DATA-CHECKED entries (beyond-reference
  * surface). Sketch internals (HLL++ registers, KLL/GK quantile
  * summaries) differ per engine, so there is no cross-engine oracle;
  * instead each entry computes the approximate AND the exact answer in
  * the same query and surfaces the error-bound check as a column — the
  * accuracy claim rides in the dumped rows themselves (rows-only driver
  * check; `ApproxSpec` additionally asserts the flags hold).
  *
  * Scale note: this is the 100 TB pattern for validating sketches —
  * both sides are single-pass distributed aggregates; nothing is
  * collected to the driver.
  */
object Approx {

  /** HLL++ relative standard deviation default (Spark): 5%. The bound
    * checked is 3σ-ish at 15% — loose enough to be deterministic-safe,
    * tight enough to catch a broken sketch. */
  val DistinctEps = 0.15

  val approxDistinct: Q = Q.rowsOnly("approx_distinct_bounds") { (s, dir) =>
    Tables.df(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("exact_nd"),
        approx_count_distinct(col("o_custkey")).as("approx_nd"))
      .withColumn("rel_err",
        abs(col("approx_nd") - col("exact_nd")).cast("double")
          / col("exact_nd").cast("double"))
      .withColumn("within_eps", col("rel_err") <= DistinctEps)
      .orderBy(col("o_orderpriority"))
  }

  /** Rank-error bound for the quantile sketch: the TRUE rank of the
    * approximate median must sit within eps of 0.5. This is the bound
    * the sketch actually promises (rank error, not value error). */
  val PercentileRankEps = 0.02

  val approxPercentile: Q = Q.rowsOnly("approx_percentile_bounds") { (s, dir) =>
    val li = Tables.df(s, dir, "lineitem")
    val ap = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("approx_p50"))
    li.crossJoin(broadcast(ap))
      .groupBy(col("approx_p50"))
      .agg((sum(when(col("l_extendedprice") <= col("approx_p50"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)).cast("double"))
        .as("rank_of_approx"))
      .withColumn("within_eps",
        col("rank_of_approx").between(0.5 - PercentileRankEps,
          0.5 + PercentileRankEps))
  }

  val queries: Seq[Q] = Seq(approxDistinct, approxPercentile)
}
