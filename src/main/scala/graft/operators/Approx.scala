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

  /** Statistical moments (stddev/variance/correlation) — beyond-reference
    * aggregates whose builtin implementations are numerically
    * engine-specific (Welford updates accumulate differently per
    * partitioning), so instead of a hash compare the entry recomputes
    * each moment from exact integer power sums IN-QUERY and surfaces the
    * agreement flag: sum(x), sum(x²), sum(x·y) over integer-valued
    * l_quantity/l_linenumber are exact, so the reference value is the
    * textbook formula evaluated once in IEEE — builtins must land within
    * 1e-9 relative. */
  val MomentsTol = 1e-9

  val statsMoments: Q = Q.rowsOnly("agg_stats_moments") { (s, dir) =>
    val li = Tables.df(s, dir, "lineitem")
      .select(col("l_quantity").as("x"), col("l_linenumber").cast("double").as("y"))
    val agg = li.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"),
      var_samp(col("x")).as("var_b"), stddev_samp(col("x")).as("sd_b"),
      corr(col("x"), col("y")).as("corr_b"))
    agg
      .withColumn("var_ref",
        (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
      .withColumn("sd_ref", sqrt(col("var_ref")))
      .withColumn("corr_ref",
        (col("sxy") - col("sx") * col("sy") / col("n"))
          / sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            * (col("syy") - col("sy") * col("sy") / col("n"))))
      .select(col("n").cast("long").as("n"),
        col("var_b"), col("var_ref"), col("sd_b"), col("sd_ref"),
        col("corr_b"), col("corr_ref"),
        (abs(col("var_b") - col("var_ref")) / col("var_ref") <= MomentsTol &&
          abs(col("sd_b") - col("sd_ref")) / col("sd_ref") <= MomentsTol &&
          abs(col("corr_b") - col("corr_ref")) <= MomentsTol).as("within_tol"))
  }

  val queries: Seq[Q] = Seq(approxDistinct, approxPercentile, statsMoments)
}
