package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution behaviors that matter at 100 TB: runtime
  * partition coalescing (small shuffles shouldn't schedule hundreds of
  * near-empty reducers) and dynamic partition pruning (a selective dim
  * filter prunes fact partitions at runtime). */
class AdaptiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE coalesces shuffle partitions for a small aggregation") {
    val df = Tables.df(spark, TestSpark.Sf, "orders")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
    val plan = finalPlan(df)
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"no AQE coalescing in:\n$plan")
  }

  test("AQE splits a skewed join partition (OptimizeSkewedJoin)") {
    import spark.implicits._
    // one key owns ~all rows: without skew handling a single reducer
    // drags the whole join; AQE must mark the SMJ skew=true and split
    // that partition into parallel subtasks
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = (1 to 200000).map(i =>
        (if (i % 100 == 0) i.toLong else 7L, s"payload_left_$i"))
        .toDF("k", "l")
      val right = (1 to 5000).map(i =>
        (if (i % 50 == 0) 7L else i.toLong, s"payload_right_$i"))
        .toDF("k", "r")
      // aggregate so only one row reaches the driver; the final adaptive
      // plan still contains the (skew-split) join
      val joined = left.join(right, Seq("k")).groupBy().count()
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true"), s"no skew-join split in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    import spark.implicits._
    val dir = "/tmp/graft-partitioned-events"
    if (!new java.io.File(dir).exists()) {
      Tables.df(spark, TestSpark.Sf, "events")
        .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    }
    val fact = spark.read.parquet(dir)
    // the dim must be a file-backed scan: a LocalRelation would have its
    // filter constant-folded away, and DPP requires a surviving
    // selective predicate on the build side
    val dimDir = "/tmp/graft-dpp-dim"
    Seq(("view", 1), ("click", 2), ("purchase", 3),
      ("signup", 4), ("error", 5)).toDF("etype", "prio")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("prio") === 1),
      col("event_type") === col("etype"))
    val planned = joined.queryExecution.executedPlan.toString
    assert(planned.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$planned")
    assert(joined.count() > 0)
  }
}
