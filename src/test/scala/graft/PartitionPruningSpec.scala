package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning — the dominant 100 TB scan optimization: a table
  * laid out as `.../event_type=X/` directories must be read with the
  * non-matching partitions skipped at PLANNING time (PartitionFilters
  * on the scan), not filtered after a full read.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hive-partitioned write + filtered read prunes partitions in-plan") {
    val dir = "/tmp/graft-partitioned-events"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    Tables.df(spark, TestSpark.Sf, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("event_type") === "view")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"no partition pruning in:\n$plan")
    // and the pruned read returns exactly the filtered rows
    val expected = Tables.df(spark, TestSpark.Sf, "events")
      .filter(col("event_type") === "view").count()
    assert(df.count() == expected && expected > 0)
  }

  test("scan_partition_pruned entry reads one partition directory in-plan") {
    val df = graft.operators.Dml.scanPartitionPruned.run(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"no partition pruning in the entry's plan:\n$plan")
  }
}
