package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning (InjectRuntimeFilter): on a
  * shuffle join where one side carries a selective filter, Catalyst
  * builds a bloom filter over the creation side's join keys and
  * semi-filters the application side's scan BEFORE the join shuffle —
  * at 100 TB this is the difference between shuffling a full fact
  * table and shuffling only the keys that can possibly match. The
  * thresholds are size-gated for real clusters; the spec lowers the
  * application-side gate to make the tiny fixture eligible, then
  * asserts the filter is actually injected. */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // shuffle join path
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val lineitem = Tables.df(spark, TestSpark.Sf, "lineitem")
      val orders = Tables.df(spark, TestSpark.Sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom runtime filter injected in:\n$optimized")
      // the filter must land on the APPLICATION (fact) side scan branch,
      // keyed by the join key
      assert(optimized.contains("bloom_filter_agg"),
        s"no bloom filter aggregate on the creation side in:\n$optimized")
      assert(joined.count() >= 1)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
