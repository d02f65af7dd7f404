package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoinNative

/** The native whole-operator as-of join (custom LogicalPlan + strategy +
  * merge SparkPlan) against the composed union+window implementation it
  * must agree with, plus the physical-contract assertions: the planner
  * actually lowers through AsOfJoinExec, EnsureRequirements provisions
  * the exchanges/sorts, and the result is partitioning-invariant. */
class AsOfNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sides() = {
    val ev = Tables.df(spark, TestSpark.Sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_event_id"), col("value").as("v_value"))
    (p, v)
  }

  private def key(r: org.apache.spark.sql.Row): (Long, Any, Any, Any) =
    (r.getLong(0), r.get(3), r.get(4), r.get(5))

  test("native as-of equals the composed union+window implementation") {
    val (p, v) = sides()
    val native = AsOfJoinNative
      .join(p, v, "p_user", "p_ts", "v_user", "v_ts", "v_event_id")
      .select(col("p_event_id"), col("p_user"), col("p_ts"),
        col("v_ts"), col("v_event_id"), col("v_value"))
      .collect().map(key).toSet
    val ev = Tables.df(spark, TestSpark.Sf, "events")
    val composed = graft.operators.Temporal.asofJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "view"))
      .select(col("p_event_id"), col("user_id"), col("p_ts"),
        col("v_ts"), col("v_event_id"), col("v_value"))
      .collect().map(key).toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("planner lowers through AsOfJoinExec with provisioned sorts") {
    val (p, v) = sides()
    val plan = AsOfJoinNative
      .join(p, v, "p_user", "p_ts", "v_user", "v_ts", "v_event_id")
      .queryExecution.executedPlan.toString
    // the exec node prints with its "Exec" suffix stripped
    assert(plan.contains("AsOfJoin"), s"strategy did not fire:\n$plan")
    assert(plan.contains("Sort"),
      s"EnsureRequirements provisioned no sort:\n$plan")
  }

  test("result is invariant under input repartitioning") {
    val (p, v) = sides()
    val a = AsOfJoinNative
      .join(p, v, "p_user", "p_ts", "v_user", "v_ts", "v_event_id")
      .collect().map(key).toSet
    val b = AsOfJoinNative
      .join(p.repartition(7), v.repartition(3),
        "p_user", "p_ts", "v_user", "v_ts", "v_event_id")
      .collect().map(key).toSet
    assert(a == b)
  }

  test("probe rows with no quote at-or-before get null right columns") {
    import spark.implicits._
    val p = Seq((1L, 100L, 10L), (2L, 5L, 11L))
      .toDF("p_user", "p_ts_raw", "p_id")
      .select(col("p_user"), timestamp_micros(col("p_ts_raw")).as("p_ts"),
        col("p_id"))
    val v = Seq((1L, 50L, 20L, 1.5), (1L, 90L, 21L, 2.5), (1L, 90L, 22L, 3.5))
      .toDF("v_user", "v_ts_raw", "v_id", "v_val")
      .select(col("v_user"), timestamp_micros(col("v_ts_raw")).as("v_ts"),
        col("v_id"), col("v_val"))
    val out = AsOfJoinNative
      .join(p, v, "p_user", "p_ts", "v_user", "v_ts", "v_id")
      .select(col("p_id"), col("v_id"), col("v_val"))
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    // user 1 at ts=100: ties at v_ts=90 resolve to the larger v_id (22)
    assert(out(10L) == (22L, 3.5))
    // user 2 has no views at all → null right side
    assert(out(11L) == (null, null))
  }

  test("overlapping column names are rejected before planning") {
    val (p, v) = sides()
    val clash = v.withColumnRenamed("v_user", "p_user")
    intercept[IllegalArgumentException] {
      AsOfJoinNative.join(p, clash, "p_user", "p_ts", "p_user", "v_ts",
        "v_event_id")
    }
  }
}
