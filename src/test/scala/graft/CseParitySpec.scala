package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Common-subexpression elimination parity.
  *
  * The reference's compute layer caches repeated eval subtrees so a
  * projection evaluating the same expensive expression twice computes
  * it once (doradb-compute/src/eval/mod.rs:18-131 — the Eval tree's
  * per-node cache slots). Catalyst has the same capability inside
  * whole-stage codegen (`spark.sql.subexpressionElimination.enabled`,
  * on by default): semantically-equal subtrees in one projection are
  * hoisted and evaluated once — sometimes as a named `subExpr_N`
  * function, sometimes inlined with the value variable reused, so the
  * load-bearing assertion here is the KERNEL COUNT in the generated
  * code (the physical plan shows the expression three times; the code
  * must contain its kernel once). Custom codegen expressions
  * participate for free because elimination keys on `semanticEquals`,
  * not on a builtin whitelist — these specs PROVE that instead of
  * assuming it.
  */
class CseParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def codegen(df: DataFrame): String =
    org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)

  test("repeated expensive builtin is hoisted into one subExpr slot") {
    val expensive = md5(concat(col("id").cast("string"), lit("salt")))
    val df = spark.range(64).select(
      expensive.as("a"),
      substring(expensive, 1, 4).as("b"),
      length(expensive).as("c"))
    val code = codegen(df)
    // the plan line shows md5 three times; the generated code carries
    // one hoisted evaluation slot and ONE digest-kernel call
    assert(code.contains("subExpr"),
      "no subexpression-elimination slot in generated code")
    val hashes = "md5Hex\\(".r.findAllIn(code).size
    assert(hashes == 1, s"md5 kernel generated $hashes times — expected 1")
  }

  test("custom codegen expression (graft_dot) participates in CSE") {
    graft.functions.DotProduct.ensureRegistered(spark)
    val df = spark.range(64)
      .select(array(col("id").cast("double"),
        (col("id") + 1).cast("double")).as("v"))
      .select(
        expr("graft_dot(v, array(0.5d, 2.0d))").as("d1"),
        (expr("graft_dot(v, array(0.5d, 2.0d))") * 2).as("d2"),
        (expr("graft_dot(v, array(0.5d, 2.0d))") + 1).as("d3"))
    // the physical plan carries the expression three times ...
    val planHits = "graft_dot".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(planHits == 3, s"plan shows graft_dot $planHits times")
    // ... the generated code carries the multiply-accumulate kernel ONCE
    val kernel =
      "\\+= \\w+\\.getDouble\\(\\w+\\) \\* .*\\.getDouble\\(\\w+\\);".r
    val n = kernel.findAllIn(codegen(df)).size
    assert(n == 1, s"graft_dot kernel generated $n times — expected 1")
    // and the shared evaluation computes the right thing
    val rows = df.collect()
    assert(rows.forall(r => r.getDouble(1) == r.getDouble(0) * 2
      && r.getDouble(2) == r.getDouble(0) + 1))
  }

  test("custom codegen expression (graft_normalize) participates in CSE") {
    graft.functions.UnicodeNormalize.ensureRegistered(spark)
    val df = spark.range(64)
      .select(concat(lit("Café "), col("id").cast("string")).as("s"))
      .select(
        expr("graft_normalize(s, 'NFKC')").as("n1"),
        length(expr("graft_normalize(s, 'NFKC')")).as("n2"))
    val planHits = "graft_normalize".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(planHits == 2, s"plan shows graft_normalize $planHits times")
    val n = "Normalizer\\.normalize\\(".r.findAllIn(codegen(df)).size
    assert(n == 1, s"normalize kernel generated $n times — expected 1")
    val rows = df.collect()
    assert(rows.forall(r => r.getString(0).length == r.getInt(1)))
  }
}
