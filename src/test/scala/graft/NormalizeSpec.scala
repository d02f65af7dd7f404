package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom Catalyst expression `graft_normalize` (Unicode NFC/NFD/
  * NFKC/NFKD): registration, agreement with java.text.Normalizer row
  * by row (the codegen path must compute exactly the JDK semantics),
  * null propagation, and plan-time form validation. */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples = Seq(
    "éclair",        // decomposed
    "éclair",         // composed
    "ÉTUDE",
    "naïve", "øre", "ASCII",
    "ﬁsh",            // fi ligature: NFC keeps, NFKC expands
    "①",              // circled one: NFKC → 1
    "")

  test("all four forms agree with java.text.Normalizer per row") {
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = samples.toDF("s")
        .select(expr(s"graft_normalize(s, '$form')")).as[String].collect()
      val want = samples.map(java.text.Normalizer.normalize(_,
        java.text.Normalizer.Form.valueOf(form)))
      assert(got.toSeq == want, form)
    }
  }

  test("NFC merges decomposed and composed spellings of the same word") {
    val d = Seq("éclair" -> 1, "éclair" -> 1).toDF("s", "n")
      .groupBy(expr("graft_normalize(s, 'NFC')").as("k"))
      .agg(sum("n").as("n")).collect()
    assert(d.length == 1 && d(0).getLong(1) == 2,
      "normalized dedup key must unify the two spellings")
  }

  test("null propagates; bad form fails at plan time") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(expr("graft_normalize(s, 'NFC')")).collect()
    assert(r(0).isNullAt(0))
    val e = intercept[Exception](
      spark.sql("select graft_normalize('x', 'NFX')").collect())
    assert(e.getMessage.contains("NFC|NFD|NFKC|NFKD"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("select graft_normalize('x', lower('NFC'))").collect())
    assert(e2.getMessage.toLowerCase.contains("literal"), e2.getMessage)
  }

  test("injected optimizer rule collapses same-form nested normalization") {
    // parquet-backed input: a literal Seq would constant-fold away the
    // whole projection before the rule's effect could be observed
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
      .select(col("text").as("s")).limit(20)
    val df = docs.select(expr(
      "graft_normalize(graft_normalize(s, 'NFC'), 'NFC')").as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    // exactly one call survives optimization
    assert("graft_normalize".r.findAllIn(optimized).size == 1, optimized)
    // and values are unchanged vs the single-call form
    val single = docs.select(expr("graft_normalize(s, 'NFC')").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(df.collect().map(_.getString(0)).toSeq == single)
  }

  test("different-form nesting is NOT collapsed (NFKC of NFD differs)") {
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
      .select(col("text").as("s")).limit(20)
    val df = docs.select(expr(
      "graft_normalize(graft_normalize(s, 'NFD'), 'NFKC')").as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("graft_normalize".r.findAllIn(optimized).size == 2, optimized)
  }
}
