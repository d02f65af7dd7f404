package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants. */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are unique") {
    val qs = SparkEntry.allQueries.map(_.name)
    assert(qs.distinct.size == qs.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("multimodal stub pipeline yields features of fixed dimension") {
    val out = graft.operators.Multimodal.multimodalFeatures.run
      .apply(spark, TestSpark.Sf)
    val feats = out.collect().map(_.getSeq[Float](1))
    assert(feats.nonEmpty && feats.forall(_.length == 8))
  }
}
