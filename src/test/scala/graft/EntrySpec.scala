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
    import graft.operators.Multimodal
    // the typed pipeline itself: every decoded row carries an 8-dim array
    val metas = Multimodal.decodeAll(Multimodal.mediaTable(spark, TestSpark.Sf))
      .collect()
    assert(metas.nonEmpty && metas.forall(_.features.length == 8))
    // the driver-checkable exploded form: 8 scalar rows per doc, bytes 0-255
    val out = Multimodal.multimodalFeatures.run.apply(spark, TestSpark.Sf)
      .collect()
    assert(out.length == metas.length * 8)
    assert(out.forall { r =>
      val idx = r.getLong(1); val b = r.getLong(2)
      idx >= 0 && idx < 8 && b >= 0 && b <= 255
    })
  }
}
