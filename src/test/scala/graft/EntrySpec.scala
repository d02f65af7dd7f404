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

  test("perceptual-hash near-dup: every derived re-encode pairs with " +
    "exactly its source, banding loses nothing at the threshold") {
    import graft.operators.Multimodal
    val pairs = Multimodal
      .phashNearDups(Multimodal.mediaWithVariants(spark, TestSpark.Sf),
        Multimodal.HamThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the variant-eligibility predicate (incl. the payload-length
    // precondition of the Hamming≤2 guarantee) must match
    // mediaWithVariants exactly — a fixture with short payloads drops
    // those variants rather than silently breaking the pair contract
    val nVariants = Multimodal.mediaTable(spark, TestSpark.Sf)
      .filter(org.apache.spark.sql.functions.col("doc_id")
        % Multimodal.VariantMod === 0 &&
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("payload"))
          > Multimodal.HashSamples)
      .count()
    // one pair per variant, each source↔variant (a one-byte edit flips
    // at most 2 gradient bits), no cross-object false positives (the
    // fixture's min cross-object Hamming is 12)
    assert(pairs.length == nVariants, s"${pairs.length} vs $nVariants")
    assert(pairs.forall { case (a, b, h) =>
      b - a == Multimodal.VariantIdOffset && h <= 2
    }, s"unexpected pair set: ${pairs.take(5).mkString(", ")}")
  }
}
