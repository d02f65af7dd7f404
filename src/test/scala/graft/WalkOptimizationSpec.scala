package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-18 optimization contracts for the beam-walk restructure: the
  * walk flips two session confs (AQE off, batch-sized shuffle
  * partitioning) around its micro-plans and must RESTORE them — a leak
  * would silently degrade every later query in a shared session; and
  * the memoized unit-vector corpus ([[Similarity.sharedUnitVecs]],
  * the normalized half of the graph-index serving artifact) must be
  * bit-equal to the per-query normalization it replaced — the walk's
  * scorer now reads it on every round. */
class WalkOptimizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("beamWalk restores AQE and shuffle-partition confs after serving") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.get(aqeKey)
    val prevSp = spark.conf.get(spKey)
    // drive a full walk end-to-end (plan build executes the loop)
    val out = Similarity.graphBeamTopK(spark, TestSpark.Sf, Similarity.TopK)
    assert(out.count() > 0)
    assert(spark.conf.get(aqeKey) == prevAqe,
      "walk leaked spark.sql.adaptive.enabled")
    assert(spark.conf.get(spKey) == prevSp,
      "walk leaked spark.sql.shuffle.partitions")
  }

  test("sharedUnitVecs is bit-equal to per-query normalization") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    def dump(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Double])] =
      df.select(col("vec_id"), col("u")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq.sortBy(_._1)
    val shared = dump(Similarity.sharedUnitVecs(spark, TestSpark.Sf))
    val fresh = dump(Similarity.withUnit(emb))
    assert(shared.nonEmpty)
    // exact comparison: same expression, materialized once vs rebuilt —
    // any drift here would break every walk oracle downstream
    assert(shared == fresh, "memoized unit corpus diverged")
  }
}
