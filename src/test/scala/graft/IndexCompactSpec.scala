package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** OPTIMIZE for the stored IVFPQ index: compaction physically drops
  * tombstoned code rows and must change NOTHING about serving —
  * post-compaction results bit-equal tombstone-filtered results, and
  * the stored code table actually shrank by exactly the tombstone
  * count. */
class IndexCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def served(q: Q): Seq[(Long, Long, Long)] =
    q.run(spark, TestSpark.Sf)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  test("compacted serving is bit-equal to tombstone-filtered serving") {
    val tombstoned = served(Similarity.annIndexDelete)
    val compacted = served(Similarity.annIndexCompact)
    assert(compacted.nonEmpty)
    assert(compacted == tombstoned,
      "compaction changed serving results")
    assert(!compacted.exists(_._2 % 7 == Similarity.AnnDeleteMod),
      "tombstoned neighbor served from the compacted index")
  }

  test("compaction shrinks the stored code table by the tombstone count") {
    val full = Similarity.fullIndexRoot(spark, TestSpark.Sf)
    val compact = Similarity.compactIndexRoot(spark, TestSpark.Sf)
    val codes = spark.read.parquet(s"$full/codes")
    val nFull = codes.count()
    val nDead = codes
      .filter(col("neighbor_id") % 7 === Similarity.AnnDeleteMod).count()
    val nCompact = spark.read.parquet(s"$compact/codes").count()
    assert(nDead > 0, "fixture has no tombstoned rows")
    assert(nCompact == nFull - nDead,
      s"compacted rows $nCompact != $nFull - $nDead")
  }
}
