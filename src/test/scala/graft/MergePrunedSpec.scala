package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dml

/** Partition-pruned row-level MERGE: a CDC batch rewrites ONLY the
  * partitions containing matched keys; every other partition's files
  * stay byte-for-byte identical (the replaceWhere/dynamic-overwrite
  * contract transactional formats give, proven here by file
  * inventory). */
class MergePrunedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("one batch rewrites only its partition; the rest byte-identical") {
    Tables.registerAll(spark, TestSpark.Sf)
    Dml.createMergePrunedTarget(spark, TestSpark.Sf)
    val before = Dml.partitionInventory(spark, Dml.PrunedTarget)
    assert(before.size >= 5, s"expected >=5 year partitions: ${before.keys}")

    val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
    val y = Dml.MergeYears.head
    val batch = Dml.mergePrunedBatch(base, y)
    assert(batch.count() > 0, "fixture has no rows for the batch year")

    // the touched-partition read is partition-PRUNED: every file the
    // merge input scans lives under the touched partition dir
    val touchedRead = spark.table(Dml.PrunedTarget).filter(col("yr") === y)
    val files = touchedRead.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(s"yr=$y")),
      s"merge input read beyond yr=$y: ${files.filterNot(_.contains(s"yr=$y")).take(3).toSeq}")

    Dml.applyMergePrunedBatch(spark, batch)
    val after = Dml.partitionInventory(spark, Dml.PrunedTarget)

    assert(after.keySet == before.keySet, "partition set changed")
    assert(after(s"yr=$y") != before(s"yr=$y"),
      "touched partition was not rewritten")
    (before.keySet - s"yr=$y").foreach { p =>
      assert(after(p) == before(p),
        s"untouched partition $p changed: ${before(p)} -> ${after(p)}")
    }

    // row-level semantics on the touched partition: updates applied,
    // inserts present, unmatched rows intact
    val got = spark.table(Dml.PrunedTarget).filter(col("yr") === y)
      .select("o_orderkey", "cents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseY = base.filter(col("yr") === y)
      .select("o_orderkey", "cents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    baseY.foreach { case (k, c) =>
      if (k % 20 == 0) {
        assert(got(k) == c * 2, s"update missed for key $k")
        assert(got(-k - 1) == c + 7, s"insert missed for key $k")
      } else assert(got(k) == c, s"unmatched row $k disturbed")
    }
    assert(got.size == baseY.size + baseY.count(_._1 % 20 == 0),
      "row count off after merge")
  }

  test("re-applying a batch is idempotent (streaming replay safety)") {
    Tables.registerAll(spark, TestSpark.Sf)
    Dml.createMergePrunedTarget(spark, TestSpark.Sf)
    val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
    val y = Dml.MergeYears.head
    val batch = Dml.mergePrunedBatch(base, y)
    Dml.applyMergePrunedBatch(spark, batch)
    def snap() = spark.table(Dml.PrunedTarget).filter(col("yr") === y)
      .select("o_orderkey", "cents").orderBy("o_orderkey").collect().toSeq
    val once = snap()
    // the claim stream_merge_pruned's exactly-once rests on: a replayed
    // micro-batch converges to the same partition content (values do
    // not derive from the target; keys anti-join back out first)
    Dml.applyMergePrunedBatch(spark, batch)
    assert(snap() == once, "replayed batch changed the partition")
  }

  test("streamed join-view maintenance: untouched partitions stay " +
    "byte-identical, the final view equals the one-shot batch rules, " +
    "and a replayed delta batch is idempotent") {
    Tables.registerAll(spark, TestSpark.Sf)
    // drive the full stream (3 micro-batches over the key-sliced delta)
    val streamed = graft.streaming.EventsStream
      .runMvJoinStream(spark, TestSpark.Sf)
      .orderBy(col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // the batch-maintained view (delta rules in one shot) is the truth
    val oneShot = Dml.dmlMvJoinDelta.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(streamed.nonEmpty && streamed == oneShot,
      "streamed view maintenance diverged from the one-shot delta rules")
    // partition discipline on the streamed target: only the delta's
    // year was ever rewritten (rebuild + snapshot + replay one batch)
    Dml.createMvJoinStreamTarget(spark, TestSpark.Sf)
    val before = Dml.partitionInventory(spark, Dml.MvJoinStreamTarget)
    val delta = Dml.mvJoinBatch(Dml.mvJoinBase(spark, TestSpark.Sf))
      .withColumn("yr", lit(Dml.MvJoinYear))
    Dml.applyMvJoinStreamBatch(spark, TestSpark.Sf, delta)
    val after = Dml.partitionInventory(spark, Dml.MvJoinStreamTarget)
    val touched = s"yr=${Dml.MvJoinYear}"
    assert(after(touched) != before(touched),
      "touched view partition was not rewritten")
    (before.keySet - touched).foreach { p =>
      assert(after(p) == before(p),
        s"untouched view partition $p changed")
    }
    // idempotence: the same delta applied again converges
    def snap() = spark.table(Dml.MvJoinStreamTarget)
      .filter(col("yr") === Dml.MvJoinYear)
      .select("o_orderkey", "cents").orderBy("o_orderkey").collect().toSeq
    val once = snap()
    Dml.applyMvJoinStreamBatch(spark, TestSpark.Sf, delta)
    assert(snap() == once, "replayed view delta changed the partition")
  }
}
