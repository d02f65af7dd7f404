package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup groups identical texts under one fingerprint") {
    val d = docs(
      1L -> "the quick brown fox", 2L -> "the quick brown fox",
      3L -> "THE QUICK BROWN FOX", 4L -> "something else entirely")
    val out = Dedup.dedupExact.run.apply(spark, TestSpark.Sf) // smoke on fixtures
    assert(out.columns.toSeq == Seq("keep_id", "dup_count", "fp"))
    // lowercased grouping on the tiny frame
    val grouped = d.groupBy(graft.functions.Text.md5Fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(grouped == Set((1L, 3L), (4L, 1L)))
  }

  test("minhash-LSH pair set equals exhaustive jaccard pair set (sf0.001)") {
    val d = Tables.df(spark, TestSpark.Sf, "documents")
    val exact = Dedup.jaccardPairs(d, Dedup.JaccardThreshold)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(d, Dedup.JaccardThreshold)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash flags near-identical token multisets, not disjoint ones") {
    // SimHash at hamming<=3/64 detects near-EXACT duplicates: order
    // changes hash to the same fingerprint; a 1-token edit in a long doc
    // moves few bits; disjoint vocab moves ~half the bits.
    val rnd = new scala.util.Random(7)
    val toks = (1 to 400).map(i => s"tok$i")
    val base = toks.mkString(" ")
    val nearDup = (rnd.shuffle(toks.dropRight(1)) :+ "tokEDIT").mkString(" ")
    val other = (1 to 400).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.simhashPairs(d, Dedup.SimhashMaxDist)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("jaccard is exact: hand-computed value") {
    // shingles(3): d1 {a b c, b c d}, d2 {a b c, b c x} → common 1, union 3
    val d = docs(1L -> "a b c d", 2L -> "a b c x")
    val rows = Dedup.jaccardPairs(d, 0.0).collect()
    assert(rows.length == 1)
    val Row(d1: Long, d2: Long, j: Double) = rows(0)
    assert((d1, d2) == (1L, 2L) && math.abs(j - 1.0 / 3.0) < 1e-15)
  }
}
