package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator parity inside the corpus-prep family. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.operators.Corpus

  test("bloom decontamination agrees with the broadcast-set entry") {
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    // exact entry reports only contaminated docs (n > 0)
    val exact = Corpus.decontaminate(docs, Corpus.BenchmarkSource).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloomRows = Corpus.decontaminateBloom(docs, Corpus.BenchmarkSource)
      .collect()
    // every row upholds the no-false-negative invariant...
    assert(bloomRows.forall(_.getBoolean(3)))
    // ...and the exact counts match the set-join entry row for row
    val bloom = bloomRows.filter(_.getLong(2) > 0)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bloom == exact,
      s"bloom ${bloom.size} contaminated docs vs exact ${exact.size}")
    // the bloom entry also covers every CLEAN non-benchmark doc
    val nonBench = docs.filter(
      org.apache.spark.sql.functions.col("source")
        =!= Corpus.BenchmarkSource).count()
    assert(bloomRows.length == nonBench)
  }
}
