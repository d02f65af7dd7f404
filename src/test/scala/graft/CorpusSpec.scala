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

  test("shard shuffle: complete, balanced-ish, and rerun-deterministic") {
    import org.apache.spark.sql.functions._
    val out = Corpus.corpusShardShuffle.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.df(spark, TestSpark.Sf, "documents").count()
    // every doc appears exactly once
    assert(out.length == nDocs && out.map(_._1).distinct.length == nDocs)
    // shards are within range and positions are contiguous 1..|shard|
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.forall(s => s >= 0 && s < Corpus.NShards))
    byShard.foreach { case (s, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head == 1L && ps.last == ps.length,
        s"shard $s positions not contiguous: ${ps.take(5).toSeq}...")
    }
    // a rerun reproduces the identical assignment (the auditability
    // property the entry exists for — no rand() anywhere)
    val again = Corpus.corpusShardShuffle.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("hot-token pruning removes exactly the >threshold-df tokens, " +
    "preserving order") {
    import org.apache.spark.sql.functions._
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    val n = docs.count()
    // recompute the hot set independently (distinct doc-term pairs)
    val hot = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .distinct().groupBy("term").count()
      .filter(col("count") * Corpus.HotDen > lit(Corpus.HotNum) * n)
      .collect().map(_.getString(0)).toSet
    assert(hot.nonEmpty, "fixture should have at least one hot token")
    val orig = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Corpus.pruneHotTokens(docs).collect().foreach { r =>
      val (id, nOrig, nKept, pruned) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val toks = orig(id).split(" ", -1)
      val expect = toks.filterNot(hot)
      assert(nOrig == toks.length)
      assert(nKept == expect.length)
      // order-preserving: the pruned text IS the original minus hot tokens
      assert(pruned == expect.mkString(" "), s"doc $id order not preserved")
    }
  }

  test("hot-token pruning join is broadcast, not a corpus-sized shuffle") {
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    val plan = Corpus.pruneHotTokens(docs).queryExecution.executedPlan.toString
    // the vocabulary-bounded hot list must attach via broadcast left_anti
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join in:\n$plan")
  }

  test("waterfill: budget respected, small sources whole, one level") {
    import org.apache.spark.sql.functions._
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    val rows = Corpus.waterfillQuota(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val total = rows.map(_._2).sum
    val budget = Corpus.WaterfillNum * total / Corpus.WaterfillDen
    val alloc = rows.map(_._3).sum
    // never over budget, and the floor loses at most one token per source
    assert(alloc <= budget, s"alloc $alloc > budget $budget")
    assert(budget - alloc <= rows.length + rows.map(_._2).max,
      s"budget under-used: $alloc of $budget")
    // uncapped sources keep everything; capped sources share one level
    rows.foreach { case (src, nt, al, capped) =>
      if (!capped) assert(al == nt, s"$src uncapped but trimmed")
      else assert(al < nt, s"$src capped but kept all")
    }
    val levels = rows.filter(_._4).map(_._3).distinct
    assert(levels.length <= 1, s"capped sources at levels $levels")
    // a 60% budget on this fixture must actually cap someone
    assert(rows.exists(_._4), "no source capped — budget not binding")
  }

  test("KL drift: non-negative for every source, zero only for a clone") {
    val rows = Corpus.klDrift(Tables.df(spark, TestSpark.Sf, "documents"))
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(rows.length == 20)
    rows.foreach { case (src, kl) =>
      assert(kl >= 0.0, s"$src KL $kl negative — support mismatch")
    }
    assert(rows.exists(_._2 > 0.0), "all sources identical to corpus")
  }

  test("DSIR weights: target excluded, selection quartile, target affinity") {
    import org.apache.spark.sql.functions._
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    val out = Corpus.dsirWeights(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val targetIds = docs.filter(col("source") === Corpus.BaseSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the target domain scores nothing of itself; everything else scored
    assert(out.forall(r => !targetIds.contains(r._1)))
    val nRaw = docs.filter(col("source") =!= Corpus.BaseSource).count()
    assert(out.length == nRaw)
    // selected = top quartile by construction (percentile_disc(0.75)
    // threshold): between 25% and 35% of docs once ties are counted
    val frac = out.count(_._4).toDouble / out.length
    assert(frac >= 0.24 && frac <= 0.40, s"selected fraction $frac")
    // NOTE: the model joins are broadcast by construction
    // (broadcast(target)/broadcast(raw) hints), but the final frame's
    // executed plan can no longer show them — the Checkpoints boundary
    // that keeps the corpus single-pass also truncates lineage, so a
    // plan-string assertion here would only ever see the LogicalRDD.
  }

  test("leakage-safe split: a near-dup cluster never straddles splits, " +
    "and singletons degrade to the per-doc split exactly") {
    import org.apache.spark.sql.functions._
    val out = Corpus.sampleLeakageSafeSplit.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out.nonEmpty)
    // the leakage guarantee: one split per cluster
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    assert(perCluster.forall(_._2.size == 1),
      "a near-dup cluster straddles two splits — eval contamination")
    // the fixture has real multi-doc clusters, so the guarantee is
    // exercised, not vacuous
    assert(out.groupBy(_._2).exists(_._2.length > 1),
      "no multi-doc cluster in the fixture — the test proves nothing")
    // degradation: a singleton's cluster_id IS its doc_id, so its
    // assignment equals sample_split_assign's
    val plain = Corpus.sampleSplit.run(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    out.filter { case (d, c, _) => d == c }.foreach { case (d, _, sp) =>
      assert(plain(d) == sp, s"singleton $d diverged from the plain split")
    }
  }
}
