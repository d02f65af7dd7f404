package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LexIndex, TextAnalysis}

/** Stored inverted-index lifecycle: persist / serve / incremental
  * segment append. The oracle hash-verifies each entry's VALUES; these
  * specs pin the lifecycle CONTRACTS the values don't show — serving
  * is bit-equal to batch scoring, the serve plan PRUNES the postings
  * scan to the query terms' buckets, serving never rewrites the stored
  * files, and a delta append leaves the base segment byte-identical
  * (the Lucene append-a-segment discipline). */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("doc_id"), col("n_terms"), col("bm25"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq

  /** Recursive (path, length, mtime, md5) inventory of a stored
    * segment — the frozen-artifact witness (GraphIndexSpec's content
    * hash over the bucket-directory tree). */
  private def inventory(root: String): Seq[(String, Long, Long, String)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(root))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map { f =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
        (f.getPath, f.length(), f.lastModified(), md5)
      }
      .sortBy(_._1)
  }

  test("index serve is bit-equal to batch BM25 re-ranked, and never " +
    "rewrites the stored segment") {
    val root = LexIndex.fullIndexRoot(spark, TestSpark.Sf)
    val before = inventory(s"$root/full")
    assert(before.nonEmpty, "stored index missing")
    val served = rows(LexIndex.textIndexServeQ.run(spark, TestSpark.Sf))
    assert(inventory(s"$root/full") == before,
      "serve rewrote the stored index files")
    val batch = rows(TextAnalysis.bm25Frame(spark, TestSpark.Sf)
      .orderBy(col("bm25").desc, col("doc_id")).limit(LexIndex.ServeTopN))
    assert(served.nonEmpty && served == batch,
      "stored-index serving diverged from batch BM25")
  }

  test("serve plan prunes the postings scan to the query terms' buckets") {
    val root = LexIndex.fullIndexRoot(spark, TestSpark.Sf)
    val df = LexIndex.serveBm25(spark, root, Seq("full"))
    // sparkPlan (pre-AQE) exposes the file scans as collectable leaves
    val plan = df.queryExecution.sparkPlan
    assert(plan.toString.contains("PartitionFilters"),
      s"no bucket pruning in the serve plan:\n$plan")
    val scanned = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("postings")) =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ <= LexIndex.QTerms),
      s"postings scan read $scanned bucket dirs (> ${LexIndex.QTerms})")
  }

  test("delta append leaves the base segment byte-identical, and " +
    "merged serve equals the full rebuild") {
    val root = LexIndex.incrIndexRoot(spark, TestSpark.Sf)
    val baseBefore = inventory(s"$root/base")
    assert(baseBefore.nonEmpty && inventory(s"$root/delta").nonEmpty)
    val merged = rows(LexIndex.textIndexIncrementalQ.run(spark, TestSpark.Sf))
    assert(inventory(s"$root/base") == baseBefore,
      "serve or delta append rewrote the base segment")
    // exact segment merge: summed integer stats make base ∪ delta
    // bit-equal to the single-segment full index
    val full = rows(LexIndex.textIndexServeQ.run(spark, TestSpark.Sf))
    assert(merged == full, "segment-merged serve diverged from full rebuild")
  }

  test("positional delta append: base positions/bigrams byte-identical, " +
    "merged phrase serve equals the full-segment serve") {
    val root = LexIndex.posIncrRoot(spark, TestSpark.Sf)
    val baseBefore = inventory(s"$root/base")
    assert(baseBefore.nonEmpty && inventory(s"$root/delta").nonEmpty,
      "positional segments missing")
    val merged = LexIndex.textIndexPhraseIncrQ.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inventory(s"$root/base") == baseBefore,
      "phrase serve or delta append rewrote the base positional segment")
    // exact positional merge: summed adjacency counts make base ∪
    // delta bit-equal to the single-segment phrase serve
    val full = LexIndex.textIndexPhraseQ.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged.nonEmpty && merged == full,
      "merged phrase serve diverged from the full segment")
    // the segments really split the corpus: delta holds exactly the
    // batch slice's occurrences
    val deltaDocs = spark.read.parquet(s"$root/delta/positions")
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0))
    assert(deltaDocs.nonEmpty &&
      deltaDocs.forall(_ % 10 == LexIndex.BatchMod),
      "a non-batch doc leaked into the delta positional segment")
  }

  test("positional delete + compaction: tombstoned docs unserved with " +
    "the artifact untouched; merged positional serve bit-equal to " +
    "two-segment, sources frozen") {
    // delete: tombstones filter the scorer's input, never the files
    val froot = LexIndex.fullIndexRoot(spark, TestSpark.Sf)
    val before = inventory(s"$froot/full")
    val del = LexIndex.textIndexPhraseDeleteQ.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inventory(s"$froot/full") == before,
      "positional delete rewrote the stored index")
    assert(del.nonEmpty)
    assert(!del.exists(_._1 % 7 == LexIndex.DeleteMod),
      "tombstoned doc served from the positional index")
    // surviving docs' phrase counts identical to the undeleted serve
    val undeleted = LexIndex.textIndexPhraseQ.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 7 != LexIndex.DeleteMod).toMap
    del.foreach { case (d, n) =>
      undeleted.get(d).foreach(u => assert(u == n,
        s"doc $d phrase count changed under tombstones: $n vs $u"))
    }
    // compaction: one merged segment, sources byte-identical, bit-equal
    val iroot = LexIndex.posIncrRoot(spark, TestSpark.Sf)
    val srcBefore = inventory(s"$iroot/base") ++ inventory(s"$iroot/delta")
    val merged = LexIndex.textIndexPhraseCompactQ.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inventory(s"$iroot/base") ++ inventory(s"$iroot/delta")
      == srcBefore, "positional compaction mutated a source segment")
    val two = LexIndex.servePhrase(spark, iroot, Seq("base", "delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged.nonEmpty && merged == two,
      "compacted positional serve diverged from two-segment serve")
    // merged bigram dictionary = summed inputs (one real segment)
    val mCnt = spark.read.parquet(s"$iroot/merged/bigrams")
      .agg(sum(col("cnt"))).collect().head.getLong(0)
    val sCnt = Seq("base", "delta").map(g =>
      spark.read.parquet(s"$iroot/$g/bigrams")
        .agg(sum(col("cnt"))).collect().head.getLong(0)).sum
    assert(mCnt == sCnt, s"merged bigram mass $mCnt != summed $sCnt")
  }

  test("segment compaction: merged serve is bit-equal to two-segment " +
    "serve, and the source segments stay byte-identical") {
    val root = LexIndex.incrIndexRoot(spark, TestSpark.Sf)
    val srcBefore = inventory(s"$root/base") ++ inventory(s"$root/delta")
    val merged = rows(LexIndex.textIndexCompactQ.run(spark, TestSpark.Sf))
    assert(inventory(s"$root/base") ++ inventory(s"$root/delta") == srcBefore,
      "compaction mutated a source segment")
    val two = rows(LexIndex.serveBm25(spark, root, Seq("base", "delta")))
    assert(merged.nonEmpty && merged == two,
      "compacted serve diverged from two-segment serve")
    // the merged segment is one real segment: its stats row equals the
    // summed inputs
    val st = spark.read.parquet(s"$root/merged/stats").collect().head
    val base = spark.read.parquet(s"$root/base/stats").collect().head
    val delta = spark.read.parquet(s"$root/delta/stats").collect().head
    assert(st.getLong(0) == base.getLong(0) + delta.getLong(0) &&
      st.getLong(1) == base.getLong(1) + delta.getLong(1))
  }

  test("tombstone delete: no deleted doc served, artifact untouched, " +
    "stats still count deletions (Lucene docFreq semantics)") {
    val root = LexIndex.fullIndexRoot(spark, TestSpark.Sf)
    val before = inventory(s"$root/full")
    val served = rows(LexIndex.textIndexDeleteQ.run(spark, TestSpark.Sf))
    assert(inventory(s"$root/full") == before,
      "delete rewrote the stored index files")
    assert(served.nonEmpty)
    assert(!served.exists(_._1 % 7 == LexIndex.DeleteMod),
      "tombstoned doc served")
    // scores of surviving docs are IDENTICAL to the undeleted serve
    // (stats unchanged is the semantics, not an accident)
    val undeleted = rows(LexIndex.textIndexServeQ.run(spark, TestSpark.Sf))
      .filter(_._1 % 7 != LexIndex.DeleteMod).map(t => (t._1, t._3)).toMap
    served.foreach { case (d, _, s) =>
      undeleted.get(d).foreach(u => assert(u == s,
        s"doc $d rescored under tombstones: $s vs $u"))
    }
  }

  test("phrase query: position-join counts equal a direct adjacency " +
    "recount, scan pruned to the two terms' buckets") {
    val root = LexIndex.fullIndexRoot(spark, TestSpark.Sf)
    val before = inventory(s"$root/full")
    val df = LexIndex.servePhrase(spark, root, Seq("full"))
    val served = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inventory(s"$root/full") == before,
      "phrase serve rewrote the stored index")
    assert(served.nonEmpty, "hottest bigram has no phrase hits")
    // independent recount straight off the corpus text
    val top = spark.read.parquet(s"$root/full/bigrams")
      .orderBy(col("cnt").desc, col("t1"), col("t2")).limit(1)
      .collect().head
    val (t1, t2) = (top.getString(0), top.getString(1))
    val toks = Tables.df(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ", -1)).as(Seq("p", "tok")))
    val want = toks.filter(col("tok") === t1).as("a")
      .join(toks.filter(col("tok") === t2).as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.p") === col("a.p") + 1)
      .groupBy(col("a.doc_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a.doc_id")).limit(LexIndex.PhraseTopN)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == want, "phrase counts diverged from direct recount")
    // the positions scan is bucket-pruned like the postings scan
    val scanned = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("positions")) =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ <= 2),
      s"positions scan read $scanned bucket dirs (> 2)")
  }

  test("block-max pruned top-k: bit-equal to the unpruned serve, " +
    "artifact untouched, and blocks actually skipped at sf0.01") {
    // bit-equality + frozen files at the spec fixture
    val root = LexIndex.fullIndexRoot(spark, TestSpark.Sf)
    val before = inventory(s"$root/full")
    val pruned = rows(LexIndex.textIndexTopkPrunedQ.run(spark, TestSpark.Sf))
    assert(inventory(s"$root/full") == before,
      "pruned serve rewrote the stored index files")
    val unpruned = rows(LexIndex.serveBm25(spark, root, Seq("full"),
      topN = LexIndex.PrunedTopN, mixedTerms = true))
    assert(pruned.nonEmpty && pruned == unpruned,
      "block-max pruning changed the top-k result")
    // the skip gate needs a corpus where topN ≪ docs: at sf0.01 the
    // 63-block layout must leave blocks under the threshold unread
    val sf01 = "/root/testdata/sf0.01"
    val root01 = LexIndex.fullIndexRoot(spark, sf01)
    val (_, _, survivors, cand) = LexIndex.prunedPlan(spark, root01)
    val (nSurv, nCand) = (survivors.count(), cand.count())
    assert(nCand > nSurv,
      s"no blocks skipped: $nCand candidate blocks, $nSurv survivors")
    // r16 gate fix: survivor selection must be IN-PLAN (a semi-join on
    // blk), never a driver-collected literal block list — the bound
    // table is df/8 rows per hot term, corpus-proportional at scale
    val servedPlan = LexIndex.textIndexTopkPrunedQ.run(spark, sf01)
      .queryExecution.optimizedPlan.toString
    assert(servedPlan.contains("LeftSemi"),
      "pruned serve lost the in-plan survivor semi-join:\n" + servedPlan)
    assert("""blk#\d+L? IN \(""".r.findFirstIn(servedPlan).isEmpty,
      "pruned serve regressed to a driver-materialized block list")
    val p01 = rows(LexIndex.textIndexTopkPrunedQ.run(spark, sf01))
    val u01 = rows(LexIndex.serveBm25(spark, root01, Seq("full"),
      topN = LexIndex.PrunedTopN, mixedTerms = true))
    assert(p01 == u01, "sf0.01 pruned serve diverged from unpruned")
  }

  test("multi-segment block-max: the component bound dominates the " +
    "exact per-segment bound, prunes the appended index, and stays " +
    "bit-equal to the unpruned two-segment serve") {
    // bound domination on the full segment: evaluating the impact
    // expression at (max_c, min_dl) under the segment's own stats must
    // be >= the stored exact per-posting max (monotonicity made data)
    val root = LexIndex.fullIndexRoot(spark, TestSpark.Sf)
    val st = spark.read.parquet(s"$root/full/stats")
    val dfr = spark.read.parquet(s"$root/full/df")
    // the bound column is the SERVE's own scoring expression with
    // (c, dl) rebound to (max_c, min_dl) — one shared definition, so a
    // formula change can never leave this domination check validating
    // a stale spelling (r16 advice)
    val viol = spark.read.parquet(s"$root/full/blockmax")
      .join(dfr, "tok")
      .crossJoin(org.apache.spark.sql.functions.broadcast(st))
      .select(col("tok"), col("blk"), col("max_s"),
        col("max_c").as("c"), col("min_dl").as("dl"),
        col("df"), col("n"), col("tot"))
      .withColumn("bound", graft.operators.TextAnalysis.bm25ScoreExpr)
      .filter(col("bound") < col("max_s") - 1e-12)
      .count()
    assert(viol == 0, s"$viol blocks where the component bound " +
      "fails to dominate the exact max impact")
    // the appended index: pruning bites at sf0.01 and stays exact
    val sf01 = "/root/testdata/sf0.01"
    val iroot = LexIndex.incrIndexRoot(spark, sf01)
    val (_, _, surv, cand) =
      LexIndex.prunedPlanMulti(spark, iroot, Seq("base", "delta"))
    val (nSurv, nCand) = (surv.count(), cand.count())
    assert(nCand > nSurv,
      s"append-regime pruning skipped nothing: $nCand vs $nSurv")
    val p = rows(LexIndex.textIndexTopkPrunedIncrQ.run(spark, sf01))
    val u = rows(LexIndex.serveBm25(spark, iroot, Seq("base", "delta"),
      topN = LexIndex.PrunedTopN, mixedTerms = true))
    assert(p.nonEmpty && p == u,
      "append-regime pruned serve diverged from unpruned")
  }

  test("persist inventory matches a direct corpus recount") {
    val got = LexIndex.textIndexPersistQ.run(spark, TestSpark.Sf)
      .collect().head
    val tf = Tables.df(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val exp = tf.agg(count(lit(1)), count_distinct(col("tok")),
      count_distinct(col("doc_id")), sum(col("c"))).collect().head
    assert(got.getLong(0) == exp.getLong(0) &&
      got.getLong(1) == exp.getLong(1) &&
      got.getLong(2) == exp.getLong(2) &&
      got.getLong(3) == exp.getLong(3),
      s"stored postings inventory $got != corpus recount $exp")
  }

  test("streaming segment append: replay-guarded, per-batch work " +
    "segment-sized, base frozen, drained serve equals the full rebuild") {
    import graft.operators.LexIndex
    val root = java.nio.file.Files
      .createTempDirectory("graft-streamidx").toString
    try {
      val docs = Tables.df(spark, TestSpark.Sf, "documents")
        .select(col("doc_id"), col("text"))
      LexIndex.writeSegment(
        docs.filter(col("doc_id") % 10 =!= LexIndex.BatchMod), root, "base")
      val baseBefore = inventory(s"$root/base")
      val slice = docs.filter(col("doc_id") % 10 === LexIndex.BatchMod)
      // batch 0 applies; a REPLAY of batch 0 is skipped by the guard
      assert(LexIndex.appendSegmentGuarded(spark, root, slice, 0L))
      val segAfter0 = inventory(s"$root/seg0")
      assert(!LexIndex.appendSegmentGuarded(spark, root, slice, 0L),
        "replayed batch id was not skipped")
      assert(inventory(s"$root/seg0") == segAfter0,
        "a skipped replay still rewrote the segment")
      assert(inventory(s"$root/base") == baseBefore,
        "segment append touched the base segment")
      // per-batch work is segment-sized: the appended postings count
      // the batch slice's (doc, tok) pairs, nothing corpus-sized
      val expect = slice
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("t"))
        .groupBy(col("doc_id"), col("t")).count().count()
      assert(spark.read.parquet(s"$root/seg0/postings").count() == expect,
        "appended segment is not batch-sized")
      // drained serve (base u segments) == single-segment full rebuild
      assert(LexIndex.segmentsOf(root) == Seq("base", "seg0"))
      val merged = rows(LexIndex.serveBm25(spark, root,
        LexIndex.segmentsOf(root)))
      val full = rows(LexIndex.textIndexServeQ.run(spark, TestSpark.Sf))
      assert(merged.nonEmpty && merged == full,
        "streamed segment serve diverged from the full rebuild")
      // end to end through the real streaming runtime
      val streamed = rows(graft.streaming.EventsStream
        .runIndexAppendStream(spark, TestSpark.Sf))
      assert(streamed == full,
        "streaming-runtime drained index diverged from the full rebuild")
    } finally graft.plans.Scratch.deleteTree(root)
  }
}
