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

  test("jaccard recovers pairs whose common shingles are ALL hot (df > cap)") {
    // A boilerplate cluster larger than the df cap: every shingle those
    // docs share is hot, so the rare-shingle index yields NO candidate
    // row for any intra-cluster pair — the hot-only recovery path must
    // find them. 6 identical docs with maxDf = 4 → every shingle df 6 > 4;
    // plus distinct background docs that must NOT pair.
    val boiler = "terms of service apply to all users of this site"
    val cluster = (1L to 6L).map(_ -> boiler)
    val others = Seq(
      7L -> "completely different words in this one here now",
      8L -> "yet another unrelated document body for the test")
    val d = docs(cluster ++ others: _*)
    val got = Dedup.jaccardPairs(d, 0.9, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = (for { i <- 1L to 6L; j <- (i + 1) to 6L } yield (i, j, 1.0)).toSet
    assert(got == want)
  }

  test("jaccard: mixed rare/hot pair still found with a tiny df cap") {
    // Two near-dup docs sharing both a hot shingle family and rare ones;
    // cap of 1 makes every shared-by-2 shingle hot, so candidacy must
    // come from the recovery path; the reported value is exact.
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta zeta",
      3L -> "unrelated content entirely here today")
    val got = Dedup.jaccardPairs(d, 0.4, maxDf = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // shingles: d1 {abg, bgd, gde}, d2 {abg, bgd, gdz} → 2/4 = 0.5
    assert(got == Set((1L, 2L, 0.5)))
  }

  test("containment surfaces a quote that Jaccard misses") {
    // doc 2 = doc 1 plus a long unrelated tail: every shingle of doc 1
    // occurs in doc 2 (containment 1.0) but Jaccard = 3/17 ≈ 0.18.
    val quote = "alpha beta gamma delta epsilon"
    val tail = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13 z14"
    val d = docs(1L -> quote, 2L -> s"$quote $tail",
      3L -> "totally different content in this third document here")
    val cont = Dedup.containmentPairs(d, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)), cont.mkString(","))
    val jac = Dedup.jaccardPairs(d, 0.8)
      .collect()
    assert(jac.isEmpty, "jaccard should NOT pair a short quote with a long host")
  }

  test("containment hot-only recovery finds boilerplate-contained docs") {
    // With maxDf = 1 every shared shingle is hot, so the rare-index
    // stage sees nothing and only the recovery pass can find the pair.
    val d = docs(
      1L -> "a b c d e",
      2L -> "a b c d e x y z w v u t s r q p",
      3L -> "a b c d e j k l m n o i h g f",
      4L -> "unrelated words that share nothing with others at all")
    val got = Dedup.containmentPairs(d, 0.9, maxDf = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L)), got.mkString(","))
  }

  test("dupClusters frees superseded frontiers (bounded block-manager storage)") {
    val sc = spark.sparkContext
    // a 5-doc duplicate chain forces multiple propagation rounds
    val d = docs(
      1L -> "a b c d e f g h", 2L -> "a b c d e f g h",
      3L -> "a b c d e f g h", 4L -> "a b c d e f g h",
      5L -> "a b c d e f g h",
      6L -> "totally different text lives here in this doc")
    val before = sc.getPersistentRDDs.size
    val out = Dedup.dupClusters(d, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 6L))
    val after = sc.getPersistentRDDs.size
    // only the FINAL frontier may remain persisted (the result is backed
    // by it); every superseded round's checkpoint and the edge set must
    // be gone regardless of how many rounds ran
    assert(after <= before + 1,
      s"checkpoint leak: $before persistent RDDs before, $after after")
  }

  test("spark.graft.checkpoint.dir swaps in reliable checkpoints") {
    // Same pipeline, but with the reliable-checkpoint knob set: every
    // materialization must go to FILES under the configured directory
    // (survives executor loss), not executor-local blocks — and results
    // must be unchanged.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(graft.plans.Checkpoints.DirKey, dir)
    try {
      val d = docs(
        1L -> "a b c d e f g h", 2L -> "a b c d e f g h",
        3L -> "completely unrelated content in this one")
      val out = Dedup.dupClusters(d, 0.9).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set(1L -> 1L, 2L -> 1L, 3L -> 3L))
      def rddDirs(f: java.io.File): Array[java.io.File] =
        f.listFiles().flatMap(c =>
          if (c.getName.startsWith("rdd-")) Array(c) else rddDirs(c))
      val remaining = rddDirs(new java.io.File(dir))
      assert(remaining.nonEmpty,
        "no reliable checkpoint files written under the configured dir")
      // free() must DELETE superseded frames' checkpoint files (unpersist
      // alone leaves them; a long session would fill the store) — only
      // the live result frame may keep its directory
      assert(remaining.length <= 2,
        s"superseded checkpoint dirs not reclaimed: ${remaining.length} remain")
      // setCheckpointDir mints a <uuid> subdir per call; materialize()
      // must reuse one for the whole session (re-asserting per call
      // would strew husks), and free() removes a parent it emptied —
      // so at most ONE uuid dir exists here, and it is non-empty
      val uuidDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      assert(uuidDirs.length == 1,
        s"expected exactly one live uuid checkpoint dir, got ${uuidDirs.length}")
      assert(uuidDirs.head.listFiles().nonEmpty,
        "an emptied uuid parent survived free()")
    } finally spark.conf.unset(graft.plans.Checkpoints.DirKey)
  }

  test("substring spans: shared 20-token window found, window count exact") {
    val w = Dedup.SpanTokens
    val shared = (1 to w + 2).map(i => s"s$i").mkString(" ") // w+2 tokens
    val d = docs(
      1L -> s"intro one two $shared",
      2L -> s"$shared outro alpha beta gamma",
      // doc 3 is long enough but shares no window
      3L -> (1 to w + 5).map(i => s"z$i").mkString(" "),
      // doc 4 shares tokens with 1/2 but is SHORTER than the window
      4L -> (1 to w - 1).map(i => s"s$i").mkString(" "))
    val got = Dedup.substringSpanPairs(d, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1 and 2 share exactly the 3 windows inside the w+2 run
    assert(got.toSeq == Seq((1L, 2L, 3L)))
  }

  test("incremental minhash = full LSH pair set restricted to cross-batch") {
    val d = Tables.df(spark, TestSpark.Sf, "documents")
    val batch = Dedup.IncrementalBatchSource
    val srcOf = d.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // full corpus LSH pairs, kept only where exactly one side is the
    // batch source, normalized to (base, batch) order
    val crossFull = Dedup.minhashLshPairs(d, Dedup.MinhashLshThreshold)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) =>
        (srcOf(a) == batch) != (srcOf(b) == batch)
      }
      .map { case (a, b) => if (srcOf(b) == batch) (a, b) else (b, a) }
      .toSet
    val inc = Dedup.incrementalMinhashPairs(d, batch,
      Dedup.MinhashLshThreshold)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == crossFull,
      s"incremental ${inc.size} pairs vs cross-filtered full ${crossFull.size}")
  }

  test("MaxSpanDf cap never binds on the fixtures (span + winnow oracles stay exact)") {
    // substringSpanPairs/winnowPairs drop keys with df > MaxSpanDf, but
    // their DuckDB oracles are uncapped — the compare is exact only
    // while no fixture key crosses the cap. If a fixture change ever
    // makes the cap bind, fail HERE with a readable message instead of
    // as an opaque oracle hash mismatch.
    val d = Tables.df(spark, TestSpark.Sf, "documents")
    val spanOver = Dedup.spanKeys(d, Dedup.SpanTokens)
      .select("doc_id", "sp")
      .distinct() // df = distinct docs per key, the quantity the cap gates
      .groupBy("sp").count()
      .filter(col("count") > Dedup.MaxSpanDf).count()
    assert(spanOver == 0,
      s"$spanOver span keys exceed MaxSpanDf=${Dedup.MaxSpanDf} — " +
        "capped engine vs uncapped oracle would silently diverge")
    val fpOver = graft.operators.TextAnalysis.winnowFingerprints(d)
      .select(explode(col("fps")).as("fp"), col("doc_id"))
      .distinct()
      .groupBy("fp").count()
      .filter(col("count") > Dedup.MaxSpanDf).count()
    assert(fpOver == 0,
      s"$fpOver winnow fingerprints exceed MaxSpanDf=${Dedup.MaxSpanDf}")
  }

  test("cluster propagation converges on a 200-hop chain (diameter >> cap)") {
    // A path graph 0-1-2-...-200: diameter 200, far past the 64-round
    // cap. One-hop min-label propagation needs `diameter` rounds and
    // would abort; pointer doubling must converge in O(log n) rounds
    // with every vertex labeled by the chain minimum.
    val n = 200
    val vertices = (0L to n).toDF("doc_id")
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("d1", "d2")
    val out = Dedup.propagateClusters(vertices, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == n + 1)
    assert(out.forall(_._2 == 0L),
      s"non-min labels: ${out.filter(_._2 != 0L).take(5).mkString(",")}")
  }

  test("maximal spans: reported runs are real, equal, and maximal") {
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    val toks = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val runs = Dedup.maximalSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(runs.nonEmpty, "fixture should contain extended duplicate runs")
    runs.foreach { case (d1, d2, s1, s2, len) =>
      val (t1, t2) = (toks(d1), toks(d2))
      val a = t1.slice(s1.toInt, (s1 + len).toInt)
      val b = t2.slice(s2.toInt, (s2 + len).toInt)
      assert(len > Dedup.SpanTokens)
      assert(a.sameElements(b), s"run ($d1,$d2,$s1,$s2,$len) tokens differ")
      // maximal: the run cannot extend by one token on either side
      val leftExtends = s1 > 0 && s2 > 0 &&
        t1(s1.toInt - 1) == t2(s2.toInt - 1)
      val rightExtends = s1 + len < t1.length && s2 + len < t2.length &&
        t1((s1 + len).toInt) == t2((s2 + len).toInt)
      assert(!leftExtends && !rightExtends,
        s"run ($d1,$d2,$s1,$s2,$len) is not maximal")
    }
  }

  test("span excision conserves tokens and removes the reported runs") {
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length).toMap
    val rows = Dedup.exciseSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, kept, removed, text) =>
      assert(kept + removed == orig(id),
        s"doc $id: $kept kept + $removed removed != ${orig(id)}")
      val n = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(n == kept, s"doc $id: new_text has $n tokens, reported $kept")
      assert(removed > Dedup.SpanTokens,
        s"doc $id removed $removed <= span width")
    }
    // only victim docs (the d2 side of some run) get rewritten
    val victims = Dedup.maximalSpans(docs).select("d2").collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == victims)
  }

  test("keep-canonical report conserves documents and matches clusters") {
    val rows = Dedup.dedupKeepCanonical.run(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    assert(rows.map(_._2).sum == docs.count())
    assert(rows.forall(r => r._2 == r._3 + r._4))
    // kept total == number of distinct clusters
    val nClusters = Dedup.sharedDupClusters(spark, TestSpark.Sf)
      .select("cluster_id").distinct().count()
    assert(rows.map(_._3).sum == nClusters)
  }
}
