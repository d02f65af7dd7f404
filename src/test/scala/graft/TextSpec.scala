package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("token counts: whitespace vs BPE-ish") {
    val r = one("hello world, this is 42!")
      .select(Text.tokenCount(col("text")), Text.bpeTokenCount(col("text")))
      .collect()(0)
    assert(r.getLong(0) == 5)          // whitespace tokens
    assert(r.getLong(1) == 7)          // hello world , this is 42 ! → 5 words + 2 punct
  }

  test("shingles: n=3 over a 5-token doc gives 3 distinct trigrams") {
    val r = one("a b c d e")
      .select(Text.shingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(r == Seq("a b c", "b c d", "c d e"))
  }

  test("shingles: doc shorter than n yields empty array, not an error") {
    val r = one("a b").select(Text.shingles(col("text"), 3))
      .collect()(0).getSeq[String](0)
    assert(r.isEmpty)
  }

  test("shingles honor the split-on-space tokenization contract (empty tokens)") {
    // reference: split(' ', -1) keeping empty tokens — the contract the
    // Dedup kernels and the DuckDB oracles (string_split) also follow
    def ref(text: String, n: Int): Seq[String] = {
      val toks = text.split(" ", -1).toSeq
      (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).distinct
    }
    val cases = Seq(
      "a b c d", "a  b c", "a b ", " a b", "", "ab", "a b",
      "x  ", "a\tb c d", "a   b", "  ", "one two  three four ")
    for (t <- cases) {
      val got = one(t).select(Text.shingles(col("text"), 3))
        .collect()(0).getSeq[String](0)
      assert(got == ref(t, 3), s"input ${t.map(c => if (c == ' ') '·' else c)}")
    }
  }

  test("rolling fingerprint: deterministic, order-sensitive, bounded") {
    val fp = (s: String) => Text.rollingFingerprint(s.split(" ", -1))
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a"))
    assert(fp("a b c") >= 0 && fp("a b c") < (1L << 40))
    // hand-computed one-token case: fnv64 low 32 bits mod 2^40
    assert(fp("a") == (Text.fnv64("a") & 0xFFFFFFFFL) % (1L << 40))
  }

  test("langId picks the language with most stopword hits; und when none") {
    assert(one("the cat sat on the mat and it was good")
      .select(Text.langId(col("text"))).collect()(0).getString(0) == "en")
    assert(one("der hund ist nicht mit der katze und der maus")
      .select(Text.langId(col("text"))).collect()(0).getString(0) == "de")
    assert(one("xyzzy plugh qwerty")
      .select(Text.langId(col("text"))).collect()(0).getString(0) == "und")
  }

  test("winnowing guarantee: docs sharing a k+w-1 token run share a fp") {
    import graft.operators.TextAnalysis
    val run = (1 to TextAnalysis.WinnowK + TextAnalysis.WinnowW - 1)
      .map(i => s"r$i").mkString(" ") // exactly the guarantee length
    val d = Seq(
      (1L, s"alpha beta gamma $run"),
      (2L, s"$run delta epsilon zeta eta"),
      (3L, "nothing in common with the others at all here"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](3).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "shared guarantee-length run left no common fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)
    // density: the expected selected fraction is ~2/(w+1) of grams
    val big = TextAnalysis.winnowFingerprints(
      Seq((9L, (1 to 500).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"))
      .collect()(0)
    assert(big.getLong(2) < big.getLong(1),
      "winnowing selected every gram — no compression")
  }

  test("entropy and LM scores respect their information-theoretic bounds") {
    import graft.operators.TextAnalysis
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    // 0 <= H <= log2(n_tokens), with H = log2(n) iff all tokens distinct
    TextAnalysis.textEntropy.run(spark, TestSpark.Sf).collect().foreach { r =>
      val (n, types, h, ttr) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      // the entry rounds H to 6 decimals, so an all-distinct doc can sit
      // half a rounding step above the exact log2(n) bound
      assert(h >= -1e-9 && h <= math.log(n.toDouble) / math.log(2.0) + 5e-7,
        s"doc ${r.getLong(0)}: H=$h outside [0, log2($n)]")
      assert(ttr > 0 && ttr <= 1.0 && types <= n)
    }
    // unigram and bigram LM scores are average log-probs: always <= 0,
    // and the corpus-trained unigram model gives every token p >= 1/T
    val t = TextAnalysis.textLmScore.run(spark, TestSpark.Sf).collect()
    val total = t.map(_.getLong(1)).sum.toDouble
    val floor = math.log(1.0 / total) / math.log(2.0) - 1e-6
    t.foreach { r =>
      assert(r.getDouble(2) <= 1e-9 && r.getDouble(2) >= floor,
        s"doc ${r.getLong(0)}: lm_score ${r.getDouble(2)} outside [log2(1/T), 0]")
    }
    TextAnalysis.textLmBigram.run(spark, TestSpark.Sf).collect().foreach { r =>
      assert(r.getDouble(2) <= 1e-9, "bigram log-prob average above zero")
    }
  }

  test("winnow fingerprints are a subset of the doc's own gram hashes") {
    import graft.operators.TextAnalysis
    val d = Seq((1L, (1 to 60).map(i => s"w${i % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val row = TextAnalysis.winnowFingerprints(d).collect()(0)
    val fps = row.getSeq[Long](3).toSet
    // recompute every gram hash the way the kernel does
    val toks = d.collect()(0).getString(1).split(" ", -1)
    val all = (0 to toks.length - TextAnalysis.WinnowK).map { i =>
      graft.functions.Text.fnv64(
        s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}") & Long.MaxValue
    }.toSet
    assert(fps.nonEmpty && fps.subsetOf(all),
      "winnowing selected a hash that is not one of the doc's gram hashes")
    assert(fps.size < all.size, "winnowing selected every gram")
  }

  test("quality score stays in [0, 1]") {
    val scores = Tables.df(spark, TestSpark.Sf, "documents")
      .select(Text.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(scores.nonEmpty && scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("perplexity buckets: every doc assigned, cuts honored per language") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.qualityPerplexityBuckets.run(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getString(4)))
    val nDocs = Tables.df(spark, TestSpark.Sf, "documents").count()
    assert(rows.length == nDocs, "bucketing dropped or duplicated documents")
    assert(rows.map(_._4).toSet == Set("head", "middle", "tail"))
    // within each language, every head doc outscores every tail doc
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val head = rs.filter(_._4 == "head").map(_._3)
      val tail = rs.filter(_._4 == "tail").map(_._3)
      assert(head.nonEmpty && tail.nonEmpty, s"$lang missing a bucket")
      assert(head.min > tail.max,
        s"$lang: head min ${head.min} <= tail max ${tail.max}")
      // terciles: no bucket hogs the language (cut ties can skew thirds,
      // but never past half on this fixture)
      val frac = rs.groupBy(_._4).map(_._2.length.toDouble / rs.length)
      assert(frac.forall(f => f > 0.1 && f < 0.6),
        s"$lang bucket fractions off terciles: $frac")
    }
  }

  test("BPE merge loop: ordered distinct merges with non-increasing counts") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.textBpeMergeLoop.run(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq ==
      (1L to TextAnalysis.BpeMergeRounds).toSeq)
    // the merged symbol is the concatenation of the pair, and each
    // round learns a NEW merge (the applied pair cannot win again —
    // every occurrence was consumed)
    assert(rows.forall { case (_, a, b, m, _) => m == a + b })
    assert(rows.map(m => (m._2, m._3)).distinct.length == rows.length,
      "a pair won twice — merges were not applied")
    // top-pair counts never increase round over round: the winner is
    // removed, runners-up are <= the old max, and any NEW pair's count
    // is bounded by the number of merges just performed
    val cnts = rows.sortBy(_._1).map(_._5)
    assert(cnts.zip(cnts.tail).forall { case (x, y) => y <= x },
      s"top-pair counts increased: ${cnts.toSeq}")
    assert(cnts.last > 0)
  }

  test("unigram prune loop: vocab shrinks 200 -> ceil(3n/4) per round, " +
      "scores rank-ordered, pieces bounded and seed-derived") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.textUnigramPruneLoop
      .run(spark, TestSpark.Sf).collect()
    // 3 rounds of keep-ceil(3n/4) from a 200-piece seed: 150, 113, 85
    val expected = (1 to TextAnalysis.UniRounds)
      .foldLeft(TextAnalysis.UniSeedSize.toLong)((n, _) => (3 * n + 3) / 4)
    assert(rows.length == expected, s"final vocab ${rows.length}")
    // ranks are 1..n in score-desc, piece-asc order
    val ranked = rows.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    assert(ranked.map(_._3).toSeq == (1L to expected).toSeq)
    val scores = ranked.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => b <= a },
      "scores not non-increasing in rank")
    assert(scores.forall(_ > 0))
    assert(ranked.forall(_._1.length <= TextAnalysis.UniMaxLen),
      "piece longer than the candidate cap")
    // encode stats cover every eligible doc word's occurrences:
    // n_occ >= n_words is not guaranteed (words may be uncovered),
    // but coverage never exceeds occurrences and both are nonnegative
    val enc = TextAnalysis.textUnigramEncodeStats
      .run(spark, TestSpark.Sf).collect()
    assert(enc.nonEmpty)
    assert(enc.forall(r => r.getLong(2) >= 0 && r.getLong(3) >= 0 &&
      r.getLong(3) <= r.getLong(2) * TextAnalysis.UniMaxLen))
  }

  test("classifier score: zero-shuffle plan, bounded votes, hand-checked doc") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val scored = TextAnalysis.classifierScore(docs)
    // features: unigrams a, b, a + bigrams a_b, b_a → n_feats = 5
    val r = scored.collect()(0)
    assert(r.getLong(1) == 5L)
    val exp = Seq("a", "b", "a", "a_b", "b_a").map { f =>
      TextAnalysis.classifierWeight(
        ((Text.fnv64(f) & 0xFFFFFFFFL) % TextAnalysis.ClassifierBuckets).toInt)
    }.sum
    assert(r.getLong(2) == exp)
    assert(r.getString(3) == (if (exp >= 0) "keep" else "drop"))
    // every vote is in [-1000, 1000], so |dot| <= 1000 * n_feats
    val full = TextAnalysis.classifierScore(
      Tables.df(spark, TestSpark.Sf, "documents")).collect()
    assert(full.forall(x => math.abs(x.getLong(2)) <= 1000L * x.getLong(1)))
    // the filter stage fuses into the scan: no Exchange anywhere
    val plan = TextAnalysis.classifierScore(
      Tables.df(spark, TestSpark.Sf, "documents"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("RAKE keyphrases: stopword-free, capped length, positive " +
    "descending scores, multi-word collocations surface") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.textRakeKeyphrases.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val stops = graft.functions.Text.stopwords("en").toSet
    rows.foreach { case (phrase, nWords, nOcc, score) =>
      val ws = phrase.split(" ").toSeq
      assert(ws.size == nWords && nWords <= TextAnalysis.RakeMaxLen)
      assert(ws.forall(t => !stops.contains(t) && t.nonEmpty),
        s"stopword inside candidate phrase '$phrase'")
      assert(nOcc >= 1 && score > 0)
    }
    // ranked: scores non-increasing down the list
    val ss = rows.map(_._4)
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    // RAKE's whole point: degree rewards collocations, so the top of
    // the ranking is dominated by multi-word phrases
    assert(rows.take(20).count(_._2 >= 2) >= 15,
      "top RAKE phrases unexpectedly unigram-dominated")
  }

  test("on-engine classifier training: mistakes strictly decrease and " +
    "the held-out AUC clears the floor") {
    import graft.operators.TextAnalysis
    val trace = TextAnalysis.classifierTrain(spark, TestSpark.Sf)
      .orderBy(col("round")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(trace.length == TextAnalysis.TrainRounds)
    val mist = trace.map(_._2)
    assert(mist.zip(mist.tail).forall { case (a, b) => b < a },
      s"training mistakes did not strictly decrease: ${mist.toSeq}")
    // held-out AUC via the Mann-Whitney machinery (classifier_eval_auc
    // discipline): rank the held-out scores, average ranks over ties
    val scored = TextAnalysis.trainedHeldOutScores(spark, TestSpark.Sf)
      .withColumn("pos", (col("y") === 1L).cast("long"))
    val byZ = org.apache.spark.sql.expressions.Window.orderBy(col("z"))
    val tie = org.apache.spark.sql.expressions.Window.partitionBy(col("z"))
    val r = scored
      .withColumn("min_rank", rank().over(byZ).cast("long"))
      .withColumn("tie_cnt", count(lit(1)).over(tie))
      .withColumn("avg_rank2",
        lit(2L) * col("min_rank") + col("tie_cnt") - lit(1L))
      .agg(sum(col("pos")).as("np"),
        sum(lit(1L) - col("pos")).as("nn"),
        sum(when(col("pos") === 1L, col("avg_rank2")).otherwise(0L))
          .as("r2p"))
      .first()
    val (np, nn, r2p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(np > 0 && nn > 0, "degenerate held-out split")
    val auc = (r2p - np * (np + 1)).toDouble / (2.0 * np * nn)
    assert(auc >= 0.65, s"held-out AUC $auc below the 0.65 floor")
  }
}
