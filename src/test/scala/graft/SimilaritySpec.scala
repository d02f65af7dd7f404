package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine kernel: hand-computed values and self-similarity") {
    val d = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val a = Vectors.asDouble(col("a")); val b = Vectors.asDouble(col("b"))
    val pairs = d.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(d.select(col("vec_id").as("j"), col("embedding").as("b")))
      .select(col("i"), col("j"), Vectors.cosine(a, b).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(pairs((1L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(pairs((1L, 2L))) < 1e-12)
    assert(math.abs(pairs((1L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("brute-force top-k returns k rows per query, ranked by cosine") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val out = Similarity.bruteForceTopK(emb, 5).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (_, rows) =>
      assert(rows.length == 5)
      val cos = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF top-k probes nearest inverted lists with usable recall") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, Similarity.TopK, TestSpark.Sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty, "IVF lists should produce candidates")
    val recall = (exact intersect approx).size.toDouble / exact.size
    // candidate budget is NProbe/NumCentroids = 1/8 of the corpus;
    // Voronoi locality must beat that baseline clearly
    assert(recall > 0.2, s"recall $recall too low")
  }

  test("PQ rerank: exact refine never lowers ADC's recall, and served " +
    "cosines are the true ones") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id", "cos_sim")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val adc = Similarity.pqTopK(emb, Similarity.TopK, TestSpark.Sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerank = Similarity
      .pqRerankTopK(emb, Similarity.TopK, TestSpark.Sf)
      .select("query_id", "neighbor_id", "cos_sim")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    def recall(got: Set[(Long, Long)]) =
      (exact.keySet intersect got).size.toDouble / exact.size
    // the refine re-ranks a RerankFactor×k ADC shortlist with the exact
    // metric, so it can only promote true neighbors the compressed
    // scores mis-ranked — never demote one the ADC top-k already had
    // that survives in the deeper shortlist
    assert(recall(rerank.map(_._1).toSet) >= recall(adc),
      "exact refine lowered recall vs raw ADC")
    // and every served cosine is the true (uncompressed) similarity
    rerank.filter { case (k, _) => exact.contains(k) }.foreach {
      case (k, c) => assert(math.abs(c - exact(k)) < 1e-9,
        s"rerank served a non-exact cosine for $k")
    }
  }

  test("IVF range search: every hit is inside the radius, and hits " +
    "are exactly the brute-force set restricted to probed cells") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val hits = Similarity
      .ivfRangeSearch(emb, Similarity.RangeTau, TestSpark.Sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(hits.nonEmpty, "radius search came back empty")
    hits.foreach { case (k, c) =>
      assert(c >= Similarity.RangeTau - 1e-6, s"hit $k outside radius: $c")
    }
    // subset of the brute-force radius set (probing can only drop)
    val brute = Similarity.bruteForceTopK(emb, Int.MaxValue)
      .filter(col("cos_sim") >= Similarity.RangeTau)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = hits.map(_._1).toSet
    assert(got.subsetOf(brute), "range search returned a non-neighbor")
    assert(got.size.toDouble / brute.size > 0.2,
      s"probed radius recall ${got.size}/${brute.size} too low")
  }

  test("graph-beam top-k: bounded walk reaches usable recall") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    // the index invariant: symmetrized degree never exceeds 2*M
    val deg = Similarity.neighborGraph(emb)
      .groupBy("src").count().agg(org.apache.spark.sql.functions.max("count"))
      .head().getLong(0)
    assert(deg <= 2 * Similarity.GraphM, s"out-degree $deg exceeds 2M")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val beam = Similarity.graphBeamTopK(spark, TestSpark.Sf, Similarity.TopK)
      .collect()
    // the walk's work bound: visited <= entries + R*B*M per query, so
    // no query can return more than TopK rows and every returned list
    // is cos-descending
    beam.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= Similarity.TopK)
      val cos = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    val approx = beam.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // R*B*M = 144 scored candidates vs a corpus >= 500: the walk must
    // clearly beat the random-subset baseline
    assert(recall > 0.2, s"graph-beam recall $recall too low")
    info(s"graph-beam recall@${Similarity.TopK} = $recall")
  }

  test("filtered graph search: predicate honored, k stays full, " +
      "recall vs the filtered exact baseline is usable") {
    import org.apache.spark.sql.functions._
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val out = Similarity.graphFilteredTopK(spark, TestSpark.Sf,
      Similarity.TopK).collect()
    // every returned neighbor satisfies the metadata predicate
    val allowed = emb.filter(col("label") % 2 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty && out.forall(r => allowed(r.getLong(1))),
      "non-matching neighbor returned")
    // k full (route-through-all keeps enough matching candidates)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length == Similarity.TopK,
        s"query $q returned ${rows.length} rows")
    }
    // recall against the exact FILTERED baseline, computed driver-side
    // over the spec-scale fixture (top-k among matching corpus only)
    val all = emb
      .selectExpr("vec_id", "cast(embedding as array<double>) as v", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getAs[Number](2).longValue))
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val units = all.map { case (id, v, _) => id -> unit(v) }.toMap
    val exact = (for {
      q <- all.map(_._1).filter(_ < Similarity.NumQueries)
      top = all.filter { case (id, _, lbl) =>
          id != q && lbl % 2 == 0
        }
        .map { case (id, _, _) =>
          (id, units(q).zip(units(id)).map { case (a, b) => a * b }.sum)
        }
        .sortBy { case (id, cos) => (-cos, id) }
        .take(Similarity.TopK)
      (id, _) <- top
    } yield (q, id)).toSet
    val approx = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"filtered graph recall@${Similarity.TopK} = $recall")
    assert(recall > 0.2, s"filtered graph recall $recall too low")
  }

  test("layered (HNSW-style) beam: query-adaptive entries lift recall") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      (exact intersect rows.map(r => (r.getLong(0), r.getLong(1))).toSet)
        .size.toDouble / exact.size
    val flat = recallOf(
      Similarity.graphBeamTopK(spark, TestSpark.Sf, Similarity.TopK).collect())
    val layered = recallOf(
      Similarity.hnswLayeredTopK(spark, TestSpark.Sf, Similarity.TopK).collect())
    info(s"flat beam recall $flat, layered recall $layered")
    assert(layered > 0.2, s"layered recall $layered too low")
    // the hierarchy exists for entry quality: routing through the
    // upper layer must not LOSE to the fixed global entry points
    assert(layered >= flat - 0.05,
      s"layered ($layered) materially below flat ($flat)")
  }

  test("binary-Hamming two-stage: high recall, candidates bounded") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Similarity.binaryHammingTopK(emb, Similarity.TopK).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length == Similarity.TopK, "k starved")
    }
    val approx = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 50 Hamming candidates out of >=500: sign-bit distance must beat
    // the 10% random baseline decisively
    assert(recall > 0.3, s"binary-Hamming recall $recall too low")
    info(s"binary-Hamming recall@${Similarity.TopK} = $recall")
  }

  test("index delete: tombstoned ids never surface, k stays full") {
    val out = Similarity.queries.find(_.name == "ann_index_delete").get
      .run(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) % 7 != Similarity.AnnDeleteMod,
        s"tombstoned neighbor ${r.getLong(1)} served")
    }
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length == Similarity.TopK,
        s"query $q starved to ${rows.length} after delete (post-filtering?)")
    }
  }

  test("PQ/ADC top-k: 32x-compressed codes retain usable recall") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(emb, Similarity.TopK, TestSpark.Sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.size == exact.size, "PQ must return k rows per query")
    val recall = (exact intersect approx).size.toDouble / exact.size
    // each 64-dim vector is replaced by 8 codes from 16-word books —
    // random top-10-of-corpus agreement would be ~10/n; the quantized
    // geometry must do far better
    assert(recall > 0.2, s"PQ recall $recall too low")
    info(s"PQ ADC recall@${Similarity.TopK} = $recall")
  }

  test("IVFPQ composes both quantizers: cell-restricted ADC with " +
      "usable recall, candidates a subset of the probed cells") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(emb, Similarity.TopK, TestSpark.Sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq.nonEmpty)
    // the candidate pool is IVF's: every IVFPQ hit must come from a
    // probed cell, i.e. be among the pairs plain IVF could have scored
    val ivfAll = Similarity.ivfTopK(emb, 1000000, TestSpark.Sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq.subsetOf(ivfAll),
      "IVFPQ returned a neighbor outside the probed cells")
    val recall = (exact intersect ivfpq).size.toDouble / exact.size
    // double approximation (cell restriction + 32x code compression):
    // still must clearly beat the 1/8 candidate-budget baseline
    assert(recall > 0.15, s"IVFPQ recall $recall too low")
    info(s"IVFPQ recall@${Similarity.TopK} = $recall")
  }

  test("persisted index: stored artifact serves bit-equal to the " +
      "in-memory IVFPQ path; build is at-most-once; codes read parquet") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val root = Similarity.fullIndexRoot(spark, TestSpark.Sf)
    // the artifact has all three tables on disk
    Seq("centroids", "codebooks", "codes").foreach { t =>
      assert(new java.io.File(s"$root/$t").exists(), s"missing $t")
    }
    // memoized: a second call returns the SAME root (no rebuild)
    assert(Similarity.fullIndexRoot(spark, TestSpark.Sf) == root)
    val stored = SparkEntry.queries("ann_index_persist")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val mem = Similarity.ivfPqTopK(emb, Similarity.TopK, TestSpark.Sf)
      .orderBy(org.apache.spark.sql.functions.col("query_id"),
        org.apache.spark.sql.functions.col("rnk"))
      .collect().map(_.toSeq).toSeq
    assert(stored == mem,
      "stored-index serving diverged from the in-memory IVFPQ path")
    // the served plan's candidate side is a parquet scan of the stored
    // index, not a recomputation from raw embeddings
    val plan = SparkEntry.queries("ann_index_persist")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("codes"), s"no stored-codes scan in plan:\n$plan")
  }

  test("incremental add: batch encoded against frozen base models " +
      "equals whole-corpus encoding under those models") {
    val res = SparkEntry.queries("ann_index_incremental")(
      spark, TestSpark.Sf).collect()
    assert(res.nonEmpty)
    // every query answered with a full top-k: the batch union did not
    // drop or duplicate candidates (codes are unique per (id, m))
    val perQuery = res.groupBy(_.getLong(0)).values.map(_.length).toSet
    assert(perQuery == Set(Similarity.TopK),
      s"per-query result sizes $perQuery")
  }

  test("k-means quantizer training is monotone in the spherical objective") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val unit = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      .map { v => val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    def objective(cm: Array[Array[Double]]): Double =
      unit.map { u =>
        cm.map { c =>
          var acc = 0.0; var k = 0
          while (k < c.length) { acc += c(k) * u(k); k += 1 }
          acc
        }.max
      }.sum / unit.length
    val o = (0 to 2).map(i => objective(Similarity.trainCentroids(emb, iters = i)))
    // assignment maximizes per-point dot given centroids; the normalized
    // mean maximizes the within-list dot given assignment — so each
    // Lloyd iteration is non-decreasing in the mean max-dot objective
    assert(o(1) >= o(0) - 1e-12, s"iter1 ${o(1)} < init ${o(0)}")
    assert(o(2) >= o(1) - 1e-12, s"iter2 ${o(2)} < iter1 ${o(1)}")
    assert(o(2) > o(0), s"training never moved the objective: $o")
    val trained = Similarity.trainCentroids(emb)
    assert(trained.length == Similarity.NumCentroids)
    trained.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n")
    }
  }

  test("cosineBlocks scales with the corpus and bounds per-block bytes") {
    import Similarity.{cosineBlocks, TargetBlockBytes}
    val par = 32
    // floor: small corpora still get enough block pairs to cover the
    // cluster's parallelism (B(B+1)/2 >= par)
    val small = cosineBlocks(5000, 64, par)
    assert(small.toLong * (small + 1) / 2 >= par, s"B=$small")
    // growth: 100× and 10000× corpora raise B monotonically...
    val sizes = Seq(5000L, 500000L, 50000000L, 5000000000L)
    val bs = sizes.map(cosineBlocks(_, 64, par))
    assert(bs == bs.sorted, s"not monotone: $bs")
    assert(bs.last > bs.head, s"B never grew: $bs")
    // ...and once the memory term dominates, one block stays bounded by
    // TargetBlockBytes — the per-task residency invariant that makes
    // the exact path survive scale-up without retuning
    sizes.foreach { n =>
      val b = cosineBlocks(n, 64, par)
      if (b < 4096) // below the cap the bound must hold exactly
        assert(n * 64 * 8 / b <= TargetBlockBytes,
          s"n=$n B=$b block bytes ${n * 64 * 8 / b}")
    }
    // the result itself is B-invariant (partitioning knob, not
    // semantics): same pair set at two explicit block counts
    val emb0 = Tables.df(spark, TestSpark.Sf, "embeddings")
    def pairs(b: Int) =
      Similarity.cosinePairs(emb0, Similarity.CosineDupThreshold, b)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(4) == pairs(9))
  }

  test("LSH top-k is a subset-quality approximation with nonzero recall") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty, "LSH buckets should produce candidates")
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.15, s"recall $recall too low")
  }

  test("embedding decontamination: bench side excluded, threshold honored") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    val bench = docs
      .filter(org.apache.spark.sql.functions.col("source")
        === graft.operators.Corpus.BenchmarkSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = Similarity.embeddingDecontaminate(
      emb, docs, graft.operators.Corpus.BenchmarkSource).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty, "fixture should contain semantic contamination")
    // a benchmark document can never flag itself
    assert(out.forall(r => !bench.contains(r._1)))
    // every flagged doc's best hit clears the threshold, and the hit
    // count is positive and bounded by the bench size
    assert(out.forall(r =>
      r._3 >= Similarity.EmbedContamThreshold - 1e-6 &&
        r._2 >= 1 && r._2 <= bench.size))
    // the bench side is the broadcast side (corpus scanned once)
    val plan = Similarity.embeddingDecontaminate(
      emb, docs, graft.operators.Corpus.BenchmarkSource)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"),
      s"bench side must broadcast in:\n$plan")
  }

  test("quantized recall: SQ8 (8x, asymmetric) dominates sign-bit " +
    "codes (32x), sits near exact, and IVF-SQ8 pays only the probe loss") {
    val rows = Similarity.annRecallQuantized.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == Similarity.NumQueries)
    val meanSq = rows.map(_._1).sum / rows.length
    val meanBin = rows.map(_._2).sum / rows.length
    val meanIvfSq = rows.map(_._3).sum / rows.length
    // the compression/recall trade the taxonomy claims, as data: the
    // float-query asymmetric scan barely loses; 1-bit codes pay
    assert(meanSq >= meanBin,
      f"SQ8 recall $meanSq%.2f below binary $meanBin%.2f")
    assert(meanSq >= 0.9, f"SQ8 mean recall $meanSq%.2f under 0.9 — " +
      "the asymmetric-scan claim does not hold")
    // the composed index scans (NProbe/C) of the corpus: it can only
    // lose flat SQ8's recall through the probe restriction, and must
    // keep the same floor IVFPQ is held to
    assert(meanIvfSq <= meanSq + 1e-9,
      f"IVF-SQ8 recall $meanIvfSq%.2f above flat SQ8 $meanSq%.2f — " +
        "probe restriction cannot ADD recall")
    assert(meanIvfSq > 0.15, f"IVF-SQ8 mean recall $meanIvfSq%.2f too low")
    info(f"recall: sq8=$meanSq%.3f ivfsq8=$meanIvfSq%.3f bin=$meanBin%.3f")
  }

  test("layered filtered search: predicate honored, k stays full, " +
    "and routing stayed unfiltered (matches pass only at emission)") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val rows = Similarity.annHnswFiltered.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val allowed = emb.filter(col("label") % 2 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    rows.foreach { case (q, n) =>
      assert(allowed.contains(n), s"query $q served filtered-out id $n")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.size == Similarity.TopK, s"query $q served ${rs.size} rows")
    }
  }

  test("persisted IVF-SQ8: stored artifact serves bit-equal to the " +
    "in-memory composition, files frozen") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val root = Similarity.ivfsqIndexRoot(spark, TestSpark.Sf)
    def inv(sub: String): Seq[(String, Long, Long)] = {
      // recursive: the code table is cell-partitioned (cid= subdirs)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$root/$sub"))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
    }
    val before = Seq("centroids", "codes").map(inv)
    assert(before.forall(_.nonEmpty), "stored IVF-SQ8 artifact missing")
    val stored = Similarity.annIvfSqPersist.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(Seq("centroids", "codes").map(inv) == before,
      "serving rewrote the stored IVF-SQ8 artifact")
    val mem = Similarity.ivfSqTopK(emb, Similarity.TopK, TestSpark.Sf)
      .orderBy(col("query_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stored.nonEmpty && stored == mem,
      "stored IVF-SQ8 serving diverged from the in-memory composition")
  }

  test("IVF-SQ8 lifecycle: tombstone delete filters pre-probe with the " +
    "artifact untouched, compaction serves bit-equal and shrinks the " +
    "codes, incremental add never touches the frozen base") {
    def inv(root: String, sub: String): Seq[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$root/$sub"))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
    }
    def rows3(q: graft.Q): Seq[(Long, Long, Long)] =
      q.run(spark, TestSpark.Sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val full = Similarity.ivfsqIndexRoot(spark, TestSpark.Sf)
    val before = Seq("centroids", "codes").map(inv(full, _))
    val del = rows3(Similarity.annIvfSqDelete)
    assert(Seq("centroids", "codes").map(inv(full, _)) == before,
      "SQ tombstone delete rewrote the stored index")
    assert(del.nonEmpty &&
      !del.exists(_._2 % 7 == Similarity.AnnDeleteMod),
      "tombstoned neighbor served from the SQ index")
    del.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.size == Similarity.TopK, s"query $q served ${rs.size}")
    }
    val comp = rows3(Similarity.annIvfSqCompact)
    assert(comp == del,
      "SQ compact-then-serve diverged from tombstone serve")
    val croot = Similarity.ivfsqCompactRoot(spark, TestSpark.Sf)
    val fullN = spark.read.parquet(s"$full/codes").count()
    val compN = spark.read.parquet(s"$croot/codes").count()
    val expectN = spark.read.parquet(s"$full/codes")
      .filter(col("neighbor_id") % 7 =!= Similarity.AnnDeleteMod).count()
    assert(compN == expectN && compN < fullN,
      s"SQ compaction kept $compN of $fullN (expected $expectN)")
    // incremental: frozen base untouched, batch nodes become servable
    val broot = Similarity.ivfsqBaseRoot(spark, TestSpark.Sf)
    val bBefore = Seq("centroids", "codes").map(inv(broot, _))
    val incr = rows3(Similarity.annIvfSqIncremental)
    assert(Seq("centroids", "codes").map(inv(broot, _)) == bBefore,
      "SQ incremental add rewrote the frozen base index")
    assert(incr.exists(_._2 % 10 == Similarity.AnnBatchMod),
      "no batch vector served after the SQ incremental add")
  }

  test("IVF-SQ8 composes the coarse quantizer with SQ8 codes: " +
    "candidates a subset of the probed cells, k stays full") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val ivfsq = Similarity.ivfSqTopK(emb, Similarity.TopK, TestSpark.Sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ivfsq.nonEmpty)
    ivfsq.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length == Similarity.TopK,
        s"query $q served ${rs.length} rows")
    }
    // every served pair must come from a probed cell — the pairs plain
    // IVF could have scored (the IVFPQ subset discipline)
    val ivfAll = Similarity.ivfTopK(emb, 1000000, TestSpark.Sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfsq.toSet.subsetOf(ivfAll),
      "IVF-SQ8 returned a neighbor outside the probed cells")
  }

  test("streaming IVF-SQ8 ingest: drained serve bit-equal to the batch " +
    "incremental path, frozen base untouched") {
    val root = Similarity.ivfsqBaseRoot(spark, TestSpark.Sf)
    def inv(): Seq[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$root/codes"))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
    }
    val before = inv()
    def rows3(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.orderBy(col("query_id"), col("rnk")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = rows3(graft.streaming.EventsStream
      .runAnnAppendStream(spark, TestSpark.Sf))
    assert(inv() == before,
      "streaming ingest touched the frozen base code table")
    val batch = rows3(Similarity.annIvfSqIncremental.run(spark, TestSpark.Sf))
    assert(streamed.nonEmpty && streamed == batch,
      "streamed IVF-SQ8 ingest diverged from the batch incremental serve")
  }
}
