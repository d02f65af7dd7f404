package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cluster, Similarity}

/** Properties of the clustering surface: assignment optimality, the
  * SemDeDup subset contract (semantic pairs are exactly the
  * within-cluster slice of the exact all-pairs set), and the balanced
  * sample's per-cluster cap. */
class ClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def emb = Tables.df(spark, TestSpark.Sf, "embeddings")

  test("k-means assignment covers every vector exactly once, sizes consistent") {
    val rows = Cluster.kmeansAssign(emb, TestSpark.Sf).collect()
    val n = emb.count()
    assert(rows.length == n, "one assignment row per vector")
    assert(rows.map(_.getLong(0)).distinct.length == n)
    // cluster_size is the actual population of the vector's cluster
    val pop = rows.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    rows.foreach(r => assert(r.getLong(2) == pop(r.getLong(1))))
  }

  test("semantic pairs = exact cosine pairs restricted to shared clusters") {
    val exact = Similarity
      .cosinePairs(emb, Cluster.SemanticThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cid = Cluster.kmeansAssign(emb, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val semantic = Cluster
      .semanticPairs(emb, TestSpark.Sf, Cluster.SemanticThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = exact.filter { case (a, b) => cid(a) == cid(b) }
    assert(semantic == expected,
      "intra-cluster slice of the exact pair set, nothing more or less")
    assert(semantic.subsetOf(exact))
  }

  test("cluster-balanced sample caps every cluster at PerCluster") {
    val sample = Cluster
      .clusterBalancedSample(emb, TestSpark.Sf, Cluster.PerCluster)
      .collect()
    val byCid = sample.groupBy(_.getLong(0))
    assert(byCid.nonEmpty)
    byCid.foreach { case (_, rows) =>
      assert(rows.length <= Cluster.PerCluster)
      assert(rows.map(_.getLong(2)).sorted.toSeq ==
        (1L to rows.length.toLong).toSeq, "ranks are dense from 1")
    }
    // clusters with population >= cap contribute exactly the cap
    val pop = Cluster.kmeansAssign(emb, TestSpark.Sf)
      .collect().groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    pop.filter(_._2 >= Cluster.PerCluster).keys.foreach { c =>
      assert(byCid(c).length == Cluster.PerCluster)
    }
  }

  test("class-balanced sample cuts every label to the smallest class") {
    val byLabel = emb.collect().groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.length).toMap
    val k = byLabel.values.min
    val sample = Cluster.sampleClassBalance.run(spark, TestSpark.Sf).collect()
    val got = sample.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    // every label present, every label exactly k rows
    assert(got.keySet == byLabel.keySet.map(_.toLong))
    got.values.foreach(n => assert(n == k, s"expected $k rows per class"))
    // ranks dense 1..k within each label
    sample.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to k.toLong).toSeq)
    }
  }

  test("k-center: greedy order, distinct centers, coverage certificate") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val sel = Cluster.kcenterSample(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sel.length == Cluster.KCenter)
    assert(sel.map(_._2).distinct.length == sel.length, "duplicate center")
    assert(sel.head == ((1L, 0L, 0.0)), "seed must be vec 0 at dist 0")
    // greedy max-min distances are non-increasing (adding centers can
    // only lower every point's min distance)
    val ds = sel.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a + 1e-9 >= b },
      s"selection distances not monotone: ${ds.mkString(",")}")
    // coverage certificate: every vector's min cosine distance to the
    // selected set is <= the last selection distance (the would-be
    // next pick can't beat the recorded greedy sequence)
    val centers = Cluster.kcenterSample(emb) // deterministic: same set
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val unitRows = emb.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(_ / n)
      }.toMap
    val cvecs = centers.toSeq.map(unitRows)
    def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      1.0 - s
    }
    val worst = unitRows.values
      .map(v => cvecs.map(c => dist(v, c)).min).max
    assert(worst <= ds.last + 1e-6,
      s"uncovered point at $worst > last pick ${ds.last}")
  }

  test("simplified silhouette: values bounded, covers every cluster, " +
    "population-weighted mean positive for the trained model") {
    import graft.operators.Cluster
    val rows = Cluster.silhouetteSimplified(
      Tables.df(spark, TestSpark.Sf, "embeddings"), TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (cid, n, s) =>
      assert(n > 0 && s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9,
        s"cluster $cid mean silhouette $s out of range")
    }
    // clusters partition the corpus
    val total = rows.map(_._2).sum
    val corpus = Tables.df(spark, TestSpark.Sf, "embeddings").count()
    assert(total == corpus, s"silhouette covered $total of $corpus")
    // a trained (non-random) quantizer separates better than chance:
    // the population-weighted mean is positive
    val wmean = rows.map { case (_, n, s) => n * s }.sum / total
    assert(wmean > 0, s"weighted mean silhouette $wmean not positive")
  }
}
