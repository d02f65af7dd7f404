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
    val approx = Similarity.ivfTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty, "IVF lists should produce candidates")
    val recall = (exact intersect approx).size.toDouble / exact.size
    // candidate budget is NProbe/NumCentroids = 1/8 of the corpus;
    // Voronoi locality must beat that baseline clearly
    assert(recall > 0.2, s"recall $recall too low")
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
}
