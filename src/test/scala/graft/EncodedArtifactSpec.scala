package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-19 optimization contracts for the shared ENCODED serving
  * artifacts: every quantized-ANN serve now reads a per-(session, dir)
  * memoized encode (assignment, PQ codes, SQ codes, sign codes, LSH
  * buckets) instead of re-encoding the corpus per invocation. Each
  * artifact must be BIT-EQUAL to the per-invocation derivation it
  * replaced — the serve tails consume them row-for-row, so any drift
  * here breaks the family's oracles. The build cost stays benched:
  * `ann_index_build` re-trains + re-encodes + re-writes per invocation
  * with no memo on its path (asserted below via the manifest's
  * stability across two invocations — same work, same artifact). */
class EncodedArtifactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.df(spark, TestSpark.Sf, "embeddings")

  test("sharedIvfAssign is bit-equal to per-invocation assignment") {
    val cm = Similarity.trainedCentroids(emb, TestSpark.Sf)
    val fresh = Similarity.withUnit(emb).as[(Long, Array[Double])]
      .map { case (id, u) =>
        (id, Similarity.nearestCentroids(u, 1, cm)(0), u.toSeq)
      }
      .collect().sortBy(_._1).toSeq
    val shared = Similarity.sharedIvfAssign(spark, TestSpark.Sf)
      .select(col("vec_id"), col("cid"), col("u"))
      .as[(Long, Int, Array[Double])]
      .collect().map { case (id, c, u) => (id, c, u.toSeq) }
      .sortBy(_._1).toSeq
    assert(shared.nonEmpty)
    assert(shared == fresh, "memoized IVF assignment diverged")
    // the label column matches the raw table (filtered serving relies
    // on filtering the artifact ≡ assigning the filtered corpus)
    val lab = Similarity.sharedIvfAssign(spark, TestSpark.Sf)
      .select(col("vec_id"), col("label")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    val rawLab = emb.select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(lab == rawLab, "artifact labels diverged from the table")
  }

  test("sharedPqCodes is bit-equal to the per-invocation encode") {
    val cm = Similarity.trainedCentroids(emb, TestSpark.Sf)
    val cb = Similarity.trainedCodebooks(emb, TestSpark.Sf)
    val fresh = Similarity.withUnit(emb).as[(Long, Array[Double])]
      .flatMap { case (id, u) =>
        val cid = Similarity.nearestCentroids(u, 1, cm)(0)
        (0 until Similarity.PqM).iterator.map { m =>
          val sub = java.util.Arrays.copyOfRange(u,
            m * Similarity.PqSubDim, (m + 1) * Similarity.PqSubDim)
          (id, cid, m, Similarity.nearestCode(sub, cb(m)))
        }
      }
      .collect().sortBy(t => (t._1, t._3)).toSeq
    val shared = Similarity.sharedPqCodes(spark, TestSpark.Sf)
      .as[(Long, Int, Int, Int)].collect().sortBy(t => (t._1, t._3)).toSeq
    assert(shared.nonEmpty)
    assert(shared == fresh, "memoized PQ code table diverged")
  }

  test("sharedSqCodes is bit-equal to ivfSqEncode, and the flat-SQ8 " +
    "serve over it matches the declarative path") {
    val cm = Similarity.trainedCentroids(emb, TestSpark.Sf)
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select(col("neighbor_id"), col("cid"), col("qv"), col("scale"))
        .as[(Long, Int, Array[Double], Double)]
        .collect().map { case (i, c, q, s) => (i, c, q.toSeq, s) }
        .sortBy(_._1).toSeq
    val shared = dump(Similarity.sharedSqCodes(spark, TestSpark.Sf))
    val fresh = dump(Similarity.ivfSqEncode(emb, cm))
    assert(shared.nonEmpty)
    assert(shared == fresh, "memoized SQ code table diverged")
    // the entry's serve (shared kernel codes) ≡ the public declarative
    // path — the bit-equality the ann_sq_topk oracle rests on
    val entry = SparkEntry.queries("ann_sq_topk")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val direct = Similarity.sqTopK(emb, Similarity.TopK)
      .orderBy(col("query_id"), col("rnk"))
      .collect().map(_.toSeq).toSeq
    assert(entry == direct, "shared-artifact SQ serve diverged")
  }

  test("sharedBinaryCodes / sharedLshKeys are bit-equal to the " +
    "per-invocation kernels") {
    val bin = Similarity.sharedBinaryCodes(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val binFresh = Similarity.binaryCodes(emb)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(bin.nonEmpty && bin == binFresh, "sign-code table diverged")
    val lsh = Similarity.sharedLshKeys(spark, TestSpark.Sf)
      .as[(Long, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val lshFresh = Similarity.lshKeys(emb)
      .as[(Long, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(lsh.nonEmpty && lsh == lshFresh, "LSH bucket table diverged")
  }

  test("ann_index_build pays a fresh build per invocation and its " +
    "manifest is deterministic") {
    val run = () => SparkEntry.queries("ann_index_build")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val first = run()
    val second = run()
    assert(first.nonEmpty)
    assert(first == second, "build manifest not deterministic")
    // sanity: total code rows = corpus size × PqM
    val total = first.map(_(1).asInstanceOf[Long]).sum
    assert(total == emb.count() * Similarity.PqM,
      "manifest row count does not cover the corpus")
  }
}
