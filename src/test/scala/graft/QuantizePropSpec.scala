package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantize

/** Property: symmetric int8 quantization reconstructs every coordinate
  * to within half a quantization step (scale/2 = max|x|/254), the bound
  * that makes the QuantizeSpec recall result a certainty rather than a
  * fixture accident. Checked over random vectors spanning magnitudes
  * from 1e-3 to 1e3, including sign-skewed and near-constant shapes. */
class QuantizePropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(seed: Long): List[List[Float]] = {
    val g = Gen.listOfN(40,
      Gen.listOfN(16, Gen.choose(-1000.0, 1000.0).map(_.toFloat)))
    g(Gen.Parameters.default, Seed(seed)).get
  }

  test("dequantization error is bounded by half a step per coordinate") {
    import spark.implicits._
    (0 until 5).foreach { i =>
      val vs = vecs(1000L + i) :+
        List.fill(16)(0.001f) :+ // near-constant small magnitude
        (List.fill(15)(0.0f) :+ 5.0f) // one-hot
      val df = vs.zipWithIndex
        .map { case (v, id) => (id.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val dq = Quantize.dequantized(df)
        .select(col("vec_id"), col("embedding").as("dq"))
      val joined = df.join(dq, Seq("vec_id"))
        .collect().map { r =>
          (r.getSeq[Float](1).toArray, r.getSeq[Float](2).toArray)
        }
      joined.foreach { case (orig, rec) =>
        val m = orig.map(x => math.abs(x.toDouble)).max
        // half a step, plus float32 representation slack on both sides
        val bound = m / 254.0 + m * 1e-5 + 1e-12
        orig.zip(rec).foreach { case (x, y) =>
          assert(math.abs(x.toDouble - y.toDouble) <= bound,
            s"|$x - $y| > $bound (max magnitude $m)")
        }
      }
    }
  }
}
