package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantize, Similarity}

/** What int8 quantization costs in ranking fidelity: top-k over the
  * DEQUANTIZED corpus must largely agree with the exact float top-k.
  * With 255 levels per dimension the per-coordinate error is <= scale/2
  * (~0.4% of the max magnitude), so near-total recall is the expected
  * regime — a large drop would mean the quantizer is broken, not merely
  * lossy. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dequantized top-k keeps high recall vs the exact float ranking") {
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dq = Similarity.bruteForceTopK(Quantize.dequantized(emb), Similarity.TopK)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dq.size == exact.size)
    val recall = (exact intersect dq).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall collapsed: $recall")
  }

  test("quantized values stay in the int8 range with zero-vector guard") {
    val rows = Quantize.quantizeStats(emb = Tables.df(spark, TestSpark.Sf,
      "embeddings")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= -127 && r.getLong(2) <= 127)
      assert(r.getLong(3) >= 0)
      assert(r.getDouble(4) >= 0.0)
    }
    // at least one coordinate per vector must hit full scale (the max
    // magnitude quantizes to exactly +/-127)
    rows.foreach(r => assert(r.getLong(2) == 127 || r.getLong(1) == -127))
  }

  test("pc1 captures at least as much variance as any coordinate axis") {
    import org.apache.spark.sql.functions._
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
    val pcVar = Quantize.pcaProject(emb)
      .agg(var_pop(col("pc1"))).collect()(0).getDouble(0)
    // per-axis population variances of the raw coordinates
    val axes = emb.select(graft.functions.Vectors.asDouble(col("embedding"))
        .as("v"))
      .select((0 until Similarity.Dim).map(i => col("v")(i).as(s"x$i")): _*)
    val axisVars = axes.agg(var_pop(col("x0")),
      (1 until Similarity.Dim).map(i => var_pop(col(s"x$i"))): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Double])
    val maxAxis = axisVars.max
    // the dominant eigenvector's variance is >= any axis variance; allow
    // 1% slack for the rounding of pc1 to 6 decimals
    assert(pcVar >= maxAxis * 0.99,
      s"pc1 variance $pcVar below best axis $maxAxis")
  }
}
