package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates (beyond-reference; sketch algorithms differ
  * per engine so there is no cross-engine oracle — accuracy is asserted
  * against the exact answer instead). */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct (HLL++) within 5% of exact on fixtures") {
    val o = Tables.df(spark, TestSpark.Sf, "orders")
    val row = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey")).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx_distinct_bounds entry: every group's flag is true") {
    val rows = graft.operators.Approx.approxDistinct
      .run(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_eps")),
      rows.map(_.toString).mkString("\n"))
  }

  test("approx_percentile_bounds entry: true rank of approx median in band") {
    val rows = graft.operators.Approx.approxPercentile
      .run(spark, TestSpark.Sf).collect()
    assert(rows.length == 1 && rows(0).getAs[Boolean]("within_eps"),
      rows.map(_.toString).mkString("\n"))
  }

  test("agg_stats_moments entry: builtins agree with exact power sums") {
    val rows = graft.operators.Approx.statsMoments
      .run(spark, TestSpark.Sf).collect()
    assert(rows.length == 1 && rows(0).getAs[Boolean]("within_tol"),
      rows.map(_.toString).mkString("\n"))
  }

  test("approx_percentile brackets the exact discrete percentile") {
    val o = Tables.df(spark, TestSpark.Sf, "orders")
    val exact = o.selectExpr(
      "percentile_disc(0.5) within group (order by o_totalprice)")
      .collect()(0).getDouble(0)
    val approx = o.select(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)))
      .collect()(0).getDouble(0)
    // with accuracy 10000 on a few thousand rows the sketch is exact-ish
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx $approx vs exact $exact")
  }

  test("CMS heavy-hitter estimates: never under, within eps·N over") {
    import graft.operators.Approx
    val rows = Approx.approxHeavyHitters.run(spark, TestSpark.Sf).collect()
    assert(rows.length == graft.operators.Corpus.TopGrams)
    assert(rows.forall(_.getBoolean(2)), "CMS underestimated a count")
    // the entry only pins >= ; here pin the other side with margin:
    // eps = 1e-4 of total gram additions
    val docs = Tables.df(spark, TestSpark.Sf, "documents")
    val total = docs.select(explode(
      graft.functions.Text.shingles(col("text"), 3)).as("g")).count()
    val grams = docs.select(explode(
      graft.functions.Text.shingles(col("text"), 3)).as("g"))
    val cmsBytes = grams.agg(expr(
      "count_min_sketch(g, cast(0.0001 as double), cast(0.99 as double), 42)"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(cmsBytes)
    rows.foreach { r =>
      val est = cms.estimateCount(
        r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(est <= r.getLong(1) + math.ceil(1e-4 * total).toLong * 3,
        s"estimate $est too far above df ${r.getLong(1)} for '${r.getString(0)}'")
    }
  }

  test("bitmap distinct: exact equality and the ALL row is the OR-merge") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Approx.bitmapDistinct
      .run(TestSpark.spark, TestSpark.Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.df(TestSpark.spark, TestSpark.Sf, "events")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, nd) => assert(rows(t) == nd, s"type $t") }
    val all = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows("ALL") == all)
    // ALL <= sum of per-type (users active in several types counted once)
    assert(rows("ALL") <= exact.values.sum)
  }

  test("persisted sketch rollup: every row within eps after the round-trip") {
    val rows = graft.operators.Approx.approxSketchRollup
      .run(TestSpark.spark, TestSpark.Sf).collect()
    assert(rows.length >= 2)
    assert(rows.exists(_.getString(0) == "ALL"))
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)} estimate outside eps after parquet round-trip"))
  }

  test("mergeable HLL: shard union lands within eps of the exact count") {
    val row = graft.operators.Approx.approxMergeable
      .run(TestSpark.spark, TestSpark.Sf).collect().head
    assert(row.getLong(0) >= 1 && row.getLong(1) >= row.getLong(0))
    assert(row.getBoolean(2), "merged estimate outside eps")
    assert(row.getBoolean(3), "a per-shard estimate outside eps")
  }

  test("Misra-Gries candidates: real pruning + superset guarantee on Zipf") {
    // synthetic Zipf over FAR more distinct keys than counters: key i
    // (1-based) appears ⌈50000/i⌉ times over 5000 distinct keys —
    // deterministic, heavy head, long uniform-ish tail
    import spark.implicits._
    val k = 64
    val toks = spark.range(1, 5001)
      .select(col("id"), explode(sequence(lit(1),
        (lit(50000) / col("id")).cast("int"))).as("rep"))
      .select(concat(lit("key"), col("id")).as("tok"))
      .repartition(8)
      .as[String]
    val n = toks.count()
    val cands = graft.operators.Approx.misraGriesCandidates(toks, k)
      .as[String].collect().toSet
    // pruning is real: candidates ≤ partitions·k, far below 5000 keys
    assert(cands.size <= 8 * k,
      s"candidate set too large: ${cands.size}")
    assert(cands.size < 1000, s"no pruning happened: ${cands.size}")
    // superset guarantee: every true heavy hitter survives
    val exactHeavy = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .as[(String, Long)].collect()
    assert(exactHeavy.nonEmpty, "test data produced no heavy hitters")
    val missed = exactHeavy.filterNot { case (t, _) => cands.contains(t) }
    assert(missed.isEmpty, s"pruned true heavy hitters: ${missed.toSeq}")
  }

  test("approx_misra_gries_hitters entry equals the direct exact answer") {
    val got = graft.operators.Approx.misraGriesHitters
      .run(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val toks = Tables.df(spark, TestSpark.Sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val n = toks.count()
    val want = toks.groupBy("tok").count()
      .filter(col("count") * graft.operators.Approx.MgCounters > n)
      .orderBy(col("count").desc, col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty, "no heavy hitters on fixture vocabulary")
    assert(got.toSeq == want.toSeq)
  }

  test("count-min point queries: one-sided error, bounded overshoot") {
    import graft.operators.Approx
    val rows = Approx.countMinPoint.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "no query keys on fixture")
    val n = Tables.df(spark, TestSpark.Sf, "events").count()
    // one-sided: the min over d rows can only overcount (collisions add)
    rows.foreach { case (k, exact, est) =>
      assert(est >= exact, s"key $k underestimated: $est < $exact")
      // expected excess per row is N/w; min over 4 independent rows
      // stays well inside 5·N/w with huge margin on any fixture
      assert(est - exact <= 5 * n / Approx.CmWidth + 1,
        s"key $k overshoot ${est - exact} beyond the sketch bound")
    }
  }

  test("theta setops: sample algebra is internally consistent and the " +
    "estimates land near the exact cardinalities") {
    import graft.operators.Approx
    // sf0.01: both yearly sets ≈ 1170 ≫ k = 64, so the ESTIMATOR path
    // is exercised (sf0.001's sets would ride the exact path)
    val rows = Approx.thetaSetops.run(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(rows.keySet == Set("a", "b", "union", "intersect", "diff"))
    val (_, thA, _, _) = rows("a")
    val (_, thB, _, _) = rows("b")
    // the combined θ is the min, shared by all derived ops
    Seq("union", "intersect", "diff").foreach { op =>
      assert(rows(op)._2 == math.min(thA, thB), s"$op theta wrong")
    }
    // retained counts: singles < k (θ excludes the kth), union ≤ sum
    assert(rows("a")._1 < Approx.KmvK && rows("b")._1 < Approx.KmvK)
    assert(rows("intersect")._1 + rows("diff")._1 <=
      math.min(rows("a")._1, rows("b")._1 + rows("diff")._1))
    // estimator quality: within 35% on every op with real support
    // (k = 64 gives ~1/√62 ≈ 13% standard error; 35% ≈ 2.5σ)
    rows.foreach { case (op, (_, _, est, exact)) =>
      if (exact >= 100)
        assert(math.abs(est - exact) / exact.toDouble <= 0.35,
          s"$op estimate $est too far from exact $exact")
    }
    // inclusion-exclusion on the EXACT columns (sanity of the truth
    // the estimates are judged against)
    assert(rows("a")._4 + rows("b")._4 - rows("intersect")._4 ==
      rows("union")._4)
    assert(rows("a")._4 - rows("intersect")._4 == rows("diff")._4)
  }
}
