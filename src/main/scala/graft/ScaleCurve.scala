package graft

import org.apache.spark.sql.SparkSession

/** Scale-curve audit: MEASURE the growth the architecture claims.
  *
  * Every expensive operator family in this repo carries a documented
  * 100 TB shape (banded LSH, df-capped inverted index, semi-join-gated
  * explode, k-bounded retrieval lists, model-sized training state …) —
  * all arguments by construction. This harness converts them into a
  * measured regression gate: run each family at the three shipped
  * fixture scales (sf0.001 / sf0.01 / sf0.1 — relative corpus sizes
  * 1× / 10× / 100×), take the min-of-3 warm time per scale, and fit
  * the growth exponent α in t ∝ sf^α by least squares over
  * (ln sf, ln t). A corpus-linear operator has α ≤ 1; fixed per-job
  * overhead (scheduling, codegen, streaming-runtime setup) only ever
  * FLATTENS the curve at fixture scale, so the gate asserts α < 1.3
  * for every audited cell.
  *
  * The slope fit alone is NOT a sufficient gate: a flat,
  * overhead-dominated first decade drags the least-squares slope down
  * even when the last decade blows up (times of 1.3/2/60 s fit
  * α ≈ 0.8). The LAST decade's ratio t(sf0.1)/t(sf0.01) is the
  * honest data-growth signal — linear growth is bounded by 10× (the
  * data factor) even with zero overhead, while a data-dominated
  * quadratic shows ~100× — so a second gate bounds it at
  * [[MaxDecadeRatio]], above every legitimate linear reading observed
  * (max 3.0×) and far below any super-linear blowup.
  *
  * Warm-up per (cell, scale) is untimed and absorbs the per-corpus
  * memoized artifact builds (trained models, shingle index, symmetric
  * edges, stored ANN index) exactly as the bench does: the audited
  * quantity is the steady-state per-run cost, the thing that must stay
  * linear for a 1000-executor deployment to hold. Training/build costs
  * are themselves bounded by the same passes (each is 1-3 linear scans
  * by construction) but are amortized across a session in production
  * and measured separately by the bench's cold run1 records.
  *
  * Output: one JSON line per cell (times per scale, per-decade ratios,
  * fitted exponent) then a markdown table for BASELINE.md. Exit 1 if
  * any cell breaches either gate.
  */
object ScaleCurve {

  /** The audited families — the most expensive cells of the bench,
    * every one carrying a corpus-linear doc-comment claim. */
  val Cells: Seq[String] = Seq(
    "dedup_ngram_jaccard",        // df-capped inverted index + verify
    "dedup_containment",          // same index, containment bound
    "dedup_span_excise",          // semi-join-gated positional explode
    "retrieval_rrf_fusion",       // k-bounded dense ⊕ lexical fusion
    "ann_ivfpq_topk",             // probed cells × PQ codes, ADC
    "ann_index_persist",          // serving from the stored index
    "graph_connected_components", // label propagation + early exit
    "text_bpe_merge_loop",        // word-TYPE state merge loop
    "stream_interval_join",       // two-sided watermark state
    "events_attribution",         // sessionized credit assignment
    "corpus_source_overlap",      // cross-source shingle agreement
    "stream_timer_sessions",      // per-key timer state, watermark-bounded
    "stream_static_join",         // broadcast dim join per micro-batch
    "text_classifier_score",      // zero-shuffle kernel scan
    "ann_filtered_topk",          // pre-filtered inverted lists
    "retrieval_eval_ndcg",        // k-bounded ranked-list evaluation
    "events_attribution_markov",  // journeys distributed, chain model-sized
    "classifier_eval_auc",        // score scan + per-source rank windows
    "approx_topk_sketch_rollup")  // persisted daily frequency sketches

  /** Gate: fitted exponent must stay below this for every cell. */
  val MaxExponent = 1.3

  /** Gate: the LAST decade's growth ratio must stay below this —
    * linear growth caps at 10x per decade, so 12 allows full
    * data-dominated linearity plus noise while catching any
    * super-linear blowup the slope fit would smooth over. */
  val MaxDecadeRatio = 12.0

  val Scales: Seq[(String, Double)] = Seq(
    "/root/testdata/sf0.001" -> 0.001,
    "/root/testdata/sf0.01" -> 0.01,
    "/root/testdata/sf0.1" -> 0.1)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    // session-level warm-up at the smallest scale: JVM/codegen cost
    // must not be billed to the first audited cell
    try exec(Cells.head, Scales.head._1) catch { case _: Throwable => () }

    val rows: Seq[(String, Seq[Double], Double)] = Cells.map { name =>
      val times = Scales.map { case (dir, _) =>
        try {
          exec(name, dir) // untimed: artifact builds + per-scale codegen
          val samples = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            exec(name, dir)
            (System.nanoTime() - t0) / 1e9
          }
          samples.min
        } catch {
          case e: Throwable =>
            System.err.println(s"[scale] $name @ $dir failed: ${e.getMessage}")
            -1.0
        }
      }
      // least-squares slope of ln t over ln sf (3 points, 2 decades)
      val alpha = if (times.forall(_ > 0)) {
        val xs = Scales.map { case (_, sf) => math.log(sf) }
        val ys = times.map(math.log)
        val n = xs.size
        val mx = xs.sum / n
        val my = ys.sum / n
        val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
        val den = xs.map(x => (x - mx) * (x - mx)).sum
        num / den
      } else Double.NaN
      (name, times, alpha)
    }

    spark.stop()

    // -1 is the failure sentinel throughout the JSON record: a NaN
    // exponent must not round to a perfect-looking 0.0, and a ratio
    // against a failed sample must not print as a negative time ratio
    def r3(v: Double): Double =
      if (v.isNaN) -1 else math.round(v * 1000) / 1000.0
    def ratio(num: Double, den: Double): Double =
      if (num > 0 && den > 0) r3(num / den) else -1
    rows.foreach { case (name, ts, a) =>
      val decade1 = ratio(ts(1), ts(0))
      val decade2 = ratio(ts(2), ts(1))
      println(s"""{"cell":"$name","t_sf0.001":${r3(ts(0))},""" +
        s""""t_sf0.01":${r3(ts(1))},"t_sf0.1":${r3(ts(2))},""" +
        s""""decade_ratios":[$decade1,$decade2],"exponent":${r3(a)}}""")
    }
    println()
    println("| cell | sf0.001 | sf0.01 | sf0.1 | ratio/decade | exponent α |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (name, ts, a) =>
      val d1 = if (ts(0) > 0) f"${ts(1) / ts(0)}%.2f" else "-"
      val d2 = if (ts(1) > 0) f"${ts(2) / ts(1)}%.2f" else "-"
      println(f"| `$name` | ${ts(0)}%.2f s | ${ts(1)}%.2f s | ${ts(2)}%.2f s " +
        f"| $d1 / $d2 | ${a}%.2f |")
    }
    val breaches = rows.filter { case (_, ts, a) =>
      a.isNaN || a >= MaxExponent ||
        (ts(1) > 0 && ts(2) / ts(1) >= MaxDecadeRatio)
    }
    if (breaches.nonEmpty) {
      breaches.foreach { case (n, ts, a) =>
        val d2 = if (ts(1) > 0) ts(2) / ts(1) else Double.NaN
        System.err.println(
          f"[scale] GATE BREACH: $n exponent $a%.2f (max $MaxExponent) " +
            f"last-decade ratio $d2%.2f (max $MaxDecadeRatio)")
      }
      sys.exit(1)
    }
    println(s"\n[scale] PASS: all ${rows.size} cells under exponent " +
      s"$MaxExponent and last-decade ratio $MaxDecadeRatio")
  }
}
