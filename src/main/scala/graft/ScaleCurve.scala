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
    "approx_topk_sketch_rollup",  // persisted daily frequency sketches
    "ann_graph_beam",             // frontier-join beam walk, O(q·B·M·R)
    "ann_hnsw_layered",           // two-layer walk, upper graph 1/8 size
    "ann_binary_hamming",         // 16-byte code scan + bounded rerank
    "graph_communities",          // per-round edge⋈label + arg-max window
    "dml_merge_pruned",           // touched-partition CDC rewrite
    "ann_graph_persist",          // serving from the STORED edge table
    "ann_graph_incremental",      // frozen-graph insert: O(batch·B·M·R)
    "text_index_serve",           // stored postings: 3 of 16 buckets read
    "ann_pq_rerank",              // corpus ADC + broadcast 4k exact refine
    "text_index_incremental",     // per-batch segment append + merged serve
    "text_index_topk_pruned",     // block-max serve: survivors only
    "ann_sq_topk",                // int8 asymmetric scan + bounded rerank
    "ann_ivfsq_topk",             // probed cells × SQ8 codes (r17 scale path)
    "text_index_phrase_incr",     // positional base ∪ delta phrase serve
    "dml_dv_versioned",           // versioned read through DV sidecars
    "ann_ivfsq_persist",          // stored SQ8 serve: probed-cell PARTITIONS only (r18)
    "ann_hnsw_lifecycle_chain",   // serve from the chained (delete→insert→compact) artifact
    "dml_merge_mor",              // merge-on-read read: data ∖ DV ∪ delta per entry
    "dml_dv_changes",             // CDF across a DV-only commit (full-entry diff)
    "dml_schema_evolution_versioned", // NULL-fill read under the versioned schema
    "classifier_train_logreg",    // 6 gradient rounds over the hashed feature table
    "stream_index_append",        // per-micro-batch segment append (3 fixed batches)
    "stream_ann_append",          // per-micro-batch IVF-SQ8 encode vs frozen base
    "dml_merge_mor_cdc",          // U/I/D MoR read: data ∖ DV ∪ delta
    "dml_mor_changes",            // CDF across the full MoR lineage
    "dml_schema_drop_column")     // post-DROP read: projection-only schema serve
  // Cells whose audited quantity differs from their serving entry run
  // a dedicated drive instead of SparkEntry.queries — declarative, like
  // StreamCells, so the dispatch below doesn't accrete name checks.
  // ann_graph_incremental: the insert walk is rebuilt EVERY timed
  // sample, bypassing the serving memo, so the measured quantity is
  // the per-batch insert contract itself (batch = the fixture's 10%
  // corpus slice → the batch term scales 10× per decade like the
  // corpus term).
  // text_index_incremental: same discipline for the lexical index —
  // the delta segment append is rebuilt every sample, so the audit
  // measures the O(batch) ingest contract, not the memoized serve.
  val AuditOverrides: Map[String, (SparkSession, String) => Unit] = Map(
    "ann_graph_incremental" ->
      ((s, d) => graft.operators.Similarity.auditIncrementalInsert(s, d)),
    "text_index_incremental" ->
      ((s, d) => graft.operators.LexIndex.auditIncrementalAppend(s, d)))
  // stream_merge_pruned is NOT audited: its 3-batch CDC apply is
  // scale-independent by design (fixed batch count, fixed streaming
  // setup per run), so neither the alpha fit nor the per-batch gate
  // would measure anything — the kernel's data term is what
  // dml_merge_pruned's row above covers.

  /** Streaming cells run the admission-controlled drive
    * ([[graft.streaming.EventsStream.auditScaledStream]]): events split
    * into [[graft.streaming.EventsStream.AuditRowsPerFile]]-row files,
    * one file admitted per trigger, so micro-batch count grows with the
    * corpus (1/3/25) and the audit measures a DATA term instead of the
    * one-batch drain's fixed setup (whose negative slopes said nothing).
    * These rows carry the batch count in the table and get an extra
    * gate: per-BATCH time flat across the last decade — the measured
    * form of "state is watermark-bounded". */
  val StreamCells: Set[String] = Set(
    "stream_interval_join", "stream_timer_sessions", "stream_static_join")

  /** Gate: fitted exponent must stay below this for every cell. */
  val MaxExponent = 1.3

  /** Gate (stream cells): per-batch time may grow at most this much
    * over the last decade — flat-ish per-batch work is the bounded-state
    * claim; 3x allows scheduler noise at fixture scale while catching
    * any state-accumulation blowup (unbounded state would grow
    * per-batch time with every admitted batch). */
  val MaxPerBatchRatio = 3.0

  /** Gate (batch cells): the LAST decade's growth ratio must stay
    * below this. The worst legitimate batch reading observed across
    * rounds is 2.94x (fixture-scale cells are overhead-dominated, far
    * from the 10x data bound), so 5.0 catches a super-linear decade
    * the slope fit would smooth over while leaving honest headroom —
    * the old 12.0 would have admitted an 11x decade.
    *
    * RECALIBRATION OBLIGATION: 5.0 is calibrated to the CURRENT
    * fixtures, where per-job overhead dominates and flattens every
    * honest linear cell well under the 10x data factor. A genuinely
    * data-dominated linear cell legitimately approaches the full 10x
    * per decade (which [[MaxExponent]] = 1.3 would still pass), so if
    * the fixture scales change, or a new cell's sf0.1 time is large
    * enough that fixed overhead stops masking the data term (rule of
    * thumb: t(sf0.1) >> 10x the session's per-job floor, ~0.3-0.5 s
    * here), re-derive this bound from the observed linear readings at
    * the new scales before trusting a breach — a 6x decade on a
    * 30-second data-dominated cell is honest linearity, not a
    * regression. */
  val MaxDecadeRatio = 5.0

  /** Gate (stream cells): total-time decade bound. The admitted batch
    * COUNT grows 3 → 25 across the last decade by design, so total
    * time legitimately grows up to ~8.3x at perfectly flat per-batch
    * cost — the per-batch ratio gate above is the honest bounded-state
    * signal for these cells; this bound only catches a total blowup
    * beyond even that. */
  val StreamMaxDecadeRatio = 12.0

  val Scales: Seq[(String, Double)] = Seq(
    "/root/testdata/sf0.001" -> 0.001,
    "/root/testdata/sf0.01" -> 0.01,
    "/root/testdata/sf0.1" -> 0.1)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional args restrict the audited cells (local iteration on a
    // new row; the recorded PASS is always the full run)
    val only = args.toSet
    // fail fast on typos: a silently-dropped unknown name would leave
    // `audited` empty and die later with a bare NoSuchElementException
    val unknown = only -- Cells.toSet
    require(unknown.isEmpty,
      s"unknown cell(s): ${unknown.toSeq.sorted.mkString(", ")}\n" +
        s"known cells: ${Cells.mkString(", ")}")
    val audited = if (only.isEmpty) Cells else Cells.filter(only)
    val spark = Session.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // returns the cell's data term: micro-batch count for stream cells
    // (the scaled drive), 0 for batch cells (noop-sink execution)
    def exec(name: String, dir: String): Long =
      if (StreamCells.contains(name))
        graft.streaming.EventsStream.auditScaledStream(name, spark, dir)
      else AuditOverrides.get(name) match {
        case Some(drive) => drive(spark, dir); 0L
        case None =>
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          0L
      }

    // session-level warm-up at the smallest scale: JVM/codegen cost
    // must not be billed to the first audited cell
    try exec(audited.head, Scales.head._1) catch { case _: Throwable => () }

    val rows: Seq[(String, Seq[Double], Double, Seq[Long])] = audited.map { name =>
      val measured = Scales.map { case (dir, _) =>
        try {
          exec(name, dir) // untimed: artifact builds + per-scale codegen
          val samples = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            val b = exec(name, dir)
            ((System.nanoTime() - t0) / 1e9, b)
          }
          samples.minBy(_._1)
        } catch {
          case e: Throwable =>
            System.err.println(s"[scale] $name @ $dir failed: ${e.getMessage}")
            (-1.0, 0L)
        }
      }
      val times = measured.map(_._1)
      val batches = measured.map(_._2)
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
      (name, times, alpha, batches)
    }

    // reclaim every memoized artifact (incl. the split-events temp
    // copies) before the session goes away
    try graft.plans.Memo.drainAll() catch { case _: Throwable => () }
    spark.stop()

    // -1 is the failure sentinel throughout the JSON record: a NaN
    // exponent must not round to a perfect-looking 0.0, and a ratio
    // against a failed sample must not print as a negative time ratio
    def r3(v: Double): Double =
      if (v.isNaN) -1 else math.round(v * 1000) / 1000.0
    def ratio(num: Double, den: Double): Double =
      if (num > 0 && den > 0) r3(num / den) else -1
    // per-batch times for stream cells (the flat-ish gate's quantity)
    def perBatch(ts: Seq[Double], bs: Seq[Long], i: Int): Double =
      if (ts(i) > 0 && bs(i) > 0) ts(i) / bs(i) else -1.0
    rows.foreach { case (name, ts, a, bs) =>
      val decade1 = ratio(ts(1), ts(0))
      val decade2 = ratio(ts(2), ts(1))
      val extra = if (bs.exists(_ > 0))
        s""","batches":[${bs.mkString(",")}],""" +
          s""""per_batch":[${(0 to 2).map(i => r3(perBatch(ts, bs, i)))
            .mkString(",")}]"""
      else ""
      println(s"""{"cell":"$name","t_sf0.001":${r3(ts(0))},""" +
        s""""t_sf0.01":${r3(ts(1))},"t_sf0.1":${r3(ts(2))},""" +
        s""""decade_ratios":[$decade1,$decade2],"exponent":${r3(a)}$extra}""")
    }
    println()
    println("| cell | sf0.001 | sf0.01 | sf0.1 | ratio/decade | exponent α |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (name, ts, a, bs) =>
      val d1 = if (ts(0) > 0) f"${ts(1) / ts(0)}%.2f" else "-"
      val d2 = if (ts(1) > 0) f"${ts(2) / ts(1)}%.2f" else "-"
      def cell(i: Int): String =
        if (bs(i) > 0) f"${ts(i)}%.2f s (${bs(i)}b, ${perBatch(ts, bs, i)}%.2f/b)"
        else f"${ts(i)}%.2f s"
      println(s"| `$name` | ${cell(0)} | ${cell(1)} | ${cell(2)} " +
        f"| $d1 / $d2 | ${a}%.2f |")
    }
    val breaches = rows.filter { case (name, ts, a, bs) =>
      val pbBreach = StreamCells.contains(name) && {
        val pb1 = perBatch(ts, bs, 1)
        val pb2 = perBatch(ts, bs, 2)
        pb1 <= 0 || pb2 <= 0 || pb2 / pb1 >= MaxPerBatchRatio ||
          bs(2) <= bs(1) // the data term must actually grow
      }
      val decadeMax =
        if (StreamCells.contains(name)) StreamMaxDecadeRatio
        else MaxDecadeRatio
      a.isNaN || a >= MaxExponent ||
        (ts(1) > 0 && ts(2) / ts(1) >= decadeMax) || pbBreach
    }
    if (breaches.nonEmpty) {
      breaches.foreach { case (n, ts, a, bs) =>
        val d2 = if (ts(1) > 0) ts(2) / ts(1) else Double.NaN
        val pb = if (bs.exists(_ > 0)) {
          val pb1 = perBatch(ts, bs, 1)
          val pb2 = perBatch(ts, bs, 2)
          val r = if (pb1 > 0 && pb2 > 0) f"${pb2 / pb1}%.2f" else "-"
          s" per-batch ratio $r batches ${bs.mkString("/")}"
        } else ""
        val dm = if (StreamCells.contains(n)) StreamMaxDecadeRatio
          else MaxDecadeRatio
        System.err.println(
          f"[scale] GATE BREACH: $n exponent $a%.2f (max $MaxExponent) " +
            f"last-decade ratio $d2%.2f (max $dm)$pb")
      }
      sys.exit(1)
    }
    println(s"\n[scale] PASS: all ${rows.size} cells under exponent " +
      s"$MaxExponent, last-decade ratio $MaxDecadeRatio (batch) / " +
      s"$StreamMaxDecadeRatio (stream), and stream per-batch ratio " +
      s"$MaxPerBatchRatio")
  }
}
