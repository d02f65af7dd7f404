package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RangeSource

/** Plan-shape assertions mirroring the reference's rule tests
  * (doradb-plan/src/rule inline tests, SURVEY §5): we assert the
  * *capability* — pushdown happened, small sides broadcast, top-k fused —
  * not literal node sequences (Catalyst may legally do better).
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planOf(q: Q): String =
    q.run(spark, TestSpark.Sf).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed down to the parquet scan") {
    val plan = planOf(graft.tpch.Tpch.q1)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushdown in:\n$plan")
  }

  test("q1: aggregation is partial (map-side combine before the shuffle)") {
    val plan = planOf(graft.tpch.Tpch.q1)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg in:\n$plan")
  }

  test("q5: dimension tables join via broadcast, not shuffle") {
    val plan = planOf(graft.tpch.Tpch.q5)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("decontamination joins gram hashes via broadcast of the benchmark side") {
    val plan = planOf(graft.operators.Corpus.decontaminateNgram)
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set did not broadcast:\n$plan")
  }

  test("q6: scan reads only the 4 needed columns (pruning)") {
    val plan = planOf(graft.tpch.Tpch.q6)
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("l_shipdate") && readSchema.contains("l_discount")
      && !readSchema.contains("l_orderkey"), s"bad ReadSchema: $readSchema")
  }

  test("top-k fuses sort+limit into TakeOrderedAndProject") {
    val plan = planOf(graft.operators.Relational.topK)
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k fusion in:\n$plan")
  }

  test("reservoir sample plans as distributed top-k, not a global sort") {
    val plan = planOf(graft.operators.Corpus.sampleReservoir)
    assert(plan.contains("TakeOrderedAndProject"),
      s"no top-k fusion in:\n$plan")
  }

  test("whole-stage codegen covers the q1 pipeline") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // AQE materializes the final (codegen'd) plan only after execution.
    val df = graft.tpch.Tpch.q1.run(spark, TestSpark.Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    // codegen'd stages print as "*(n) Operator" in the plan string
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined, s"no codegen in:\n$plan")
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti (no row explosion)") {
    val semi = planOf(graft.operators.Relational.joinSemi)
    val anti = planOf(graft.operators.Relational.joinAnti)
    assert(semi.contains("LeftSemi"), s"no semi join in:\n$semi")
    assert(anti.contains("LeftAnti"), s"no anti join in:\n$anti")
  }

  test("row-tuple IN subquery plans as a two-key LeftSemi, no nested loop") {
    val plan = planOf(graft.operators.Relational.subqRowTupleIn)
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"tuple IN degenerated to a product in:\n$plan")
    // both tuple fields participate in the equi-join key
    assert(plan.contains("o_custkey") && plan.contains("o_orderdate"),
      s"compound key missing in:\n$plan")
  }

  test("range join stays an equi-join on (user, bin), never a nested loop") {
    val plan = planOf(graft.operators.Temporal.rangeViewPurchase)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("asof join is one shuffle: union feeds a single user-window") {
    val plan = planOf(graft.operators.Temporal.asofPurchaseView)
    assert(plan.contains("Union") && plan.contains("Window"), s"unexpected shape:\n$plan")
    assert(!plan.contains("Join"), s"asof should not plan any join:\n$plan")
  }

  test("rollup plans an Expand over the grouping sets") {
    val plan = planOf(graft.operators.Relational.aggRollup)
    assert(plan.contains("Expand"), s"no Expand in:\n$plan")
  }

  test("pivot compiles to a single aggregation, no join") {
    val plan = planOf(graft.operators.Relational.pivotStatus)
    assert(plan.contains("HashAggregate") && !plan.contains("Join"),
      s"unexpected pivot shape:\n$plan")
  }

  test("nearest as-of join stays bin-equi-joined, never a nested loop") {
    val plan = planOf(graft.operators.Temporal.asofNearestQ)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
      s"nearest as-of degenerated to a nested loop:\n$plan")
  }

  test("PPS-WoR sample plans as distributed top-k, not a global sort") {
    val plan = planOf(graft.operators.Corpus.samplePpswor)
    assert(plan.contains("TakeOrderedAndProject"),
      s"no top-k fusion in:\n$plan")
  }

  test("BM25 scoring broadcasts the query-term and corpus-stats sides") {
    val plan = planOf(graft.operators.TextAnalysis.textBm25)
    assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
      s"BM25 did not broadcast its model-sized sides:\n$plan")
    // the corpus-sized tf relation must never be the built (broadcast)
    // side of a shuffle — the only shuffles allowed are the groupBys
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("DSv2 range source: bounds push, columns prune, slices partition") {
    import org.apache.spark.sql.functions._
    def table = spark.read
      .format(classOf[graft.sources.RangeTableProvider].getName)
      .option("end", "100000").option("slices", "8").load()
    // range predicates reach the source as narrowed interval bounds;
    // the hash predicate stays residual (pushed count excludes it)
    val filtered = table.filter(col("id") >= 1000 && col("id") < 50000
      && col("h") % 10 === 3)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[1000, 50000)"),
      s"id bounds not pushed into the source:\n$plan")
    assert(plan.contains("pushed=2"), s"expected 2 pushed filters:\n$plan")
    // the residual still filters: digit-3 hashes only
    assert(filtered.select("h").collect().forall(_.getLong(0) % 10 == 3))
    // column pruning: an id-only projection never materializes sq or h
    val pruned = table.filter(col("id") < 10).select(col("id"))
      .queryExecution.executedPlan.toString
    assert(pruned.contains("cols=id") && !pruned.contains("sq"),
      s"projection not pruned at the source:\n$pruned")
    // source-side parallelism: 8 input partitions, disjoint and complete
    assert(table.rdd.getNumPartitions == 8)
    assert(table.count() == 100000L)
  }

  test("DSv2 SMA zone maps: synopses skip partitions, stats report narrowed") {
    import org.apache.spark.sql.functions._
    def table = spark.read
      .format(classOf[graft.sources.RangeTableProvider].getName)
      .option("end", "100000").option("slices", "8").load()
    // sq is synopsis-covered (monotone: slice [s,e) has sq ∈ [s²,(e-1)²]):
    // sq < 1e8 ⇒ id < 10000 ⇒ only the first 12500-wide slice can match
    val zoned = table.filter(col("sq") < 100000000L)
    assert(zoned.rdd.getNumPartitions == 1,
      s"zone map did not skip partitions: ${zoned.rdd.getNumPartitions}")
    assert(zoned.count() == 10000L) // residual still filters row-level
    val plan = zoned.queryExecution.executedPlan.toString
    assert(plan.contains("parts=1/8") && plan.contains("zone=1"),
      s"zone skip not surfaced in scan description:\n$plan")
    // h carries NO synopsis — a predicate on it must not skip anything
    val unzoned = table.filter(col("h") < 100)
    assert(unzoned.rdd.getNumPartitions == 8,
      "synopsis-less column must never skip partitions")
    // SupportsReportStatistics: the planner sees the narrowed scan
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    def scanStats(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r.stats.sizeInBytes
      }.get
    val full = scanStats(table)
    assert(scanStats(zoned) < full,
      "zone-skipped scan must report smaller size than the full table")
    assert(scanStats(table.filter(col("id") < 10).select(col("id"))) < full,
      "pushdown+pruned scan must report smaller size than the full table")
  }

  test("DSv2 aggregate/limit/top-N pushdown + columnar read path") {
    import org.apache.spark.sql.functions._
    def table = spark.read
      .format(classOf[graft.sources.RangeTableProvider].getName)
      .option("end", "100000").option("slices", "8").load()
    // COUNT/MIN/MAX/SUM answer from closed forms: one partition, no rows
    val agg = table.filter(col("id") >= 10 && col("id") < 1000)
      .agg(count(lit(1)), min(col("id")), max(col("id")), sum(col("id")))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.contains("agg-pushdown"),
      s"aggregate not pushed into the source:\n$aggPlan")
    val row = agg.collect()(0)
    assert(row.getLong(0) == 990L && row.getLong(1) == 10L &&
      row.getLong(2) == 999L && row.getLong(3) == (10L + 999L) * 990L / 2)
    // a residual-bearing filter must NOT push the aggregate (wrong rows)
    val resid = table.filter(col("h") % 10 === 3).agg(count(lit(1)))
    assert(!resid.queryExecution.executedPlan.toString
      .contains("agg-pushdown"))
    assert(resid.collect()(0).getLong(0) ==
      (0L until 100000L).count(RangeSource.hash(_) % 10 == 3))
    // LIMIT truncates the generated interval at the source
    val lim = table.limit(7)
    assert(lim.queryExecution.executedPlan.toString
      .contains("bounds=[0, 7) ") && lim.count() == 7)
    // ORDER BY id ASC LIMIT pushes as top-N (native order); DESC cannot
    val topAsc = table.orderBy(col("id")).limit(5)
    assert(topAsc.queryExecution.executedPlan.toString
      .contains("limited=true"))
    assert(topAsc.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
    val topDesc = table.orderBy(col("id").desc).limit(5)
    assert(!topDesc.queryExecution.executedPlan.toString
      .contains("limited=true"))
    assert(topDesc.collect().map(_.getLong(0)).toSeq ==
      Seq(99999L, 99998L, 99997L, 99996L, 99995L))
    // the plain scan reads COLUMNAR: batches bridge through ColumnarToRow
    val scanPlan = table.filter(col("id") < 1000)
      .queryExecution.executedPlan.toString
    assert(scanPlan.contains("ColumnarToRow"),
      s"scan did not take the columnar path:\n$scanPlan")
    assert(table.filter(col("id") < 1000)
      .agg(sum(col("sq"))).collect()(0).getLong(0) ==
      (0L until 1000L).map(i => i * i).sum)
  }

  test("rank <= k filter plans as WindowGroupLimit (per-group top-k prune)") {
    // Catalyst's InferWindowGroupLimit turns a rank()<=k filter over a
    // window into a per-partition group limit BEFORE the full window
    // sort materializes — each group keeps k rows early instead of
    // ranking everything and discarding. The 100 TB difference between
    // 'rank all orders per customer' and 'keep 3 per customer'.
    Tables.registerAll(spark, TestSpark.Sf)
    val plan = spark.sql(graft.operators.Relational.windowRank.oracle.get)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k did not fuse into WindowGroupLimit:\n$plan")
  }

  test("DSv2 runtime filtering: join keys narrow the scan at execution") {
    import org.apache.spark.sql.functions._
    graft.sources.RangeSource.lastRuntimeBounds = None
    val fact = spark.read
      .format(classOf[graft.sources.RangeTableProvider].getName)
      .option("end", "100000").option("slices", "8").load()
    // a selective dim: 10 keys clustered in [40000, 40900]
    val dim = spark.range(0, 1000)
      .select((col("id") * 100).as("k"), (col("id") % 100).as("cat"))
      .filter(col("cat") === 4 && col("k") >= 40000 && col("k") < 41000)
    val joined = fact.join(dim, col("id") === col("k"))
      .select(col("id"), col("sq"))
    val rows = joined.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq ==
      Seq(40400L), s"unexpected join result: ${rows.toSeq}")
    // the runtime IN-filter reached the scan and narrowed its interval
    val narrowed = graft.sources.RangeSource.lastRuntimeBounds
    assert(narrowed.isDefined, "runtime filter never reached the source " +
      "(SupportsRuntimeV2Filtering not applied)")
    val (rlo, rhi) = narrowed.get
    assert(rlo >= 40000L && rhi <= 41000L,
      s"runtime bounds not narrowed: [$rlo, $rhi)")
  }

  test("segment column reads as a CONSTANT vector (Codec::Single mirror)") {
    // `seg` = id div 16384 is block-constant; the columnar reader caps
    // batches at segment boundaries and serves it via a
    // ConstantColumnVector — one value per batch, not one putLong per
    // row. Value-check against the closed form AND witness the
    // constant-vector path actually firing.
    import org.apache.spark.sql.functions._
    graft.sources.RangeSource.constantSegBatches.reset()
    val table = spark.read
      .format(classOf[graft.sources.RangeTableProvider].getName)
      .option("end", "100000").option("slices", "8").load()
    val got = table.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
        max(col("id")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    val segRows = graft.sources.RangeSource.SegRows
    val want = (0L until 100000L).groupBy(_ / segRows).toSeq
      .map { case (s, ids) => (s, ids.length.toLong, ids.min, ids.max) }
      .sortBy(_._1)
    assert(got.toSeq == want, "seg grouping diverged from id div SegRows")
    assert(graft.sources.RangeSource.constantSegBatches.sum() > 0,
      "no batch served seg through the constant vector")
    // the scan stayed columnar with the constant vector in the batch
    val plan = table.select(col("seg"), col("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"seg projection fell off the columnar path:\n$plan")
    // and a seg-less projection is untouched (no boundary capping,
    // no constant vectors involved)
    graft.sources.RangeSource.constantSegBatches.reset()
    assert(table.select(col("id")).filter(col("id") < 10).count() == 10)
    assert(graft.sources.RangeSource.constantSegBatches.sum() == 0)
    // segment ELIMINATION: seg predicates are exact id-bound
    // translations, so they push fully into the scan (block pruning
    // from block-id arithmetic, no residual filter left for Spark)
    val eq = table.filter(col("seg") === 3)
    assert(eq.queryExecution.executedPlan.toString
      .contains(s"bounds=[${3 * segRows}, ${4 * segRows}) "),
      "seg equality did not narrow the generated interval")
    assert(eq.count() == segRows)
    val lt = table.filter(col("seg") < 2).select(col("id"))
    assert(lt.queryExecution.executedPlan.toString
      .contains(s"bounds=[0, ${2 * segRows}) "))
    assert(lt.count() == 2 * segRows)
  }

  test("par column reads as a packed BITMAP vector (Codec::Bitmap " +
      "mirror) — the codec enum's third member, alongside constant " +
      "and array vectors") {
    import org.apache.spark.sql.functions._
    graft.sources.RangeSource.bitmapParBatches.reset()
    val table = spark.read
      .format(classOf[graft.sources.RangeTableProvider].getName)
      .option("end", "100000").option("slices", "8").load()
    // value-check: id parity splits the interval exactly in half, and
    // the parity-conditional sums match the closed forms
    val got = table.groupBy(col("par"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val evens = (0L until 100000L).filter(_ % 2 == 0)
    val odds = (0L until 100000L).filter(_ % 2 == 1)
    assert(got.toSeq == Seq(
      (false, odds.length.toLong, odds.sum),
      (true, evens.length.toLong, evens.sum)))
    assert(graft.sources.RangeSource.bitmapParBatches.sum() > 0,
      "no batch served par through the bitmap vector")
    // all three codec kinds coexist in ONE batch: par (bitmap), seg
    // (constant), id (array) — and the scan stays columnar
    graft.sources.RangeSource.bitmapParBatches.reset()
    graft.sources.RangeSource.constantSegBatches.reset()
    val mixed = table.select(col("id"), col("seg"), col("par"))
    assert(mixed.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"),
      "mixed-codec projection fell off the columnar path")
    // aggregate over all three columns so pruning keeps each codec
    // live (count() alone would prune id and seg away)
    val r = mixed.filter(col("par"))
      .agg(sum(col("id")).as("s"), max(col("seg")).as("m"))
      .collect()(0)
    assert(r.getLong(0) == evens.sum &&
      r.getLong(1) == (100000L - 2) / graft.sources.RangeSource.SegRows)
    assert(graft.sources.RangeSource.bitmapParBatches.sum() > 0)
    assert(graft.sources.RangeSource.constantSegBatches.sum() > 0)
    // a par-less projection touches no bitmap vector
    graft.sources.RangeSource.bitmapParBatches.reset()
    assert(table.select(col("id")).filter(col("id") < 10).count() == 10)
    assert(graft.sources.RangeSource.bitmapParBatches.sum() == 0)
  }

  test("PSMA positional lookup: h equality reads only the probed " +
      "sub-range inside each partition") {
    // the zone map cannot skip on the hash column (its min/max spans
    // the domain in any non-trivial partition); the PSMA position
    // table still bounds WHERE in the partition a value can sit —
    // the reference's intra-block lookup (col/sma.rs:255-345)
    import org.apache.spark.sql.functions._
    graft.sources.RangeSource.psmaSkippedRows.reset()
    val table = spark.read
      .format(classOf[graft.sources.RangeTableProvider].getName)
      .option("end", "100000").option("slices", "8").load()
    val probe = 54321L
    val v = graft.sources.RangeSource.hash(probe)
    val q = table.filter(col("h") === v).select(col("id"), col("h"))
    // multiplication by an odd constant mod 2^32 is injective on this
    // id range: exactly one matching row, value-correct
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((probe, v)))
    // the probe is visible in the scan description; on a UNIFORM hash
    // column equal-bucket values scatter across the block, so the
    // sub-range honestly degrades toward the whole partition (the
    // reference's PSMA has the same property) — only edge runs trim
    assert(q.queryExecution.executedPlan.toString.contains("psma=1"),
      "h equality not remembered as a PSMA probe")
    assert(graft.sources.RangeSource.psmaSkippedRows.sum() > 0L,
      "PSMA probe never consulted")
    // absence: a value under every partition's min is proven absent by
    // the synopsis min/max — zero rows, every row skipped
    graft.sources.RangeSource.psmaSkippedRows.reset()
    assert(table.filter(col("h") === 1L).count() == 0)
    assert(graft.sources.RangeSource.psmaSkippedRows.sum() > 90000L,
      "absent-value probe did not skip")
    // where PSMA shines — a CLUSTERED (here monotone) column: the sq
    // zone map eliminates 7 of 8 partitions, and inside the survivor
    // the position table narrows to the value's leading-byte run,
    // ~1/256th of the block instead of all 12500 rows
    graft.sources.RangeSource.psmaSkippedRows.reset()
    val sqProbe = 54321L * 54321L
    val sq = table.filter(col("sq") === sqProbe).select(col("id"))
    assert(sq.collect().map(_.getLong(0)).toSeq == Seq(54321L))
    val sqSkipped = graft.sources.RangeSource.psmaSkippedRows.sum()
    assert(sqSkipped > 12000L,
      s"sq PSMA skipped only $sqSkipped of the surviving partition")
    // control: probes only fire for equality — a plain range query
    // touches no PSMA
    graft.sources.RangeSource.psmaSkippedRows.reset()
    assert(table.filter(col("id") < 100).count() == 100)
    assert(graft.sources.RangeSource.psmaSkippedRows.sum() == 0)
  }

  test("retrieval fusion/expansion plans stay broadcast-shaped") {
    // the RRF and PRF compositions promise k-bounded broadcast joins:
    // no cartesian product anywhere, the explicit candidate cross a
    // broadcast nested loop, and the bounded-list lookups broadcast
    // hash joins — the shapes that survive a corpus 100x this size
    val ranked = graft.operators.Similarity.rrfBuild(spark, TestSpark.Sf)
    val rrfPlan = ranked.queryExecution.executedPlan.toString
    assert(!rrfPlan.contains("CartesianProduct"),
      s"RRF plan degraded to a cartesian:\n$rrfPlan")
    assert(rrfPlan.contains("BroadcastNestedLoopJoin"),
      "RRF candidate cross lost its broadcast hint")
    // the fusion bottoms out in the two SHARED stored lists — never a
    // corpus re-scan on consumption
    assert(ranked.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      "RRF fusion re-derives from the corpus instead of stored lists")
    // PRF materializes its PrfTerms·queries-row result and frees the
    // token stream before returning — so the consumable plan must
    // bottom out in stored blocks (no corpus re-scan on consumption),
    // which is exactly its single-pass promise
    val prf = graft.operators.Similarity.prfExpansion
      .run(spark, TestSpark.Sf)
    assert(prf.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      "PRF output re-derives from the corpus instead of stored blocks")
  }

  test("runtime narrowing is refused on a limit-pushed scan") {
    // pushLimit truncates hi to honor an already-eliminated LIMIT; a
    // later runtime filter narrowing the same interval would return
    // fewer rows than that promise. The combination is planner-
    // unreachable today, but the scan refuses it structurally.
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("id", LongType)))
    val pred = new Predicate("IN", Array(
      Expressions.column("id"),
      Expressions.literal(java.lang.Long.valueOf(40L)),
      Expressions.literal(java.lang.Long.valueOf(50L))))
    def spanAfterFilter(limited: Boolean): Long = {
      val scan = new graft.sources.RangeScan(
        0L, 100L, 4, schema, 0, limited = limited)
      scan.filter(Array(pred))
      scan.planInputPartitions().map {
        case graft.sources.RangePartition(a, b) => b - a
      }.sum
    }
    assert(spanAfterFilter(limited = false) == 11L,
      "runtime IN-filter should narrow an unlimited scan to [40, 51)")
    assert(spanAfterFilter(limited = true) == 100L,
      "limit-pushed scan accepted runtime narrowing — row-count promise broken")
  }

  test("V2 catalog: identifiers resolve, pushdown survives, writes refuse") {
    // multi-part identifier resolution, straight through SQL
    val df = spark.sql(
      "select count(*) as n from graft_cat.gen.range_1000 where id >= 900")
    assert(df.collect()(0).getLong(0) == 100L)
    // the catalog route loses nothing: the bound still pushes
    val plan = spark.sql(
      "select id from graft_cat.gen.range_1000 where id >= 900")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[900, 1000)"),
      s"pushdown lost through the catalog route:\n$plan")
    // SHOW TABLES sees the namespace; unknown identifiers error cleanly
    val listed = spark.sql("show tables in graft_cat.gen")
      .collect().map(_.getString(1))
    assert(listed.contains("range_100000"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select * from graft_cat.gen.nope").collect()
    }
    // derived catalog: dropTable reports false, and the identifier
    // still resolves afterwards — DDL cannot remove a derived table
    spark.sql("drop table graft_cat.gen.range_1000")
    assert(spark.sql("select count(*) from graft_cat.gen.range_1000")
      .collect()(0).getLong(0) == 1000L)
    // mutation DDL refuses outright
    intercept[Exception] {
      spark.sql("create table graft_cat.gen.range_5 (id bigint)")
    }
  }
}
