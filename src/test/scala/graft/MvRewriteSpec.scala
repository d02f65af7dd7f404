package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Money._
import graft.plans.MvRewrite

/** The MV automatic-rewrite rule: fires on exactly the answerable
  * shapes, vetoes everything else, and is semantically invisible. */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def base: DataFrame = Tables.df(spark, TestSpark.Sf, "lineitem")

  /** Root paths of every file scan in the optimized plan (the plan's
    * string form does not render paths). */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  private def scansBase(df: DataFrame): Boolean =
    scanPaths(df).exists(_.endsWith("lineitem.parquet"))

  private def scansMv(df: DataFrame): Boolean =
    scanPaths(df).exists(_.contains("mv_lineitem_agg"))

  test("subset roll-up rewrites to the MV scan and equals the direct run") {
    MvRewrite.ensure(spark, TestSpark.Sf)
    def q = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), dsum(m(col("l_quantity"))).as("sq"),
        min(m(col("l_quantity"))).as("mn"),
        max(m(col("l_extendedprice"))).as("mx"))
      .orderBy(col("l_returnflag"))
    assert(scansMv(q), s"MV scan missing: ${scanPaths(q)}")
    assert(!scansBase(q), s"base scan kept: ${scanPaths(q)}")
    val rewritten = q.collect().toSeq
    spark.conf.set(MvRewrite.EnabledKey, "false")
    val direct =
      try { assert(scansBase(q)); q.collect().toSeq }
      finally spark.conf.set(MvRewrite.EnabledKey, "true")
    assert(rewritten == direct, "rewrite changed the answer")
  }

  test("full-dimension grouping rewrites too (exact-match case)") {
    MvRewrite.ensure(spark, TestSpark.Sf)
    val q = base
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .agg(count(lit(1)).as("n"))
    assert(scansMv(q) && !scansBase(q), scanPaths(q))
  }

  test("non-dimension keys, filters, and foreign aggregates all veto") {
    MvRewrite.ensure(spark, TestSpark.Sf)
    // grouping key outside the MV dimensions
    assert(scansBase(base.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))))
    // a filter between the aggregate and the scan is not answerable
    assert(scansBase(base.filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))))
    // an aggregate the summary has no partial for
    assert(scansBase(base.groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("a"))))
    // DISTINCT cannot roll up from counts
    assert(scansBase(base.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_linestatus")).as("d"))))
    // a raw double sum (no decimal cast) has no exact partial
    assert(scansBase(base.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"))))
    // a DIFFERENTLY-scaled decimal cast rounds per row before summing —
    // not reproducible from the Money-typed partials, so it vetoes
    assert(scansBase(base.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")
        .cast(org.apache.spark.sql.types.DecimalType(12, 0))).as("s"))))
    // a GLOBAL aggregate (no grouping) vetoes: Sum over an empty MV is
    // NULL where count must be 0
    assert(scansBase(base.agg(count(lit(1)).as("n"))))
  }

  test("incremental refresh equals a full rebuild, and the rewrite " +
      "serves from the refreshed artifact") {
    MvRewrite.ensureIncremental(spark, TestSpark.Sf)
    val incPath = spark.conf.get(MvRewrite.PathKey)
    assert(incPath.nonEmpty)
    // refreshed summary == one-shot rebuild over the full table
    val refreshed = spark.read.parquet(incPath)
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .collect().toSeq
    val full = base
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .agg(count(lit(1)).as("cnt"),
        sum(m(col("l_quantity"))).as("sum_l_quantity"),
        sum(m(col("l_extendedprice"))).as("sum_l_extendedprice"),
        min(m(col("l_quantity"))).as("min_l_quantity"),
        max(m(col("l_quantity"))).as("max_l_quantity"),
        min(m(col("l_extendedprice"))).as("min_l_extendedprice"),
        max(m(col("l_extendedprice"))).as("max_l_extendedprice"))
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .collect().toSeq
    assert(refreshed == full, "refresh diverged from the full rebuild")
    // the rewrite now reads THE refreshed artifact — the exact path
    // just registered, not merely any MV-suffixed one
    val q = base.groupBy(col("l_linestatus")).agg(count(lit(1)).as("n"))
    assert(scanPaths(q).exists(_.endsWith(incPath)) && !scansBase(q),
      s"expected $incPath in ${scanPaths(q)}")
  }

  test("two eligible aggregates in ONE query get distinct MV instances") {
    MvRewrite.ensure(spark, TestSpark.Sf)
    // A union of two roll-ups (and a self-join below) puts TWO rewritten
    // aggregates into one plan AFTER DeduplicateRelations has run —
    // splicing one shared plan object would duplicate exprIds and
    // mis-bind attributes. Each rewrite must splice a fresh instance.
    def side(d: String) = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).withColumn("side", lit(d))
    val u = side("a").unionByName(side("b")).orderBy(col("side"), col("l_returnflag"))
    assert(scansMv(u) && !scansBase(u), scanPaths(u))
    val mvScans = u.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] => lr
    }
    assert(mvScans.size == 2, s"expected two MV scans, got ${mvScans.size}")
    assert(mvScans(0).output.map(_.exprId).toSet
        .intersect(mvScans(1).output.map(_.exprId).toSet).isEmpty,
      "the two spliced MV scans share exprIds")
    val byFlag = side("a").drop("side").as("l")
      .join(side("b").drop("side").as("r"), Seq("l_returnflag"))
    assert(scansMv(byFlag) && !scansBase(byFlag), scanPaths(byFlag))
    spark.conf.set(MvRewrite.EnabledKey, "false")
    val direct = try byFlag.orderBy(col("l_returnflag")).collect().toSeq
      finally spark.conf.set(MvRewrite.EnabledKey, "true")
    assert(byFlag.orderBy(col("l_returnflag")).collect().toSeq == direct,
      "double rewrite changed the answer")
  }

  test("rewritten count keeps the original non-nullable schema") {
    MvRewrite.ensure(spark, TestSpark.Sf)
    val q = base.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(scansMv(q))
    assert(!q.queryExecution.optimizedPlan.schema("n").nullable,
      "count roll-up flipped nullability")
  }

  test("another table's identical shape is untouched (source pinning)") {
    MvRewrite.ensure(spark, TestSpark.Sf)
    val orders = Tables.df(spark, TestSpark.Sf, "orders")
    val q = orders.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(scanPaths(q).exists(_.endsWith("orders.parquet")) && !scansMv(q),
      scanPaths(q))
  }

  test("join-MV automatic rewrite: eligible joins scan only the view; " +
    "outer joins, interposed filters, and non-view columns veto") {
    import graft.plans.MvJoinRewrite
    MvJoinRewrite.ensure(spark, TestSpark.Sf)
    val orders = Tables.df(spark, TestSpark.Sf, "orders")
    val customer = Tables.df(spark, TestSpark.Sf, "customer")
    def eligible = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("c_nationkey").as("nat"))
    val q = eligible
    val paths = scanPaths(q)
    assert(paths.exists(_.contains("mv_orders_customer")),
      s"rewrite did not fire: $paths")
    assert(!paths.exists(p => p.endsWith("orders.parquet") ||
      p.endsWith("customer.parquet")),
      s"rewritten plan still scans a base table: $paths")
    // invisible in values: rule off must agree bit-for-bit
    val got = q.orderBy(col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    spark.conf.set(MvJoinRewrite.EnabledKey, "false")
    val want =
      try eligible.orderBy(col("o_orderkey")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      finally spark.conf.set(MvJoinRewrite.EnabledKey, "true")
    assert(got.nonEmpty && got == want, "rewrite changed the answer")
    // vetoes — each must keep scanning the base tables
    def scansBase(df: DataFrame): Boolean =
      scanPaths(df).exists(_.endsWith("orders.parquet"))
    assert(scansBase(orders
      .join(customer, col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), col("c_nationkey"))),
      "outer join was rewritten")
    // an ANSWERABLE filter (view columns only) no longer vetoes: the
    // inner join preserves single-side row predicates, so the rewrite
    // re-applies it on the view — and stays value-invisible
    def filtered = orders.filter(col("o_orderkey") > 100)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    assert(scanPaths(filtered).exists(_.contains("mv_orders_customer")) &&
      !scansBase(filtered),
      s"answerable filtered join not rewritten: ${scanPaths(filtered)}")
    val gotF = filtered.orderBy(col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    spark.conf.set(MvJoinRewrite.EnabledKey, "false")
    val wantF =
      try filtered.orderBy(col("o_orderkey")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      finally spark.conf.set(MvJoinRewrite.EnabledKey, "true")
    assert(gotF.nonEmpty && gotF == wantF,
      "filtered rewrite changed the answer")
    // a NON-view-column filter still vetoes (fail closed)
    assert(scansBase(orders.filter(col("o_orderdate") > "1995-01-01")
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))),
      "a non-view-column filter was rewritten")
    assert(scansBase(orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("c_nationkey"))),
      "a non-view column was rewritten")
  }

  test("join+agg composed rewrite: summary scanned, partials rolled " +
    "up exactly; non-dim keys, foreign aggregates, DISTINCT, and " +
    "filtered joins all veto; a stale fingerprint silences the rule") {
    import graft.plans.MvJoinRewrite
    MvJoinRewrite.ensure(spark, TestSpark.Sf)
    val orders = Tables.df(spark, TestSpark.Sf, "orders")
    val customer = Tables.df(spark, TestSpark.Sf, "customer")
    def joined = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
    def eligible = joined.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), dsum(m(col("o_totalprice"))).as("sp"))
    val q = eligible
    val paths = scanPaths(q)
    assert(paths.exists(_.contains("mv_oc_agg")),
      s"agg rewrite did not fire: $paths")
    assert(!paths.exists(p => p.endsWith("orders.parquet") ||
      p.endsWith("customer.parquet")),
      s"rewritten agg still scans a base table: $paths")
    // invisible in values (exact decimal partial roll-up)
    val got = q.orderBy(col("c_nationkey")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.conf.set(MvJoinRewrite.EnabledKey, "false")
    val want =
      try eligible.orderBy(col("c_nationkey")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      finally spark.conf.set(MvJoinRewrite.EnabledKey, "true")
    assert(got.nonEmpty && got == want, "agg rewrite changed the answer")
    // full-dims grouping rewrites too (exact-match case)
    val full = joined.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(full).exists(_.contains("mv_oc_agg")),
      scanPaths(full))
    // vetoes — each must keep scanning the base fact
    def scansOrders(df: DataFrame): Boolean =
      scanPaths(df).exists(_.endsWith("orders.parquet"))
    // a non-dimension grouping key vetoes the SUMMARY — and then falls
    // back to the flat join view (the chained composition): grouping
    // over the pre-joined rows is always answerable, pre-aggregation
    // only when the keys are summary dims
    val nonDim = joined.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    assert(!scanPaths(nonDim).exists(_.contains("mv_oc_agg")),
      "a non-dimension grouping key was served from the summary")
    assert(scanPaths(nonDim).exists(_.contains("mv_orders_customer")),
      "the flat-view fallback did not fire under the vetoed aggregate")
    // unrecognized aggregates likewise veto the summary (values could
    // differ — avg needs both partials, DISTINCT and per-row-rounded
    // sums are unreproducible) while the flat view stays fair game
    def summaryVetoed(df: DataFrame, what: String): Unit =
      assert(!scanPaths(df).exists(_.contains("mv_oc_agg")),
        s"$what was served from the pre-aggregated summary")
    summaryVetoed(joined.groupBy(col("c_nationkey"))
      .agg(avg(col("o_totalprice")).as("a")), "a foreign aggregate (avg)")
    summaryVetoed(joined.groupBy(col("c_nationkey"))
      .agg(countDistinct(col("o_custkey")).as("n")), "a DISTINCT aggregate")
    summaryVetoed(joined.groupBy(col("c_nationkey"))
      .agg(sum(col("o_totalprice")).as("s")),
      "a raw-double sum (no Money cast)")
    // a DIM filter composes with the summary (per-dim-value partials
    // drop whole groups exactly as base rows drop) — and stays exact
    def dimFiltered = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), dsum(m(col("o_totalprice"))).as("sp"))
    assert(scanPaths(dimFiltered).exists(_.contains("mv_oc_agg")),
      s"dim-filtered aggregate not served from the summary: " +
        s"${scanPaths(dimFiltered)}")
    val gotD = dimFiltered.orderBy(col("c_nationkey")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.conf.set(MvJoinRewrite.EnabledKey, "false")
    val wantD =
      try dimFiltered.orderBy(col("c_nationkey")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      finally spark.conf.set(MvJoinRewrite.EnabledKey, "true")
    assert(gotD.nonEmpty && gotD == wantD,
      "dim-filtered summary rewrite changed the answer")
    // a MEASURE filter vetoes the summary (partials can't re-filter
    // rows) but falls back to the flat view (answerable there)
    val measureFiltered = orders.filter(col("o_totalprice") > 1000)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    assert(!scanPaths(measureFiltered).exists(_.contains("mv_oc_agg")),
      "a measure-filtered aggregate was served from the summary")
    assert(scanPaths(measureFiltered)
      .exists(_.contains("mv_orders_customer")),
      "the flat-view fallback did not fire under the measure filter")
    // a NON-view-column filter vetoes everything
    assert(scansOrders(orders.filter(col("o_orderdate") > "1995-01-01")
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))),
      "a non-view-column filter's aggregate was rewritten")
    // freshness guard: a descriptor whose recorded fingerprint no
    // longer matches the base files must veto (fail closed)
    val live = spark.conf.get(MvJoinRewrite.ViewsKey)
    val realFp = MvJoinRewrite.fingerprint(
      spark, s"${TestSpark.Sf}/orders.parquet")
    assert(realFp != "stale" && realFp != "absent")
    MvJoinRewrite.register(MvJoinRewrite.JoinViewDesc(
      "stale_oc",
      s"${TestSpark.Sf}/orders.parquet",
      s"${TestSpark.Sf}/customer.parquet",
      "stale", "stale",
      Set("o_custkey", "c_custkey"),
      Map("c_custkey" -> "o_custkey"),
      Set("o_orderkey", "o_custkey", "o_totalprice", "c_nationkey"),
      paths.find(_.contains("mv_oc_agg")).get))
    spark.conf.set(MvJoinRewrite.ViewsKey, "stale_oc")
    try {
      val v = joined.select(col("o_orderkey"), col("c_nationkey"))
      assert(scansOrders(v),
        "a stale-fingerprint view served the rewrite")
    } finally spark.conf.set(MvJoinRewrite.ViewsKey, live)
  }

  test("join-view IVM: maintained view equals the full recompute, the " +
    "base fact table is never rescanned, and the stored view is frozen") {
    import graft.operators.Dml
    val df = Dml.dmlMvJoinDelta.run(spark, TestSpark.Sf)
    // the IVM plan property: no orders scan anywhere — the refresh
    // reads the stored view, the materialized delta, and the dimension
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("graft-mvjoin")),
      s"maintained view does not read the stored view: $paths")
    assert(!paths.exists(_.endsWith("orders.parquet")),
      s"IVM rescanned the base fact table: $paths")
    val root = Dml.mvJoinRoot(spark, TestSpark.Sf)
    def inv(): Seq[(String, Long, Long)] =
      Option(new java.io.File(s"$root/v0").listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("_"))
        .map(f => (f.getName, f.length(), f.lastModified())).sortBy(_._1)
    val before = inv()
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inv() == before, "refresh rewrote the stored view")
    // full recompute over the upserted base — the delta rules' truth
    val base = Tables.df(spark, TestSpark.Sf, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      (graft.functions.Money.m(col("o_totalprice")) * lit(100))
        .cast("long").as("cents"),
      org.apache.spark.sql.functions.year(col("o_orderdate")).cast("int")
        .as("yr"))
    val batch = Dml.sharedMvJoinBatch(spark, TestSpark.Sf)
    val upserted = base
      .join(batch.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"), col("cents"))
      .unionByName(batch)
    val want = upserted
      .join(Tables.df(spark, TestSpark.Sf, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").as("nat")), Seq("o_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("cents"))
      .orderBy(col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == want,
      "incrementally maintained view diverged from the recompute")
  }

  test("fingerprint is recursive and content-digested: a hive-partitioned " +
    "base lists its leaf files, and a new leaf in a subdir flips it") {
    import graft.plans.MvJoinRewrite
    val root = java.nio.file.Files
      .createTempDirectory("graft_fp_part_").toString
    spark.range(10).select(col("id"), (col("id") % 2).as("p"))
      .write.partitionBy("p").parquet(s"$root/t")
    val fp1 = MvJoinRewrite.fingerprint(spark, s"$root/t")
    assert(fp1 != "absent" && !fp1.startsWith("0:"),
      s"partitioned base fingerprinted as empty inventory: $fp1")
    // a change INSIDE a partition subdir (top-level listing unchanged)
    // must flip the digest — the r17 gap: a non-recursive listing saw
    // an empty inventory here and staleness was invisible
    spark.range(3).select(lit(99L).as("id"))
      .write.mode("append").parquet(s"$root/t/p=0")
    val fp2 = MvJoinRewrite.fingerprint(spark, s"$root/t")
    assert(fp2 != fp1, "leaf append under a partition dir did not change " +
      "the fingerprint")
  }

  test("join-view rewrite over a hive-partitioned base: serves the view " +
    "while fresh, vetoes (fail closed) after a leaf changes") {
    import graft.plans.MvJoinRewrite
    val root = java.nio.file.Files
      .createTempDirectory("graft_fp_veto_").toString
    val fact = s"$root/fact"
    val dim = s"$root/dim"
    spark.range(20).select(col("id").as("f_k"), (col("id") * 2).as("f_v"),
      (col("id") % 2).as("p")).write.partitionBy("p").parquet(fact)
    spark.range(5).select(col("id").as("d_k"), (col("id") + 7).as("d_v"))
      .write.parquet(dim)
    spark.read.parquet(fact)
      .join(spark.read.parquet(dim), col("f_k") === col("d_k"))
      .select(col("f_k"), col("f_v"), col("d_v"))
      .write.parquet(s"$root/mv_part_fd")
    MvJoinRewrite.register(s"$root::part_fd", MvJoinRewrite.JoinViewDesc(
      "part_fd", fact, dim,
      MvJoinRewrite.fingerprint(spark, fact),
      MvJoinRewrite.fingerprint(spark, dim),
      Set("f_k", "d_k"), Map("d_k" -> "f_k"),
      Set("f_k", "f_v", "d_v"), s"$root/mv_part_fd"))
    val live = spark.conf.getOption(MvJoinRewrite.ViewsKey).getOrElse("")
    spark.conf.set(MvJoinRewrite.ViewsKey, s"$root::part_fd")
    spark.conf.set(MvJoinRewrite.EnabledKey, "true")
    try {
      def q = spark.read.parquet(fact)
        .join(spark.read.parquet(dim), col("f_k") === col("d_k"))
        .select(col("f_k"), col("f_v"), col("d_v"))
      assert(scanPaths(q).exists(_.contains("mv_part_fd")),
        s"fresh partitioned base did not serve the view: ${scanPaths(q)}")
      // invalidate a LEAF under a partition dir; top-level names same
      spark.range(1).select(lit(77L).as("f_k"), lit(0L).as("f_v"))
        .write.mode("append").parquet(s"$fact/p=1")
      assert(!scanPaths(q).exists(_.contains("mv_part_fd")),
        "stale partitioned base still served the view (fail-open)")
    } finally spark.conf.set(MvJoinRewrite.ViewsKey, live)
  }
}
