package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth beyond the parquet fixtures (CSV/JSON round-trip)
  * and the bucketing scale tool: co-located joins with no shuffle.
  */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("events reader fails loudly on an unexpected ts parquet type") {
    import org.apache.spark.sql.functions._
    // a hypothetical future fixture vintage shipping ts as STRING must
    // surface as an error at the reader, not a silent cast that every
    // downstream events query inherits
    val dir = java.nio.file.Files
      .createTempDirectory("graft-events-guard").toString
    spark.range(3).select(col("id").as("user_id"),
        lit("click").as("event_type"), lit("2020-01-01T00:00:00").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](
      Tables.df(spark, dir, "events"))
    assert(e.getMessage.contains("unsupported"), e.getMessage)
  }

  test("corrupt parquet object is skipped, losing nothing else") {
    import org.apache.spark.sql.functions._
    val n = Tables.df(spark, TestSpark.Sf, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-corrupt").toString
    n.write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-bad.parquet"),
      "garbage".getBytes)
    // without the option the scan fails on the bad footer ...
    intercept[Exception](
      spark.read.schema(n.schema).parquet(dir).count())
    // ... with it, exactly the good rows survive
    val back = spark.read.schema(n.schema)
      .option("ignoreCorruptFiles", "true").parquet(dir)
    assert(back.count() == n.count())
  }

  test("CSV and JSON round-trip the nation table losslessly") {
    val n = Tables.df(spark, TestSpark.Sf, "nation")
    val base = n.collect().map(_.toSeq).toSet
    val dir = "/tmp/graft-io"
    n.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    n.write.mode("overwrite").json(s"$dir/nation_json")
    val csv = spark.read.schema(n.schema).option("header", "true")
      .csv(s"$dir/nation_csv")
    val jsn = spark.read.schema(n.schema).json(s"$dir/nation_json")
    assert(csv.collect().map(_.toSeq).toSet == base)
    assert(jsn.collect().map(_.toSeq).toSet == base)
  }

  test("ORC round-trips the nation table losslessly, schema preserved") {
    val n = Tables.df(spark, TestSpark.Sf, "nation")
    val base = n.collect().map(_.toSeq).toSet
    val dir = "/tmp/graft-io/nation_orc"
    n.write.mode("overwrite").orc(dir)
    val orc = spark.read.orc(dir)
    // ORC files carry their own schema (unlike CSV/JSON above): the
    // read-back types must match without supplying one
    assert(orc.schema == n.schema)
    assert(orc.collect().map(_.toSeq).toSet == base)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val s = spark
    s.sql("drop table if exists b_orders")
    s.sql("drop table if exists b_lineitem")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear them or CTAS refuses
    Seq("b_orders", "b_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft-warehouse/$t"))
    }
    Tables.df(s, TestSpark.Sf, "orders").select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.df(s, TestSpark.Sf, "lineitem").select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // broadcast would bypass the bucketing path; force the shuffle planner
    val saved = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = s.table("b_orders").join(s.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val phys = j.queryExecution.executedPlan.toString
      assert(!phys.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$phys")
      assert(j.count() > 0)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("compaction collapses a 64-file table without changing content") {
    import graft.operators.Dml
    val s = spark
    s.sql("drop table if exists c_frag")
    s.sql("drop table if exists c_frag_stage")
    Seq("c_frag", "c_frag_stage").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft-warehouse/$t"))
    }
    Tables.df(s, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("n_chars"))
      .repartition(64)
      .write.format("parquet").saveAsTable("c_frag")
    val before = Dml.dataFileCount(s, "c_frag")
    val want = s.table("c_frag").collect().map(_.toSeq).toSet
    val after = Dml.compactTable(s, "c_frag", "c_frag_stage",
      128L * 1024 * 1024)
    assert(before == 64, s"fragmentation setup wrote $before files")
    // fixture bytes are far under one 128 MB target file
    assert(after < 8, s"compaction left $after files")
    assert(s.table("c_frag").collect().map(_.toSeq).toSet == want,
      "compaction changed table content")
  }

  test("executeStatement: simultaneous SET, NULL predicate, type stability") {
    val t = s"graft_dml_sem_${System.nanoTime()}"
    spark.sql(s"create table $t using parquet as " +
      "select cast(id as bigint) as a, cast(id * 10 as bigint) as b " +
      "from range(6)")
    try {
      // SQL simultaneous assignment: every SET expression sees the OLD
      // row, so `set a = b, b = a` swaps (sequential eval would lose a)
      assert(graft.operators.Dml.executeStatement(
        spark, s"update $t set a = b, b = a where a >= 4") == 2L)
      val swapped = spark.sql(s"select a, b from $t where b = 4").collect()
      assert(swapped.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((40L, 4L)))
      // a NULL predicate result is "not matched" (MySQL semantics)
      assert(graft.operators.Dml.executeStatement(
        spark, s"update $t set a = -1 where null") == 0L)
      assert(spark.sql(s"select count(*) from $t where a = -1")
        .head.getLong(0) == 0L)
      // a WHERE inside a SET subquery is not the statement's WHERE
      assert(graft.operators.Dml.executeStatement(
        spark, s"update $t set b = (select max(a) from $t where a < 100) " +
          "where b = 0") == 1L)
      assert(spark.sql(s"select b from $t where a = 0").head.getLong(0) == 50L)
      // rewrites preserve the catalog schema exactly
      assert(spark.table(t).schema.map(_.dataType.sql) ==
        Seq("BIGINT", "BIGINT"))
      // DELETE without WHERE clears the table and reports the full count
      assert(graft.operators.Dml.executeStatement(
        spark, s"delete from $t") == 6L)
      assert(spark.table(t).count() == 0L)
    } finally spark.sql(s"drop table if exists $t")
  }

  test("salted join equals the plain join (operator identity)") {
    import graft.operators.Skew
    val o = Tables.df(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.df(spark, TestSpark.Sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val plain = l.join(o, Seq("o_orderkey"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(l, o, "o_orderkey", salt = 8)
      .select(col("o_orderkey"), col("l_quantity"), col("o_custkey"))
      .collect().map(_.toSeq).toSet
    // same columns for both sides of the compare
    val plainCols = l.join(o, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("l_quantity"), col("o_custkey"))
      .collect().map(_.toSeq).toSet
    assert(salted == plainCols)
    assert(plain.nonEmpty)
    // and the scatter is real: the physical join keys include the salt
    val plan = Skew.saltedJoin(l, o, "o_orderkey", salt = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt not in join keys:\n$plan")
  }

  test("audit sink: digest is partitioning-invariant and atomic") {
    val spark = TestSpark.spark
    val ev = Tables.df(spark, TestSpark.Sf, "events")
      .select(col("event_id").as("id"))
    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val p = java.nio.file.Files
        .createTempDirectory("graft_audit_spec_").toString + "/a.json"
      df.write.format(classOf[graft.sources.AuditSinkProvider].getName)
        .option("path", p).mode("overwrite").save()
      val r = spark.read.json(p).collect().head
      (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_hash"))
    }
    val one = digest(ev.coalesce(1))
    val many = digest(ev.repartition(13))
    // the merged digest must not depend on how tasks split the rows
    assert(one == many, s"digest depends on partitioning: $one vs $many")
    assert(one._1 == ev.count())
  }

  test("SCD2 history: intervals chain, one current row, no self-repeats") {
    val rows = graft.operators.Dml.dmlScd2.run(TestSpark.spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, h0) =>
      val h = h0.sortBy(_._2)
      // versions are 1..n dense
      assert(h.map(_._2).toSeq == (1L to h.length).toSeq, s"user $u versions")
      // exactly one open interval, and it is the LAST version
      assert(h.count(_._6) == 1 && h.last._6, s"user $u current flag")
      h.sliding(2).map(_.toSeq).foreach {
        case Seq(a, b) =>
          // each version closes exactly when the next opens
          assert(a._5 == b._4, s"user $u: v${a._2} closes ${a._5}, " +
            s"v${b._2} opens ${b._4}")
          // consecutive versions always change the value
          assert(a._3 != b._3, s"user $u: v${a._2}->v${b._2} same value")
        case _ =>
      }
    }
  }
}
