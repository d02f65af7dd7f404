package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed catalog over one TESTDATA scale-factor directory.
  *
  * Mirrors the reference's in-memory `Catalog` trait
  * (doradb-catalog/src/lib.rs:14-46) re-expressed Spark-first: tables are
  * parquet scans registered as temp views, so Catalyst gets file-level
  * statistics (sizeInBytes) for broadcast decisions, and predicate
  * pushdown / column pruning reach the parquet reader for free.
  *
  * Scale note: at 100 TB each table is a partitioned parquet dataset; the
  * same `spark.read.parquet(dir)` call scales because nothing here is
  * driver-side — registration is metadata-only.
  */
object Tables {
  /** TPC-H-ish core tables + LLM-pipeline extension tables (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) which Spark's vectorized reader
      // rejects; read the raw int64 nanos and convert (exact: fixture
      // values are microsecond-precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view named after the table. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
