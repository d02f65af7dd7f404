package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the point of the Morton sort is that every written
  * file covers a narrow RECTANGLE of the 2-D key space, so parquet
  * min/max skipping prunes on either filter column. This spec measures
  * per-file normalized ranges on the actual written files and compares
  * them against a linear single-key sort of the same data.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Mean per-file (max-min)/(globalMax-globalMin) for both columns. */
  private def meanRanges(files: Seq[String]): (Double, Double) = {
    val global = spark.read.parquet(files: _*).agg(
      min("o_custkey").cast("double"), max("o_custkey").cast("double"),
      min("o_totalprice"), max("o_totalprice"))
      .collect()(0)
    val (ck0, ck1) = (global.getDouble(0), global.getDouble(1))
    val (tp0, tp1) = (global.getDouble(2), global.getDouble(3))
    val perFile = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min("o_custkey").cast("double"), max("o_custkey").cast("double"),
        min("o_totalprice"), max("o_totalprice")).collect()(0)
      ((r.getDouble(1) - r.getDouble(0)) / (ck1 - ck0),
        (r.getDouble(3) - r.getDouble(2)) / (tp1 - tp0))
    }
    (perFile.map(_._1).sum / perFile.size, perFile.map(_._2).sum / perFile.size)
  }

  test("morton interleave is a bijection: both 16-bit ranks round-trip") {
    import graft.operators.Dml
    import spark.implicits._
    // exhaustive-ish corner + random coverage of the 16-bit × 16-bit grid
    val rnd = new scala.util.Random(11)
    val pts = (Seq((0, 0), (65535, 65535), (0, 65535), (65535, 0),
      (1, 2), (32768, 32767)) ++
      Seq.fill(500)((rnd.nextInt(65536), rnd.nextInt(65536)))).distinct
    val df = pts.toDF("a", "b")
      .withColumn("z", Dml.zValue(col("a"), 0, 65535, col("b"), 0, 65535))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      // deinterleave on the driver: even bits → a, odd bits → b
      var (da, db, i) = (0L, 0L, 0)
      while (i < 16) {
        da |= ((z >> (2 * i)) & 1L) << i
        db |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      assert(da == a && db == b,
        s"morton($a,$b)=$z deinterleaved to ($da,$db)")
    }
    // and z is distinct per point (a bijection, so sorting by z is a
    // genuine total order on the grid)
    assert(got.map(_._3).distinct.length == got.length)
  }

  test("z-ordered files are 2-D rectangles; linear sort localizes one dim") {
    import graft.operators.Dml
    // the entry writes graft_zorder_orders (8 z-range files)
    Dml.dmlZorder.run(spark, TestSpark.Sf).collect()
    val zFiles = Dml.dataFiles(spark, "graft_zorder_orders")
    assert(zFiles.size > 1, "z-order write produced a single file")
    // comparison layout: same data, same file count, single-key sort
    spark.sql("drop table if exists graft_linear_orders")
    Seq("graft_linear_orders").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft-warehouse/$t"))
    }
    Tables.df(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartitionByRange(zFiles.size, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.format("parquet").saveAsTable("graft_linear_orders")
    val lFiles = Dml.dataFiles(spark, "graft_linear_orders")

    val (zCk, zTp) = meanRanges(zFiles)
    val (lCk, lTp) = meanRanges(lFiles)
    // z-order: BOTH dimensions localized (each file a narrow rectangle)
    assert(zCk < 0.8 && zTp < 0.8,
      f"z-order files not rectangles: custkey $zCk%.2f totalprice $zTp%.2f")
    // linear sort: first dim tight, second dim spans ~everything
    assert(lCk < 0.5, f"linear sort key range unexpectedly wide: $lCk%.2f")
    assert(lTp > 0.9, f"independent second dim should be unlocalized: $lTp%.2f")
    // and the z-layout strictly dominates on the worst dimension
    assert(math.max(zCk, zTp) < math.max(lCk, lTp),
      f"z-order worst-dim $zCk%.2f/$zTp%.2f vs linear $lCk%.2f/$lTp%.2f")
  }
}
