package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Cell-partitioned layout of the stored quantized-ANN indexes: the
  * code tables are written `partitionBy("cid")` (one directory per
  * inverted list — the LexIndex bucket discipline) and the serve plans
  * push the probed-cell set as a PARTITION predicate, so a query batch
  * reads only the probed cells' files. The oracles hash-verify the
  * VALUES; these specs pin the I/O SHAPE the values can't show — at
  * 100 TB this is the difference between reading ~NProbe/C of the
  * index bytes per batch and reading all of them (the r17 verdict's
  * one scale-shape gap). */
class AnnIndexLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (selectedPartitions, partitionFilters text) of the code-table
    * scan leaves in a serve plan — TextIndexSpec's counting pattern. */
  private def codesScan(df: org.apache.spark.sql.DataFrame): Seq[(Int, String)] = {
    val plan = df.queryExecution.sparkPlan
    plan.collectLeaves().collect {
      case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("codes")) =>
        (f.selectedPartitions.partitionCount, f.partitionFilters.mkString(";"))
    }
  }

  test("IVFPQ stored serve reads only the probed cells' partitions") {
    val root = Similarity.fullIndexRoot(spark, TestSpark.Sf)
    val probed = Similarity.probedCellsOf(spark, TestSpark.Sf, root)
    val (df, _) = Similarity.serveFromIndex(spark, TestSpark.Sf, root,
      Similarity.TopK)
    val scans = codesScan(df)
    assert(scans.nonEmpty, "no codes scan found in the IVFPQ serve plan")
    scans.foreach { case (n, filt) =>
      assert(filt.toLowerCase.contains("cid"),
        s"no cid partition filter on the codes scan: $filt")
      assert(n == probed.size && n <= Similarity.NumQueries * Similarity.NProbe,
        s"codes scan read $n cell dirs; probed set is ${probed.size}")
    }
  }

  test("IVF-SQ8 stored serve reads only the probed cells' partitions") {
    val root = Similarity.ivfsqIndexRoot(spark, TestSpark.Sf)
    val probed = Similarity.probedCellsOf(spark, TestSpark.Sf, root)
    val cm = Similarity.readCentroids(spark, root)
    val df = Similarity.ivfSqServe(
      Tables.df(spark, TestSpark.Sf, "embeddings"), Similarity.TopK, cm,
      spark.read.parquet(s"$root/codes"))
    val scans = codesScan(df)
    assert(scans.nonEmpty, "no codes scan found in the IVF-SQ8 serve plan")
    scans.foreach { case (n, filt) =>
      assert(filt.toLowerCase.contains("cid"),
        s"no cid partition filter on the codes scan: $filt")
      assert(n == probed.size && n <= Similarity.NumQueries * Similarity.NProbe,
        s"codes scan read $n cell dirs; probed set is ${probed.size}")
    }
  }

  test("incremental serve prunes the STORED base segment through the " +
    "union with the fresh batch") {
    // the probed-cell predicate must push through Union to reach the
    // base segment's parquet scan as a partition filter
    val df = Similarity.annIndexIncremental.run(spark, TestSpark.Sf)
    val base = Similarity.baseIndexRoot(spark, TestSpark.Sf)
    val probed = Similarity.probedCellsOf(spark, TestSpark.Sf, base)
    val scans = codesScan(df)
    assert(scans.nonEmpty, "no stored codes scan in the incremental plan")
    scans.foreach { case (n, _) =>
      assert(n <= probed.size,
        s"base-segment scan read $n cell dirs; probed set is ${probed.size}")
    }
  }

  test("compacted roots keep the cell-partitioned layout") {
    for (root <- Seq(Similarity.compactIndexRoot(spark, TestSpark.Sf),
                     Similarity.ivfsqCompactRoot(spark, TestSpark.Sf))) {
      val dirs = new java.io.File(s"$root/codes").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("cid=")),
        s"compacted codes at $root are not cell-partitioned: ${dirs.toSeq}")
    }
  }
}
