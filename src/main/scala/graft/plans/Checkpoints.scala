package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Eager materialization for iterative / multi-consumer operators
  * (duplicate-cluster label propagation, LSH candidate verification).
  *
  * Default is `localCheckpoint(eager)`: blocks live in executor storage
  * and lineage is truncated — the right trade on a healthy cluster for
  * bounded loops, and the only option on local[n]. Setting
  * `spark.graft.checkpoint.dir` swaps in RELIABLE checkpoints (files on
  * HDFS / object store): an executor loss mid-iteration then recomputes
  * the lost partitions from the checkpoint files instead of failing the
  * whole O(log diameter) loop from the root — the knob a 1000-executor
  * deployment needs, where the expected number of executor losses over a
  * long job is >= 1 and localCheckpoint'd blocks die with their executor.
  */
object Checkpoints {

  /** When set (session conf), [[materialize]] writes reliable
    * checkpoints under this directory instead of local ones. */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Materialize `df` eagerly with truncated lineage. Every call is one
    * distributed write + read-back boundary; callers pair it with
    * [[free]] once the frame is superseded so storage stays O(live
    * frontier), not O(frontier · rounds). */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey) match {
      case Some(dir) =>
        // setCheckpointDir mints a fresh UUID subdirectory on EVERY
        // call — re-asserting per materialize would strew empty dirs
        // over the checkpoint store. Only (re)assert when the conf
        // value actually changed: after setCheckpointDir(dir) the
        // context's checkpoint dir is dir/<uuid>, so a prefix test
        // detects both first use and a mid-session conf change.
        val sc = spark.sparkContext
        // setCheckpointDir stores the FULLY-QUALIFIED path
        // (file:/tmp/ckpt/<uuid>), so compare path components, not raw
        // strings — a scheme-less conf value would otherwise never
        // match and every materialize would mint a fresh UUID dir
        val root = java.net.URI.create(dir.stripSuffix("/")).getPath
        if (!sc.getCheckpointDir.exists { d =>
            val p = java.net.URI.create(d).getPath
            p == root || p.startsWith(root + "/")
          })
          sc.setCheckpointDir(dir)
        // Reliable checkpoint computes the subtree TWICE unpersisted:
        // the eager count job, then the checkpoint-file write job that
        // re-runs the RDD. Persisting across the pair makes the second
        // pass read blocks instead of recomputing; the cache is dropped
        // immediately after — the checkpoint files are the durable copy.
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint(eager = true)
        finally df.unpersist(blocking = false)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** The RDD a checkpointed Dataset is backed by. `Dataset.unpersist`
    * does NOT release checkpoint blocks (they are RDD-level persists,
    * not cached query plans), so freeing a superseded frame needs the
    * RDD handle out of the plan's LogicalRDD leaf. */
  private def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collectFirst { case l: LogicalRDD => l.rdd }

  /** Release the executor-storage blocks behind a [[materialize]]d frame
    * (synchronously — the caller is about to allocate the next round's
    * frontier into the same storage budget). For a reliable checkpoint
    * the files are deleted too: `unpersist` only drops the in-memory
    * replica, and a superseded frame's files are dead by the caller's
    * contract (the LIVE frame has its own checkpoint files for fault
    * tolerance) — without this every materialize() of a long session
    * accumulates rdd-N directories on the checkpoint store until quota
    * death. Local checkpoints have no file, so the delete is a no-op
    * there. */
  def free(df: DataFrame): Unit =
    backingRdd(df).foreach { rdd =>
      rdd.unpersist(blocking = true)
      rdd.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val fs = p.getFileSystem(
          df.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
        // rdd-N lives under the setCheckpointDir-minted <uuid> dir;
        // once its last rdd-N is gone remove the empty parent too, or
        // a long session leaves a trail of husk directories (delete
        // only-if-empty keeps concurrent checkpoints safe).
        val parent = p.getParent
        if (parent != null &&
            scala.util.Try(fs.listStatus(parent).isEmpty).getOrElse(false))
          fs.delete(parent, false)
      }
    }
}
