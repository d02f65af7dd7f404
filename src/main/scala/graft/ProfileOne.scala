package graft

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Dev helper (not part of the driver contract): run one named query
  * like the bench does (warm-up + timed noop-sink sample) with a
  * listener attached, and print where the wall-clock went — per job
  * (submission→completion) and per stage (task-time sum + launch
  * spread). The bench's per-cell seconds are job latency stacked on
  * the driver thread, so the gap between "sum of job wall" and the
  * timed sample is driver-side work (planning, checkpoint bookkeeping,
  * filesystem ops).
  *
  * args: name sfDir [runs]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    final case class JobRec(id: Int, var submitted: Long = 0L,
        var completed: Long = 0L, var stages: Int = 0,
        var tasks: Int = 0, var taskTimeMs: Long = 0L,
        var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) synchronized {
          val r = JobRec(e.jobId, submitted = e.time)
          r.desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          r.stages = e.stageIds.size
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
          jobs(e.jobId) = r
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (collecting) synchronized {
          jobs.get(e.jobId).foreach(_.completed = e.time)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (collecting) synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { r =>
            r.tasks += 1
            if (e.taskInfo != null)
              r.taskTimeMs += e.taskInfo.duration
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) synchronized {
          val si = e.stageInfo
          val jid = stageToJob.getOrElse(si.stageId, -1)
          val ms = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          if (ms >= 200)
            println(f"[profile]   STAGE ${si.stageId}%4d job=$jid%4d ${ms / 1e3}%7.3f s " +
              f"tasks=${si.numTasks}%4d  ${si.name.take(100)}")
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def exec(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // untimed warm-up (mirrors the bench), then min of 3 samples
    exec()
    val samples = (1 to 3).map { _ =>
      val t = System.nanoTime()
      exec()
      (System.nanoTime() - t) / 1e9
    }
    collecting = true
    val t0 = System.nanoTime()
    exec()
    val wallSec = (System.nanoTime() - t0) / 1e9
    collecting = false
    println(f"[profile] samples=${samples.map(s => f"$s%.3f").mkString(",")} min=${samples.min}%.3f")
    // let the async listener bus drain (dev tool: a bounded sleep is fine)
    Thread.sleep(2000)

    println(f"%n[profile] $name timed sample: $wallSec%.3f s")
    val js = jobs.values.toSeq
    val jobWall = js.map(j => (j.completed - j.submitted).max(0L)).sum / 1e3
    println(f"[profile] jobs=${js.size} stages=${js.map(_.stages).sum} " +
      f"tasks=${js.map(_.tasks).sum} jobWallSum=$jobWall%.3f s " +
      f"taskTimeSum=${js.map(_.taskTimeMs).sum / 1e3}%.3f s " +
      f"driverGap=${wallSec - jobWall}%.3f s")
    js.sortBy(j => -(j.completed - j.submitted)).take(25).foreach { j =>
      println(f"[profile]   job ${j.id}%4d ${(j.completed - j.submitted) / 1e3}%7.3f s " +
        f"stages=${j.stages}%3d tasks=${j.tasks}%5d taskTime=${j.taskTimeMs / 1e3}%7.3f s  ${j.desc.take(80)}")
    }
    spark.stop()
  }
}
