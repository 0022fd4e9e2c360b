package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.SparkEntry
import graft.util.GraftSession

/** Round-16 measurement tool (guide §1): attribute a composite
  * query's wall clock to its individual Spark JOBS — the harness
  * queries (streaming twins, pipeline stages, index builds) run tens
  * of jobs per invocation and a single end-to-end number cannot say
  * which of them is the cost. Prints one line per job (duration,
  * stage count, task count, callsite) in execution order, then the
  * gaps (time between jobs = driver-side work: planning, checkpoint
  * bookkeeping, file moves, stream lifecycle).
  *
  * Usage: `runMain graft.tools.JobProfile <sfDir> <query...>`
  * — each query gets one warmup run (memoized index/store builds
  * land there), then the profiled run; `-cold` clears the
  * checkpoint/pair memos before the profiled run, matching Bench's
  * warm-session/cold-checkpoint protocol. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cold = args.contains("-cold")
    val queryNames = args.drop(1).filterNot(_ == "-cold")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-jobprofile",
      master = Some(s"local[$cpus]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, start: Long, var end: Long = 0L,
      var desc: String = "", var site: String = "",
      var nStages: Int = 0, var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        lock.synchronized {
          val r = JobRec(j.jobId, j.time)
          r.desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          r.site = j.stageInfos.lastOption.map(_.name).getOrElse("")
          r.nStages = j.stageInfos.size
          r.nTasks = j.stageInfos.map(_.numTasks).sum
          jobs(j.jobId) = r
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        lock.synchronized {
          jobs.get(j.jobId).foreach(_.end = j.time); ()
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = ()
    })

    queryNames.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (cold) graft.ops.Dedup.clearPairsMemo()
      graft.util.Exec.materialize(fn(spark, dir))
      lock.synchronized(jobs.clear())
      if (cold) graft.ops.Dedup.clearPairsMemo()
      val t0 = System.nanoTime()
      val rows = graft.util.Exec.materialize(fn(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      lock.synchronized {
        var prevEnd = 0L
        var jobSum = 0.0
        println(f"== $name rows=$rows wall=$wall%.3f s ==")
        jobs.values.toSeq.sortBy(_.start).foreach { r =>
          val dur = (r.end - r.start) / 1e3
          jobSum += math.max(0, dur)
          val gap = if (prevEnd == 0) 0.0 else (r.start - prevEnd) / 1e3
          prevEnd = math.max(prevEnd, r.end)
          val label = if (r.desc.nonEmpty) r.desc else r.site
          println(f"job ${r.id}%4d ${dur}%7.3f s  gap=${gap}%6.3f  " +
            f"stages=${r.nStages}%2d tasks=${r.nTasks}%4d  " +
            label.take(110))
        }
        println(f"== $name jobs=${jobs.size} jobSum=$jobSum%.3f s " +
          f"wall=$wall%.3f s (driver/gaps=${wall - jobSum}%.3f s) ==")
      }
    }
    spark.stop()
  }
}
