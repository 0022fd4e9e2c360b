package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.SparkEntry
import graft.util.GraftSession

/** Plan + wall-clock + shuffle-volume profiler for registered queries:
  * prints the formatted physical plan and the min of `reps` timed runs,
  * with per-run total shuffle-write bytes (summed over stages by a
  * SparkListener) — the number that decides whether a plan survives a
  * 100× scale-up, independently of this box's timing noise.
  *
  * Usage: `runMain graft.tools.Profile <sfDir> <query> [reps=3]
  * [explain|noexplain]` */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val doExplain = args.length <= 3 || args(3) != "noexplain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-profile",
      master = Some(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      // task-level, not stage-level: StageInfo.taskMetrics is not
      // reliably populated without an event log
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) shuffleBytes.addAndGet(
          t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    val fn = SparkEntry.queries(name)
    if (doExplain) println(fn(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val times = (1 to reps).map { _ =>
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      // full materialization (Exec doc): count() would prune the very
      // work — and shuffles — this profiler exists to show
      val n = graft.util.Exec.materialize(fn(spark, dir))
      val s = (System.nanoTime() - t0) / 1e9
      // listener events are asynchronous — give the bus a beat before
      // reading the accumulated stage metrics (profiler-grade accuracy)
      Thread.sleep(300)
      println(f"[profile] $name rows=$n sec=$s%.3f " +
        f"shuffle_mb=${shuffleBytes.get / 1048576.0}%.2f")
      s
    }
    println(f"[profile] $name min=${times.min}%.3f")
    spark.stop()
  }
}
