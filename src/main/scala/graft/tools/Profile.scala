package graft.tools

import graft.SparkEntry
import graft.util.GraftSession

/** Plan + wall-clock profiler for registered queries: prints the
  * formatted physical plan and the min of `reps` timed runs.
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
    val fn = SparkEntry.queries(name)
    if (doExplain) println(fn(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rows=$n sec=$s%.3f")
      s
    }
    println(f"[profile] $name min=${times.min}%.3f")
    spark.stop()
  }
}
