package graft.tools

import graft.SparkEntry
import graft.util.GraftSession

/** Time a subset of registered queries without running the full bench:
  * `runMain graft.tools.QTime q1 q2 ...` (all registry names when no
  * args). Same protocol as [[graft.Bench]] — one discarded warmup pass,
  * then the minimum of two timed passes, FULL materialization via
  * [[graft.util.Exec]] (never `count()`, which prunes work out of the
  * timed plan) — so numbers are comparable with BENCH_r*.json entries
  * from round 7 on.
  *
  * Pass `-cold` to clear the checkpoint + candidate-pair memos before
  * EVERY timed invocation (Bench's per-pass cold-checkpoint protocol,
  * BASELINE.md §protocol item 3) — required when A/B-ing any of the
  * ~10 checkpoint-backed queries against BENCH numbers, which always
  * time the cold build. */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cold = args.contains("-cold")
    val spark = GraftSession.builder("graft-qtime",
      master = Some(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = SparkEntry.queries
    val qArgs = args.toSeq.filterNot(_ == "-cold")
    val names =
      if (qArgs.nonEmpty) qArgs else SparkEntry.registry.map(_._1)
    names.foreach { n =>
      val fn = fns.getOrElse(n,
        sys.error(s"unknown query $n; known: ${fns.keys.mkString(", ")}"))
      graft.util.Exec.materialize(fn(spark, dir)) // warmup
      val times = (1 to 2).map { _ =>
        if (cold) graft.ops.Dedup.clearPairsMemo()
        val t0 = System.nanoTime()
        val rows = graft.util.Exec.materialize(fn(spark, dir))
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"QTIME $n%-24s ${times.map(_._1).min}%8.3f s  rows=${times.head._2}")
    }
    spark.stop()
  }
}
