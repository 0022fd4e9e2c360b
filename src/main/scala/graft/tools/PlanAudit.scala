package graft.tools

import graft.SparkEntry
import graft.util.GraftSession

/** One-shot plan audit across every registered query: flags cartesian
  * products, broadcast nested-loop joins, and repeated scans of the
  * same parquet source inside a single query plan (the
  * column-pruning-defeats-ReuseExchange double-scan class). Scratch
  * tool. Caveats: building a registered DataFrame RUNS the
  * side-effecting queries' setup (ingest_* scratch lakes, format
  * roundtrip/bucketing/incremental writes), and only each query's
  * FINAL READ plan is audited — the eagerly-executed write-stage plans
  * are not. */
object PlanAudit {
  /** KEYED shuffle-exchange count in a physical plan STRING:
    * `Exchange hashpartitioning/rangepartitioning/SinglePartition`
    * nodes — the environment-independent data movements a query's
    * semantics force. Deliberately excluded: BroadcastExchange (not a
    * shuffle), ReusedExchange (costs nothing), and RoundRobin
    * repartitions (the `Tables.fanOut` scan-scaling knob, whose
    * presence depends on source partition count vs local parallelism
    * and which vanishes on a real cluster's many-split scans).
    * Shared with PlanAuditSpec's per-query exchange budgets. */
  def keyedExchanges(plan: String): Int =
    ("(?<![A-Za-z])Exchange (hashpartitioning|rangepartitioning|" +
      "SinglePartition)").r
      .findAllIn(plan).size

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val printExch = args.contains("exch")
    val spark = GraftSession.builder("graft-planaudit",
      master = Some("local[8]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry.foreach { case (name, q) =>
      try {
        val p = q.fn(spark, dir).queryExecution.executedPlan.toString
        if (printExch) println(s"EXCH $name: ${keyedExchanges(p)}")
        val cart = "CartesianProduct".r.findAllIn(p).size
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        val scans = "file:[^,\\]]*?([a-z_0-9]+\\.(?:parquet|csv|csv\\.gz))".r
          .findAllMatchIn(p).map(_.group(1)).toSeq
        val dups = scans.groupBy(identity).filter(_._2.size > 1)
          .map { case (f, l) => s"$f x${l.size}" }
        val flags = Seq(
          if (cart > 0) Some(s"CARTESIAN x$cart") else None,
          if (bnlj > 0) Some(s"BNLJ x$bnlj") else None,
          if (dups.nonEmpty) Some("MULTISCAN " + dups.mkString(", ")) else None
        ).flatten
        if (flags.nonEmpty) println(s"AUDIT $name: ${flags.mkString("; ")}")
      } catch {
        case e: Throwable => println(s"AUDIT $name: PLAN-ERROR ${e.getMessage.take(100)}")
      }
    }
    println("AUDIT done")
    spark.stop()
  }
}
