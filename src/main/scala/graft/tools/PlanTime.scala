package graft.tools

/** Measure DRIVER planning cost (analyze + optimize + physical plan +
  * codegen prep) of a registered query WITHOUT executing it — the
  * number behind the crawl family's "wall ≫ jobSum" profile rows.
  * Usage: `runMain graft.tools.PlanTime <query...>`. */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.util.GraftSession.builder("graft-plantime",
      master = Some("local[8]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val plan = df.queryExecution.executedPlan
        val nNodes = plan.collect { case p => p }.size
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PLANTIME $n%-28s run$i $s%7.3f s  physNodes=$nNodes")
      }
    }
    spark.stop()
  }
}
