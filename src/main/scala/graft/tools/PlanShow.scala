package graft.tools

/** Throwaway: print one registered query's executed plan. */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.util.GraftSession.builder("graft-planshow",
      master = Some("local[8]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
