package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints explain(formatted) for selected registered queries — the
  * scale/plan audit harness (run: sbt "Test/runMain graft.tools.PlanExplain q1_pricing_summary ..."). */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_top_revenue", "asof_join",
        "similarity_topk", "neardup_minhash")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
