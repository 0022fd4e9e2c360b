package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local("smoke", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n QUERIES=${graft.SparkEntry.queries.size} ORACLES=${graft.SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
