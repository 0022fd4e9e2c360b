package graft.tools

object CompactDemo {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val spark = graft.util.GraftSession.local("compact-demo", 4)
    spark.sparkContext.setLogLevel("ERROR")
    def files(dt: String) = new java.io.File(s"$path/dt=$dt").listFiles()
      .count(_.getName.endsWith(".parquet"))
    def rows = graft.load.Strategies.readCurated(spark, path).count()
    println(s"BEFORE files(2024-06-28)=${files("2024-06-28")} rows=$rows")
    graft.load.Strategies.compact(spark, path)
    println(s"AFTER  files(2024-06-28)=${files("2024-06-28")} rows=$rows")
    spark.stop()
  }
}
