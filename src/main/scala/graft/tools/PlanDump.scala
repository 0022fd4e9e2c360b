package graft.tools

/** Write `.explain("formatted")` output for the named registered
  * queries to `<outDir>/<query>_<suffix>.txt` — the round-16 plan
  * evidence files (plans/r16, suffix `before` / `after`).
  *
  * Usage: `runMain graft.tools.PlanDump <outDir> <suffix> <query...>`
  * (sf dir from SPARK_GRAFT_SF_DIR, default sf0.001 — plan SHAPE is
  * scale-independent; building a registered DataFrame runs the
  * side-effecting harness setups, so the small sf keeps this fast). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.GraftSession.builder("graft-plandump",
      master = Some(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val txt =
        try graft.SparkEntry.queries(n)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
