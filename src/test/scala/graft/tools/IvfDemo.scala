package graft.tools

object IvfDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local("ivf-demo", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val brute = graft.ops.Similarity.cosineTopK(spark, dir, k = 5, nQueries = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.ops.Similarity.ivfTopK(spark, dir, k = 5, nQueries = 8, nProbe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = graft.ops.Similarity.ivfTopK(spark, dir, k = 5, nQueries = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nProbe far beyond the cell count: must clamp to probe-everything
    val over = graft.ops.Similarity.ivfTopK(spark, dir, k = 5, nQueries = 8, nProbe = 99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"IVF_FULL_EXACT=${full == brute} (${full.size} results)")
    println(s"IVF_OVERPROBE_EXACT=${over == brute}")
    println(f"IVF_PRUNED recall=${brute.count(pruned.contains).toDouble / brute.size}%.2f")
    spark.stop()
  }
}
