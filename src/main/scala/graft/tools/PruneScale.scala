package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.util.GraftSession

/** Measured proof of the `cosine_pairs` angular cell bound in its
  * FAVORABLE regime (VERDICT r9 item 1). The driver testdata is
  * near-isotropic — label clusters have ~90° radii, nothing prunes,
  * and the operator degrades to the blocked exact scan — so this tool
  * builds the regime the bound was designed for: a CLUSTERED corpus
  * (tight label clusters on orthogonal axis directions) where the
  * spherical-triangle-inequality bound can prune cross-cluster cell
  * pairs, and times the pruned plan against the prune-disabled
  * control at 1× and 10×. Results are recorded in SCALE_NOTES.md;
  * the structural guarantee (pruning fires, zero false negatives) is
  * pinned by `CosinePruneSpec`.
  *
  * Usage: `runMain graft.tools.PruneScale [scales...]`
  * (default `1 10`; base corpus 2000 vectors, 16 clusters). */
object PruneScale {

  /** Deterministic clustered embedding corpus: `nClusters` tight
    * clusters, cluster `c` centered on coordinate axis
    * `c * dim / nClusters` (distinct coordinates ⇒ exactly orthogonal
    * centers, pairwise 90°), members perturbed by ±`amp` uniform
    * noise per coordinate (xxhash-derived — same row, same vector on
    * every run/engine). With amp = 0.02 the measured per-cluster
    * angular radius is ~5–6°, far inside the prune bound's margin
    * (90° − 2r ≫ arccos 0.4 ≈ 66.4°). `label = vec_id % nClusters`,
    * so the codebook's `pmod(label, maxCells)` cells coincide with
    * the true clusters when maxCells = nClusters. */
  def clusteredDf(spark: SparkSession, n: Long, nClusters: Int = 16,
      dim: Int = 64, amp: Double = 0.02): DataFrame = {
    require(dim % nClusters == 0, "dim must be a multiple of nClusters")
    val stride = dim / nClusters
    spark.range(n).select(
      col("id").as("vec_id"),
      (col("id") % nClusters).cast("int").as("label"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val axis = (col("id") % nClusters).cast("int") * lit(stride)
        val u = pmod(xxhash64(col("id"), i), lit(2000001L))
          .cast("double") / 1000000.0 - 1.0
        (when(i === axis, lit(1.0)).otherwise(lit(0.0)) + lit(amp) * u)
          .cast("float")
      }).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val scales =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val base = 2000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-prune-scale",
      master = Some(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scales.foreach { s =>
      val n = base * s
      val path = graft.util.Scratch.under(s"scale/clustered_x$s").toString
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        clusteredDf(spark, n).write.mode("overwrite").parquet(path)
      val corpus = spark.read.parquet(path)
      def timed(prune: Boolean): (Double, Long, Similarity.PairPruneStats) = {
        var best = Double.MaxValue; var rows = 0L
        var st: Similarity.PairPruneStats = null
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          val (df, stats) = Similarity.cosinePairsFor(corpus,
            pruneCells = prune)
          rows = graft.util.Exec.materialize(df)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          st = stats
        }
        (best, rows, st)
      }
      val (tOn, rowsOn, stOn) = timed(prune = true)
      val (tOff, rowsOff, stOff) = timed(prune = false)
      require(rowsOn == rowsOff,
        s"PRUNING CHANGED THE OUTPUT at x$s: $rowsOn vs $rowsOff")
      println(f"[prune-scale] x$s%-3d n=$n%-6d pairs=$rowsOn%-9d " +
        f"pruned=${tOn}%.2fs (cellPairs ${stOn.survivingCellPairs}/" +
        f"${stOn.totalCellPairs}) unpruned=${tOff}%.2fs " +
        f"(cellPairs ${stOff.survivingCellPairs}/${stOff.totalCellPairs}) " +
        f"speedup=${tOff / tOn}%.2fx")
    }
    spark.stop()
  }
}
