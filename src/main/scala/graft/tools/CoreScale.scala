package graft.tools

import graft.util.GraftSession

/** Round-17 CORE-COUNT scaling evidence (VERDICT r16 item 2): the
  * committed bench's low-core leg at sf0.1 measures nothing about
  * operator parallelism — the whole fixture is ~17 MB, wall clock is
  * scheduler/planning overhead that GROWS with core count, and every
  * low/high-core ratio reads ≈1. This tool times REGISTERED queries
  * (the bench's own names and functions) over the ScaleStress 10×
  * corpus — big enough that per-row work dominates — at the core
  * count in `$SPARK_GRAFT_CPUS`, so two runs (8 vs 32) produce
  * ratios that can actually move.
  *
  * Protocol matches the bench: one discarded warmup pass (memoized
  * stores land there), cold checkpoint/pair memos before every timed
  * invocation, full `Exec.materialize`, min of 2 timed passes. The
  * 10× corpus is built once (cached under target/scale/x<n>,
  * `_SUCCESS`-gated) — run the HIGH-core leg first so the build never
  * pollutes the low-core timing.
  *
  * Usage: `SPARK_GRAFT_CPUS=<n> runMain graft.tools.CoreScale
  * [scale] [query...]`; prints ONE JSON line
  * `{"metric":"corescale","cpus":N,"scale":n,"queries":{...}}`.
  * The committed artifact (SCALING_r17.json) holds the 8- and
  * 32-core lines plus per-query ratios. */
object CoreScale {

  /** Default leg: per-row-CPU-heavy scans (tokenize/score/hash — the
    * embarrassingly-parallel class whose ratio should approach the
    * core ratio) plus two shuffle-bearing pair pipelines and one
    * embedding-routing query, all registered bench names. */
  val defaultQueries: Seq[String] = Seq(
    "token_counts", "quality_score", "gopher_rules", "doc_fingerprint",
    "word_rarity", "ngram_lm_score", "neardup_minhash", "semdedup")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val names =
      if (args.length > 1) args.drop(1).toSeq else defaultQueries
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-corescale",
      master = Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = graft.util.Scratch.under(s"scale/x$n").toString
    def ready(path: String) =
      new java.io.File(s"$path/_SUCCESS").exists()
    if (!ready(s"$out/documents.parquet"))
      ScaleStress.buildDocCorpus(spark, src, out, n)
    if (!ready(s"$out/embeddings.parquet"))
      ScaleStress.buildEmbeddingCorpus(spark, src, out, n)

    val fns = graft.SparkEntry.queries
    def run(name: String): Double = {
      graft.ops.Dedup.clearPairsMemo()
      val t0 = System.nanoTime()
      graft.util.Exec.materialize(fns(name)(spark, out))
      (System.nanoTime() - t0) / 1e9
    }
    val results = names.map { name =>
      run(name) // warmup (builds _SUCCESS-gated stores; discarded)
      name -> (1 to 2).map(_ => run(name)).min
    }
    def jstr(s: String) = "\"" + s + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"corescale","cpus":$cpus,"scale":$n,"queries":$qs}""")
    spark.stop()
  }
}
