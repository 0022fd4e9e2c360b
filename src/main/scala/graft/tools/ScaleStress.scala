package graft.tools

import org.apache.spark.sql.functions._
import graft.util.{GraftSession, Tables}
import graft.ops.{CorpusStats, Dedup, QualitySignals, TextAnalysis}

/** Scale-stress harness for the dedup family: runs the document
  * operators on 1×/3×/10× corpora derived from sf0.1 and reports how
  * cost and output grow with corpus size (results recorded in
  * SCALE_NOTES.md).
  *
  * Corpus construction keeps the DUPLICATE RATE constant: copy `c`
  * offsets every doc_id and suffixes every token with `c<c>`, so no
  * shingle ever matches across copies — a 10× corpus has 10× the docs,
  * 10× the true near-dup pairs, and (crucially) the same bucket-size
  * distribution shape an organically-10×-larger corpus would have.
  * Naively unioning unperturbed copies would instead make every doc a
  * near-dup of its 9 clones and measure an artificial 45× pair blowup.
  *
  * Usage: `runMain graft.tools.ScaleStress [scales...]` (default
  * `1 3 10`); corpora are cached under target/scale/. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-scale-stress",
      master = Some(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpusDir(n: Int) = s"/root/repo/target/scale/x$n"
    scales.foreach { n =>
      val out = corpusDir(n)
      // _SUCCESS marker, not the dir: a partially-written corpus from a
      // crashed run would otherwise be reused and skew the measurements
      if (!new java.io.File(s"$out/documents.parquet/_SUCCESS").exists()) {
        val base = Tables.t(spark, src, "documents")
        val copies = (0 until n).map { c =>
          if (c == 0) base
          else base
            .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
            .withColumn("text",
              regexp_replace(col("text"), "(\\S+)", s"$$1c$c"))
        }
        copies.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
      }
    }

    val ops: Seq[(String, String => Long)] = Seq(
      "neardup_minhash" -> (d => Dedup.nearDupPairs(spark, d).count()),
      "simhash_pairs" -> (d => Dedup.simhashPairs(spark, d).count()),
      "ngram_jaccard" -> (d => Dedup.ngramJaccard(spark, d).count()),
      "dedup_groups" -> (d => Dedup.dedupGroups(spark, d).count()),
      "clean_corpus" -> (d => TextAnalysis.cleanCorpus(spark, d).count()),
      "kmv_distinct" -> (d => CorpusStats.kmvDistinct(spark, d).count()),
      "tfidf_top_terms" -> (d => CorpusStats.tfidfTopTerms(spark, d).count()),
      "inverted_index" -> (d => CorpusStats.invertedIndex(spark, d).count()),
      "bigram_novelty" -> (d => CorpusStats.bigramNovelty(spark, d).count()),
      "ngram_repetition" -> (d => QualitySignals.ngramRepetition(spark, d).count()),
      "decontaminate" -> (d => QualitySignals.decontaminate(spark, d).count()),
      "zipf_spectrum" -> (d => QualitySignals.zipfSpectrum(spark, d).count()))

    println(f"${"op"}%-18s ${"scale"}%5s ${"docs"}%8s ${"rows"}%8s ${"sec"}%8s")
    val results = for {
      n <- scales
      dir = corpusDir(n)
      docs = Tables.t(spark, dir, "documents").count()
      (name, fn) <- ops
    } yield {
      fn(dir) // warmup (codegen + shuffle files)
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = fn(dir)
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val sec = timed.map(_._1).min
      val rows = timed.head._2
      println(f"$name%-18s $n%5d $docs%8d $rows%8d $sec%8.2f")
      (name, n, sec, rows)
    }
    // growth factors vs 1× (time and rows per op)
    val base = results.filter(_._2 == scales.min)
      .map(r => r._1 -> ((r._3, r._4))).toMap
    println(f"${"op"}%-18s ${"scale"}%5s ${"t-growth"}%9s ${"row-growth"}%11s")
    results.filter(_._2 != scales.min).foreach { case (name, n, sec, rows) =>
      val (b, br) = base(name)
      println(f"$name%-18s $n%5d ${sec / b}%9.2f ${rows.toDouble / math.max(1, br)}%11.2f")
    }
    spark.stop()
  }
}
