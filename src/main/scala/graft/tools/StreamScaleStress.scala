package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.TableConfig
import graft.lake.LakeLayout
import graft.ops.Dedup
import graft.streaming.{IngestStream, NeardupIndex, NeardupStream}
import graft.util.{GraftSession, Scratch, Tables}

/** Scale-stress for the STREAMING family (VERDICT r8 item 6) — the one
  * family the 1×/10×/100× batch curves don't cover. Two claims are
  * measured, each at 10× the registered queries' micro-batch volume:
  *
  *  1. `neardup_stream`: per-arrival cost is BATCH-sized, not
  *     STATE-sized — the probe broadcasts only the new batch's
  *     signatures and never shuffles the corpus index, so arrival
  *     latency must stay flat as the stream ages and the index
  *     accumulates appended batch dirs; and [[NeardupIndex.compact]]
  *     on a fixed cadence keeps the live-directory count (the
  *     per-arrival LISTING cost) bounded by the cadence, never by
  *     stream age.
  *  2. `ingest_stream`: the per-micro-batch upsert merge rewrites only
  *     the TOUCHED dt partitions, so daily-arrival latency must stay
  *     flat while the curated table grows batch-by-batch (a
  *     table-sized merge would grow linearly with stream age).
  *
  * Protocol: wall-clock per arrival = atomic file landing +
  * `processAllAvailable()`; arrival 0 is warm-up (first-batch plan
  * compilation + sink creation) and excluded from the flatness ratio,
  * which compares the mean of the last third of arrivals to the mean
  * of the first third (post-warm-up). Printed rows go into
  * SCALE_NOTES verbatim.
  *
  * Usage: `runMain graft.tools.StreamScaleStress [docScale] [arrivals]
  * [rowsPerIngestBatch]` (defaults 10, 20, 20000). */
object StreamScaleStress {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Land a one-file parquet slice into a watched dir atomically —
    * the shared [[graft.util.StreamFiles.landParquet]] (one copy of
    * the file-source landing contract). */
  private def landParquet(slice: DataFrame, stagingBase: String,
      watch: String, name: String): Unit =
    graft.util.StreamFiles.landParquet(slice, stagingBase, watch, name)

  private def flatness(secs: Seq[Double]): (Double, Double, Double) = {
    // drop arrival 0 (warm-up); first third vs last third of the rest
    val s = secs.drop(1)
    val third = math.max(1, s.length / 3)
    val head = s.take(third).sum / third
    val tail = s.takeRight(third).sum / third
    (head, tail, tail / head)
  }

  def neardupStress(spark: SparkSession, corpus: String,
      nArrivals: Int, compactEvery: Int): Unit = {
    val base = Scratch.under("ingest/neardup_stream_stress")
    Scratch.deleteRecursive(base)
    val (watch, idx, out, ckpt) = (s"$base/watch", s"$base/index",
      s"$base/pairs", s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    val docs = Tables.t(spark, corpus, "documents")
      .select(col("doc_id"), col("text"))
    val (_, seedSec) = timed {
      docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .transform(d => Dedup.bandSignaturesFor(d, 8))
        .write.partitionBy("band").parquet(s"$idx/batch_id=seed")
    }
    val batchDocs = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("slice", pmod(xxhash64(col("doc_id")), lit(nArrivals)))
      .persist()
    val nBatch = batchDocs.count()
    println(f"neardup_stream_stress: corpus=$corpus seed=$seedSec%.2fs " +
      f"batch_docs=$nBatch arrivals=$nArrivals compact_every=$compactEvery")
    println(f"${"arrival"}%8s ${"docs"}%6s ${"sec"}%7s ${"live_dirs"}%9s " +
      f"${"compact_sec"}%11s")
    val secs = Seq.newBuilder[Double]
    val q = NeardupStream.start(spark, watch, idx, out, ckpt)
    try {
      (0 until nArrivals).foreach { k =>
        val slice = batchDocs.filter(col("slice") === k)
          .select("doc_id", "text")
        val nDocs = slice.count()
        val (_, sec) = timed {
          landParquet(slice, base.toString, watch, s"arr$k")
          q.processAllAvailable()
        }
        secs += sec
        val live = NeardupIndex.liveBatchDirs(spark, idx).size
        val compactSec =
          if ((k + 1) % compactEvery == 0)
            f"${timed(NeardupIndex.compact(spark, idx))._2}%11.2f"
          else f"${"-"}%11s"
        println(f"$k%8d $nDocs%6d $sec%7.2f $live%9d $compactSec")
      }
    } finally q.stop()
    batchDocs.unpersist()
    val (head, tail, ratio) = flatness(secs.result())
    println(f"neardup_stream flatness: first-third ${head}%.2fs " +
      f"last-third ${tail}%.2fs ratio ${ratio}%.2f (1.0 = flat)")
  }

  /** X81b: the streaming admission gate's per-arrival cost must be
    * flat by construction — stateless given its persisted statistics
    * (three broadcast tables), no index growth, no state store. The
    * measurement pins that nothing accidental (listing, checkpoint
    * bloat, stats re-read) creeps in as the stream ages. */
  def gateStress(spark: SparkSession, corpus: String,
      nArrivals: Int): Unit = {
    val base = Scratch.under("ingest/quality_gate_stream_stress")
    Scratch.deleteRecursive(base)
    val (watch, out, ckpt) = (s"$base/watch", s"$base/verdicts",
      s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    val (statsDir, statsSec) = timed {
      graft.ops.QualitySignals.qualityGateBuildStats(spark, corpus)
    }
    val batchDocs = Tables.t(spark, corpus, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .filter(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("slice", pmod(xxhash64(col("doc_id")), lit(nArrivals)))
      .persist()
    val nBatch = batchDocs.count()
    println(f"quality_gate_stream_stress: corpus=$corpus " +
      f"stats_build=$statsSec%.2fs batch_docs=$nBatch arrivals=$nArrivals")
    println(f"${"arrival"}%8s ${"docs"}%6s ${"sec"}%7s")
    val secs = Seq.newBuilder[Double]
    val q = graft.streaming.GateStream.start(spark, watch, statsDir,
      out, ckpt)
    try {
      (0 until nArrivals).foreach { k =>
        val slice = batchDocs.filter(col("slice") === k).drop("slice")
        val nDocs = slice.count()
        val (_, sec) = timed {
          landParquet(slice, base.toString, watch, s"arr$k")
          q.processAllAvailable()
        }
        secs += sec
        println(f"$k%8d $nDocs%6d $sec%7.2f")
      }
    } finally q.stop()
    batchDocs.unpersist()
    val (head, tail, ratio) = flatness(secs.result())
    println(f"quality_gate_stream flatness: first-third ${head}%.2fs " +
      f"last-third ${tail}%.2fs ratio ${ratio}%.2f (1.0 = flat)")
  }

  /** X106f: streaming media probe — asset FILES land per arrival and
    * each micro-batch decodes batch-side only, probing the PERSISTED
    * signature index (built once from the n× corpus). Per-arrival
    * cost must be flat: batch decode + a banded join against the slim
    * index; the index never grows during the stream and no state
    * store exists. The variant store's files are dealt round-robin
    * into arrivals. */
  def mediaStress(spark: SparkSession, corpus: String,
      nArrivals: Int): Unit = {
    val base = Scratch.under("ingest/media_probe_stream_stress")
    Scratch.deleteRecursive(base)
    val (watch, out, ckpt) = (s"$base/watch", s"$base/verdicts",
      s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    val (idxDir, idxSec) = timed {
      graft.ops.MediaNeardup.sigIndexDir(spark, corpus)
    }
    val variants = new java.io.File(
        graft.ops.MediaNeardup.variantDir(spark, corpus))
      .listFiles().filter(_.getName.endsWith(".ppm")).sortBy(_.getName)
    println(f"media_probe_stream_stress: corpus=$corpus " +
      f"index_build=$idxSec%.2fs assets=${variants.length} " +
      f"arrivals=$nArrivals")
    println(f"${"arrival"}%8s ${"files"}%6s ${"sec"}%7s")
    val secs = Seq.newBuilder[Double]
    val q = graft.streaming.MediaStream.start(spark, watch, idxDir,
      out, ckpt)
    try {
      (0 until nArrivals).foreach { k =>
        val slice = variants.zipWithIndex
          .filter(_._2 % nArrivals == k).map(_._1)
        val (_, sec) = timed {
          slice.foreach { f =>
            val tmp = Paths.get(base.toString, s".tmp_${f.getName}")
            Files.copy(f.toPath, tmp,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            Files.move(tmp, Paths.get(watch, f.getName),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            ()
          }
          q.processAllAvailable()
        }
        secs += sec
        println(f"$k%8d ${slice.length}%6d $sec%7.2f")
      }
    } finally q.stop()
    val (head, tail, ratio) = flatness(secs.result())
    println(f"media_probe_stream flatness: first-third ${head}%.2fs " +
      f"last-third ${tail}%.2fs ratio ${ratio}%.2f (1.0 = flat)")
  }

  /** X82b: the streaming extractor is a pure projection — no stats,
    * no state, no index — so its per-arrival cost is the strongest
    * flat claim in the streaming family. Measured over the n× doc
    * corpus wrapped in synthetic page chrome (the ScaleStress X82
    * recipe), sliced into arrivals. */
  def extractStress(spark: SparkSession, corpus: String,
      nArrivals: Int): Unit = {
    val base = Scratch.under("ingest/html_extract_stream_stress")
    Scratch.deleteRecursive(base)
    val (watch, out, ckpt) = (s"$base/watch", s"$base/extracted",
      s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    val pages = graft.ops.HtmlExtract.chromeWrap(
        Tables.t(spark, corpus, "documents")
          .filter(pmod(col("doc_id"), lit(7)) === 0)) // batch convention
      .withColumn("slice", pmod(xxhash64(col("doc_id")), lit(nArrivals)))
      .persist()
    val nPages = pages.count()
    println(s"html_extract_stream_stress: corpus=$corpus " +
      s"pages=$nPages arrivals=$nArrivals")
    println(f"${"arrival"}%8s ${"docs"}%6s ${"sec"}%7s")
    val secs = Seq.newBuilder[Double]
    val q = graft.streaming.ExtractStream.start(spark, watch, out, ckpt)
    try {
      (0 until nArrivals).foreach { k =>
        val slice = pages.filter(col("slice") === k).drop("slice")
        val nDocs = slice.count()
        val (_, sec) = timed {
          landParquet(slice, base.toString, watch, s"arr$k")
          q.processAllAvailable()
        }
        secs += sec
        println(f"$k%8d $nDocs%6d $sec%7.2f")
      }
    } finally q.stop()
    pages.unpersist()
    val (head, tail, ratio) = flatness(secs.result())
    println(f"html_extract_stream flatness: first-third ${head}%.2fs " +
      f"last-third ${tail}%.2fs ratio ${ratio}%.2f (1.0 = flat)")
  }

  /** X84b: the streaming crawl entry's per-arrival work is extraction
    * + admission + slim-state append for the BATCH ONLY — no read of
    * accumulated state inside foreachBatch — so arrival cost must
    * stay flat as the stream ages. The manifest fold (which does read
    * the whole state) is priced separately once at the end: it is the
    * report query, not the per-arrival path. Mixed chrome, so
    * admission passes ~half and the dedup state is real. */
  def crawlStress(spark: SparkSession, corpus: String,
      nArrivals: Int): Unit = {
    val base = Scratch.under("ingest/crawl_ingest_stream_stress")
    Scratch.deleteRecursive(base)
    val (watch, state, ckpt) = (s"$base/watch", s"$base/state",
      s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    Seq("pages", "admitted", "sigs").foreach(s =>
      Files.createDirectories(Paths.get(s"$state/$s")))
    val pages = graft.ops.HtmlExtract.chromeWrapMixed(
        Tables.t(spark, corpus, "documents")
          .filter(pmod(col("doc_id"), lit(7)) === 0))
      .withColumn("page_url",
        concat(lit("http://s"), pmod(col("doc_id"), lit(1000)),
          lit(".test/p"), col("doc_id"), lit(".html")))
      .select("doc_id", "source", "page_url", "html")
      .withColumn("slice", pmod(xxhash64(col("doc_id")), lit(nArrivals)))
      .persist()
    val nPages = pages.count()
    println(s"crawl_ingest_stream_stress: corpus=$corpus " +
      s"pages=$nPages arrivals=$nArrivals")
    println(f"${"arrival"}%8s ${"docs"}%6s ${"sec"}%7s")
    val secs = Seq.newBuilder[Double]
    val q = graft.streaming.CrawlStream.start(spark, watch, state, ckpt)
    try {
      (0 until nArrivals).foreach { k =>
        val slice = pages.filter(col("slice") === k).drop("slice")
        val nDocs = slice.count()
        val (_, sec) = timed {
          landParquet(slice, base.toString, watch, s"arr$k")
          q.processAllAvailable()
        }
        secs += sec
        println(f"$k%8d $nDocs%6d $sec%7.2f")
      }
    } finally q.stop()
    pages.unpersist()
    val (head, tail, ratio) = flatness(secs.result())
    println(f"crawl_ingest_stream flatness: first-third ${head}%.2fs " +
      f"last-third ${tail}%.2fs ratio ${ratio}%.2f (1.0 = flat)")
    val (nRows, foldSec) = timed {
      graft.streaming.CrawlStream.manifestFrom(spark, state).count()
    }
    println(f"crawl_ingest_stream manifest fold: $nRows rows " +
      f"$foldSec%.2fs (report path, prices the accumulated state)")
  }

  def ingestStress(spark: SparkSession, nBatches: Int,
      rowsPerBatch: Int): Unit = {
    val base = Scratch.under("ingest/ingest_stream_stress")
    Scratch.deleteRecursive(base)
    val watch = s"$base/inbound"
    Files.createDirectories(Paths.get(watch))
    val cfg = TableConfig.fromFile(
      "fixtures/config/sap/customers_upsert/customers_upsert_config.json")
    val layout =
      LakeLayout(s"$base/landing", s"$base/config", s"$base/curated")
    def csvFor(day: Int): String = {
      val sb = new StringBuilder("id,name,city,bal,junk\n")
      (1 to rowsPerBatch).foreach { id =>
        sb.append(s"$id,name_$id,city_${id % 50},${id % 1000}.25,x\n")
      }
      sb.result()
    }
    def land(day: Int): Unit = {
      val date = java.time.LocalDate.of(2024, 7, 1).plusDays(day.toLong)
        .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
      val name = s"customers_$date.csv"
      val tmp = Paths.get(s"$base/.staging_$name")
      Files.writeString(tmp, csvFor(day))
      Files.move(tmp, Paths.get(s"$watch/$name"),
        StandardCopyOption.ATOMIC_MOVE)
      ()
    }
    // file present before start: the streaming CSV reader needs a
    // schema source and batch 0 (same as the registered harness)
    land(0)
    println(s"ingest_stream_stress: batches=$nBatches " +
      s"rows_per_batch=$rowsPerBatch (distinct dt per batch, upsert)")
    println(f"${"batch"}%6s ${"sec"}%7s ${"curated_rows"}%12s")
    val secs = Seq.newBuilder[Double]
    val q = IngestStream.start(spark, watch, cfg, layout, "sap",
      "customers_stress", s"$base/ckpt",
      clock = Some(java.sql.Timestamp.from(
        java.time.Instant.parse("2024-07-01T00:00:00Z"))))
    try {
      (0 until nBatches).foreach { k =>
        val (_, sec) = timed {
          if (k > 0) land(k)
          q.processAllAvailable()
        }
        secs += sec
        val rows = graft.load.Strategies
          .readCurated(spark, layout.curatedPath("sap", "customers_stress"))
          .count()
        println(f"$k%6d $sec%7.2f $rows%12d")
      }
    } finally q.stop()
    val (head, tail, ratio) = flatness(secs.result())
    println(f"ingest_stream flatness: first-third ${head}%.2fs " +
      f"last-third ${tail}%.2fs ratio ${ratio}%.2f (1.0 = flat)")
  }

  def main(args: Array[String]): Unit = {
    val docScale = args.headOption.map(_.toInt).getOrElse(10)
    val nArrivals = args.lift(1).map(_.toInt).getOrElse(20)
    val rowsPerBatch = args.lift(2).map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-stream-stress",
      Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Scratch.under(s"scale/x$docScale").toString
    if (!new java.io.File(s"$corpus/documents.parquet/_SUCCESS").exists())
      ScaleStress.buildDocCorpus(spark, "/root/testdata/sf0.1", corpus,
        docScale)
    val only = sys.env.get("SPARK_GRAFT_OPS")
      .map(_.split(",").map(_.trim).toSet)
    def run(name: String)(f: => Unit): Unit =
      if (only.forall(_.contains(name))) f
    run("neardup_stream")(
      neardupStress(spark, corpus, nArrivals, compactEvery = 5))
    run("quality_gate_stream")(gateStress(spark, corpus, nArrivals))
    run("html_extract_stream")(extractStress(spark, corpus, nArrivals))
    run("crawl_ingest_stream")(crawlStress(spark, corpus, nArrivals))
    run("media_probe_stream")(mediaStress(spark, corpus, nArrivals))
    run("ingest_stream")(ingestStress(spark, nArrivals, rowsPerBatch))
    spark.stop()
  }
}
