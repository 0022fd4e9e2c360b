package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.{Dedup, HtmlExtract, TextAnalysis}

/** X84b — STREAMING crawl entry, composed: the continuous form of
  * [[graft.ops.HtmlExtract.crawlIngest]] (extract → admit → exact
  * dedup → near-dup collapse → manifest), chained the way a live
  * crawl edge actually runs. Raw pages arrive as files in a watched
  * directory; each micro-batch runs the FULL extraction + admission
  * chain ONCE and persists three slim per-batch relations under
  * idempotent `batch_id=<id>` subdirectories (the [[NeardupStream]]
  * at-least-once contract):
  *
  *   pages/    (doc_id, source)                     — fetch ledger
  *   admitted/ (doc_id, source, text_len, n_tok, k) — k = md5(text)
  *   sigs/     (doc_id, band, sig)                  — MinHash bands
  *
  * Extraction, tokenization and shingling are therefore BATCH-SIDED
  * and NEVER repeated for old arrivals — the per-arrival cost is
  * batch-sized forever. The page TEXT never needs to be stored or
  * re-read: everything the dedup stages and the manifest consume
  * (exact-text key, band signatures, token/char mass) is derived at
  * extraction time.
  *
  * The manifest is then a pure fold over the accumulated slim stores:
  * keep-min-doc_id per md5 key (exact stage), bucket-local pair
  * generation over the UNIQUE docs' stored signatures + the one-pass
  * larger-side drop (near-dup stage, [[Dedup.pairsFromSigs]] — the
  * identical derivation the batch operator runs), source rollups.
  * Accumulated over any arrival order this is byte-equal to the batch
  * [[graft.ops.HtmlExtract.crawlIngest]] — and shares its DuckDB
  * oracle. Dedup is GLOBAL across arrivals by construction: a page
  * whose twin arrived three batches ago still collapses, including
  * the retroactive direction (a smaller-id near-dup arriving late
  * drops an already-accepted larger doc from the manifest — the fold
  * re-derives verdicts from state, it never freezes them). */
object CrawlStream {

  val pageSchema: StructType = HtmlExtract.FixtureSchema

  private val admittedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text_len", LongType), StructField("n_tok", LongType),
    StructField("k", StringType)))

  private val pagesLedgerSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType)))

  private val sigSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band", org.apache.spark.sql.types.IntegerType),
    StructField("sig", StringType)))

  /** Start the crawl-entry stream over a watched parquet dir. */
  def start(spark: SparkSession, watchDir: String, stateDir: String,
      checkpoint: String, nBands: Int = 8): StreamingQuery = {
    spark.readStream.schema(pageSchema).parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        if (!rawBatch.isEmpty) {
          // one extraction chain per micro-batch; persisted because
          // three slim projections consume it
          val ex = HtmlExtract.htmlExtractFrom(rawBatch).persist()
          try {
            val admitted = ex
              .filter(!col("boilerplate_flag") &&
                col("text_len") >= HtmlExtract.MinTextLen)
              .withColumn("n_tok",
                size(TextAnalysis.tokens(col("text"))).cast("long"))
              .withColumn("k", md5(col("text")))
              .persist()
            try {
              ex.select(col("doc_id"), col("source"))
                .write.mode("overwrite")
                .parquet(s"$stateDir/pages/batch_id=$batchId")
              admitted.select(col("doc_id"), col("source"),
                  col("text_len"), col("n_tok"), col("k"))
                .write.mode("overwrite")
                .parquet(s"$stateDir/admitted/batch_id=$batchId")
              Dedup.bandSignaturesFor(
                  admitted.select(col("doc_id"), col("text")), nBands)
                .write.mode("overwrite")
                .parquet(s"$stateDir/sigs/batch_id=$batchId")
            } finally { admitted.unpersist(); () }
          } finally { ex.unpersist(); () }
        }
      }
      .start()
  }

  /** The manifest fold over the accumulated slim stores — the
    * identical stage semantics as the batch operator, with zero page
    * text in sight. */
  private[graft] def manifestFrom(spark: SparkSession,
      stateDir: String, minBands: Int = 4): DataFrame = {
    val pages = spark.read.schema(pagesLedgerSchema)
      .parquet(s"$stateDir/pages")
    val admitted = spark.read.schema(admittedSchema)
      .parquet(s"$stateDir/admitted")
    val sigs = spark.read.schema(sigSchema)
      .parquet(s"$stateDir/sigs")
    val unique = admitted
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .drop("rn")
      .localCheckpoint()
    // pair generation over the UNIQUE docs' stored signatures — the
    // batch operator shingles exactly this set. DISTINCT first: a
    // re-fetch (same page in two arrivals) lands identical signature
    // rows under two batch_id dirs, and the duplicate rows would make
    // a one-doc bucket read [x, x] and emit the self-pair (x, x) —
    // dropping the doc from the manifest while the batch pipeline
    // keeps it (review r14)
    val pairs = Dedup.pairsFromSigs(
      sigs.select(col("doc_id"), col("band"), col("sig"))
        .join(unique.select(col("doc_id")), Seq("doc_id"))
        .distinct(),
      minBands, maxBucket = 0)
    val drops = pairs.select(col("doc_b").as("doc_id")).distinct()
    val fin = unique.join(drops, Seq("doc_id"), "left_anti")
    val pagesBySrc = pages.groupBy(col("source"))
      .agg(count(lit(1)).as("n_pages"))
    val admitBySrc = admitted.groupBy(col("source"))
      .agg(count(lit(1)).as("n_admitted"))
    val uniqBySrc = unique.groupBy(col("source"))
      .agg(count(lit(1)).as("n_unique"))
    val finBySrc = fin.groupBy(col("source"))
      .agg(count(lit(1)).as("n_final"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("text_len")).as("n_chars"))
    pagesBySrc
      .join(admitBySrc, Seq("source"), "left")
      .join(uniqBySrc, Seq("source"), "left")
      .join(finBySrc, Seq("source"), "left")
      .select(col("source"), col("n_pages"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_final"), lit(0L)).as("n_final"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .orderBy("source")
  }

  /** Registered-query harness (gate row `crawl_ingest_stream`): the
    * fixture corpus in TWO file arrivals through a real
    * StreamingQuery, then the manifest fold — byte-equal to the batch
    * [[graft.ops.HtmlExtract.crawlIngest]] and checked by the same
    * oracle. */
  def crawlStreamQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.util.Scratch.under("ingest/crawl_ingest_stream")
    graft.util.Scratch.deleteRecursive(base)
    val (watch, state, ckpt) =
      (s"$base/watch", s"$base/state", s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    // pre-create the stores: an empty corpus writes no batches and
    // the fold must return the batch answer (empty), not
    // PATH_NOT_FOUND
    Seq("pages", "admitted", "sigs").foreach(s =>
      Files.createDirectories(Paths.get(s"$state/$s")))

    val pages = HtmlExtract.fixturePages(spark)
    def land(slice: DataFrame, name: String): Unit =
      graft.util.StreamFiles.landParquet(slice, base.toString, watch,
        name)
    val q = start(spark, watch, state, ckpt)
    try {
      land(pages.filter(pmod(col("doc_id"), lit(2)) === 0), "arrival1")
      q.processAllAvailable()
      land(pages.filter(pmod(col("doc_id"), lit(2)) =!= 0), "arrival2")
      q.processAllAvailable()
    } finally q.stop()

    manifestFrom(spark, state)
  }
}
