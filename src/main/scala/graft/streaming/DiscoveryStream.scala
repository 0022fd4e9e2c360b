package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.{HtmlExtract, Sitemap}

/** X101b — STREAMING discovery feed: the continuous form of
  * [[graft.ops.Sitemap.discoveryFeed]]. Newly crawled pages arrive as
  * files in a watched directory; each micro-batch does BATCH-SIZED
  * work only — resolve the arriving pages' outlinks (the X83b chain
  * over just this batch) and normalize their page URLs — and appends
  * both as slim per-batch state (`outlinks/batch_id=`,
  * `seen/batch_id=`, idempotent overwrite under foreachBatch's
  * at-least-once replay, the [[NeardupStream.start]] contract). The
  * FEED is then a read-time view over the accumulated state through
  * the SAME [[Sitemap.discoveryFeedAssemble]] the batch operator
  * uses: distinct outlinks ∖ accumulated seen, folded with the
  * sitemap and robots channels.
  *
  * The anti-join at READ time is what makes accumulation correct: a
  * URL discovered in arrival 1 and then CRAWLED in arrival 2 must
  * leave the feed (it is seen now) — per-batch append-only feed rows
  * could never retract it. Per-arrival cost is batch-sized forever;
  * the stores carry (host, url) and (url) strings, never pages.
  *
  * Pinned by SitemapSpec: the accumulated stream feed equals the
  * batch [[Sitemap.discoveryFeed]] ROW FOR ROW over the same pages
  * (shared DuckDB oracle), including a witness URL that arrival 2
  * retracts. */
object DiscoveryStream {

  val pageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("page_url", StringType), StructField("html", StringType)))

  private val outlinkSchema = StructType(Seq(
    StructField("host", StringType), StructField("url", StringType)))
  private val seenSchema = StructType(Seq(
    StructField("url", StringType)))

  /** Start the discovery stream over a watched parquet dir of crawled
    * pages. */
  def start(spark: SparkSession, watchDir: String, outBase: String,
      checkpoint: String): StreamingQuery =
    spark.readStream.schema(pageSchema).parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          HtmlExtract.resolvedUrls(batch)
            .filter(!col("host").isin("(non-http)", "(unresolved)"))
            .select(col("host"), col("r").as("url")).distinct()
            .write.mode("overwrite")
            .parquet(s"$outBase/outlinks/batch_id=$batchId")
          batch
            .filter(col("page_url").isNotNull && col("page_url") =!= "")
            .select(HtmlExtract.normalizeUrl(col("page_url")).as("url"))
            .distinct()
            .write.mode("overwrite")
            .parquet(s"$outBase/seen/batch_id=$batchId")
        }
      }
      .start()

  /** Registered-query harness (`discovery_feed_stream`): stream the
    * crawl fixture's pages in TWO file arrivals through a real
    * StreamingQuery, then assemble the feed from the accumulated
    * per-batch state — byte-equal to the batch feed and checked by
    * the same oracle. */
  def discoveryStreamQuery(spark: SparkSession, dir: String): DataFrame =
    streamFeed(spark, HtmlExtract.fixturePages(spark),
      pmod(col("doc_id"), lit(2)) === 0)

  /** The two-arrival stream harness over an ARBITRARY page relation
    * split by `arrival1` — shared by the registered fixture query and
    * the retraction-witness spec (the fixture's only crawled-URL
    * targets are self links, so the cross-arrival retraction needs a
    * planted corpus). */
  private[graft] def streamFeed(spark: SparkSession, pages: DataFrame,
      arrival1: org.apache.spark.sql.Column): DataFrame = {
    val base = graft.util.Scratch.under("ingest/discovery_feed_stream")
    graft.util.Scratch.deleteRecursive(base)
    val (watch, out, ckpt) = (s"$base/watch", s"$base/state",
      s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    // pre-create both stores: an empty arrival writes nothing and the
    // read-back must see empty relations, not PATH_NOT_FOUND
    Files.createDirectories(Paths.get(s"$out/outlinks"))
    Files.createDirectories(Paths.get(s"$out/seen"))

    def land(slice: DataFrame, name: String): Unit =
      graft.util.StreamFiles.landParquet(slice, base.toString, watch,
        name)
    val q = start(spark, watch, out, ckpt)
    try {
      land(pages.filter(arrival1), "arrival1")
      q.processAllAvailable()
      land(pages.filter(!arrival1), "arrival2")
      q.processAllAvailable()
    } finally q.stop()

    // select the data columns explicitly: partition discovery appends
    // the batch_id dir column, which must not join the distinct keys
    val outlinks = spark.read.schema(outlinkSchema)
      .parquet(s"$out/outlinks").select("host", "url").distinct()
    val seen = spark.read.schema(seenSchema)
      .parquet(s"$out/seen").select("url").distinct()
    Sitemap.discoveryFeedAssemble(spark, outlinks, seen)
  }
}
