package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.HtmlExtract

/** X82b — STREAMING markup extraction: the continuous form of
  * [[graft.ops.HtmlExtract.htmlExtract]], the shape a crawl ingest
  * edge actually runs (pages arrive continuously; extraction is the
  * FIRST stage, ahead of every text operator and the X81 admission
  * gate). Incoming raw pages arrive as files in a watched directory;
  * each micro-batch runs the full deterministic extraction chain and
  * its rows land under an idempotent `batch_id=<id>` subdirectory.
  *
  * The extraction is a pure per-row projection — no state store, no
  * watermark, no corpus statistics — so the stream's per-arrival cost
  * is batch-sized forever, the strongest possible streaming shape
  * (even [[GateStream]] carries three broadcast stats; this stage
  * carries nothing).
  *
  * Output semantics are pinned to the batch operator: the harness
  * streams the fixture corpus in two arrivals and the accumulated
  * rows equal [[graft.ops.HtmlExtract.htmlExtract]] byte-for-byte —
  * and share its DuckDB oracle. */
object ExtractStream {

  /** The shared fixture schema — [[HtmlExtract.FixtureSchema]], not a
    * local copy: the CSV is positional under an explicit schema, so a
    * drifted copy shears columns sideways. */
  val pageSchema: StructType = HtmlExtract.FixtureSchema

  /** Start the extraction stream over a watched parquet dir. Each
    * micro-batch OVERWRITES its own `batch_id=<id>` subdirectory
    * (idempotent under foreachBatch's at-least-once replay, the
    * [[NeardupStream.start]] contract). */
  def start(spark: SparkSession, watchDir: String, out: String,
      checkpoint: String): StreamingQuery = {
    spark.readStream.schema(pageSchema).parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        if (!rawBatch.isEmpty) {
          HtmlExtract.htmlExtractFrom(rawBatch)
            .write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
        }
      }
      .start()
  }

  /** Registered-query harness (gate row `html_extract_stream`): stage
    * the fixture corpus as TWO file arrivals through a real
    * StreamingQuery and return the accumulated extractions —
    * byte-equal to the batch operator and checked by the same
    * oracle. */
  def extractStreamQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.util.Scratch.under("ingest/html_extract_stream")
    graft.util.Scratch.deleteRecursive(base)
    val (watch, out, ckpt) = (s"$base/watch", s"$base/extracted",
      s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    Files.createDirectories(Paths.get(out))

    val pages = HtmlExtract.fixturePages(spark)

    def land(slice: DataFrame, name: String): Unit =
      graft.util.StreamFiles.landParquet(slice, base.toString, watch,
        name)
    val q = start(spark, watch, out, ckpt)
    try {
      land(pages.filter(pmod(col("doc_id"), lit(2)) === 0), "arrival1")
      q.processAllAvailable()
      land(pages.filter(pmod(col("doc_id"), lit(2)) =!= 0), "arrival2")
      q.processAllAvailable()
    } finally q.stop()

    // explicit schema: with zero written batches the dir is empty and
    // schema inference would fail; the extractor's own plan IS the
    // schema
    val outSchema = HtmlExtract.htmlExtractFrom(pages.limit(0)).schema
    spark.read.schema(outSchema).parquet(out)
      .select("doc_id", "source", "text", "text_len", "n_links",
        "link_chars", "link_density", "boilerplate_flag")
      .orderBy("doc_id")
  }
}
