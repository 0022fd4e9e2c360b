package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.MediaNeardup

/** X106f — STREAMING media ingest: the continuous form of
  * [[MediaNeardup.mediaNeardupProbe]], closing the media family's
  * stream column (every other family — ingest, extract, gate,
  * neardup, crawl, discovery — already has one). Media ARRIVALS land
  * as raw asset files in a watched directory (the real `binaryFile`
  * file-stream source, not a parquet stand-in); each micro-batch is
  * decoded and dHashed BATCH-SIDE only and probed against the
  * PERSISTED base-asset signature index — the corpus is never decoded
  * at arrival time — and its verdict rows land under an idempotent
  * `batch_id=<id>` subdirectory (the [[GateStream.start]] contract:
  * overwrite-own-subdir is replay-safe under foreachBatch's
  * at-least-once).
  *
  * Per-arrival cost is batch-decode + a banded join against the slim
  * index (16-byte signatures; the index side carries the X106c
  * occupancy cap) — flat in corpus size forever, the serving shape
  * the persisted perceptual index exists for.
  *
  * Verdict semantics are pinned to the batch operator: the harness
  * streams the variant store in two file arrivals and the accumulated
  * verdicts equal [[MediaNeardup.mediaNeardupProbe]] — and share its
  * DuckDB oracle. */
object MediaStream {

  /** The binaryFile source's fixed schema — a streaming source must
    * declare it explicitly. */
  private val binarySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** Start the media probe stream over a watched asset directory. */
  def start(spark: SparkSession, watchDir: String, idxDir: String,
      out: String, checkpoint: String): StreamingQuery = {
    spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.ppm")
      .load(watchDir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.ppm$", 1).as("id"),
        col("content"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        if (!rawBatch.isEmpty) {
          MediaNeardup.probeAgainstIndex(spark,
              MediaNeardup.sigsOf(spark, rawBatch), idxDir,
              MediaNeardup.HammingMax, MediaNeardup.MaxBucket)
            .write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
        }
      }
      .start()
  }

  /** Registered-query harness (gate row `media_probe_stream`): build
    * the persisted signature index, stream the variant store's files
    * in TWO arrivals through a real StreamingQuery, and return the
    * accumulated verdicts — byte-equal to the batch probe and checked
    * by the same oracle. Arrivals are REAL file landings: each .ppm
    * copies to a scratch temp name and atomically moves into the
    * watched dir (the file source must never list a half-written
    * asset). */
  def mediaProbeStreamQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val base = graft.util.Scratch.under("ingest/media_probe_stream")
    graft.util.Scratch.deleteRecursive(base)
    val (watch, out, ckpt) = (s"$base/watch", s"$base/verdicts",
      s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    Files.createDirectories(Paths.get(out))

    val idxDir = MediaNeardup.sigIndexDir(spark, dir)
    val variants = {
      val d = new java.io.File(
        MediaNeardup.variantDir(spark, dir))
      d.listFiles().filter(_.getName.endsWith(".ppm")).sortBy(_.getName)
    }
    require(variants.nonEmpty, "variant store is empty")

    def land(files: Seq[java.io.File]): Unit =
      files.foreach { f =>
        val tmp = Paths.get(base.toString, s".tmp_${f.getName}")
        Files.copy(f.toPath, tmp, StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, Paths.get(watch, f.getName),
          StandardCopyOption.ATOMIC_MOVE)
        ()
      }
    val (arr1, arr2) = variants.toSeq.zipWithIndex
      .partition(_._2 % 2 == 0)
    val q = start(spark, watch, idxDir, out, ckpt)
    try {
      land(arr1.map(_._1))
      q.processAllAvailable()
      land(arr2.map(_._1))
      q.processAllAvailable()
    } finally q.stop()

    val verdictSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("new_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("corpus_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("hamming",
        org.apache.spark.sql.types.IntegerType)))
    spark.read.schema(verdictSchema).parquet(out)
      .select(col("new_id"), col("corpus_id"), col("hamming"))
      .orderBy("new_id", "corpus_id")
  }
}
