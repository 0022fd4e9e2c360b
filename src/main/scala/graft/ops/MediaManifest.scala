package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X111 — the CROSS-MODAL asset manifest: one row per training
  * document with its full multimodal inventory, decoded from all
  * three asset stores (PPM images X16/X106, WAV audio X109, Y4M video
  * X110). This is the packing precursor of a multimodal training
  * pipeline — before interleaving text with its media, the pipeline
  * needs the per-document ledger of what exists, how much of it there
  * is, and in which decoded units (pixels, samples, frames).
  *
  * Every value is DECODED, not inferred from names: the three codecs
  * parse each container's header for real and the manifest sums the
  * parsed geometry — so a truncated or mis-encoded asset is excluded
  * by its family's loud-failure admission rule rather than counted
  * from its filename. The DuckDB oracle re-derives every count and
  * unit sum from the store-generation arithmetic, so a decode drift
  * in ANY of the three codecs hash-fails here too.
  *
  * Scale shape: three binaryFile scans, each a typed header-decode
  * mapPartitions emitting one slim (doc_id, modality, units) row per
  * asset — no shuffle until the single doc-keyed aggregation; at
  * 100 TB of media the scans ARE the job and only ledger rows move.
  * Counts and unit sums are map-side-combinable, so the agg state is
  * documents-sized, never assets-sized. */
object MediaManifest {

  private def docIdOf(c: org.apache.spark.sql.Column) =
    regexp_extract(c, "^doc_(\\d+)", 1).cast("long")

  /** Slim per-asset ledger rows of one modality: (doc_id, units)
    * where `units` is the modality's decoded content measure. */
  private def ledger(spark: SparkSession, files: DataFrame,
      counter: String)(decode: Array[Byte] => Long): DataFrame = {
    import spark.implicits._
    val failures = spark.sparkContext.longAccumulator(counter)
    files.as[(String, Array[Byte])]
      .mapPartitions { it =>
        val log =
          org.slf4j.LoggerFactory.getLogger("graft.ops.MediaManifest")
        it.flatMap { case (id, payload) =>
          scala.util.Try((id, decode(payload))).recoverWith { case e =>
            failures.add(1L)
            log.warn(s"manifest decode failed for asset $id, " +
              s"excluded: ${e.getMessage}")
            scala.util.Failure(e)
          }.toOption
        }
      }
      .toDF("id", "units")
      .select(docIdOf(col("id")).as("doc_id"), col("units"))
  }

  /** X113 token-cost model (pure integers, so both engines replay it
    * exactly): a visual token per 64 pixels (the ViT patch economy),
    * an audio token per 320 samples (the 20 ms @ 16 kHz frame
    * convention), video priced as patches over its full pixel mass. */
  val ImgPatchPx = 64L
  val AudFrameSamples = 320L
  val PackBudget = 1024L
  val PackShards = 8

  /** X113 registered query — MULTIMODAL sequence packing: the X69
    * `seq_packing` context-window filler extended to the full
    * modality triple. Each document's cost is its whitespace token
    * count PLUS the decoded media token cost of its BASE assets (one
    * content copy per document — the planted `_up`/`_rs`/`_rt`/...
    * variants are re-encodes of the same content and must not be
    * packed twice; exact/perceptual dedup exists to remove them).
    * Sharding, ordering and the greedy `floor(cum_before / budget)`
    * assignment are [[Reshape.seqPacking]]'s verbatim — each worker
    * packs its shard independently, no global sort at 100 TB.
    *
    * Scale shape: three base-asset header decodes → one doc-keyed
    * media-cost agg (map-side combinable) → broadcast-or-shuffled
    * join with the token scan → the single window exchange. Media
    * bytes never shuffle; only (doc_id, tokens) ledger rows do. */
  def multimodalPack(spark: SparkSession, dir: String,
      nShards: Int = PackShards, budget: Long = PackBudget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def baseOnly(df: DataFrame): DataFrame =
      df.filter(col("id").rlike("^doc_[0-9]+$"))
    val images = ledger(spark,
      baseOnly(MediaNeardup.assetFiles(spark, dir)),
      "graft.pack.image_failures") { bytes =>
      val img = PpmCodec.decode(bytes)
      (img.width.toLong * img.height + ImgPatchPx - 1) / ImgPatchPx
    }
    val audio = ledger(spark,
      baseOnly(AudioNeardup.assetFiles(spark, dir)),
      "graft.pack.audio_failures") { bytes =>
      (WavCodec.decode(bytes).samples.length + AudFrameSamples - 1) /
        AudFrameSamples
    }
    val video = ledger(spark,
      baseOnly(VideoNeardup.assetFiles(spark, dir)),
      "graft.pack.video_failures") { bytes =>
      val v = Y4mCodec.decode(bytes)
      (v.frames.length.toLong * v.width * v.height + ImgPatchPx - 1) /
        ImgPatchPx
    }
    val mediaTok = images.union(audio).union(video)
      .groupBy("doc_id")
      .agg(sum(col("units")).as("media_tok"))
    val docs = graft.util.Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("h",
        md5(concat(lit("pack:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        graft.util.Tables.md5Bucket("shard:", col("doc_id"), nShards)
          .cast("int"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
    docs.join(mediaTok, Seq("doc_id"))
      .withColumn("total_tok", col("n_tok") + col("media_tok"))
      .withColumn("cum_tok", sum(col("total_tok")).over(w))
      .withColumn("pack_id",
        floor((col("cum_tok") - col("total_tok")) / lit(budget))
          .cast("long"))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        col("media_tok"), col("total_tok"), col("cum_tok"),
        col("pack_id"))
      .orderBy("doc_id")
  }

  /** X111 registered query — per-document multimodal inventory:
    * asset counts and decoded unit sums for all three modalities. */
  def multimodalManifest(spark: SparkSession, dir: String): DataFrame = {
    val images = ledger(spark, MediaNeardup.assetFiles(spark, dir),
      "graft.manifest.image_failures") { bytes =>
      val img = PpmCodec.decode(bytes)
      img.width.toLong * img.height
    }.withColumn("modality", lit("image"))
    val audio = ledger(spark, AudioNeardup.assetFiles(spark, dir),
      "graft.manifest.audio_failures") { bytes =>
      WavCodec.decode(bytes).samples.length.toLong
    }.withColumn("modality", lit("audio"))
    val video = ledger(spark, VideoNeardup.assetFiles(spark, dir),
      "graft.manifest.video_failures") { bytes =>
      Y4mCodec.decode(bytes).frames.length.toLong
    }.withColumn("modality", lit("video"))
    images.union(audio).union(video)
      .groupBy("doc_id")
      .agg(
        sum(when(col("modality") === "image", 1L).otherwise(0L))
          .as("n_image"),
        sum(when(col("modality") === "image", col("units"))
          .otherwise(0L)).as("image_px"),
        sum(when(col("modality") === "audio", 1L).otherwise(0L))
          .as("n_audio"),
        sum(when(col("modality") === "audio", col("units"))
          .otherwise(0L)).as("audio_samples"),
        sum(when(col("modality") === "video", 1L).otherwise(0L))
          .as("n_video"),
        sum(when(col("modality") === "video", col("units"))
          .otherwise(0L)).as("video_frames"),
        count(lit(1)).as("n_assets"))
      .orderBy("doc_id")
  }
}
