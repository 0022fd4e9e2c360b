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
