package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** X112 — cross-modal ASSET GC: when the text dedup manifest drops a
  * document from the lake (X76b `dedup_apply`), every media asset that
  * document owns — across ALL THREE asset stores (PPM image incl.
  * variants, WAV audio, Y4M video) — must stop being stored and
  * served. Without this, a 100 TB lake accumulates orphaned media:
  * the text side collapses a near-dup clique to its keeper while each
  * dropped member's image/audio/video payloads (the BULK of the bytes
  * at multimodal scale) keep costing storage and keep leaking into
  * any pipeline that walks the asset stores. This is the referential-
  * integrity twin of `dedup_apply` on the media side, exactly as
  * `media_apply` (X106e) is of `media_canonical`.
  *
  * Mechanics (the [[Takedown]] / [[MediaNeardup.mediaApplyStore]]
  * write-back discipline):
  *  - the drop list is [[Takedown.neardupDropIds]] — the SAME
  *    pair-participant-bounded relation `dedup_apply` consumes, so
  *    the two write-backs can never disagree about which documents
  *    died; broadcast-joined against each store's listing (a marker,
  *    never a predicate);
  *  - per modality, dropped assets are RETIRED under
  *    `_deleted/<modality>` FIRST (the restore path exists before any
  *    keeper lands), survivors hard-link into `<modality>/` (zero
  *    bytes copied; cross-device falls back to copy). Linking runs
  *    executor-side over the listing relation — per-file work
  *    distributes like the store builds;
  *  - `_SUCCESS` last, keyed by the documents listing tag — a corpus
  *    refresh re-keys the whole GC.
  *
  * The manifest is computed by READING BACK the written stores
  * (proving the write, not the plan): counts from the three
  * consolidated + retired listings, and the retired UNIT mass
  * (pixels/samples/frames) from a real decode of the retired files —
  * so a GC that linked the wrong files, or retired undecodable
  * bytes, hash-fails against the oracle's re-derived arithmetic.
  *
  * Scale shape: three path-only listings (no byte reads) + one
  * decode pass over the RETIRED set (drop-bounded, ≪ corpus); the
  * write-back itself is `_SUCCESS`-memoized and drop-bounded. Only
  * ledger rows ever shuffle. */
object AssetGc {

  /** The three stores: (modality, load paths, extension, units
    * decode — the [[MediaManifest]] measure: px / samples / frames). */
  private def stores(spark: SparkSession, dir: String)
      : Seq[(String, Seq[String], String, Array[Byte] => Long)] = Seq(
    ("image",
      Seq(Multimodal.mediaAssetDir(spark, dir),
        MediaNeardup.variantDir(spark, dir)), "ppm",
      bytes => {
        val img = PpmCodec.decode(bytes)
        img.width.toLong * img.height
      }),
    ("audio", Seq(AudioNeardup.audioAssetDir(spark, dir)), "wav",
      bytes => WavCodec.decode(bytes).samples.length.toLong),
    ("video", Seq(VideoNeardup.videoAssetDir(spark, dir)), "y4m",
      bytes => Y4mCodec.decode(bytes).frames.length.toLong))

  private def pathListing(spark: SparkSession, paths: Seq[String],
      ext: String): DataFrame =
    // packScan (r16): a per-file-path binaryFile load otherwise scans
    // as one partition PER PATH — profiled as a 1,278-task job over
    // the three stores at sf0.1
    graft.util.Tables.packScan(
      spark.read.format("binaryFile").load(paths: _*)
        .filter(col("path").endsWith(s".$ext")))
      .select(col("path"),
        regexp_extract(col("path"), s"([^/]+)\\.$ext$$", 1).as("id"))

  /** Execute (or reuse) the GC write-back; returns the store root. */
  def assetGcStore(spark: SparkSession, dir: String): String = {
    val out = s"target/graft_asset_gc/${Tables.pathTag(dir)}_" +
      Tables.listingTag(spark, s"$dir/documents.parquet")
    if (!Tables.successExists(spark, out)) {
      graft.util.Scratch.deleteRecursive(
        java.nio.file.Paths.get(out).toAbsolutePath)
      val outAbs = java.nio.file.Paths.get(out).toAbsolutePath.toString
      // pair-participant-sized; checkpointed so the three listings'
      // marker joins never re-run the MinHash chain
      val drops = Takedown.neardupDropIds(spark, dir).localCheckpoint()
      stores(spark, dir).foreach { case (mod, paths, ext, _) =>
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(outAbs, mod))
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(outAbs, "_deleted", mod))
        val listing = pathListing(spark, paths, ext)
          .withColumn("owner",
            regexp_extract(col("id"), "^doc_(\\d+)", 1).cast("long"))
          .join(broadcast(drops.withColumn("_h", lit(true))),
            col("owner") === col("drop_id"), "left")
          .withColumn("_hit", coalesce(col("_h"), lit(false)))
          .select(col("path"), col("id"), col("_hit"))
          .localCheckpoint()
        def linkAll(df: DataFrame, sub: String): Unit =
          df.select(col("path"), col("id"))
            .foreachPartition {
              it: Iterator[org.apache.spark.sql.Row] =>
              it.foreach { r =>
                val src = java.nio.file.Paths.get(
                  new java.net.URI(r.getString(0)))
                val dst = java.nio.file.Paths.get(
                  s"$outAbs/$sub/${r.getString(1)}.$ext")
                try { java.nio.file.Files.createLink(dst, src); () }
                catch { case _: UnsupportedOperationException |
                    _: java.nio.file.FileSystemException =>
                  java.nio.file.Files.copy(src, dst,
                    java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
                  ()
                }
              }
            }
        // retire FIRST: the restore path exists before keepers land
        linkAll(listing.filter(col("_hit")), s"_deleted/$mod")
        linkAll(listing.filter(!col("_hit")), mod)
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "_SUCCESS"), Array.emptyByteArray)
    }
    out
  }

  /** X112 registered query — the GC manifest: per modality, assets
    * before, retired, surviving (all read back from the written
    * stores), and the retired unit mass from a REAL decode of the
    * retired files. */
  def assetGc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = assetGcStore(spark, dir)
    val counts = stores(spark, dir).map { case (mod, paths, ext, _) =>
      pathListing(spark, paths, ext)
        .select(lit(mod).as("modality"), lit("before").as("kind"))
        .union(pathListing(spark, Seq(s"$store/_deleted/$mod"), ext)
          .select(lit(mod).as("modality"), lit("removed").as("kind")))
        .union(pathListing(spark, Seq(s"$store/$mod"), ext)
          .select(lit(mod).as("modality"), lit("after").as("kind")))
    }.reduce(_ union _)
      .groupBy("modality")
      .agg(
        sum(when(col("kind") === "before", 1L).otherwise(0L))
          .as("n_before"),
        sum(when(col("kind") === "removed", 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("kind") === "after", 1L).otherwise(0L))
          .as("n_after"))
    val failures =
      spark.sparkContext.longAccumulator("graft.assetgc.decode_failures")
    val units = stores(spark, dir).map { case (mod, _, ext, decode) =>
      graft.util.Tables.packScan(
        spark.read.format("binaryFile").load(s"$store/_deleted/$mod")
          .filter(col("path").endsWith(s".$ext")))
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          val log =
            org.slf4j.LoggerFactory.getLogger("graft.ops.AssetGc")
          it.flatMap { case (p, payload) =>
            scala.util.Try((mod, decode(payload))).recoverWith {
              case e =>
                failures.add(1L)
                log.warn(s"gc read-back decode failed for $p: " +
                  s"${e.getMessage}")
                scala.util.Failure(e)
            }.toOption
          }
        }
        .toDF("modality", "units")
    }.reduce(_ union _)
      .groupBy("modality")
      .agg(sum(col("units")).as("units_removed"))
    counts.join(units, Seq("modality"), "left")
      .select(col("modality"), col("n_before"), col("n_removed"),
        col("n_after"),
        coalesce(col("units_removed"), lit(0L)).as("units_removed"))
      .orderBy("modality")
  }
}
