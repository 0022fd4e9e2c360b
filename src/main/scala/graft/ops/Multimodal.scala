package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.t

/** X16 — multimodal column handling: media as opaque `binary` columns
  * with typed metadata structs (SURVEY.md §2.8).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic fake — content hashing + byte sampling stand in for
  * pixel decoding — while everything Spark-side is real: binary column
  * construction, struct metadata, codegen'd byte ops, schema. A real
  * decoder would replace [[mediaFeatures]]'s hash/sample expressions
  * with a `mapPartitions` (Scala) or `mapInPandas` (Python) stage of
  * the same signature: binary in, feature struct out. */
object Multimodal {

  /** Documents recast as media blobs: payload = UTF-8 bytes (the stand-in
    * for an image/audio payload), metadata = typed struct. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /** Deterministic "decode + feature extract + frame-sample" over the
    * payload bytes: length, sha-256 content hash, head bytes, and three
    * sampled "frames" (byte offsets 1, mid, last — the frame-sampling
    * shape without a codec). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val len = octet_length(col("payload"))
    mediaTable(spark, dir)
      .select(
        col("media_id"),
        col("meta.lang").as("lang"),
        col("meta.source").as("source"),
        col("meta.n_chars").as("n_chars"),
        len.as("n_bytes"),
        sha2(col("payload"), 256).as("content_sha"),
        hex(substring(col("payload"), 1, 8)).as("head_hex"),
        hex(substring(col("payload"), 1, 1)).as("frame_0"),
        // int/int division is double in Spark; cast truncates = DuckDB's
        // floor `//` for positive lengths.
        hex(col("payload").substr((len / 2).cast("int"), lit(1)))
          .as("frame_mid"),
        hex(col("payload").substr(len, lit(1))).as("frame_last"))
      .orderBy("media_id")
  }

  /** X16c — media RESIZE: deterministic stride-4 decimation, the
    * codec-free stand-in for spatial downsampling (every real media
    * pipeline's resize step: payload in, smaller payload out, metadata
    * preserved). Per-row expression work on the payload — no shuffle,
    * no UDF; with a real codec this becomes a [[mediaEmbedded]]-style
    * `mapPartitions` stage of the same bytes→bytes signature. Output
    * carries the size accounting and the content hash of the resized
    * payload, so the oracle pins the exact resampled bytes. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    mediaResizeFor(t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text")))

  /** [[mediaResize]] over an arbitrary (media_id, text) frame.
    * Decimation is defined over CHARACTERS (positions 1, 5, 9, … of
    * `text`) in BOTH engines, so the semantics agree for any unicode
    * payload; on the testdata's ASCII payloads (pinned by
    * `multimodal_media`'s oracle) character decimation IS byte
    * decimation of the binary — the workaround for DuckDB's missing
    * BLOB substring. A NULL payload propagates to NULL output (SQL
    * semantics, matching the oracle), never an empty resize. */
  def mediaResizeFor(media: DataFrame): DataFrame = {
    val n = length(col("text"))
    // sequence(a, b) DESCENDS when a > b — an empty payload must
    // resize to an empty payload, not two phantom samples
    val resized = when(col("text").isNull, lit(null).cast("string"))
      .when(n > 0,
        array_join(transform(sequence(lit(1L), ceil(n / 4.0).cast("long")),
          i => col("text").substr(((i - 1) * 4 + 1).cast("int"), lit(1))),
          ""))
      .otherwise(lit(""))
    media
      .select(col("media_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long")
          .as("n_bytes"),
        resized.as("rs"))
      .select(col("media_id"), col("n_bytes"),
        octet_length(encode(col("rs"), "UTF-8")).cast("long")
          .as("resized_bytes"),
        sha2(encode(col("rs"), "UTF-8"), 256).as("resized_sha"))
      .orderBy("media_id")
  }

  /** Image geometry of the generated asset for a document: the PPM
    * dimensions VARY per asset (8–16 × 8–14) so the decoded header is
    * load-bearing — every downstream feature depends on the w/h the
    * decoder parsed, not on a constant. Shared with the
    * `media_embed_topk` oracle (`8 + doc_id % 9`,
    * `8 + (doc_id // 9) % 7` in DuckDB) and MultimodalSpec's
    * independent re-derivation. */
  def assetWidth(id: Long): Int = (8 + id % 9).toInt
  def assetHeight(id: Long): Int = (8 + (id / 9) % 7).toInt

  /** The asset STORE for `dir`: one real PPM (P6) image per document,
    * raster = the document's ASCII bytes repeated cyclically over a
    * per-doc-varying geometry. Files are materialized executor-side
    * (`foreachPartition`, parallel — on a cluster the target would be
    * shared storage, same posture as [[Formats.binaryIngest]]) and
    * `_SUCCESS`-gated per (sf dir, source listing fingerprint) so a
    * testdata refresh self-invalidates the store instead of serving
    * stale pixels. Returns the directory path. */
  def mediaAssetDir(spark: SparkSession, dir: String): String = {
    val tag = graft.util.Tables.pathTag(dir)
    val out = java.nio.file.Paths.get("target/graft_media/" +
      s"ppm_${tag}_" +
      graft.util.Tables.listingTag(spark, s"$dir/documents.parquet"))
      .toAbsolutePath
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      // sweep superseded generations of the SAME sf dir (stale
      // listing tags): nothing else deletes them, and each holds a
      // full per-document file tree
      val root = java.nio.file.Paths.get("target/graft_media")
      if (java.nio.file.Files.exists(root)) {
        val ls = java.nio.file.Files.list(root)
        try ls.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter { p =>
            val n = p.getFileName.toString
            n.startsWith(s"ppm_${tag}_") && p.toAbsolutePath != out
          }.foreach(graft.util.Scratch.deleteRecursive)
        finally ls.close()
      }
      graft.util.Scratch.deleteRecursive(out)
      java.nio.file.Files.createDirectories(out)
      val outStr = out.toString
      t(spark, dir, "documents").select(col("doc_id"), col("text"))
        .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
          it.foreach { r =>
            val id = r.getLong(0)
            val tb = r.getString(1).getBytes("US-ASCII")
            val w = assetWidth(id); val h = assetHeight(id)
            val raster = new Array[Byte](w * h * 3)
            var i = 0
            while (i < raster.length) {
              raster(i) = tb(i % tb.length); i += 1
            }
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outStr/doc_$id.ppm"),
              PpmCodec.encode(w, h, raster))
            ()
          }
        }
      java.nio.file.Files.write(out.resolve("_SUCCESS"),
        Array.emptyByteArray)
    }
    out.toString
  }

  /** The asset store read back through the real `binaryFile` source:
    * (media_id from the file name, payload = the raw PPM bytes). */
  def mediaAssets(spark: SparkSession, dir: String): DataFrame =
    graft.util.Tables.packScan(
      spark.read.format("binaryFile").load(mediaAssetDir(spark, dir))
        .filter(col("path").endsWith(".ppm")))
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.ppm$", 1)
          .cast("long").as("media_id"),
        col("content").as("payload"))

  /** X16b — the typed `mapPartitions` DECODE STAGE: binary payloads in,
    * fixed-dim embedding vectors out. This is the batch shape a real
    * multimodal pipeline needs and codegen expressions can't provide —
    * per-row work is genuine bytes→pixels→features ([[PpmCodec]]
    * parses the P6 header and raster and throws on malformed input),
    * and the per-partition closure is where a heavier codec (libjpeg
    * handle, ONNX session) would initialize once and amortize.
    * Embarrassingly parallel: no shuffle, scan-partitioned like the
    * source; the embedding is reused downstream by the similarity
    * operators unchanged. */
  def mediaEmbedded(spark: SparkSession, dir: String): DataFrame =
    embedDf(mediaAssets(spark, dir))

  /** The decode stage over an arbitrary (media_id, payload) frame —
    * shared so [[mediaEmbedTopK]] can decode its tiny query batch
    * separately instead of running the corpus decode pipeline twice.
    *
    * CORRUPT assets are EXCLUDED, not fatal: [[PpmCodec.decode]] is
    * strict (throws on any malformed header/raster — the right
    * contract for a codec), but at crawl scale a single truncated or
    * mislabeled file MUST NOT kill the corpus-wide decode job through
    * task-retry exhaustion (the binary twin of the zero-norm
    * embedding crash — same admission rule: an undecodable asset
    * carries no features). Pinned by HostileMediaSpec; the committed
    * fixtures are all well-formed, so gate semantics are unchanged. */
  private[graft] def embedDf(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // exclusion must be LOUD: a systemically corrupt feed (every
    // asset truncated) would otherwise read as an empty-but-healthy
    // embed relation. The accumulator totals failures across the job
    // (visible in the UI/status API); each failed asset also warns
    // with its id and cause, so one bad file is traceable.
    val failures = spark.sparkContext
      .longAccumulator("graft.media.decode_failures")
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Multimodal")
        it.flatMap { case (id, payload) =>
          scala.util.Try(PpmCodec.features(PpmCodec.decode(payload)))
            .recoverWith { case e =>
              failures.add(1L)
              log.warn(s"media decode failed for asset $id, excluded: " +
                s"${e.getMessage}")
              scala.util.Failure(e)
            }.toOption.map(f => (id, f))
        }
      }
      .toDF("media_id", "embedding")
  }

  /** X16b — composed multimodal retrieval: real file ingest → real
    * PPM decode → feature embed → exact cosine top-k, the
    * media-similarity pipeline (dedup of re-encoded images,
    * nearest-neighbor media search) end to end. Ranking reuses
    * [[Similarity.scoreTopK]] — the SAME scoring tail as the
    * `embeddings`-table operators, proving the decoded vectors are
    * first-class citizens of the similarity family. Query side = the
    * lowest `nQueries` media ids, broadcast; candidate side streams
    * with no shuffle (see [[Similarity.cosineTopK]]). */
  def mediaEmbedTopK(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 4): DataFrame = {
    // the query batch is decoded SEPARATELY (filtered to nQueries rows
    // BEFORE the decode stage) so the corpus-wide decode pipeline
    // executes exactly once — both branches of an uncached shared
    // subplan would re-run it, doubling the dominant stage
    val queries = embedDf(
        mediaAssets(spark, dir).filter(col("media_id") < nQueries))
      .select(col("media_id").as("q_id"), col("embedding").as("q_emb"),
        Similarity.l2norm(col("embedding")).as("q_nrm"))
    val cands = mediaEmbedded(spark, dir)
      .select(col("media_id").as("vec_id"), col("embedding"),
        Similarity.l2norm(col("embedding")).as("nrm"))
    Similarity.scoreTopK(cands.crossJoin(broadcast(queries)), k)
  }
}
