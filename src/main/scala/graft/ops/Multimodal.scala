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

  /** X16b — the typed `mapPartitions` DECODE STAGE: binary payloads in,
    * fixed-dim embedding vectors out. This is the batch shape a real
    * multimodal pipeline needs and codegen expressions can't provide —
    * a per-PARTITION resource (codec handle, inference session) is
    * initialized once and amortized across the partition's rows, with
    * per-row work pure bytes-to-vector. The decode itself is the
    * container-imposed stub ([[MediaDecoder]]); everything Spark-side —
    * the `Dataset[(Long, Array[Byte])]` signature, the per-partition
    * iterator, the schema of the output, the downstream reuse of the
    * embedding by the similarity operators — is real and oracle-tested
    * through [[mediaEmbedTopK]]. Embarrassingly parallel: no shuffle,
    * scan-partitioned like the source. */
  def mediaEmbedded(spark: SparkSession, dir: String,
      dim: Int = 8): DataFrame =
    embedDf(mediaTable(spark, dir), dim)

  /** The decode stage over an arbitrary (media_id, payload) frame —
    * shared so [[mediaEmbedTopK]] can decode its tiny query batch
    * separately instead of running the corpus decode pipeline twice. */
  private def embedDf(media: DataFrame, dim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one "codec" per partition, reset per row — the resource
        // lifecycle a real decoder (libjpeg handle, ONNX session)
        // would use in exactly this position
        val codec = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          (id, MediaDecoder.embed(codec, payload, dim))
        }
      }
      .toDF("media_id", "embedding")
  }

  /** X16b — composed multimodal retrieval: decode → embed → exact
    * cosine top-k, the media-similarity pipeline (dedup of
    * re-encoded images, nearest-neighbor media search) end to end.
    * Ranking reuses [[Similarity.scoreTopK]] — the SAME scoring tail
    * as the `embeddings`-table operators, proving the decoded vectors
    * are first-class citizens of the similarity family. Query side =
    * the lowest `nQueries` media ids, broadcast; candidate side
    * streams with no shuffle (see [[Similarity.cosineTopK]]). */
  def mediaEmbedTopK(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 4): DataFrame = {
    // the query batch is decoded SEPARATELY (nQueries rows, pushed-down
    // scan filter) so the corpus-wide decode pipeline executes exactly
    // once — both branches of an uncached shared subplan would re-run
    // it, and with a real codec that doubles the expensive stage
    val queries = embedDf(
        mediaTable(spark, dir).filter(col("media_id") < nQueries), 8)
      .select(col("media_id").as("q_id"), col("embedding").as("q_emb"),
        Similarity.l2norm(col("embedding")).as("q_nrm"))
    val cands = mediaEmbedded(spark, dir)
      .select(col("media_id").as("vec_id"), col("embedding"),
        Similarity.l2norm(col("embedding")).as("nrm"))
    Similarity.scoreTopK(cands.crossJoin(broadcast(queries)), k)
  }
}

/** STUB DECODER — the container has no image/audio/video codecs, so
  * "decode + feature-extract" is a deterministic fake: feature j is
  * the first 32 bits of md5(payload ++ ":j") scaled into [0, 1] —
  * closed at 1: words ≥ 2^32−128 are within half an ulp of 1 and the
  * final toFloat rounds them to exactly 1.0f (~2^-25 per feature).
  * Deliberately reproducible in DuckDB SQL
  * (`CAST(('0x' || substring(md5(text || ':' || j), 1, 8)) AS BIGINT)`)
  * so the full decode→embed→top-k pipeline is cross-engine
  * oracle-checked, float rounding included. A real deployment replaces
  * ONLY this object's body (bytes in, float vector out); the
  * mapPartitions plumbing above is unchanged. */
object MediaDecoder {
  def embed(codec: java.security.MessageDigest, payload: Array[Byte],
      dim: Int): Array[Float] = {
    (0 until dim).map { j =>
      codec.reset()
      codec.update(payload)
      codec.update(s":$j".getBytes("UTF-8"))
      val word = codec.digest().take(4).map("%02x".format(_)).mkString
      // /2^32 is exact in double (power-of-two exponent shift); the
      // one rounding step is the final toFloat — same IEEE
      // round-to-nearest as DuckDB's CAST(double AS FLOAT)
      (java.lang.Long.parseLong(word, 16).toDouble / 4294967296.0).toFloat
    }.toArray
  }
}
