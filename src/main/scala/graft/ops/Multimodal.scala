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
}
