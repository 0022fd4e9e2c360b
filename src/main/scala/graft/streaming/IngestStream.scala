package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.config.TableConfig
import graft.lake.LakeLayout
import graft.load.Strategies
import graft.transform.Derive

/** Streaming twin of the batch [[graft.pipeline.GenericLoader]]: a
  * `readStream` CSV file source watches the inbound directory and each
  * discovered file becomes a micro-batch applied to the curated zone
  * under the config's load strategy via `foreachBatch`.
  *
  * `foreachBatch` is the right seam because the curated sink is a
  * MERGE-style upsert — not an append-only sink — so each micro-batch
  * reuses the exact batch merge ([[Strategies.writeCurated]]): the
  * streaming and batch paths cannot drift. Checkpointing makes file
  * discovery exactly-once; the merge itself is idempotent on
  * `primary_key + dt` (MergePropsSpec), so retries are safe — the
  * standard Spark recipe for upsert sinks without a table format.
  *
  * The filename→`dt` derivation uses the per-row input file name
  * (`_metadata.file_path`), so one micro-batch may span several inbound
  * files and still partition correctly. */
object IngestStream {

  def start(spark: SparkSession, watchDir: String, config: TableConfig,
      layout: LakeLayout, sourceSystem: String, table: String,
      checkpoint: String,
      clock: Option[java.sql.Timestamp] = None,
      actor: String = "graft-spark"): StreamingQuery = {
    import org.apache.spark.sql.functions._
    val reader = spark.readStream
      .option("header", true)
      .option("delimiter", config.delimiter)
      .option("escape", "\"") // RFC-4180, matching the batch readCsv
      .option("multiLine", config.multiline)
    val raw = config.structType.fold(
      // v1 all-string mode needs an explicit schema for streaming:
      // infer once from the files already present
      reader.schema(spark.read.option("header", true)
        .option("delimiter", config.delimiter).csv(watchDir).schema))(
      s => reader.schema(s))
      .csv(watchDir)
      .withColumn("__file", col("_metadata.file_path"))

    val curatedPath = layout.curatedPath(sourceSystem, table)
    val landingPath = layout.landingPath(sourceSystem, table)
    def ingestBatch(batch: org.apache.spark.sql.DataFrame): Unit = {
        if (!batch.isEmpty) {
          // Zone parity with the batch loader (W4, landing BEFORE
          // curated): raw pre-`dt` projection, unpartitioned, under the
          // config's landing strategy. Granularity is the micro-batch —
          // an overwrite-strategy landing zone holds the latest
          // micro-batch (possibly several inbound files) where the
          // batch loader holds the latest single file.
          val landing = Derive.project(batch.drop("__file"),
            config.selectColumns)
          val landingSorted =
            if (config.sortColumns.nonEmpty)
              landing.sortWithinPartitions(config.sortColumns.map(col): _*)
            else landing
          Strategies.writeLanding(landingSorted, landingPath,
            config.landingLoadStrategy)

          val dts = batch.select("__file").distinct().collect()
            .map(_.getString(0)).map(f => f -> Derive.dtFromFileName(f))
            .toMap
          val dtExpr = dts.foldLeft(lit(null).cast("string")) {
            case (acc, (f, dt)) =>
              when(col("__file") === f, lit(dt)).otherwise(acc)
          }
          val projected = Derive.project(
            batch.withColumn("dt", dtExpr).drop("__file"),
            config.selectColumns.map(_ :+ "dt"))
          // Same curation-zone timestamp normalization as the batch
          // loader (landing above stays raw) — the two paths must not
          // drift on a per-column unit declaration.
          val curated = Derive.withAudit(
            Derive.normalizeTimestamps(projected, config.timestampNormalize),
            actor, clock)
          Strategies.writeCurated(spark, curated, curatedPath,
            config.curatedLoadStrategy, config.primaryKey,
            config.sortColumns)
        }
    }

    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (rawBatch: org.apache.spark.sql.DataFrame, _: Long) =>
        // Persist the micro-batch: emptiness probe, landing write, file
        // list, and curated write are four separate actions — uncached,
        // each would re-parse the batch's CSV files.
        val batch = rawBatch.persist()
        try ingestBatch(batch)
        finally batch.unpersist()
      }
      .start()
  }
}
