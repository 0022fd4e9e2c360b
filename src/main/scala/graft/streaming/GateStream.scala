package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.QualitySignals

/** X81b — STREAMING admission gate: the continuous form of
  * [[graft.ops.QualitySignals.qualityGateProbe]]. Incoming documents
  * arrive as files in a watched directory; each micro-batch is gated
  * against the PERSISTED corpus statistics (X77 length bounds, the
  * X80 rank's margin cutoff, X78 temperature rates — built once from
  * the corpus side) and its per-doc verdicts land under an idempotent
  * `batch_id=<id>` subdirectory. This is the ingest-edge loop of the
  * quality family: derive statistics on the periodic rebuild cadence,
  * gate every arrival against them with ZERO corpus work — the gate
  * relation is three lang/source-sized broadcast tables, so the
  * stream's per-arrival cost is batch-sized forever (no state store,
  * no watermark: the gate is stateless given its statistics).
  *
  * Verdict semantics are pinned to the batch operator: the harness
  * streams the `doc_id % batchMod == 0` slice in two arrivals and the
  * accumulated verdicts equal [[QualitySignals.qualityGateProbe]] —
  * and share its DuckDB oracle. */
object GateStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Start the gate stream over a watched parquet dir. Each
    * micro-batch OVERWRITES its own `batch_id=<id>` subdirectory
    * (idempotent under foreachBatch's at-least-once replay, the
    * [[NeardupStream.start]] contract). */
  def start(spark: SparkSession, watchDir: String, statsDir: String,
      out: String, checkpoint: String): StreamingQuery = {
    spark.readStream.schema(docSchema).parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        if (!rawBatch.isEmpty) {
          QualitySignals.qualityGateFor(rawBatch, statsDir)
            .write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
        }
      }
      .start()
  }

  /** Registered-query harness (gate row `quality_gate_stream`): build
    * the corpus-side statistics, stream the batch slice in TWO file
    * arrivals through a real StreamingQuery, and return the
    * accumulated verdicts — byte-equal to the batch probe and checked
    * by the same oracle. */
  def gateStreamQuery(spark: SparkSession, dir: String,
      batchMod: Int = 7): DataFrame = {
    val base = graft.util.Scratch.under("ingest/quality_gate_stream")
    graft.util.Scratch.deleteRecursive(base)
    val (watch, out, ckpt) = (s"$base/watch", s"$base/verdicts",
      s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    // pre-create the verdict store: an all-empty batch slice writes
    // nothing (foreachBatch skips empty micro-batches), and the
    // read-back below must return an EMPTY result — the batch probe's
    // answer — not PATH_NOT_FOUND
    Files.createDirectories(Paths.get(out))

    val statsDir = QualitySignals.qualityGateBuildStats(spark, dir,
      batchMod)
    val batch = graft.util.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .filter(pmod(col("doc_id"), lit(batchMod)) === 0)

    def land(slice: DataFrame, name: String): Unit =
      graft.util.StreamFiles.landParquet(slice, base.toString, watch,
        name)
    val q = start(spark, watch, statsDir, out, ckpt)
    try {
      land(batch.filter(pmod(col("doc_id"), lit(2)) === 0), "arrival1")
      q.processAllAvailable()
      land(batch.filter(pmod(col("doc_id"), lit(2)) =!= 0), "arrival2")
      q.processAllAvailable()
    } finally q.stop()

    // explicit schema: with zero written batches the dir is empty and
    // schema inference would fail; the gate's own plan IS the schema
    val verdictSchema = graft.ops.QualitySignals
      .qualityGateFor(batch.limit(0), statsDir).schema
    spark.read.schema(verdictSchema).parquet(out)
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("margin"), col("keep_length"),
        col("keep_quality"), col("keep_sample"), col("admit"))
      .orderBy("doc_id")
  }
}
