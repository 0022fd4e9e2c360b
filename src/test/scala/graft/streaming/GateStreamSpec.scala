package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The streaming gate's contract: accumulated per-micro-batch
  * verdicts are EXACTLY the batch probe's output (same statistics,
  * same semantics, arrival order irrelevant), and the verdict store
  * carries the idempotent `batch_id` layout that makes foreachBatch
  * replays overwrite rather than duplicate. */
class GateStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("stream verdicts == batch probe verdicts; store is batch_id-partitioned") {
    import spark.implicits._
    val streamed = GateStream.gateStreamQuery(spark, dir)
    val batch = graft.ops.QualitySignals.qualityGateProbe(spark, dir)
    val cols = streamed.columns.toSeq
    assert(cols == batch.columns.toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(streamed) == rows(batch))
    assert(streamed.count() > 0)
    // two arrivals → two live batch_id dirs in the verdict store
    val out = graft.util.Scratch
      .under("ingest/quality_gate_stream/verdicts")
    val dirs = new java.io.File(out.toString).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(dirs.length == 2,
      s"expected 2 batch_id dirs, got ${dirs.map(_.getName).toSeq}")
  }

  test("an empty batch slice streams to an empty result, same as the probe") {
    import spark.implicits._
    // no doc_id divisible by 7 → every micro-batch is empty, nothing
    // is ever written, and the read-back must be EMPTY (the batch
    // probe's answer), not PATH_NOT_FOUND
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gate-empty").toString
    (1L to 13L).filter(_ % 7 != 0)
      .map(i => (i, s"some text for doc $i", "en", "src0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val streamed = GateStream.gateStreamQuery(spark, tmp)
    assert(streamed.count() == 0)
    assert(graft.ops.QualitySignals.qualityGateProbe(spark, tmp)
      .count() == 0)
  }
}
