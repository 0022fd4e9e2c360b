package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The streaming extractor's contract (X82b): accumulated
  * per-micro-batch extractions are EXACTLY the batch operator's
  * output (pure projection — arrival order irrelevant, no state), and
  * the store carries the idempotent `batch_id` layout that makes
  * foreachBatch replays overwrite rather than duplicate. */
class ExtractStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed extractions == batch extractions; store is batch_id-partitioned") {
    val streamed = ExtractStream.extractStreamQuery(spark, dir)
    val batch = graft.ops.HtmlExtract.htmlExtract(spark, dir)
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(streamed) == rows(batch))
    assert(streamed.count() > 0)
    val out = graft.util.Scratch
      .under("ingest/html_extract_stream/extracted")
    val dirs = new java.io.File(out.toString).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(dirs.length == 2,
      s"expected 2 batch_id dirs, got ${dirs.map(_.getName).toSeq}")
  }
}
