package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The streaming crawl entry's contract (X84b): the manifest fold
  * over accumulated per-batch state is EXACTLY the batch pipeline's
  * manifest — including the cross-arrival dedup directions a frozen
  * per-batch verdict would get wrong — and the state dirs carry the
  * idempotent `batch_id` layout. */
class CrawlStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed manifest == batch manifest; state is batch_id-partitioned") {
    val streamed = CrawlStream.crawlStreamQuery(spark, dir)
    val batch = graft.ops.HtmlExtract.crawlIngest(spark, dir)
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(streamed) == rows(batch))
    assert(streamed.count() > 0)
    val state = graft.util.Scratch.under("ingest/crawl_ingest_stream/state")
    Seq("pages", "admitted", "sigs").foreach { s =>
      val dirs = new java.io.File(s"$state/$s").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      assert(dirs.length == 2,
        s"$s: expected 2 batch_id dirs, got ${dirs.map(_.getName).toSeq}")
    }
  }

  test("cross-arrival dedup: late twins collapse, including retroactively") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-crawlstream").toString
    val (watch, state, ckpt) =
      (s"$base/watch", s"$base/state", s"$base/ckpt")
    Files.createDirectories(Paths.get(watch))
    Seq("pages", "admitted", "sigs").foreach(s =>
      Files.createDirectories(Paths.get(s"$state/$s")))

    // two UNRELATED long bodies: the exact pair and the near pair
    // must not cross-band, or the expected counts get entangled
    val body1 = (1 to 40).map(i => s"a${i * 7 % 31}x$i").mkString(" ")
    val body2 = (1 to 40).map(i => s"b${i * 11 % 37}y$i").mkString(" ")
    def pg(id: Long, text: String) =
      (id, "s0", s"http://s0.test/p$id", s"<p>$text</p>")
    // arrival 1: docs 10 (exact twin-to-be), 20 (near twin-to-be), 30
    val arr1 = Seq(pg(10, body1), pg(20, body2),
      pg(30, "totally different content " + (1 to 30).map(i => s"q$i")
        .mkString(" ")))
      .toDF("doc_id", "source", "page_url", "html")
    // arrival 2: doc 4 = EXACT text of doc 10 (smaller id, later
    // arrival → 10 must drop from the exact stage); doc 3 = NEAR dup
    // of doc 20 (smaller id, later arrival → 20 must drop
    // RETROACTIVELY from the near-dup stage); doc 30 = a RE-FETCH of
    // arrival 1's doc 30 (identical bytes, new file) — its duplicate
    // signature rows must NOT self-pair it out of the manifest
    val arr2 = Seq(pg(4, body1), pg(3, body2 + " updated"),
      pg(30, "totally different content " + (1 to 30).map(i => s"q$i")
        .mkString(" ")))
      .toDF("doc_id", "source", "page_url", "html")

    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      graft.util.StreamFiles.landParquet(df, base, watch, name)
    val q = CrawlStream.start(spark, watch, state, ckpt)
    try {
      land(arr1, "arrival1")
      q.processAllAvailable()
      land(arr2, "arrival2")
      q.processAllAvailable()
    } finally q.stop()

    val m = CrawlStream.manifestFrom(spark, state)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    // 6 pages, 6 admitted, 4 exact-unique (10 collapsed into 4, the
    // doc-30 re-fetch collapsed into itself), 3 final: {3, 4, 30} —
    // 3 retroactively drops the already-accepted 20 via near-dup,
    // and the re-fetched 30 SURVIVES (no self-pair from its
    // duplicated signature rows)
    assert(m._2 == 6L && m._3 == 6L && m._4 == 4L, m)
    assert(m._5 == 3L, s"expected 3 final (late smaller twin wins): $m")
    // and the batch operator over the SAME pages agrees exactly
    val batch = graft.ops.HtmlExtract
      .crawlIngestFrom(arr1.union(arr2))
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(m == batch, s"stream $m != batch $batch")
  }
}
