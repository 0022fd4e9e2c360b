package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("mapPartitions decode stage embeds every media row at the fixed dim (X16b)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = Multimodal.mediaEmbedded(spark, dir)
    assert(emb.count() == docs.count())
    val dims = emb.select(size(col("embedding"))).distinct()
      .as[Int].collect().toSeq
    assert(dims == Seq(PpmCodec.FeatureDim),
      s"expected uniform dim ${PpmCodec.FeatureDim}, got $dims")
    // decoded-pixel features are bounded by construction: channel
    // means/maxima in [0, 255] (ASCII payload bytes are 0x00–0x7F, so
    // actually ≤ 127), aspect = w/h within the generator's geometry
    // envelope (8–16 × 8–14)
    val bad = emb.select(explode(col("embedding")).as("v"))
      .filter(col("v") < 0.0f || col("v") > 255.0f).count()
    assert(bad == 0)
    val aspects = emb.select(element_at(col("embedding"), 7).as("a"))
      .filter(col("a") < 0.5f || col("a") > 2.0f).count()
    assert(aspects == 0, "aspect feature outside the geometry envelope")
  }

  test("decoded embedding matches an independent re-derivation from the source text (X16b)") {
    import spark.implicits._
    val sample = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .orderBy("doc_id").take(3)
    val got = Multimodal.mediaEmbedded(spark, dir)
      .filter(col("media_id") <= sample.map(_._1).max)
      .select(col("media_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().map(r => r._1 -> r._2.toSeq).toMap
    // deliberately NOT PpmCodec: the expected features are rebuilt
    // from the generating text with spec-local arithmetic (the same
    // chain the DuckDB oracle runs), so an encode/decode bug cannot
    // cancel itself out
    sample.foreach { case (id, text) =>
      val tb = text.getBytes("US-ASCII")
      val w = (8 + id % 9).toInt
      val h = (8 + (id / 9) % 7).toInt
      val n = w * h
      val sums = new Array[Long](3); val maxs = new Array[Int](3)
      val tsums = new Array[Long](12); val tcnt = new Array[Long](4)
      (0 until n * 3).foreach { i =>
        val v = tb(i % tb.length) & 0xff
        val c = i % 3; val px = i / 3
        val t = (2 * (px / w) / h) * 2 + (2 * (px % w) / w)
        sums(c) += v
        tsums(t * 3 + c) += v
        if (c == 0) tcnt(t) += 1
        if (v > maxs(c)) maxs(c) = v
      }
      val expect = Seq(
        (sums(0).toDouble / n).toFloat, (sums(1).toDouble / n).toFloat,
        (sums(2).toDouble / n).toFloat, maxs(0).toFloat,
        maxs(1).toFloat, maxs(2).toFloat, (w.toDouble / h).toFloat,
        ((sums(0) + sums(1) + sums(2)).toDouble / (3L * n)).toFloat) ++
        (0 until 12).map(j => (tsums(j).toDouble / tcnt(j / 3)).toFloat)
      assert(got(id) == expect, s"doc $id decode mismatch")
    }
  }

  test("asset store holds genuine parseable PPMs and the decoder trusts only the header (X16b)") {
    val assetDir = Multimodal.mediaAssetDir(spark, dir)
    val files = new java.io.File(assetDir).listFiles()
      .filter(_.getName.endsWith(".ppm")).sortBy(_.getName)
    assert(files.length ==
      spark.read.parquet(s"$dir/documents.parquet").count())
    val bytes = java.nio.file.Files.readAllBytes(files.head.toPath)
    // a real P6: magic + parseable header + exact raster length
    val img = PpmCodec.decode(bytes)
    assert(img.raster.length == img.width * img.height * 3)
    val id = files.head.getName
      .stripPrefix("doc_").stripSuffix(".ppm").toLong
    assert(img.width == Multimodal.assetWidth(id) &&
      img.height == Multimodal.assetHeight(id))
    // corrupting the header dimensions must change what decode
    // reports (it parses, not assumes) — and a truncated raster throws
    intercept[IllegalArgumentException] {
      PpmCodec.decode(bytes.dropRight(1))
    }
  }

  test("media resize decimates at stride 4 and survives empty/short payloads (X16c)") {
    import spark.implicits._
    val media = Seq(
      (1L, "abcdefghij"), // 10 bytes -> positions 1,5,9 -> "aei"
      (2L, "abcd"),       // 4 bytes  -> position 1      -> "a"
      (3L, "xy"),         // shorter than stride          -> "x"
      (4L, "")            // empty -> empty, no phantom samples
    ).toDF("media_id", "text")
    val got = Multimodal.mediaResizeFor(media)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((10L, 3L)))
    assert(got(2L) == ((4L, 1L)))
    assert(got(3L) == ((2L, 1L)))
    assert(got(4L) == ((0L, 0L)))
    // exact resampled content, pinned through the hash
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("aei".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gotSha = Multimodal.mediaResizeFor(media)
      .filter(col("media_id") === 1L)
      .select("resized_sha").as[String].head()
    assert(gotSha == sha)
    // NULL payload propagates to NULL (SQL semantics, oracle-matching),
    // and decimation is CHARACTER-based: 8 two-byte chars sample
    // positions 1 and 5, regardless of the 16-byte payload
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, "éèêëéèêë"))
      .toDF("media_id", "text")
    val got2 = Multimodal.mediaResizeFor(edge).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got2(1L) == ((None, None, None)))
    val (nb, rb, _) = got2(2L)
    assert(nb.contains(16L) && rb.contains(4L),
      s"unicode decimation: ${got2(2L)}") // "éê" re-encodes to 4 bytes
  }

  test("media top-k plan: one corpus decode, query side broadcast (X16b)") {
    val df = Multimodal.mediaEmbedTopK(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the corpus-wide mapPartitions decode must appear exactly once on
    // the candidate side (the query batch's own tiny decode is scan-
    // filtered to nQueries rows); with a real codec a second corpus
    // decode would double the pipeline's dominant cost
    val decodes = "MapPartitions".r.findAllIn(plan).size
    assert(decodes == 2, s"expected 2 decode stages (corpus + query " +
      s"batch), got $decodes in:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the broadcast scoring join in:\n$plan")
  }

  test("media top-k ranks with the same scoring tail as the embeddings family (X16b)") {
    import spark.implicits._
    val topk = Multimodal.mediaEmbedTopK(spark, dir)
      .as[(Long, Long, Double, Int)].collect()
    assert(topk.nonEmpty)
    // per query: exactly k ranked rows, rn dense from 1, never self
    topk.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to 5))
      assert(rows.forall(_._2 != q))
      // scores non-increasing in rank
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("binaryFile skips zero-byte assets — the documented source gap (X93)") {
    val onDisk = new java.io.File(Formats.BinmixDir).listFiles()
    val empties = onDisk.filter(_.length == 0)
    assert(empties.map(_.getName).toSeq == Seq("empty.jpg"),
      "fixture must keep its zero-byte witness")
    val seen = spark.read.format("binaryFile").load(Formats.BinmixDir)
      .count()
    // if Spark ever starts surfacing empty files, the oracle's
    // octet_length(content) > 0 guard must be removed with this pin
    assert(seen == onDisk.length - empties.length,
      s"binaryFile saw $seen of ${onDisk.length} files")
  }

  test("mime_sniff equals a driver-side reclassification of the bytes (X93)") {
    import java.nio.file.{Files, Paths}
    def hexPrefix(b: Array[Byte]): String =
      b.take(8).map("%02X".format(_)).mkString
    val files = new java.io.File(Formats.BinmixDir).listFiles()
      .filter(_.length > 0).toSeq
    val expected = files.map { f =>
      val px = hexPrefix(Files.readAllBytes(Paths.get(f.getPath)))
      val detected = Formats.MagicTypes
        .collectFirst { case (p, t) if px.startsWith(p) => t }
        .getOrElse("unknown")
      val ext = f.getName.reverse.takeWhile(_ != '.').reverse
        .toLowerCase match {
          case e if f.getName.contains('.') => e
          case _ => ""
        }
      val promised = Formats.ExtTypes.toMap.getOrElse(
        if (f.getName.contains('.')) ext else "", "unknown")
      (detected, promised, f.length)
    }
    val want = expected.groupBy(_._1).map { case (d, xs) =>
      d -> ((xs.size.toLong, xs.map(_._3).sum,
        xs.count { case (de, pr, _) => de != pr }.toLong))
    }
    val got = Formats.mimeSniff(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    // the planted liars are visible: some type has a nonzero mismatch
    assert(got.values.exists(_._3 > 0))
    // every planted real type was detected
    assert(Set("jpeg", "png", "gif", "pdf", "zip", "unknown")
      .subsetOf(got.keySet))
  }

  test("asset_dedup: planted reuploads collapse across extensions (X106)") {
    val got = Formats.assetDedup(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(3) -> ((r.getString(0), r.getLong(1),
        r.getString(4)))).toMap
    // exactly the planted groups plus the fixture's own same-stem
    // jpeg pair (both honest spellings share a payload) — nothing
    // else shares bytes
    assert(got.keySet == Set(
      "100% copy.pdf+100%.pdf",
      "lit%20enc twin.pdf+lit%20enc.pdf",
      "mirror.pdf+ok_pdf.pdf",
      "ok_jpeg.jpeg+ok_jpeg.jpg",
      "ok_png.png+reupload_1.png+reupload_2.jpg",
      "spaces in name.pdf+spaces twin.pdf"), got.keySet)
    assert(got("ok_jpeg.jpeg+ok_jpeg.jpg") ==
      (("jpeg", 2L, "ok_jpeg.jpeg")))
    // the PNG triple collapses ACROSS a lying .jpg extension; the
    // canonical keeper is the min name
    assert(got("ok_png.png+reupload_1.png+reupload_2.jpg") ==
      (("png", 3L, "ok_png.png")))
    assert(got("mirror.pdf+ok_pdf.pdf") == (("pdf", 2L, "mirror.pdf")))
    // RAW name identity pins, inside real dup groups: spaces, a
    // literal %, and a literal %20 must all render EXACTLY as on
    // disk in both engines (binaryFile's path is not percent-encoded
    // — probed; a decode step would throw on '100%.pdf' and fold
    // 'lit%20enc' into 'lit enc')
    assert(got("spaces in name.pdf+spaces twin.pdf") ==
      (("pdf", 2L, "spaces in name.pdf")))
    assert(got("100% copy.pdf+100%.pdf") ==
      (("pdf", 2L, "100% copy.pdf")))
    assert(got("lit%20enc twin.pdf+lit%20enc.pdf") ==
      (("pdf", 2L, "lit%20enc twin.pdf")))
  }
}
