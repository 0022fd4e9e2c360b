package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X111 gates: the manifest is the full document universe, its counts
  * agree with the stores' real listings, and the unit sums agree with
  * a direct decode — cross-modal arithmetic pinned at both ends. */
class MediaManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def listed(store: String, ext: String): Seq[String] =
    new java.io.File(store).listFiles()
      .map(_.getName).filter(_.endsWith(ext))
      .map(_.stripSuffix(ext)).toSeq

  test("manifest covers every document and its counts match the stores") {
    import spark.implicits._
    val rows = MediaManifest.multimodalManifest(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    val nDocs = graft.util.Tables.t(spark, dir, "documents").count()
    assert(rows.length == nDocs, "one manifest row per document")

    val nImages =
      listed(Multimodal.mediaAssetDir(spark, dir), ".ppm").size +
        listed(MediaNeardup.variantDir(spark, dir), ".ppm").size
    val nAudio = listed(AudioNeardup.audioAssetDir(spark, dir), ".wav").size
    val nVideo = listed(VideoNeardup.videoAssetDir(spark, dir), ".y4m").size
    assert(rows.map(_._2).sum == nImages, "image count = store listing")
    assert(rows.map(_._4).sum == nAudio, "audio count = store listing")
    assert(rows.map(_._6).sum == nVideo, "video count = store listing")
    assert(rows.map(_._8).sum == nImages + nAudio + nVideo)
  }

  test("multimodal pack: media cost matches direct decode, window sums balance") {
    import spark.implicits._
    val rows = MediaManifest.multimodalPack(spark, dir)
      .as[(Long, Int, Long, Long, Long, Long, Long)].collect()
    assert(rows.length ==
      graft.util.Tables.t(spark, dir, "documents").count())
    rows.foreach { case (_, _, nTok, mTok, tot, _, _) =>
      assert(mTok > 0 && tot == nTok + mTok)
    }
    // doc 7's media cost from the arithmetic (base assets only —
    // doc 7 ≡ 7 (mod 8) has NO variants, doc 10 ≡ 2 has an audio
    // variant which must NOT be priced)
    import MediaManifest.{ImgPatchPx, AudFrameSamples}
    def cost(id: Long): Long = {
      val px = Multimodal.assetWidth(id).toLong * Multimodal.assetHeight(id)
      val ns = AudioNeardup.nSamples(id).toLong
      val nf = VideoNeardup.nFrames(id).toLong
      (px + ImgPatchPx - 1) / ImgPatchPx +
        (ns + AudFrameSamples - 1) / AudFrameSamples +
        (nf * px + ImgPatchPx - 1) / ImgPatchPx
    }
    val byId = rows.map(r => r._1 -> r._4).toMap
    assert(byId(7L) == cost(7L))
    assert(byId(10L) == cost(10L), "variants must not be priced")
    // per shard, cum_tok is the running sum in (h, doc_id) order
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(s"pack:${r._1}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, r._1))
      var run = 0L
      ordered.foreach { r =>
        run += r._5
        assert(r._6 == run, s"cum_tok drift at doc ${r._1}")
      }
    }
  }

  test("unit sums match a direct decode for a variant-bearing doc") {
    import spark.implicits._
    val rows = MediaManifest.multimodalManifest(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 11 ≡ 3 (mod 8): carries the video _cl variant
    val vStore = VideoNeardup.videoAssetDir(spark, dir)
    def frames(name: String): Long =
      Y4mCodec.decode(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$vStore/$name.y4m"))).frames.length
    val r11 = rows(11L)
    assert(r11._6 == 2 && r11._7 == frames("doc_11") + frames("doc_11_cl"))
    // doc 16 ≡ 0 (mod 8): carries the image _up variant (4× the px)
    val w = Multimodal.assetWidth(16); val h = Multimodal.assetHeight(16)
    val r16 = rows(16L)
    assert(r16._2 == 2 && r16._3 == 5L * w * h)
    // doc 10 ≡ 2 (mod 8): carries the audio _rs resample (2× samples)
    val r10 = rows(10L)
    assert(r10._4 == 2 &&
      r10._5 == 3L * AudioNeardup.nSamples(10L))
  }
}
