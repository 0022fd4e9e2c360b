package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X110 gates: the Y4M codec's strict contract, the keyframe
  * fingerprint's documented invariances (2× temporal upsample, +4
  * luma), the planted-variant proof that byte-exact dedup misses what
  * the perceptual path pairs, frame-sampling semantics, and
  * banded-vs-brute recall — the third modality through the
  * MediaNeardupSpec pattern. */
class VideoNeardupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def mkFrames(w: Int, h: Int, n: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Array.tabulate[Byte](3 * w * h)(j =>
      ((j * 31 + f * 17 + 5) % 251).toByte))

  test("y4m codec roundtrips and parses its own header for real") {
    val frames = mkFrames(12, 9, 5)
    val bytes = Y4mCodec.encode(12, 9, 25, 2, frames)
    val v = Y4mCodec.decode(bytes)
    assert(v.width == 12 && v.height == 9)
    assert(v.fpsNum == 25 && v.fpsDen == 2)
    assert(v.frames.length == 5)
    v.frames.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("decode is strict: malformed containers fail loudly") {
    val ok = Y4mCodec.encode(8, 8, 10, 1, mkFrames(8, 8, 2))
    def dies(bytes: Array[Byte], what: String): Unit =
      assertThrows[IllegalArgumentException] {
        Y4mCodec.decode(bytes); fail(s"$what must not decode")
      }
    dies("JUNK4MPEG".getBytes ++ ok.drop(9), "wrong magic")
    dies(ok.dropRight(5), "truncated frame")
    dies(ok ++ Array[Byte](0), "trailing garbage (not a FRAME marker)")
    dies("YUV4MPEG2 W8 H8 F10:1 Ip A1:1 C420jpeg\n".getBytes ++
      "FRAME\n".getBytes ++ new Array[Byte](96),
      "unsupported colourspace")
    dies("YUV4MPEG2 W8 H8 Q9 F10:1 C444\n".getBytes, "unknown param")
    dies("YUV4MPEG2 W8 W9 H8 F10:1 C444\n".getBytes, "duplicate W")
    dies("YUV4MPEG2 W8 H8 F10:1 C444\n".getBytes, "zero frames")
    // frame-level parameters after FRAME are accepted per spec
    val withParam = new String(ok, "ISO-8859-1")
      .replaceFirst("FRAME\n", "FRAME Xsome\n").getBytes("ISO-8859-1")
    assert(Y4mCodec.decode(withParam).frames.length == 2)
  }

  test("sampled-frame CONTENT is invariant under 2x temporal upsample") {
    val base = mkFrames(10, 8, 7)
    val dup = (0 until 14).map(k => base(k / 2))
    val bi = VideoNeardup.sampleIndices(7)
    val di = VideoNeardup.sampleIndices(14)
    bi.zip(di).foreach { case ((pos, bf), (pos2, df)) =>
      assert(pos == pos2)
      assert(java.util.Arrays.equals(base(bf), dup(df)),
        s"sampled frame '$pos' must map to the same content")
    }
  }

  test("keyframe dhash is invariant under +4 luma shift (no clamp)") {
    val w = 11; val h = 9
    val y = Array.tabulate[Byte](w * h)(i => ((i * 73) % 200).toByte)
    val fp = VideoNeardup.dhashLuma(w, h, y)
    val br = y.map(b => ((b & 0xff) + 4).toByte)
    assert(VideoNeardup.dhashLuma(w, h, br) == fp)
  }

  test("planted variants differ in BYTES (exact dedup misses) but pair at hamming 0") {
    import spark.implicits._
    val store = VideoNeardup.videoAssetDir(spark, dir)
    def bytesOf(id: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/$id.y4m"))
    val variants = new java.io.File(store).listFiles()
      .map(_.getName).filter(n => n.contains("_rt") || n.contains("_br"))
      .map(_.stripSuffix(".y4m")).toSeq
    assert(variants.nonEmpty, "store must plant variants")
    val pairs = VideoNeardup.videoNeardup(spark, dir)
      .as[(String, String, Int)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    variants.foreach { vid =>
      val bid = vid.replaceAll("_(rt|br)$", "")
      assert(!java.util.Arrays.equals(bytesOf(vid), bytesOf(bid)))
      val key = if (bid < vid) (bid, vid) else (vid, bid)
      assert(pairs.get(key).contains(0),
        s"variant $vid must pair with $bid at hamming 0")
    }
  }

  test("banded candidate generation has full recall vs brute force (X110c)") {
    import spark.implicits._
    val sigs = VideoNeardup.signatures(spark, dir)
    val all = sigs.as[(String, Long, Long)].collect()
    val brute = (for {
      a <- all; b <- all
      if a._1 < b._1
      hm = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if hm <= VideoNeardup.HammingMax
    } yield (a._1, b._1, hm)).toSet
    val banded = MediaNeardup
      .pairsFor(sigs, VideoNeardup.HammingMax, maxBucket = 0)
      .as[(String, String, Int)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
    assert(banded == brute,
      s"banded missed ${(brute -- banded).take(5)} / extra " +
        s"${(banded -- brute).take(5)}")
  }

  test("subclip channel catches the planted temporal crops at containment 1.0") {
    import spark.implicits._
    val store = VideoNeardup.videoAssetDir(spark, dir)
    val cls = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.endsWith("_cl.y4m"))
      .map(_.stripSuffix(".y4m")).toSeq
    assert(cls.nonEmpty, "store must plant _cl temporal crops")
    val sub = VideoNeardup.videoSubclip(spark, dir)
      .as[(String, String, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._4).toMap
    cls.foreach { vid =>
      val bid = vid.stripSuffix("_cl")
      val key = if (bid < vid) (bid, vid) else (vid, bid)
      assert(sub.get(key).contains(1.0),
        s"crop $vid must reach containment 1.0 with $bid")
    }
    // the rt/br classes are SUBSUMED: frame-doubling and constant
    // shift both preserve consecutive-frame shingles
    val others = new java.io.File(store).listFiles()
      .map(_.getName)
      .filter(n => n.contains("_rt") || n.contains("_br"))
      .map(_.stripSuffix(".y4m")).toSeq
    others.foreach { vid =>
      val bid = vid.replaceAll("_(rt|br)$", "")
      val key = if (bid < vid) (bid, vid) else (vid, bid)
      assert(sub.get(key).contains(1.0),
        s"$vid must be subsumed at containment 1.0 with $bid")
    }
  }

  test("keyframe channel structurally MISSES the temporal-crop class") {
    import spark.implicits._
    val store = VideoNeardup.videoAssetDir(spark, dir)
    val cls = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.endsWith("_cl.y4m"))
      .map(_.stripSuffix(".y4m")).toSeq
    val key = VideoNeardup.videoNeardup(spark, dir)
      .as[(String, String, Int)].collect()
      .map(p => Set(p._1, p._2)).toSet
    val caught = cls.count(vid => key(Set(vid, vid.stripSuffix("_cl"))))
    // the crop shifts the temporal middle onto a DIFFERENT content
    // frame and the stride de-correlates frames — the keyframe hash
    // should land outside the Hamming bound for (nearly) every pair.
    // Pin the envelope: at most 20% coincidental catches.
    assert(caught <= cls.size / 5,
      s"keyframe channel caught $caught/${cls.size} planted crops — " +
        "the miss this class documents has disappeared")
  }

  test("canonical election: the longest clip survives, trims and re-encodes fold in") {
    import spark.implicits._
    val store = VideoNeardup.videoAssetDir(spark, dir)
    val variants = new java.io.File(store).listFiles()
      .map(_.getName)
      .filter(n => n.contains("_rt") || n.contains("_br") ||
        n.contains("_cl"))
      .map(_.stripSuffix(".y4m")).toSeq
    assert(variants.nonEmpty)
    val rows = VideoNeardup.videoCanonical(spark, dir)
      .as[(String, String, Long, String)].collect()
    val byMember = rows.flatMap { case (g, can, _, members) =>
      members.split('+').map(_ -> ((g, can)))
    }.toMap
    variants.foreach { vid =>
      val bid = vid.replaceAll("_(rt|br|cl)$", "")
      val (g, can) = byMember(vid)
      // every planted class folds into its base's group, and the
      // base wins the election on all three arms: _cl is SHORTER
      // (duration), _rt/_br tie on duration and lose on id
      assert(byMember(bid)._1 == g,
        s"$vid and $bid must share a group")
      assert(can == bid, s"group of $vid must elect $bid, got $can")
    }
    // the manifest is the full clip universe: every asset appears
    val nAssets = new java.io.File(store).listFiles()
      .count(_.getName.endsWith(".y4m"))
    assert(rows.map(_._3).sum == nAssets)
  }

  test("frame sampling: three rows per clip, stats match a direct decode") {
    import spark.implicits._
    val rows = VideoNeardup.videoFrames(spark, dir)
      .as[(String, String, Int, Long, Long, Long, Long, Long)]
      .collect()
    val byId = rows.groupBy(_._1)
    assert(byId.values.forall(_.length == 3),
      "every clip samples exactly first/mid/last")
    // cross-check one clip against a direct decode
    val store = VideoNeardup.videoAssetDir(spark, dir)
    val v = Y4mCodec.decode(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/doc_3.y4m")))
    val np = v.width * v.height
    val mid = v.frames(v.frames.length / 2)
    val expSum = (0 until np).map(i => (mid(i) & 0xff).toLong).sum
    val got = byId("doc_3").find(_._2 == "mid").get
    assert(got._3 == v.frames.length / 2 && got._6 == expSum)
  }
}
