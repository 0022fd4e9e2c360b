package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the pure-JVM P6 codec behind the multimodal
  * decode stage: encode/decode roundtrip, spec-conformant header
  * parsing (whitespace variants, `#` comments), and loud rejection of
  * every malformed shape — the decoder must PARSE, never assume. */
class PpmCodecSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 7 + 13) % 256).toByte)

  test("encode/decode roundtrip preserves dimensions and raster bytes") {
    for ((w, h) <- Seq((1, 1), (8, 14), (16, 8), (5, 3))) {
      val r = raster(w, h)
      val img = PpmCodec.decode(PpmCodec.encode(w, h, r))
      assert(img.width == w && img.height == h)
      assert(java.util.Arrays.equals(img.raster, r))
    }
  }

  test("header parsing honors Netpbm whitespace variants and # comments") {
    val r = raster(2, 3)
    // same image, three spec-legal headers
    val variants = Seq(
      s"P6 2 3 255 ",
      s"P6\n# a comment\n2\t3\r\n# another\n255\n",
      s"P6\n2 # trailing comment\n3 255\n")
    variants.foreach { hdr =>
      val img = PpmCodec.decode(hdr.getBytes("US-ASCII") ++ r)
      assert(img.width == 2 && img.height == 3, s"header <$hdr>")
      assert(java.util.Arrays.equals(img.raster, r), s"header <$hdr>")
    }
  }

  test("malformed inputs throw with a named cause") {
    val good = PpmCodec.encode(2, 2, raster(2, 2))
    def bad(bytes: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](PpmCodec.decode(bytes))
      assert(e.getMessage.contains("malformed PPM"), what)
    }
    bad("P5\n2 2\n255\n".getBytes ++ raster(2, 2), "wrong magic")
    bad(Array[Byte](), "empty")
    bad("P6\n2 2\n65535\n".getBytes ++ raster(2, 2), "16-bit maxval")
    bad("P6\n2\n255\n".getBytes ++ raster(2, 2), "missing height")
    bad(good.dropRight(1), "truncated raster")
    bad(good :+ 0.toByte, "trailing garbage")
    bad("P6\n0 2\n255\n".getBytes, "zero width")
    bad("P6\n99999999999 2\n255\n".getBytes, "overflowing width")
  }

  test("features are the documented pixel statistics") {
    // 2x1 image: pixels (10,20,30) and (50, 200, 0)
    val r = Array[Byte](10, 20, 30, 50, 200.toByte, 0)
    val f = PpmCodec.features(PpmCodec.Image(2, 1, r))
    assert(f.length == PpmCodec.FeatureDim)
    assert(f(0) == 30.0f && f(1) == 110.0f && f(2) == 15.0f) // means
    assert(f(3) == 50.0f && f(4) == 200.0f && f(5) == 30.0f) // maxima
    assert(f(6) == 2.0f) // aspect 2/1
    assert(f(7) == ((10 + 20 + 30 + 50 + 200 + 0) / 6.0).toFloat)
    // 2x2 tile means, tile-major channel-minor: pixel 0 -> tile (0,0),
    // pixel 1 -> tile (0,1); the h=1 bottom tile row is empty -> 0.0f
    assert(f.slice(8, 11).toSeq == Seq(10.0f, 20.0f, 30.0f))
    assert(f.slice(11, 14).toSeq == Seq(50.0f, 200.0f, 0.0f))
    assert(f.slice(14, 20).forall(_ == 0.0f))
  }

  test("patch features separate layouts that global statistics cannot") {
    // same multiset of pixels, mirrored layout: global stats identical,
    // tile means must differ — the point of the round-11 extension
    val a = PpmCodec.features(PpmCodec.Image(2, 2,
      Array[Byte](100, 0, 0, 0, 0, 0, 0, 0, 0, 100, 0, 0)))
    val b = PpmCodec.features(PpmCodec.Image(2, 2,
      Array[Byte](0, 0, 0, 100, 0, 0, 100, 0, 0, 0, 0, 0)))
    assert(a.take(8).toSeq == b.take(8).toSeq, "global stats equal")
    assert(a.drop(8).toSeq != b.drop(8).toSeq, "patch stats differ")
  }
}
