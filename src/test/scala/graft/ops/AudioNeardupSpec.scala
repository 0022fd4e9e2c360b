package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X109 gates: the WAV codec's strict contract, the fingerprint's
  * documented invariances (2× resample, 2× gain), the planted-variant
  * proof that byte-exact dedup misses what the perceptual path pairs,
  * and banded-vs-brute recall — the MediaNeardupSpec pattern for the
  * second modality. */
class AudioNeardupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("wav codec roundtrips and parses its own header for real") {
    val samples = Array.tabulate[Short](300)(i =>
      (((i * 37) % 256 - 128) * 64).toShort)
    val bytes = WavCodec.encode(11025, samples)
    val a = WavCodec.decode(bytes)
    assert(a.sampleRate == 11025)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("decode is strict: malformed containers fail loudly") {
    val ok = WavCodec.encode(8000, Array.tabulate[Short](10)(_.toShort))
    def dies(bytes: Array[Byte], what: String): Unit =
      assertThrows[IllegalArgumentException] {
        WavCodec.decode(bytes); fail(s"$what must not decode")
      }
    dies("JUNK".getBytes ++ ok.drop(4), "wrong RIFF magic")
    dies(ok.dropRight(3), "truncated container")
    dies(ok ++ Array[Byte](0), "trailing garbage")
    // stereo: flip the channel count field (offset 22)
    val stereo = ok.clone(); stereo(22) = 2
    dies(stereo, "stereo")
    // non-PCM format tag (offset 20)
    val comp = ok.clone(); comp(20) = 3
    dies(comp, "non-PCM")
    // 8-bit samples (offset 34)
    val bits8 = ok.clone(); bits8(34) = 8
    dies(bits8, "8-bit")
  }

  test("unknown RIFF chunks are skipped, per the spec") {
    val samples = Array.tabulate[Short](20)(i => (i * 100).toShort)
    val base = WavCodec.encode(8000, samples)
    // splice a LIST chunk between fmt and data (offset 36 = start of
    // the data chunk in the canonical 44-byte header)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ list ++ base.drop(36)
    // RIFF size field must cover the spliced chunk
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val a = WavCodec.decode(spliced)
    assert(a.sampleRate == 8000 && a.samples.toSeq == samples.toSeq)
  }

  test("fingerprint is invariant under 2x resample and 2x gain (X109)") {
    val base = Array.tabulate[Short](317)(i =>
      (((i * 131 + 7) % 256 - 128) * 64).toShort)
    val fp = AudioNeardup.fingerprint(WavCodec.Audio(8000, base))
    val rs = new Array[Short](2 * base.length)
    base.indices.foreach { i => rs(2 * i) = base(i); rs(2 * i + 1) = base(i) }
    assert(AudioNeardup.fingerprint(WavCodec.Audio(16000, rs)) == fp,
      "2x sample duplication must not move any fingerprint bit")
    val gn = base.map(s => (s * 2).toShort)
    assert(AudioNeardup.fingerprint(WavCodec.Audio(8000, gn)) == fp,
      "2x gain must not move any fingerprint bit")
  }

  test("planted variants differ in BYTES (exact dedup misses) but pair at hamming 0") {
    import spark.implicits._
    val store = AudioNeardup.audioAssetDir(spark, dir)
    def bytesOf(id: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/$id.wav"))
    val variants = new java.io.File(store).listFiles()
      .map(_.getName).filter(n => n.contains("_rs") || n.contains("_gn"))
      .map(_.stripSuffix(".wav")).toSeq
    assert(variants.nonEmpty, "store must plant variants")
    val pairs = AudioNeardup.audioNeardup(spark, dir)
      .as[(String, String, Int)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    variants.foreach { vid =>
      val bid = vid.replaceAll("_(rs|gn)$", "")
      // every byte-exact digest differs — the md5 dedup family can
      // never pair the re-encode with its base
      assert(!java.util.Arrays.equals(bytesOf(vid), bytesOf(bid)))
      val key = if (bid < vid) (bid, vid) else (vid, bid)
      assert(pairs.get(key).contains(0),
        s"variant $vid must pair with $bid at hamming 0")
    }
  }

  test("banded candidate generation has full recall vs brute force (X109b)") {
    import spark.implicits._
    val sigs = AudioNeardup.signatures(spark, dir)
    val all = sigs.as[(String, Long, Long)].collect()
    val brute = (for {
      a <- all; b <- all
      if a._1 < b._1
      hm = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if hm <= AudioNeardup.HammingMax
    } yield (a._1, b._1, hm)).toSet
    val banded = MediaNeardup
      .pairsFor(sigs, AudioNeardup.HammingMax, maxBucket = 0)
      .as[(String, String, Int)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
    assert(banded == brute,
      s"banded missed ${(brute -- banded).take(5)} / extra " +
        s"${(banded -- brute).take(5)}")
  }
}
