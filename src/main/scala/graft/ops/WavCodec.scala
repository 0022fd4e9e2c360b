package graft.ops

/** Pure-JVM WAV (RIFF/PCM) audio codec — the second REAL decoder of
  * the multimodal family (X109; [[PpmCodec]] is the image template).
  *
  * Canonical PCM WAV is as deterministically parseable as PPM: a
  * RIFF container (`RIFF <size> WAVE`), a `fmt ` chunk declaring
  * PCM / channel count / sample rate / bit depth, and a `data` chunk
  * of little-endian samples. [[decode]] walks the chunks for real —
  * the parsed sample RATE and COUNT drive every downstream feature —
  * and is strict about the contract this pipeline stores: mono,
  * 16-bit, uncompressed PCM; a malformed magic, a non-PCM format tag,
  * a truncated data chunk, or trailing garbage past the container all
  * throw (one file = exactly one clip; silent tolerance would mask
  * generator bugs — the [[PpmCodec.decode]] posture). Unknown chunks
  * BETWEEN the declared ones (`LIST`, `INFO`, …) are skipped per the
  * RIFF spec: real encoders emit them, and skipping is deterministic.
  */
object WavCodec {

  /** A decoded clip: header-parsed rate + the 16-bit mono samples. */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Encode mono 16-bit PCM at `sampleRate` into a canonical 44-byte
    * -header WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16))
    out.write(le16(1))            // PCM
    out.write(le16(1))            // mono
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * 2)) // byte rate
    out.write(le16(2))            // block align
    out.write(le16(16))           // bits per sample
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataLen))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Decode a mono 16-bit PCM WAV. Strict: throws
    * `IllegalArgumentException` on anything malformed — wrong RIFF or
    * WAVE magic, a declared RIFF size disagreeing with the container,
    * a non-PCM / non-mono / non-16-bit `fmt `, a missing or truncated
    * chunk, an odd data length, or trailing bytes past the declared
    * container. Unknown chunks are skipped (RIFF allows them);
    * duplicate `fmt `/`data` chunks fail. */
  def decode(bytes: Array[Byte]): Audio = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WAV: $msg")
    def u16(p: Int): Int = {
      if (p + 2 > bytes.length) fail(s"truncated u16 at offset $p")
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    }
    def u32(p: Int): Long = {
      if (p + 4 > bytes.length) fail(s"truncated u32 at offset $p")
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    }
    def tag(p: Int): String = {
      if (p + 4 > bytes.length) fail(s"truncated chunk tag at offset $p")
      new String(bytes, p, 4, "US-ASCII")
    }
    if (bytes.length < 12 || tag(0) != "RIFF") fail("magic is not RIFF")
    val riffLen = u32(4)
    if (riffLen + 8 != bytes.length)
      fail(s"container declares ${riffLen + 8} bytes, " +
        s"file has ${bytes.length}")
    if (tag(8) != "WAVE") fail("RIFF form is not WAVE")
    var pos = 12
    var rate = -1
    var samples: Array[Short] = null
    while (pos < bytes.length) {
      val t = tag(pos)
      val len = u32(pos + 4)
      if (len > Int.MaxValue - pos - 8) fail(s"chunk $t overflows")
      val body = pos + 8
      if (body + len > bytes.length)
        fail(s"chunk $t truncated: declares $len bytes past the file")
      t match {
        case "fmt " =>
          if (rate >= 0) fail("duplicate fmt chunk")
          if (len < 16) fail(s"fmt chunk too short ($len)")
          if (u16(body) != 1) fail(s"format tag ${u16(body)} is not PCM")
          if (u16(body + 2) != 1)
            fail(s"${u16(body + 2)} channels (need mono)")
          val r = u32(body + 4)
          if (r <= 0 || r > Int.MaxValue) fail(s"bad sample rate $r")
          if (u16(body + 14) != 16)
            fail(s"${u16(body + 14)} bits per sample (need 16)")
          rate = r.toInt
        case "data" =>
          if (samples != null) fail("duplicate data chunk")
          if (len % 2 != 0) fail(s"odd data length $len")
          val n = (len / 2).toInt
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = ((bytes(body + 2 * i) & 0xff) |
              ((bytes(body + 2 * i + 1) & 0xff) << 8)).toShort
            i += 1
          }
          samples = out
        case _ => // unknown chunk: skip (RIFF permits them)
      }
      // chunks are word-aligned: odd-length bodies carry a pad byte
      pos = body + len.toInt + (len.toInt % 2)
    }
    if (rate < 0) fail("missing fmt chunk")
    if (samples == null) fail("missing data chunk")
    Audio(rate, samples)
  }
}
