package graft.ops

/** Pure-JVM Y4M (YUV4MPEG2) video codec — the THIRD real decoder of
  * the multimodal family (X110; [[PpmCodec]] images, [[WavCodec]]
  * audio). Y4M is the uncompressed interchange format the open video
  * toolchain (mjpegtools, ffmpeg, VP9/AV1 test vectors) uses: an
  * ASCII stream header `YUV4MPEG2 W<w> H<h> F<num>:<den> ...`
  * terminated by `\n`, then per frame an ASCII `FRAME\n` marker
  * followed by the raw planar YUV payload. As with PPM, there is no
  * codec dependency — the header grammar and plane arithmetic are the
  * whole format.
  *
  * Supported subset, strict (the one-clip-one-file contract of this
  * pipeline's stores): colourspace `C444` (three full-resolution
  * planes — deterministic plane sizes with no chroma subsampling
  * rounding), progressive, any `W`/`H`/`F`. [[decode]] parses the
  * stream header for real — the decoded geometry and frame rate
  * drive every downstream feature — and throws on a malformed magic,
  * unknown/duplicate/malformed parameters, an unsupported
  * colourspace, a truncated frame payload, or trailing bytes after
  * the last frame. Unknown `X` (comment) parameters are skipped per
  * the spec; frame-level parameters after `FRAME` are accepted and
  * ignored (the spec allows them). */
object Y4mCodec {

  /** A decoded clip: geometry, frame rate, and per-frame planar YUV
    * (each frame = three `width·height` planes, Y then U then V). */
  final case class Video(width: Int, height: Int,
      fpsNum: Int, fpsDen: Int, frames: Array[Array[Byte]])

  /** Encode C444 frames (each `3·w·h` bytes: Y, U, V planes). */
  def encode(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(fpsNum > 0 && fpsDen > 0, s"bad rate $fpsNum:$fpsDen")
    frames.foreach(f => require(f.length == 3 * w * h,
      s"frame length ${f.length} != 3*${w}x$h"))
    val header =
      s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C444\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.map(_.length + marker.length).sum)
    out.write(header)
    frames.foreach { f => out.write(marker); out.write(f) }
    out.toByteArray
  }

  /** Decode a C444 Y4M clip; strict (see object doc). */
  def decode(bytes: Array[Byte]): Video = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed Y4M: $msg")
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      if (pos >= bytes.length) fail("unterminated header line")
      val s = new String(bytes, start, pos - start, "US-ASCII")
      pos += 1
      s
    }
    val header = line()
    val parts = header.split(" ")
    if (parts.isEmpty || parts(0) != "YUV4MPEG2")
      fail("magic is not YUV4MPEG2")
    var w = -1; var h = -1; var fn = -1; var fd = -1
    var cs = "C420jpeg" // the spec's default when C is absent
    def posInt(s: String, what: String): Int = {
      if (s.isEmpty || !s.forall(_.isDigit)) fail(s"bad $what '$s'")
      val v = s.toLong
      if (v <= 0 || v > Int.MaxValue) fail(s"$what $v out of range")
      v.toInt
    }
    parts.drop(1).foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' =>
          if (w >= 0) fail("duplicate W"); w = posInt(p.tail, "width")
        case 'H' =>
          if (h >= 0) fail("duplicate H"); h = posInt(p.tail, "height")
        case 'F' =>
          if (fn >= 0) fail("duplicate F")
          p.tail.split(":") match {
            case Array(n, d) =>
              fn = posInt(n, "fps num"); fd = posInt(d, "fps den")
            case _ => fail(s"bad frame rate '$p'")
          }
        case 'C' => cs = p
        case 'I' | 'A' | 'X' => // interlacing/aspect/comment: ignored
        case _ => fail(s"unknown stream parameter '$p'")
      }
    }
    if (w < 0 || h < 0) fail("missing W or H")
    if (fn < 0) fail("missing F")
    if (cs != "C444") fail(s"unsupported colourspace $cs (need C444)")
    val frameLen = 3L * w * h
    if (frameLen > Int.MaxValue) fail(s"frame ${w}x$h too large")
    val frames = Seq.newBuilder[Array[Byte]]
    while (pos < bytes.length) {
      val fl = line()
      if (fl != "FRAME" && !fl.startsWith("FRAME "))
        fail(s"expected FRAME marker, got '${fl.take(20)}'")
      if (bytes.length - pos < frameLen)
        fail(s"frame truncated: need $frameLen bytes, " +
          s"have ${bytes.length - pos}")
      frames += java.util.Arrays.copyOfRange(bytes, pos,
        pos + frameLen.toInt)
      pos += frameLen.toInt
    }
    val fs = frames.result()
    if (fs.isEmpty) fail("clip has no frames")
    Video(w, h, fn, fd, fs.toArray)
  }
}
