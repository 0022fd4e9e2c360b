package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.t

/** Typed row shapes of the three X110 video queries (product
  * encoders — `Encoders.tuple` caps at five fields). File-top-level
  * and bytecode-public: a `private` nested case class breaks the
  * encoder's whole-stage codegen (Janino cannot reference it) and
  * silently falls back to interpreted serialization. */
private[graft] case class VIngestRow(id: String, width: Int,
    height: Int, n_frames: Int, fps_num: Int, fps_den: Int,
    duration_ms: Long, y_sum: Long)
private[graft] case class VFrameRow(id: String, pos: String,
    frame_idx: Int, y_min: Long, y_max: Long, y_sum: Long,
    dh_lo: Long, dh_hi: Long)
private[graft] case class VSigRow(id: String, dh_lo: Long, dh_hi: Long)

/** X110 — the THIRD modality: Y4M video ingest, frame sampling and
  * keyframe perceptual near-dup. Completes the multimodal triple the
  * pipeline surface mandates (images X16/X106*, audio X109, video
  * here) with the same discipline: [[Y4mCodec.decode]] parses the
  * stream header and planar frames for real, the decoded geometry /
  * frame rate / frame count are load-bearing, and every downstream
  * value is an all-integer chain the DuckDB oracle replays from the
  * generating document text.
  *
  * The ASSET STORE derives one clip per document: the frame geometry
  * is the IMAGE store's ([[Multimodal.assetWidth]]/[[Multimodal.assetHeight]]
  * — one geometry convention across modalities), `4 + id mod 4`
  * frames at `(10 + id mod 5):1` fps; frame `f`'s Y plane byte `i` is
  * `textByte((17·f + i) mod len)` (the 17 stride de-correlates
  * consecutive frames), U/V planes the +7/+13 offsets of the same
  * cycle.
  *
  * FRAME SAMPLING (`video_frames`) is the brief's frame-sample stage
  * made real: three sampled frames per clip (first / temporal middle
  * / last — the thumbnail-strip convention), each decoded to
  * per-frame luma statistics and its 64-bit luma dHash. The batch
  * shape is the multimodal contract: binary in, one typed row per
  * sampled frame out, all work inside one mapPartitions closure.
  *
  * KEYFRAME NEAR-DUP (`video_neardup`) hashes the TEMPORAL-MIDDLE
  * frame's luma plane ([[dhashLuma]] — the [[MediaNeardup.dhash]]
  * grid over one plane; real video dedup hashes keyframe luma) and
  * pairs through the SHARED [[MediaNeardup.pairsFor]] banded Hamming
  * engine. The VARIANT STORE plants the two re-encode classes
  * byte-exact dedup provably misses:
  *  - `_rt`: 2× TEMPORAL upsample — every frame duplicated, fps
  *    doubled (the naive frame-rate conversion). Middle-frame
  *    selection commutes: the duplicated clip's middle
  *    `d[(2n) div 2] = d[n] = b[n div 2]` IS the base middle — and
  *    first/last map to base first/last the same way, so the sampled
  *    frame CONTENT is invariant while every byte of the container
  *    differs (header rate + doubled payload);
  *  - `_br`: +4 LUMA brightness re-encode (the levels-adjust
  *    re-export; ASCII-derived planes never clamp). A constant shift
  *    preserves every neighbor comparison — hamming 0, bytes differ.
  * Variant planting: `id ≡ 1 (mod 8)` → temporal, `≡ 5` → brightness
  * — disjoint from the image (0/4) and audio (2/6) classes, so the
  * four stores never alias a document's variants.
  *
  * The dHash recall ENVELOPE documented for images applies verbatim
  * (same hash, same grid): re-encode/resize/brightness caught at
  * hamming ≈ 0; crop/translate missed by construction.
  *
  * Scale shape: decode + per-frame features is mapPartitions over the
  * binaryFile scan (no shuffle; at 100 TB of video the scan IS the
  * job and only 16-byte signatures + slim stat rows ever move); pair
  * generation is bucket-local with the `maxBucket` cap; the stats
  * queries are scan + presentation sort. */
object VideoNeardup {

  val HammingMax = 3
  val MaxBucket = 64
  /** Variant planting mods (images use 0/4, audio 2/6). */
  val VariantMod = 8L
  val RtMod = 1L
  val BrMod = 5L
  val BrightDelta = 4
  /** Frame-generation stride: frame `f` reads the text cycle at
    * offset `17·f` (17 is coprime to every plane size in range, so
    * consecutive frames de-correlate). */
  val FrameStride = 17

  def nFrames(id: Long): Int = (4 + id % 4).toInt
  def fpsNum(id: Long): Int = (10 + id % 5).toInt

  /** 64-bit dHash of a single-channel (luma) plane — the
    * [[MediaNeardup.dhash]] 9×8 grid and bit packing over one byte
    * per pixel. */
  def dhashLuma(w: Int, h: Int, y: Array[Byte]): (Long, Long) = {
    val gw = MediaNeardup.GridW
    val gh = MediaNeardup.GridH
    val g = new Array[Int](gh * gw)
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        val sx = gx * w / gw
        val sy = gy * h / gh
        g(gy * gw + gx) = y(sy * w + sx) & 0xff
        gx += 1
      }
      gy += 1
    }
    var lo = 0L
    var hi = 0L
    gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        if (g(gy * gw + gx) > g(gy * gw + gx + 1)) {
          val bit = 1L << ((gy % 4) * 8 + gx)
          if (gy < 4) lo |= bit else hi |= bit
        }
        gx += 1
      }
      gy += 1
    }
    (lo, hi)
  }

  /** The video asset store for `dir`: base clips + planted variants,
    * `_SUCCESS`-gated per (sf dir, documents listing fingerprint)
    * with stale-generation sweep — the [[Multimodal.mediaAssetDir]]
    * discipline. */
  def videoAssetDir(spark: SparkSession, dir: String): String = {
    val tag = graft.util.Tables.pathTag(dir)
    val out = java.nio.file.Paths.get("target/graft_video/" +
      s"y4m_${tag}_" +
      graft.util.Tables.listingTag(spark, s"$dir/documents.parquet"))
      .toAbsolutePath
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      val root = java.nio.file.Paths.get("target/graft_video")
      if (java.nio.file.Files.exists(root)) {
        val ls = java.nio.file.Files.list(root)
        try ls.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter { p =>
            val n = p.getFileName.toString
            n.startsWith(s"y4m_${tag}_") && p.toAbsolutePath != out
          }.foreach(graft.util.Scratch.deleteRecursive)
        finally ls.close()
      }
      graft.util.Scratch.deleteRecursive(out)
      java.nio.file.Files.createDirectories(out)
      val outStr = out.toString
      t(spark, dir, "documents").select(col("doc_id"), col("text"))
        .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
          it.foreach { r =>
            val id = r.getLong(0)
            val tb = r.getString(1).getBytes("US-ASCII")
            val w = Multimodal.assetWidth(id)
            val h = Multimodal.assetHeight(id)
            val nf = nFrames(id)
            val fn = fpsNum(id)
            val np = w * h
            def frame(f: Int): Array[Byte] =
              Array.tabulate[Byte](3 * np) { j =>
                val plane = j / np       // 0=Y, 1=U, 2=V
                val i = j % np
                val off = plane match {
                  case 0 => 0
                  case 1 => 7
                  case _ => 13
                }
                tb((FrameStride * f + i + off) % tb.length)
              }
            val base = (0 until nf).map(frame)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outStr/doc_$id.y4m"),
              Y4mCodec.encode(w, h, fn, 1, base))
            if (id % VariantMod == RtMod) {
              // 2× temporal upsample: frames duplicated, rate doubled
              val rt = (0 until 2 * nf).map(k => base(k / 2))
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$outStr/doc_${id}_rt.y4m"),
                Y4mCodec.encode(w, h, 2 * fn, 1, rt))
            }
            if (id % VariantMod == BrMod) {
              // +4 luma re-encode (U/V untouched — a levels adjust)
              val br = base.map { fr =>
                Array.tabulate[Byte](fr.length)(j =>
                  if (j < np)
                    math.min(255, (fr(j) & 0xff) + BrightDelta).toByte
                  else fr(j))
              }
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$outStr/doc_${id}_br.y4m"),
                Y4mCodec.encode(w, h, fn, 1, br))
            }
            ()
          }
        }
      java.nio.file.Files.write(out.resolve("_SUCCESS"),
        Array.emptyByteArray)
    }
    out.toString
  }

  /** The store read back through the real binaryFile source. */
  private[graft] def assetFiles(spark: SparkSession,
      dir: String): DataFrame =
    spark.read.format("binaryFile").load(videoAssetDir(spark, dir))
      .filter(col("path").endsWith(".y4m"))
      .select(
        regexp_extract(col("path"), "([^/]+)\\.y4m$", 1).as("id"),
        col("content"))

  /** Shared decode wrapper: corrupt payloads excluded loudly
    * (accumulator + per-asset warn, the [[Multimodal.embedDf]]
    * admission rule). */
  private def decodedFlatMap[A](spark: SparkSession, dir: String,
      counter: String)(f: (String, Y4mCodec.Video) => Iterator[A])(
      implicit enc: org.apache.spark.sql.Encoder[A])
      : org.apache.spark.sql.Dataset[A] = {
    import spark.implicits._
    val failures = spark.sparkContext.longAccumulator(counter)
    assetFiles(spark, dir)
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val log =
          org.slf4j.LoggerFactory.getLogger("graft.ops.VideoNeardup")
        it.flatMap { case (id, payload) =>
          scala.util.Try(Y4mCodec.decode(payload)).map(v => f(id, v))
            .recoverWith { case e =>
              failures.add(1L)
              log.warn(s"video decode failed for asset $id, " +
                s"excluded: ${e.getMessage}")
              scala.util.Failure(e)
            }.getOrElse(Iterator.empty)
        }
      }
  }

  /** X110a registered query — per-clip DECODE STATS, every value an
    * integer the oracle re-derives: parsed geometry, frame count,
    * rate, integer-ms duration, and the luma mass over all frames. */
  def videoIngest(spark: SparkSession, dir: String): DataFrame =
    decodedFlatMap(spark, dir, "graft.video.decode_failures") {
      (id, v) =>
        val np = v.width * v.height
        var ySum = 0L
        v.frames.foreach { fr =>
          var i = 0
          while (i < np) { ySum += (fr(i) & 0xff); i += 1 }
        }
        Iterator.single(VIngestRow(id, v.width, v.height,
          v.frames.length, v.fpsNum, v.fpsDen,
          v.frames.length.toLong * 1000L * v.fpsDen / v.fpsNum, ySum))
    }(org.apache.spark.sql.Encoders.product[VIngestRow])
      .toDF()
      .orderBy("id")

  /** The three sampled frame indices of an `n`-frame clip: first,
    * temporal middle, last — the thumbnail-strip convention. */
  def sampleIndices(n: Int): Seq[(String, Int)] =
    Seq(("first", 0), ("mid", n / 2), ("last", n - 1))

  /** X110b registered query — FRAME SAMPLING: one row per sampled
    * frame (first / mid / last) with per-frame luma stats and the
    * frame's 64-bit luma dHash. */
  def videoFrames(spark: SparkSession, dir: String): DataFrame =
    decodedFlatMap(spark, dir, "graft.video.frame_failures") {
      (id, v) =>
        val np = v.width * v.height
        sampleIndices(v.frames.length).iterator.map { case (pos, fi) =>
          val fr = v.frames(fi)
          var mn = 255; var mx = 0; var sum = 0L
          var i = 0
          while (i < np) {
            val y = fr(i) & 0xff
            if (y < mn) mn = y
            if (y > mx) mx = y
            sum += y
            i += 1
          }
          val (lo, hi) = dhashLuma(v.width, v.height, fr)
          VFrameRow(id, pos, fi, mn.toLong, mx.toLong, sum, lo, hi)
        }
    }(org.apache.spark.sql.Encoders.product[VFrameRow])
      .toDF()
      .orderBy("id", "frame_idx", "pos")

  /** (id, dh_lo, dh_hi) keyframe signatures: the temporal-middle
    * frame's luma dHash. */
  private[graft] def signatures(spark: SparkSession,
      dir: String): DataFrame =
    decodedFlatMap(spark, dir, "graft.video.dhash_failures") {
      (id, v) =>
        val fr = v.frames(v.frames.length / 2)
        val (lo, hi) = dhashLuma(v.width, v.height, fr)
        Iterator.single(VSigRow(id, lo, hi))
    }(org.apache.spark.sql.Encoders.product[VSigRow])
      .toDF()

  /** X110c registered query — keyframe perceptual near-dup through
    * the SHARED banded Hamming engine ([[MediaNeardup.pairsFor]]). */
  def videoNeardup(spark: SparkSession, dir: String,
      hammingMax: Int = HammingMax,
      maxBucket: Int = MaxBucket): DataFrame =
    MediaNeardup.pairsFor(signatures(spark, dir), hammingMax, maxBucket)
}
