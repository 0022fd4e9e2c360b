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
private[graft] case class VQuad(a_lo: Long, a_hi: Long,
    b_lo: Long, b_hi: Long)
private[graft] case class VProxyRow(id: String, n_frames: Int,
    duration_ms: Long, mid_lo: Long, mid_hi: Long,
    shingles: Seq[VQuad])

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
  * A third planted class exercises the documented MISS:
  *  - `_cl`: TEMPORAL crop — the first [[ClDrop]] frames trimmed (the
  *    re-edit that shifts every frame index). The keyframe channel
  *    misses it structurally (the cropped clip's middle is a
  *    different content frame, and frames are de-correlated by the
  *    [[FrameStride]]); the SEQUENCE channel (`video_subclip`)
  *    catches it: consecutive-frame-hash shingles are index-free, so
  *    a subclip shares all its interior shingles with its base —
  *    containment 1.0 regardless of the trim offset.
  * Variant planting: `id ≡ 1 (mod 8)` → temporal, `≡ 3` → crop, `≡ 5`
  * → brightness — disjoint from the image (0/4) and audio (2/6)
  * classes, so the four stores never alias a document's variants.
  *
  * The dHash recall ENVELOPE documented for images applies verbatim
  * (same hash, same grid): re-encode/resize/brightness caught at
  * hamming ≈ 0; SPATIAL crop/translate missed by construction (the
  * fixed grid shifts with content). The temporal-crop class, by
  * contrast, is recovered by the shingle channel above — time has an
  * alignment-free representation where space does not.
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
  val ClMod = 3L
  val BrightDelta = 4
  /** The `_cl` temporal crop drops this many LEADING frames (a
    * trimmed-intro re-edit). Two, not one: for every frame count in
    * range the cropped clip's temporal-middle frame is then a
    * DIFFERENT content frame than the base's (`2 + (n-2)/2 ≠ n/2` for
    * all n ≥ 3), so the keyframe channel's miss is structural, not
    * luck of the frame parity. */
  val ClDrop = 2
  /** Subclip containment threshold: fraction of the smaller clip's
    * distinct frame-hash shingles the pair must share. */
  val MinContain = 0.8
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
    // v2: the store gained the `_cl` temporal-crop class — the
    // version in the prefix invalidates v1 stores (the listing-tag
    // memo can't see a BUILDER change, only a source change)
    val out = java.nio.file.Paths.get("target/graft_video/" +
      s"y4mv2_${tag}_" +
      graft.util.Tables.listingTag(spark, s"$dir/documents.parquet"))
      .toAbsolutePath
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      val root = java.nio.file.Paths.get("target/graft_video")
      if (java.nio.file.Files.exists(root)) {
        val ls = java.nio.file.Files.list(root)
        try ls.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter { p =>
            val n = p.getFileName.toString
            (n.startsWith(s"y4m_${tag}_") ||
              n.startsWith(s"y4mv2_${tag}_")) && p.toAbsolutePath != out
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
            if (id % VariantMod == ClMod) {
              // temporal crop: the first ClDrop frames trimmed (the
              // re-edit class the KEYFRAME channel structurally
              // misses — the documented crop gap, here in time)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$outStr/doc_${id}_cl.y4m"),
                Y4mCodec.encode(w, h, fn, 1, base.drop(ClDrop)))
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
    graft.util.Tables.packScan(
      spark.read.format("binaryFile").load(videoAssetDir(spark, dir))
        .filter(col("path").endsWith(".y4m")))
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

  /** Decode-once per-clip PROXY relation (r16 optimization, guide §8:
    * decide with small rows — one decode of the store yields every
    * per-clip feature the pair channels need). Per clip, the
    * frame-hash sequence collapses to the temporal-middle dHash, the
    * DISTINCT consecutive-hash shingle set, and the integer duration;
    * `video_neardup`'s signatures, `video_subclip`'s shingles and
    * `video_canonical`'s election key all derive from this ONE scan.
    * Pre-r16, `video_canonical` re-decoded the store once per channel
    * reference (profiled: 5 concurrent 215-task decode jobs at sf0.1
    * — 6.4 s; the subclip self-join alone held 4 copies of the
    * decode subtree, which Catalyst cannot CSE through an opaque
    * mapPartitions). Every derived value is bit-identical to the old
    * per-channel closures: same [[dhashLuma]] per frame, same
    * `.distinct` shingle rule, same integer duration arithmetic. */
  private[graft] def videoProxies(spark: SparkSession,
      dir: String): DataFrame =
    // SESSION-MEMOIZED checkpoint (r17, ADVICE r16): the r16 form
    // re-decoded the store and pinned a FRESH per-invocation
    // checkpoint in each of videoSubclip/videoCanonical — unbounded
    // pinned storage in a long-lived session, and video_neardup/
    // video_subclip/video_canonical each paid their own full decode
    // in every bench pass. The memo is keyed on the store listing tag
    // (refresh self-invalidates), cold-cleared per bench pass like
    // every CkptMemo relation, and — clip-proxy-sized (hashes,
    // shingles, duration; no pixels) — is exactly the materialized
    // proxy table a production video pipeline maintains.
    graft.util.CkptMemo.of(spark, "video_proxies",
        graft.util.Tables.listingTag(spark,
          videoAssetDir(spark, dir))) {
      decodedFlatMap(spark, dir, "graft.video.proxy_failures") {
        (id, v) =>
          val hs = v.frames.map(fr => dhashLuma(v.width, v.height, fr))
          val sh = (0 until hs.length - 1)
            .map(i => (hs(i), hs(i + 1))).distinct
          val (mlo, mhi) = hs(hs.length / 2)
          Iterator.single(VProxyRow(id, v.frames.length,
            v.frames.length.toLong * 1000L * v.fpsDen / v.fpsNum,
            mlo, mhi,
            sh.map { case ((alo, ahi), (blo, bhi)) =>
              VQuad(alo, ahi, blo, bhi) }))
      }(org.apache.spark.sql.Encoders.product[VProxyRow])
        .toDF()
        .localCheckpoint(false)
    }

  /** (id, dh_lo, dh_hi) keyframe signatures: the temporal-middle
    * frame's luma dHash (derived from [[videoProxies]] — one decode
    * path to maintain; the standalone query still scans once). */
  private[graft] def signatures(spark: SparkSession,
      dir: String): DataFrame =
    signaturesFrom(videoProxies(spark, dir))

  private def signaturesFrom(proxy: DataFrame): DataFrame =
    proxy.select(col("id"), col("mid_lo").as("dh_lo"),
      col("mid_hi").as("dh_hi"))

  /** X110c registered query — keyframe perceptual near-dup through
    * the SHARED banded Hamming engine ([[MediaNeardup.pairsFor]]). */
  def videoNeardup(spark: SparkSession, dir: String,
      hammingMax: Int = HammingMax,
      maxBucket: Int = MaxBucket): DataFrame =
    MediaNeardup.pairsFor(signatures(spark, dir), hammingMax, maxBucket)

  /** Per-clip DISTINCT consecutive-frame-hash shingles: every frame's
    * luma dHash, paired with its successor's — `(h_i, h_{i+1})`, the
    * order-preserving alignment-FREE unit of the sequence channel.
    * One row per distinct shingle, carrying the clip's distinct-
    * shingle count (the containment denominator). All work inside the
    * decode closure — the whole clip is already in hand, so the
    * shingle window costs no shuffle. */
  private[graft] def frameShingles(spark: SparkSession,
      dir: String): DataFrame =
    shinglesFrom(videoProxies(spark, dir))

  /** The (id, n_sh, a_lo, a_hi, b_lo, b_hi) shingle relation unpacked
    * from the proxy rows — `n_sh` is the clip's distinct-shingle
    * count (the containment denominator), exactly the old closure's
    * `sh.size`; single-frame clips carry an empty array and emit no
    * rows, matching the old empty iterator. */
  private def shinglesFrom(proxy: DataFrame): DataFrame =
    proxy
      .select(col("id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("q"))
      .select(col("id"), col("n_sh"), col("q.a_lo").as("a_lo"),
        col("q.a_hi").as("a_hi"), col("q.b_lo").as("b_lo"),
        col("q.b_hi").as("b_hi"))

  /** X110d registered query — temporal SUBCLIP near-dup: clips
    * sharing ≥ `minContain` of the smaller side's frame-hash shingles
    * (id_a < id_b, with the shared count and the containment score).
    *
    * This is the channel that closes the keyframe path's temporal
    * blind spot: a trimmed/re-cut clip shares none of its frame
    * INDICES with its source, but every interior consecutive-frame
    * shingle survives, so containment hits 1.0 wherever the overlap
    * covers the smaller clip — while `video_neardup`'s single
    * middle-frame hash lands on different content and misses. The
    * constant-shift (`_br`) and frame-doubling (`_rt`) classes are
    * subsumed: both preserve consecutive-frame shingles (`_rt`'s
    * `(h_i, h_i)` self-shingles are extras on the larger side, which
    * containment ignores).
    *
    * Scale shape: shingles join by 256-bit EQUALITY — hash-partitioned
    * bucket work, never all-pairs; the occupancy cap drops degenerate
    * shingle values (flat/looping content) exactly like the banded
    * engine's [[MaxBucket]]. Output pairs are containment-gated, so
    * only genuinely overlapping clips survive to the driver. */
  def videoSubclip(spark: SparkSession, dir: String,
      minContain: Double = MinContain,
      maxBucket: Int = MaxBucket): DataFrame =
    // the proxy is the memoized checkpoint: the occupancy-cap +
    // self-join shape below references the shingle relation four
    // times, and through an opaque decode closure each reference
    // would re-scan and re-decode the store (r16 profile: 4 decode
    // jobs; with the [[videoProxies]] memo leaf, one per pass)
    subclipPairs(shinglesFrom(videoProxies(spark, dir)),
      minContain, maxBucket)

  private def subclipPairs(sh: DataFrame, minContain: Double,
      maxBucket: Int): DataFrame = {
    val keyCols = Seq("a_lo", "a_hi", "b_lo", "b_hi")
    val capped =
      if (maxBucket > 0) {
        val allowed = sh.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("occ"))
          .filter(col("occ") <= maxBucket)
          .drop("occ")
        sh.join(allowed, keyCols)
      } else sh
    val a = capped.select(col("id").as("id_a"), col("n_sh").as("n_a"),
      col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi"))
    val b = capped.select(col("id").as("id_b"), col("n_sh").as("n_b"),
      col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi"))
    a.join(b, keyCols)
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("shared"))
      .withColumn("containment",
        col("shared") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= minContain)
      .select("id_a", "id_b", "shared", "containment")
      .orderBy("id_a", "id_b")
  }

  /** (id, duration_ms) from the parsed container headers — the
    * election key of [[videoCanonical]]. */
  private def clipDurations(proxy: DataFrame): DataFrame =
    proxy.select(col("id"), col("duration_ms"))

  /** X110e registered query — video CANONICAL consolidation: one row
    * per near-dup GROUP with its keeper, over the UNION of the two
    * perceptual channels (keyframe Hamming + subclip shingles — a
    * pair caught by either collapses). Groups are connected
    * components via the SHARED [[Dedup.minLabelComponents]]
    * pointer-jump core, labeled by their lexicographic-min id (the
    * [[MediaNeardup.mediaCanonical]] convention); singletons are
    * emitted, so the output is a full clip manifest.
    *
    * The ELECTION RULE is the modality's own: the keeper is the
    * LONGEST clip by decoded duration (tie → min id) — in a
    * subclip group the superclip carries the trimmed copy's entire
    * content, so duration, not name order, is what "canonical" means
    * for video. The planted classes pin all three arms: `_cl` is
    * SHORTER (base wins on duration), `_rt`/`_br` are duration-ties
    * (base wins on id).
    *
    * Scale shape: both pair channels are bucket-bounded; the edge
    * union is pair-sized and CHECKPOINTED before the label rounds
    * (the [[MediaNeardup.mediaCanonical]] lesson — un-checkpointed,
    * every propagation round would re-run both decode+bucket
    * chains); the manifest is one left join of the label relation
    * onto the clip universe and one group-keyed agg whose
    * collect_list state is group-size-bounded. */
  def videoCanonical(spark: SparkSession, dir: String,
      minContain: Double = MinContain,
      hammingMax: Int = HammingMax,
      maxBucket: Int = MaxBucket): DataFrame = {
    // ONE memoized decode pass feeds all three channels (subclip
    // shingles, keyframe signatures, duration election key) — the
    // r16 decode-once restructure, now shared ACROSS the video
    // queries per pass via the [[videoProxies]] memo (r17); pre-r16
    // this query ran 5 full store decodes
    val proxy = videoProxies(spark, dir)
    val edges = subclipPairs(shinglesFrom(proxy), minContain,
        maxBucket)
      .select(col("id_a"), col("id_b"))
      .union(MediaNeardup.pairsFor(signaturesFrom(proxy), hammingMax,
          maxBucket)
        .select(col("id_a"), col("id_b")))
      .distinct()
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .localCheckpoint()
    val labels = Dedup.minLabelComponents(edges)
      .select(col("doc_id").as("id"), col("grp"))
    clipDurations(proxy)
      .join(labels, Seq("id"), "left")
      .withColumn("group_id", coalesce(col("grp"), col("id")))
      .groupBy(col("group_id"))
      .agg(
        // min over (−duration, id): longest first, ties by min id
        min(struct((-col("duration_ms")).as("k"), col("id").as("i")))
          .getField("i").as("canonical"),
        count(lit(1)).as("n_members"),
        array_join(array_sort(collect_list(col("id"))), "+")
          .as("members"))
      .orderBy("group_id")
  }
}
