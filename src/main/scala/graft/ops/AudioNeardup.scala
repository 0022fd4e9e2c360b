package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.t

/** X109 — the SECOND modality: WAV audio ingest + perceptual near-dup
  * (VERDICT r15 item 3). The engine decoded only PPM images until this
  * round; audio completes the multimodal claim with the same
  * real-decode discipline — [[WavCodec.decode]] parses the RIFF
  * container and PCM samples for real, the decoded RATE and SAMPLE
  * COUNT are load-bearing, and every downstream value is an
  * all-integer chain the DuckDB oracle replays bit-for-bit from the
  * generating document text.
  *
  * The ASSET STORE derives one clip per document: sample `i` =
  * `(textByte(i mod len) − 128) · 64` — int16-safe amplitudes over a
  * per-doc-varying geometry (`n = 240 + (doc_id mod 5)·60` samples at
  * `8000 + (doc_id mod 3)·2000` Hz), so the parsed header drives the
  * stats, not a constant.
  *
  * The FINGERPRINT is the 1-D [[MediaNeardup.dhash]] analog: 65
  * point-sampled amplitudes (`sx = x·n div 65` — floor), bit x =
  * `amp(x) > amp(x+1)`, 64 bits packed into two 32-bit halves. The
  * VARIANT STORE plants the two re-encode classes byte-exact dedup
  * provably misses:
  *  - `_rs`: 2× RESAMPLE — every sample duplicated, rate doubled (the
  *    naive sample-rate conversion). Point sampling commutes with 2×
  *    duplication — `(x·2n div 65) div 2 = x·n div 65` — so the
  *    fingerprint is identical (hamming 0) while every byte of the
  *    file differs (header rate + doubled data);
  *  - `_gn`: 2× GAIN — every sample doubled (the normalization
  *    re-encode). Amplitudes stay in int16 range by construction
  *    (|base| ≤ 8192), and `a > b ⟺ 2a > 2b`, so every comparison
  *    bit survives — hamming 0, bytes differ.
  * Variant planting: `doc_id ≡ 2 (mod 8)` → resample, `≡ 6` → gain —
  * disjoint from the image variants' 0/4 classes so the two
  * modalities' stores never alias.
  *
  * Candidate pairing reuses the [[MediaNeardup.pairsFor]] banded
  * 16-bit-chunk Hamming join UNCHANGED — the signature relation has
  * the same (id, lo, hi) shape, which is the point: one bucketed
  * pair engine serves every 64-bit perceptual fingerprint, image or
  * audio.
  *
  * Scale shape: decode + fingerprint is mapPartitions over the
  * binaryFile scan (no shuffle; 16-byte signatures are all that
  * moves); pair generation is bucket-local with the `maxBucket`
  * adversarial cap; the stats query is a scan + presentation sort. */
object AudioNeardup {

  /** Fingerprint geometry: 65 sampled points → 64 comparison bits. */
  val Points = 65
  val HammingMax = 3
  val MaxBucket = 64
  /** Variant planting mods (disjoint from the image store's 0/4). */
  val VariantMod = 8L
  val RsMod = 2L
  val GnMod = 6L

  def nSamples(id: Long): Int = (240 + (id % 5) * 60).toInt
  def sampleRate(id: Long): Int = (8000 + (id % 3) * 2000).toInt

  /** Base amplitude of sample `i` for a doc's ASCII bytes: int16-safe
    * (|v| ≤ 8192 — the 2× gain variant can never clamp). */
  private def baseSample(tb: Array[Byte], i: Int): Short =
    (((tb(i % tb.length) & 0xff) - 128) * 64).toShort

  /** The audio asset store for `dir`: base clips + planted variants,
    * one dir (no serving split — the probe story lives in the image
    * family), `_SUCCESS`-gated per (sf dir, documents listing
    * fingerprint) with stale-generation sweep — the
    * [[Multimodal.mediaAssetDir]] discipline. */
  def audioAssetDir(spark: SparkSession, dir: String): String = {
    val tag = graft.util.Tables.pathTag(dir)
    val out = java.nio.file.Paths.get("target/graft_audio/" +
      s"wav_${tag}_" +
      graft.util.Tables.listingTag(spark, s"$dir/documents.parquet"))
      .toAbsolutePath
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      val root = java.nio.file.Paths.get("target/graft_audio")
      if (java.nio.file.Files.exists(root)) {
        val ls = java.nio.file.Files.list(root)
        try ls.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter { p =>
            val n = p.getFileName.toString
            n.startsWith(s"wav_${tag}_") && p.toAbsolutePath != out
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
            val n = nSamples(id)
            val rate = sampleRate(id)
            val base = Array.tabulate[Short](n)(baseSample(tb, _))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outStr/doc_$id.wav"),
              WavCodec.encode(rate, base))
            if (id % VariantMod == RsMod) {
              // 2× resample: every sample duplicated, rate doubled
              val rs = new Array[Short](2 * n)
              var i = 0
              while (i < rs.length) { rs(i) = base(i / 2); i += 1 }
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$outStr/doc_${id}_rs.wav"),
                WavCodec.encode(2 * rate, rs))
            }
            if (id % VariantMod == GnMod) {
              val gn = base.map(s => (s * 2).toShort)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$outStr/doc_${id}_gn.wav"),
                WavCodec.encode(rate, gn))
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
      spark.read.format("binaryFile").load(audioAssetDir(spark, dir))
        .filter(col("path").endsWith(".wav")))
      .select(
        regexp_extract(col("path"), "([^/]+)\\.wav$", 1).as("id"),
        col("content"))

  /** 64-bit amplitude fingerprint as (lo, hi) 32-bit halves — bit x
    * (0-based) at position `x mod 32` of lo (x < 32) or hi. Pure
    * integer arithmetic (see object doc). */
  def fingerprint(a: WavCodec.Audio): (Long, Long) = {
    val n = a.samples.length
    val p = new Array[Int](Points)
    var x = 0
    while (x < Points) {
      p(x) = a.samples(x * n / Points).toInt
      x += 1
    }
    var lo = 0L
    var hi = 0L
    x = 0
    while (x < Points - 1) {
      if (p(x) > p(x + 1)) {
        if (x < 32) lo |= 1L << x else hi |= 1L << (x - 32)
      }
      x += 1
    }
    (lo, hi)
  }

  /** (id, dh_lo, dh_hi) signatures via the REAL decode — corrupt
    * payloads excluded loudly (accumulator + per-asset warn, the
    * [[Multimodal.embedDf]] admission rule). */
  private[graft] def signatures(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val failures = spark.sparkContext
      .longAccumulator("graft.audio.fingerprint_failures")
    assetFiles(spark, dir)
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val log =
          org.slf4j.LoggerFactory.getLogger("graft.ops.AudioNeardup")
        it.flatMap { case (id, payload) =>
          scala.util.Try {
            val (lo, hi) = fingerprint(WavCodec.decode(payload))
            (id, lo, hi)
          }.recoverWith { case e =>
            failures.add(1L)
            log.warn(s"audio fingerprint failed for asset $id, " +
              s"excluded: ${e.getMessage}")
            scala.util.Failure(e)
          }.toOption
        }
      }
      .toDF("id", "dh_lo", "dh_hi")
  }

  /** X109a registered query — per-clip DECODE STATS, every value an
    * integer the oracle re-derives from the doc text: parsed rate,
    * sample count, integer-ms duration, amplitude min/max/sum. */
  def audioIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val failures = spark.sparkContext
      .longAccumulator("graft.audio.decode_failures")
    assetFiles(spark, dir)
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val log =
          org.slf4j.LoggerFactory.getLogger("graft.ops.AudioNeardup")
        it.flatMap { case (id, payload) =>
          scala.util.Try {
            val a = WavCodec.decode(payload)
            var mn = Int.MaxValue
            var mx = Int.MinValue
            var sum = 0L
            a.samples.foreach { s =>
              val v = s.toInt
              if (v < mn) mn = v
              if (v > mx) mx = v
              sum += v
            }
            (id, a.sampleRate, a.samples.length.toLong,
              a.samples.length.toLong * 1000L / a.sampleRate,
              mn.toLong, mx.toLong, sum)
          }.recoverWith { case e =>
            failures.add(1L)
            log.warn(s"audio decode failed for asset $id, excluded: " +
              s"${e.getMessage}")
            scala.util.Failure(e)
          }.toOption
        }
      }
      .toDF("id", "sample_rate", "n_samples", "duration_ms",
        "amp_min", "amp_max", "amp_sum")
      .orderBy("id")
  }

  /** X109b registered query — perceptual audio near-dup pairs through
    * the SHARED banded Hamming engine ([[MediaNeardup.pairsFor]]). */
  def audioNeardup(spark: SparkSession, dir: String,
      hammingMax: Int = HammingMax,
      maxBucket: Int = MaxBucket): DataFrame =
    MediaNeardup.pairsFor(signatures(spark, dir), hammingMax, maxBucket)
}
