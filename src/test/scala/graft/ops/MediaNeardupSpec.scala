package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X106b gates: the dHash arithmetic on hand-built pixels, the two
  * re-encode invariances (2× nearest upscale, sub-clamp brightness
  * shift), the exact-dedup MISS the operator exists to close (planted
  * variant bytes differ from their base), end-to-end pairing of every
  * planted twin, and the banded candidate generation's recall
  * verified by brute force (a banded-join bug implemented identically
  * in the oracle would pass the cross-engine gate — this check is
  * independent). */
class MediaNeardupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def img(w: Int, h: Int, f: (Int, Int) => Int) =
    PpmCodec.Image(w, h, Array.tabulate(w * h * 3) { i =>
      f((i / 3) % w, (i / 3) / w).toByte
    })

  test("dhash: hand-built gradient and flat images (X106b)") {
    // strictly increasing left→right: every neighbor comparison is
    // g(x) < g(x+1) → all 64 bits are 0
    val inc = img(9, 8, (x, _) => x * 10)
    assert(MediaNeardup.dhash(inc) == ((0L, 0L)))
    // strictly decreasing: all 64 bits are 1 → both halves 2^32-1
    val dec = img(9, 8, (x, _) => 200 - x * 10)
    assert(MediaNeardup.dhash(dec) == ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    // flat image: no strict inequality anywhere → all-zero hash (the
    // degenerate bucket the MaxBucket cap exists for)
    val flat = img(9, 8, (_, _) => 7)
    assert(MediaNeardup.dhash(flat) == ((0L, 0L)))
    // one bright pixel at the top-left grid cell flips exactly the
    // (y=0, x=0) comparison bit
    val spike = img(9, 8, (x, y) => if (x == 0 && y == 0) 255 else 7)
    assert(MediaNeardup.dhash(spike) == ((1L, 0L)))
  }

  test("dhash is invariant under 2x nearest upscale and sub-clamp brightness (X106b)") {
    val base = img(11, 9, (x, y) => (x * 37 + y * 91) % 200)
    val up = img(22, 18, (x, y) =>
      (base.raster(3 * ((y / 2) * 11 + (x / 2))) & 0xff))
    assert(MediaNeardup.dhash(up) == MediaNeardup.dhash(base),
      "2x nearest upscale must not move a single dHash bit")
    val br = PpmCodec.Image(11, 9,
      base.raster.map(b => math.min(255, (b & 0xff) + 4).toByte))
    assert(MediaNeardup.dhash(br) == MediaNeardup.dhash(base),
      "a constant shift below the clamp preserves every comparison")
  }

  test("planted variants differ in BYTES (exact dedup misses) but pair at hamming 0 (X106b)") {
    import spark.implicits._
    val baseDir = Multimodal.mediaAssetDir(spark, dir)
    val varDir = MediaNeardup.variantDir(spark, dir)
    val variants = new java.io.File(varDir).listFiles()
      .filter(_.getName.endsWith(".ppm")).map(_.getName).toSeq
    assert(variants.nonEmpty, "fixture must plant variants")
    // every variant's bytes differ from its base → md5-keyed exact
    // dedup (the asset_dedup shape) can never pair them
    variants.foreach { v =>
      val id = v.replaceAll("_(up|br)\\.ppm$", ".ppm")
      val vb = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(varDir, v))
      val bb = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(baseDir, id))
      assert(!java.util.Arrays.equals(vb, bb), s"$v must be a re-encode")
    }
    // ...while the perceptual operator pairs EVERY planted twin with
    // its base at hamming 0
    val pairs = MediaNeardup.mediaNeardup(spark, dir)
      .as[(String, String, Int)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    variants.foreach { v =>
      val vid = v.stripSuffix(".ppm")
      val bid = vid.replaceAll("_(up|br)$", "")
      val key = if (bid < vid) (bid, vid) else (vid, bid)
      assert(byPair.get(key).contains(0),
        s"planted twin $vid must pair with $bid at hamming 0: " +
          s"${byPair.get(key)}")
    }
  }

  test("banded candidate generation has full recall vs brute force (X106b)") {
    import spark.implicits._
    val sigs = MediaNeardup.signatures(spark, dir).localCheckpoint()
    val rows = sigs.as[(String, Long, Long)].collect()
    // brute force: ALL pairs within the hamming bound
    val brute = (for {
      a <- rows; b <- rows if a._1 < b._1
      hm = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if hm <= MediaNeardup.HammingMax
    } yield (a._1, b._1, hm)).toSet
    // banded with the cap DISABLED — recall is the property under
    // test; the cap is a documented adversarial-bucket guard
    val banded = MediaNeardup
      .pairsFor(sigs, MediaNeardup.HammingMax, maxBucket = 0)
      .as[(String, String, Int)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
    assert(banded == brute,
      s"banded missed ${(brute -- banded).take(5)} / extra " +
        s"${(banded -- brute).take(5)}")
  }

  test("probe: every re-encoded arrival hits its indexed original; banded ≡ brute (X106c)") {
    import spark.implicits._
    val probe = MediaNeardup.mediaNeardupProbe(spark, dir)
      .as[(String, String, Int)].collect()
    // every planted variant (the incoming batch) pairs with exactly
    // its base at hamming 0 — the re-encoded-copy catch the index
    // exists for, with ZERO corpus decode at probe time
    val varDir = MediaNeardup.variantDir(spark, dir)
    val variants = new java.io.File(varDir).listFiles()
      .filter(_.getName.endsWith(".ppm"))
      .map(_.getName.stripSuffix(".ppm")).toSeq
    assert(variants.nonEmpty)
    val byPair = probe.map(p => (p._1, p._2) -> p._3).toMap
    variants.foreach { vid =>
      val bid = vid.replaceAll("_(up|br)$", "")
      assert(byPair.get((vid, bid)).contains(0),
        s"arrival $vid must hit indexed $bid at hamming 0")
    }
    // the banded probe equals brute force over (batch × index)
    val sigs = MediaNeardup.signatures(spark, dir)
      .as[(String, Long, Long)].collect()
    val (base, vars) = sigs.partition(_._1.matches("^doc_[0-9]+$"))
    val brute = (for {
      a <- vars; b <- base
      hm = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if hm <= MediaNeardup.HammingMax
    } yield (a._1, b._1, hm)).toSet
    assert(probe.toSet == brute,
      s"probe missed ${(brute -- probe.toSet).take(5)} / extra " +
        s"${(probe.toSet -- brute).take(5)}")
  }

  test("media_canonical: full manifest, variants fold to their base's group (X106d)") {
    import spark.implicits._
    val groups = MediaNeardup.mediaCanonical(spark, dir)
      .as[(String, String, Long, String)].collect()
    // COMPLETENESS: groups partition the asset universe — member
    // mass equals the asset count, every id appears exactly once
    val allIds = MediaNeardup.assetFiles(spark, dir)
      .select("id").as[String].collect().toSet
    assert(groups.map(_._3).sum == allIds.size)
    val memberIds = groups.flatMap(_._4.split("\\+"))
    assert(memberIds.length == allIds.size &&
      memberIds.toSet == allIds, "groups must partition the assets")
    // every planted variant sits in its base's group; the canonical
    // keeper is the base (lexicographic min — 'doc_N' < 'doc_N_up')
    val byMember = groups.flatMap(g =>
      g._4.split("\\+").map(_ -> g)).toMap
    val varDir = MediaNeardup.variantDir(spark, dir)
    new java.io.File(varDir).listFiles()
      .filter(_.getName.endsWith(".ppm"))
      .map(_.getName.stripSuffix(".ppm")).foreach { vid =>
        val bid = vid.replaceAll("_(up|br)$", "")
        val g = byMember(vid)
        assert(g._2 == bid && g._1 == bid,
          s"variant $vid must fold into $bid's group with $bid " +
            s"canonical, got $g")
        assert(g._4.split("\\+").contains(bid))
      }
    // singletons are 1-member groups canonicalized to themselves
    val singles = groups.filter(_._3 == 1L)
    assert(singles.nonEmpty &&
      singles.forall(g => g._2 == g._1 && g._4 == g._1))
  }

  test("media_apply: consolidation executes the manifest; post-apply store is pair-free (X106e)") {
    import spark.implicits._
    val store = MediaNeardup.mediaApplyStore(spark, dir)
    def ids(p: String): Set[String] = {
      val f = new java.io.File(p)
      if (!f.exists) Set.empty
      else f.listFiles().filter(_.getName.endsWith(".ppm"))
        .map(_.getName.stripSuffix(".ppm")).toSet
    }
    val kept = ids(s"$store/assets")
    val retired = ids(s"$store/_deleted/assets")
    // the retired set is EXACTLY the non-canonical members of the
    // X106d manifest — the apply executed the election, nothing else
    val expectedDrops = MediaNeardup.mediaCanonical(spark, dir)
      .as[(String, String, Long, String)].collect()
      .flatMap(g => g._4.split("\\+").filter(_ != g._2)).toSet
    assert(retired == expectedDrops)
    // keepers + retired partition the original store
    val allIds = MediaNeardup.assetFiles(spark, dir)
      .select("id").as[String].collect().toSet
    assert((kept ++ retired) == allIds && (kept & retired).isEmpty)
    // the rewritten signature index answers ONLY for keepers: its id
    // set is exactly the surviving base assets
    val idxIds = spark.read.parquet(s"$store/sig_index")
      .select("id").as[String].collect().toSet
    assert(idxIds == kept.filter(_.matches("^doc_[0-9]+$")),
      "index must drop collapsed assets and keep every base keeper")
    // POST-APPLY: re-hashing the consolidated store finds ZERO pairs —
    // by component transitivity, two surviving keepers can never sit
    // within the Hamming bound (they would have shared a group)
    val postSigs = MediaNeardup.sigsOf(spark,
      spark.read.format("binaryFile").load(s"$store/assets")
        .filter(col("path").endsWith(".ppm"))
        .select(regexp_extract(col("path"), "([^/]+)\\.ppm$", 1)
          .as("id"), col("content")))
    val post = MediaNeardup
      .pairsFor(postSigs, MediaNeardup.HammingMax, maxBucket = 0)
      .count()
    assert(post == 0L, s"consolidated store still pairs: $post")
  }

  test("recall ENVELOPE: crop re-encodes fall outside the dHash bound — a documented miss (X106b)") {
    import spark.implicits._
    // The two planted variant classes (2× upscale, +4 brightness) are
    // transforms dHash is invariant to BY CONSTRUCTION — honest, but
    // a spec that only shows catches overclaims the channel. Build
    // CROP variants (2 columns off the left — the thumbnail/letterbox
    // re-edit class) and measure: the grid sampling shifts under
    // translation, so the hash moves far outside the Hamming bound
    // and the pair is MISSED. The envelope is therefore:
    // resize/re-encode/brightness-class → caught at hamming 0;
    // crop/translate/letterbox → NOT caught (needs shift-search or
    // keypoint methods, documented out of scope).
    val base = MediaNeardup.assetFiles(spark, dir)
      .filter(col("id").rlike("^doc_[0-9]+$"))
      .as[(String, Array[Byte])].collect()
      .sortBy(_._1).take(50)
    assert(base.length == 50)
    val hams = base.map { case (_, bytes) =>
      val img = PpmCodec.decode(bytes)
      val off = 2
      val w2 = img.width - off
      val crop = Array.tabulate[Byte](w2 * img.height * 3) { i =>
        val c = i % 3
        val p = i / 3
        img.raster(3 * ((p / w2) * img.width + (p % w2 + off)) + c)
      }
      val (bl, bh) = MediaNeardup.dhash(img)
      val (cl, ch) = MediaNeardup
        .dhash(PpmCodec.Image(w2, img.height, crop))
      java.lang.Long.bitCount(bl ^ cl) + java.lang.Long.bitCount(bh ^ ch)
    }
    val missed = hams.count(_ > MediaNeardup.HammingMax)
    // the miss must be SYSTEMATIC (≥ 90% of crops escape the bound) —
    // if crops started landing inside it, the envelope documentation
    // would be stale and this pin forces the rewrite
    assert(missed >= 45,
      s"only $missed/50 crops escaped the Hamming bound — the " +
        "documented crop-miss envelope no longer holds")
  }

  test("candidate mass stays bucket-bounded (X106b scale gate)") {
    val mask = 0xFFFFL
    val buckets = MediaNeardup.signatures(spark, dir)
      .select(col("id"),
        posexplode(array(
          col("dh_lo").bitwiseAND(lit(mask)),
          shiftright(col("dh_lo"), 16).bitwiseAND(lit(mask)),
          col("dh_hi").bitwiseAND(lit(mask)),
          shiftright(col("dh_hi"), 16).bitwiseAND(lit(mask)))))
      .groupBy(col("pos"), col("col")).count()
      .agg(max(col("count")).cast("long")).head().getLong(0)
    // text-derived pixels hash near-uniformly: the hottest 16-bit
    // bucket must stay within the MaxBucket adversarial cap
    assert(buckets <= MediaNeardup.MaxBucket,
      s"hottest chunk bucket $buckets exceeds the cap — candidate " +
        "mass would quadratically blow past the documented bound")
  }
}
