package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The persisted-index FRESHNESS contract: every `_SUCCESS`-gated
  * build keys its output dir by `Tables.listingTag` (file names +
  * sizes + mtimes of the source table), so a corpus change — a new
  * partition landing, a compaction — keys a NEW build instead of
  * silently serving stale statistics/signatures. The classic failure
  * this pins against: yesterday's margin cutoffs gating today's
  * corpus because the index path was keyed by dir name alone. */
class IndexFreshnessSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def cloneTable(src: String, dst: String): Unit = {
    val d = Paths.get(dst)
    Files.createDirectories(d)
    val s = Paths.get(src)
    // testdata tables are single parquet FILES; clone into a dir so
    // the "new partition lands" append below has somewhere to land
    if (Files.isDirectory(s)) {
      val listing = Files.list(s)
      try listing.forEach { f =>
        Files.copy(f, d.resolve(f.getFileName.toString),
          StandardCopyOption.COPY_ATTRIBUTES)
        ()
      } finally listing.close()
    } else {
      Files.copy(s, d.resolve("part-00000.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
      ()
    }
  }

  test("a corpus change re-keys the gate stats and signature index builds") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-freshness").toString
    cloneTable("/root/testdata/sf0.001/documents.parquet",
      s"$base/documents.parquet")

    val stats1 = QualitySignals.qualityGateBuildStats(spark, base)
    val index1 = Dedup.neardupBuildIndex(spark, base)
    // same corpus, second call: same dirs, no rebuild (the _SUCCESS
    // fast path)
    assert(QualitySignals.qualityGateBuildStats(spark, base) == stats1)
    assert(Dedup.neardupBuildIndex(spark, base) == index1)

    // a new partition lands (a doc from a NEW source) → both builds
    // re-key, and the rebuilt stats actually see the new corpus
    // 999998 % 7 != 0: the new doc must land on the CORPUS side (an
    // id divisible by batchMod would be batch-side and correctly
    // invisible to the rebuilt statistics)
    Seq((999998L, "fresh arrival text words", "en", "src_new", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append")
      .parquet(s"$base/documents.parquet")
    val stats2 = QualitySignals.qualityGateBuildStats(spark, base)
    val index2 = Dedup.neardupBuildIndex(spark, base)
    assert(stats2 != stats1,
      "gate stats must re-key when the corpus changes")
    assert(index2 != index1,
      "signature index must re-key when the corpus changes")
    def sources(p: String, rel: String) = spark.read.parquet(s"$p/$rel")
      .select("source").as[String].collect().toSet
    assert(!sources(stats1, "rates").contains("src_new"))
    assert(sources(stats2, "rates").contains("src_new"),
      "rebuilt rates must include the newly landed source")
    // CUTOFFS freshness too: the scored base behind the margin rank is
    // session-memoized, and a memo key without the corpus listing tag
    // would hand the re-keyed build YESTERDAY'S cutoffs (bounds/rates
    // fresh, cutoffs stale) — the newly landed source must get a
    // cutoff row from the same rebuild
    assert(!sources(stats1, "cutoffs").contains("src_new"))
    assert(sources(stats2, "cutoffs").contains("src_new"),
      "rebuilt cutoffs must include the newly landed source")
  }

  /** VERDICT r12 item 5: the same contract, asserted over the
    * remaining persisted stores — set-sim shingle/df, edit-distance
    * segment, IVF. Beyond the path re-key, each rebuilt store must
    * CONTAIN the newly landed row: the set-sim and edit-distance
    * builds fill their stores from session-memoized checkpoints, so
    * an un-listing-tagged memo key would hand the fresh store
    * yesterday's corpus (the qgate_base staleness class — this test
    * fails if those memo keys ever lose the tag). */
  test("a corpus change re-keys the set-sim, edit-distance, and IVF stores — and their contents") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-freshness2").toString
    cloneTable("/root/testdata/sf0.001/documents.parquet",
      s"$base/documents.parquet")
    cloneTable("/root/testdata/sf0.001/embeddings.parquet",
      s"$base/embeddings.parquet")

    val newId = 999998L // % 7 != 0: corpus-side, like the stats test
    def hasDoc(path: String, rel: String, idCol: String): Boolean =
      spark.read.parquet(s"$path/$rel")
        .filter(org.apache.spark.sql.functions.col(idCol) === newId)
        .limit(1).count() == 1

    val ss1 = Dedup.setSimBuildIndex(spark, base)
    val ed1 = EditDistance.editDistanceBuildIndex(spark, base)
    val ivf1 = Similarity.ivfBuildIndex(spark, base)
    // same corpus, second call: the _SUCCESS fast path
    assert(Dedup.setSimBuildIndex(spark, base) == ss1)
    assert(EditDistance.editDistanceBuildIndex(spark, base) == ed1)
    assert(Similarity.ivfBuildIndex(spark, base) == ivf1)
    assert(!hasDoc(ss1, "sh", "doc_id"))
    assert(!hasDoc(ed1, "docs", "doc_id"))
    assert(!hasDoc(ivf1, "cells", "vec_id"))

    // a new partition lands in each source table
    Seq((newId, "fresh arrival text words", "en", "src_new", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append")
      .parquet(s"$base/documents.parquet")
    val v = Array.fill(64)(0.0f); v(0) = 1.0f
    Seq((newId, v, 3)).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append")
      .parquet(s"$base/embeddings.parquet")

    val ss2 = Dedup.setSimBuildIndex(spark, base)
    val ed2 = EditDistance.editDistanceBuildIndex(spark, base)
    val ivf2 = Similarity.ivfBuildIndex(spark, base)
    assert(ss2 != ss1, "set-sim index must re-key on corpus change")
    assert(ed2 != ed1, "edit-distance index must re-key on corpus change")
    assert(ivf2 != ivf1, "IVF store must re-key on corpus change")
    assert(hasDoc(ss2, "sh", "doc_id"),
      "rebuilt set-sim store must contain the new doc's shingles")
    assert(hasDoc(ed2, "docs", "doc_id"),
      "rebuilt edit-distance store must contain the new doc")
    assert(hasDoc(ivf2, "cells", "vec_id"),
      "rebuilt IVF cells must contain the new vector")
  }

  /** X85 (VERDICT r13 item 4): takedown PROPAGATION — after the
    * compliance delete rewrites the corpus, every persisted store
    * built against the post-takedown dir must re-key AND contain
    * nothing of the deleted docs. A store that kept serving deleted
    * content after its erasure is the compliance failure this test
    * exists to prevent. */
  test("a takedown re-keys all five stores and erases the deleted docs from them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-takedown").toString
    cloneTable("/root/testdata/sf0.001/documents.parquet",
      s"$base/documents.parquet")
    cloneTable("/root/testdata/sf0.001/embeddings.parquet",
      s"$base/embeddings.parquet")
    // plant a source whose EVERY doc is takedown-hit (ids ≡ 0 mod 97,
    // % 7 != 0 so they sit corpus-side for the gate statistics), plus
    // embeddings for the IVF store
    val tdIds = Seq(97L * 100003, 97L * 100004, 97L * 100006)
    tdIds.foreach(id => assert(id % 7 != 0 && id % Takedown.TakedownMod == 0))
    tdIds.map(id => (id, "takedown target text words enough to shingle " +
        s"uniquely $id", "en", "src_td", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(s"$base/documents.parquet")
    tdIds.map { id =>
      val v = Array.fill(64)(0.0f); v(1) = 1.0f; (id, v, 5) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(s"$base/embeddings.parquet")

    // pre-takedown stores see the planted docs
    val ss1 = Dedup.setSimBuildIndex(spark, base)
    assert(spark.read.parquet(s"$ss1/sh")
      .filter(col("doc_id").isin(tdIds: _*)).count() > 0)

    val newDir = Takedown.takedownStore(spark, base)
    assert(newDir != base)
    // the rewritten corpus itself: deleted rows gone, retired copy
    // carries exactly them (the restore/audit path)
    val afterIds = spark.read.parquet(s"$newDir/documents.parquet")
      .select("doc_id").as[Long].collect().toSet
    tdIds.foreach(id => assert(!afterIds.contains(id), s"doc $id survived"))
    val retired = spark.read.parquet(s"$newDir/_deleted/documents")
      .select("doc_id").as[Long].collect().toSet
    assert(tdIds.toSet.subsetOf(retired), s"retired copy missing rows")

    // all five stores, rebuilt against the post-takedown dir: fresh
    // keys, no deleted content
    val stats2 = QualitySignals.qualityGateBuildStats(spark, newDir)
    val sig2 = Dedup.neardupBuildIndex(spark, newDir)
    val ss2 = Dedup.setSimBuildIndex(spark, newDir)
    val ed2 = EditDistance.editDistanceBuildIndex(spark, newDir)
    val ivf2 = Similarity.ivfBuildIndex(spark, newDir)
    assert(Seq(sig2, ss2, ed2, ivf2).forall(_ != ss1))
    def none(path: String, rel: String, idCol: String): Unit =
      assert(spark.read.parquet(s"$path/$rel")
        .filter(col(idCol).isin(tdIds: _*)).count() == 0,
        s"$path/$rel still serves deleted docs")
    none(sig2, "", "doc_id")
    none(ss2, "sh", "doc_id")
    none(ed2, "docs", "doc_id")
    none(ivf2, "cells", "vec_id")
    // the fully-deleted source vanishes from the gate statistics
    val rateSrcs = spark.read.parquet(s"$stats2/rates")
      .select("source").as[String].collect().toSet
    assert(!rateSrcs.contains("src_td"),
      "gate stats still carry the fully-deleted source")
  }

  /** X76b (round 15): the dedup manifest APPLIED — after
    * [[Takedown.dedupApplyStore]] drops the non-canonical near-dup
    * members, the rewritten corpus keeps exactly the keepers, the
    * retirement carries the dropped rows, and stores rebuilt against
    * the post-dedup dir re-key with none of the collapsed docs — the
    * takedown propagation contract, driven by the X76 manifest
    * instead of a compliance list. */
  test("applying the dedup manifest drops non-canonical members and re-keys the stores") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-dedup-apply").toString
    cloneTable("/root/testdata/sf0.001/documents.parquet",
      s"$base/documents.parquet")
    cloneTable("/root/testdata/sf0.001/embeddings.parquet",
      s"$base/embeddings.parquet")
    // plant a 3-doc near-dup clique: identical text → identical
    // MinHash signatures on every band → pairs; min id is canonical
    val clique = Seq(999900001L, 999900002L, 999900003L)
    val cliqueText = "zzqx wvrbl kpth zzqx wvrbl kpth unique clique " +
      "payload words that shingle identically across all three copies"
    clique.map(id => (id, cliqueText, "en", "src_cliq", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(s"$base/documents.parquet")
    clique.map { id =>
      val v = Array.fill(64)(0.0f); v(2) = 1.0f; (id, v, 4) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(s"$base/embeddings.parquet")

    val newDir = Takedown.dedupApplyStore(spark, base)
    assert(newDir != base)
    val keeper = clique.min
    val dropped = clique.filter(_ != keeper)
    val afterIds = spark.read.parquet(s"$newDir/documents.parquet")
      .select("doc_id").as[Long].collect().toSet
    assert(afterIds.contains(keeper), "the canonical member must survive")
    dropped.foreach(id => assert(!afterIds.contains(id),
      s"non-canonical member $id survived the write-back"))
    val retired = spark.read.parquet(s"$newDir/_deleted/documents")
      .select("doc_id").as[Long].collect().toSet
    assert(dropped.toSet.subsetOf(retired),
      "retirement must carry exactly the collapsed members")
    assert(!retired.contains(keeper))
    // embeddings of collapsed docs are gone too — similarity search
    // must not keep serving vectors of rows the lake no longer has
    val afterVecs = spark.read.parquet(s"$newDir/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(afterVecs.contains(keeper))
    dropped.foreach(id => assert(!afterVecs.contains(id)))
    // the post-delete probe walk: stores rebuilt against the
    // post-dedup dir re-key and contain none of the collapsed docs
    val sig2 = Dedup.neardupBuildIndex(spark, newDir)
    assert(spark.read.parquet(sig2)
      .filter(col("doc_id").isin(dropped: _*)).count() == 0,
      "rebuilt signature index still serves collapsed docs")
    val ivf2 = Similarity.ivfBuildIndex(spark, newDir)
    assert(spark.read.parquet(s"$ivf2/cells")
      .filter(col("vec_id").isin(dropped: _*)).count() == 0,
      "rebuilt IVF cells still serve collapsed vectors")
    // idempotent: the second call is the _SUCCESS fast path
    assert(Takedown.dedupApplyStore(spark, base) == newDir)
  }

  /** The MEDIA stores (round 16): the X106c dHash signature index and
    * the X106e consolidation both derive from the generated asset
    * stores, which key by the DOCUMENTS listing tag — a corpus change
    * must re-key both, and the rebuilt signature index must cover the
    * newly landed document's asset. */
  test("a corpus change re-keys the media signature index and the apply store") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-freshness-media").toString
    cloneTable("/root/testdata/sf0.001/documents.parquet",
      s"$base/documents.parquet")
    val idx1 = MediaNeardup.sigIndexDir(spark, base)
    val app1 = MediaNeardup.mediaApplyStore(spark, base)
    // same corpus, second call: the _SUCCESS fast path
    assert(MediaNeardup.sigIndexDir(spark, base) == idx1)
    assert(MediaNeardup.mediaApplyStore(spark, base) == app1)
    def idxIds(p: String) = spark.read.parquet(p)
      .select("id").as[String].collect().toSet
    assert(!idxIds(idx1).contains("doc_999998"))
    Seq((999998L, "fresh media arrival with enough words to raster",
        "en", "src_new", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append")
      .parquet(s"$base/documents.parquet")
    val idx2 = MediaNeardup.sigIndexDir(spark, base)
    val app2 = MediaNeardup.mediaApplyStore(spark, base)
    assert(idx2 != idx1,
      "media signature index must re-key when the corpus changes")
    assert(app2 != app1,
      "media apply store must re-key when the corpus changes")
    assert(idxIds(idx2).contains("doc_999998"),
      "rebuilt signature index must cover the newly landed asset")
  }

  /** The SIXTH store (round 14): the X90 rank vector the X99 priority
    * reads. Keyed by the crawl FIXTURE's listing tag (it derives from
    * crawled pages, not the testdata dir — which is why the takedown
    * walk above does not cover it): a new fetch landing must re-key
    * the store and the rebuilt ranks must see the new host. */
  test("a crawl change re-keys the rank store and ranks the new host") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-freshness-rank").toString
    val csv = s"$base/html_docs.csv"
    Files.copy(Paths.get(HtmlExtract.FixtureCsv), Paths.get(csv))
    val s1 = LinkGraph.rankStore(spark, csv)
    // same crawl, second call: the _SUCCESS fast path
    assert(LinkGraph.rankStore(spark, csv) == s1)
    def hosts(p: String) = spark.read.parquet(p)
      .select("host").as[String].collect().toSet
    assert(!hosts(s1).contains("brandnew.test"))
    // a newly fetched page linking a brand-new host lands
    Files.write(Paths.get(csv),
      ("999998,freshsrc,http://freshsrc.crawl.test/a.html," +
        "<p><a href='http://brandnew.test/x'>n</a></p>\n").getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    val s2 = LinkGraph.rankStore(spark, csv)
    assert(s2 != s1, "rank store must re-key when the crawl changes")
    assert(hosts(s2).contains("brandnew.test"),
      "rebuilt ranks must include the newly linked host")
  }
}
