package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X112 gates: the GC store retires exactly the dropped documents'
  * assets across all three modalities (variants included), keeps the
  * rest by link, and the read-back manifest balances — referential
  * integrity between the text dedup write-back and the media stores. */
class AssetGcSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def names(path: String): Set[String] = {
    val f = new java.io.File(path)
    if (!f.exists()) Set.empty
    else f.listFiles().map(_.getName).filter(!_.startsWith("_")).toSet
  }

  test("retired set = exactly the dropped docs' assets, keepers survive by link") {
    import spark.implicits._
    val store = AssetGc.assetGcStore(spark, dir)
    val drops = Takedown.neardupDropIds(spark, dir)
      .as[Long].collect().toSet
    assert(drops.nonEmpty, "fixture must contain near-dup drop ids")

    def owner(n: String): Long =
      "^doc_(\\d+)".r.findFirstMatchIn(n).get.group(1).toLong
    Seq("image" -> ".ppm", "audio" -> ".wav", "video" -> ".y4m")
      .foreach { case (mod, ext) =>
        val removed = names(s"$store/_deleted/$mod")
        val kept = names(s"$store/$mod")
        assert(removed.nonEmpty, s"$mod must retire something")
        assert(removed.forall(n => drops(owner(n))),
          s"$mod retired an asset of a surviving doc")
        assert(kept.forall(n => !drops(owner(n))),
          s"$mod kept an asset of a dropped doc")
        // a dropped doc loses ALL its assets, variants included
        val removedOwners = removed.map(owner)
        assert(kept.map(owner).intersect(removedOwners).isEmpty,
          s"$mod split a document's assets across keep/retire")
        assert(ext.nonEmpty)
      }
  }

  test("manifest balances and the retired unit mass matches a direct decode") {
    import spark.implicits._
    val store = AssetGc.assetGcStore(spark, dir)
    val rows = AssetGc.assetGc(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq("audio", "image", "video"))
    rows.foreach { case (mod, before, removed, after, units) =>
      assert(before == removed + after, s"$mod manifest must balance")
      assert(removed > 0 && units > 0, s"$mod must have retired mass")
    }
    // video retired frames vs direct decode of the retired files
    val vRemoved = new java.io.File(s"$store/_deleted/video")
      .listFiles().filter(_.getName.endsWith(".y4m"))
    val expFrames = vRemoved.map(f => Y4mCodec.decode(
      java.nio.file.Files.readAllBytes(f.toPath)).frames.length.toLong)
      .sum
    assert(rows.find(_._1 == "video").get._5 == expFrames)
  }
}
