package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X85 gates beyond the oracle row and the IndexFreshnessSpec
  * propagation walk: the FILE-GRANULAR economics of the write-back.
  * The oracle only proves arithmetic over the rewritten corpus; these
  * tests pin the mechanism — untouched part files must be retained by
  * hard link (zero bytes copied at 100 TB), affected files rewritten
  * without the deleted rows, and the retired copy must hold exactly
  * the deleted rows. */
class TakedownSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def listNames(dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
  }

  test("untouched part files are retained by link; affected ones rewritten") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-td-files").toString
    // file A: ids 1..50, no takedown hits (0 excluded; 97 > 50)
    (1L to 50L).map(i => (i, s"clean doc $i words", "en", s"s${i % 3}", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$base/documents.parquet")
    val fileA = listNames(s"$base/documents.parquet")
    assert(fileA.size == 1)
    // file B: ids with hits (97, 194) + one survivor (100)
    Seq((97L, "hit one", "en", "s0", 7L), (194L, "hit two", "en", "s1", 7L),
        (100L, "survivor in affected file", "en", "s2", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(s"$base/documents.parquet")
    val fileB = listNames(s"$base/documents.parquet") -- fileA
    assert(fileB.size == 1)
    // embeddings: NO hits at all — exercises the affected-empty path
    // (everything linked, survivors write degenerates to empty)
    (1L to 20L).map { i =>
      val v = Array.fill(64)(0.0f); v(0) = 1.0f; (i, v, 1) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$base/embeddings.parquet")
    val embFiles = listNames(s"$base/embeddings.parquet")

    val out = Takedown.takedownStore(spark, base)
    val newNames = listNames(s"$out/documents.parquet")
    // the clean file is retained under its ORIGINAL name (linked, not
    // rewritten); the affected file is gone, replaced by a rewrite
    assert(fileA.subsetOf(newNames),
      s"untouched file not retained: $fileA vs $newNames")
    assert((fileB & newNames).isEmpty,
      s"affected file must be rewritten, not retained: $fileB")
    // and it IS a hard link to the same inode, not a copy
    val a = fileA.head
    val src = java.nio.file.Paths.get(s"$base/documents.parquet", a)
    val dst = java.nio.file.Paths.get(s"$out/documents.parquet", a)
    assert(Files.getAttribute(src, "unix:ino") ==
      Files.getAttribute(dst, "unix:ino"),
      "untouched file must be hard-linked (zero-copy retention)")
    // row semantics: hits gone, the affected file's survivor kept
    val ids = spark.read.parquet(s"$out/documents.parquet")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == ((1L to 50L).toSet + 100L), s"got $ids")
    // retired copy holds exactly the deleted rows
    val retired = spark.read.parquet(s"$out/_deleted/documents")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(retired == Seq(97L, 194L))
    // no-hit embeddings: every file linked, nothing deleted
    assert(embFiles.subsetOf(listNames(s"$out/embeddings.parquet")))
    assert(spark.read.parquet(s"$out/embeddings.parquet").count() == 20L)
    assert(spark.read.parquet(s"$out/_deleted/embeddings").count() == 0L)
  }

  test("takedown store is _SUCCESS-memoized and re-keys on corpus change") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-td-memo").toString
    (1L to 30L).map(i => (i * 97, s"doomed doc $i", "en", "s0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$base/documents.parquet")
    (1L to 5L).map { i =>
      val v = Array.fill(64)(0.0f); v(2) = 1.0f; (i * 97, v, 1) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$base/embeddings.parquet")
    val out1 = Takedown.takedownStore(spark, base)
    assert(Takedown.takedownStore(spark, base) == out1)
    // every doc was a hit: the rewritten corpus is empty but READABLE
    // (the manifest's read-back must not crash on a fully-taken-down
    // source table)
    assert(spark.read.parquet(s"$out1/documents.parquet").count() == 0L)
    // corpus change → new key
    Seq((7L, "late arrival", "en", "s1", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(s"$base/documents.parquet")
    assert(Takedown.takedownStore(spark, base) != out1)
  }
}
