package graft.load

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Load-strategy matrix (SURVEY.md §5.2.2): append/overwrite/upsert ×
  * first-load/existing × single/composite PK × same-dt/new-dt. */
class StrategiesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-strategies").toString + "/t"

  private def df(rows: (Int, String, String)*): DataFrame =
    rows.toSeq.toDF("id", "v", "dt")

  private def contents(path: String): Set[(Int, String, String)] =
    Strategies.readCurated(spark, path)
      .select("id", "v", "dt").as[(Int, String, String)].collect().toSet

  test("append accumulates batches (W1)") {
    val p = tmp()
    Strategies.writeCurated(spark, df((1, "a", "d1")), p, "append", Nil)
    Strategies.writeCurated(spark, df((2, "b", "d1")), p, "append", Nil)
    assert(contents(p) == Set((1, "a", "d1"), (2, "b", "d1")))
  }

  test("overwrite replaces, under both spellings (W2, SURVEY §2.9.3)") {
    for (spelling <- Seq("overwrite", "truncate")) {
      val p = tmp()
      Strategies.writeCurated(spark, df((1, "a", "d1")), p, spelling, Nil)
      Strategies.writeCurated(spark, df((2, "b", "d2")), p, spelling, Nil)
      assert(contents(p) == Set((2, "b", "d2")), s"spelling=$spelling")
    }
  }

  test("upsert first load falls back to overwrite (J2)") {
    val p = tmp()
    Strategies.writeCurated(spark, df((1, "a", "d1")), p, "upsert", Seq("id"))
    assert(contents(p) == Set((1, "a", "d1")))
  }

  test("upsert updates matched PK+dt, inserts unmatched (J1)") {
    val p = tmp()
    Strategies.writeCurated(spark,
      df((1, "a", "d1"), (2, "b", "d1")), p, "upsert", Seq("id"))
    Strategies.writeCurated(spark,
      df((2, "B2", "d1"), (3, "c", "d1")), p, "upsert", Seq("id"))
    assert(contents(p) == Set((1, "a", "d1"), (2, "B2", "d1"), (3, "c", "d1")))
  }

  test("merge key includes dt: same PK on a new dt INSERTS (SURVEY §2.9.5)") {
    val p = tmp()
    Strategies.writeCurated(spark, df((1, "a", "d1")), p, "upsert", Seq("id"))
    Strategies.writeCurated(spark, df((1, "a2", "d2")), p, "upsert", Seq("id"))
    assert(contents(p) == Set((1, "a", "d1"), (1, "a2", "d2")))
  }

  test("upsert leaves untouched dt partitions alone (partition-scoped)") {
    val p = tmp()
    Strategies.writeCurated(spark,
      df((1, "a", "d1"), (9, "z", "d0")), p, "upsert", Seq("id"))
    Strategies.writeCurated(spark, df((1, "A", "d1")), p, "upsert", Seq("id"))
    assert(contents(p) == Set((1, "A", "d1"), (9, "z", "d0")))
  }

  test("composite primary key merges on all key parts") {
    val p = tmp()
    val mk = Seq("id", "v")
    Strategies.writeCurated(spark,
      df((1, "x", "d1"), (1, "y", "d1")), p, "upsert", mk)
    Strategies.writeCurated(spark, df((1, "x", "d1")), p, "upsert", mk)
    assert(contents(p) == Set((1, "x", "d1"), (1, "y", "d1")))
  }

  test("upsert rejects a source batch with duplicate (pk, dt) rows " +
      "(Delta MERGE multiple-match error twin)") {
    val p = tmp()
    Strategies.writeCurated(spark, df((1, "a", "d1")), p, "upsert", Seq("id"))
    val ex = intercept[IllegalArgumentException] {
      Strategies.writeCurated(spark,
        df((1, "x", "d1"), (1, "y", "d1")), p, "upsert", Seq("id"))
    }
    assert(ex.getMessage.contains("duplicate"))
    // target untouched by the failed merge
    assert(contents(p) == Set((1, "a", "d1")))
  }

  test("upsert without primary key raises (FInal/load_script.py:89-90)") {
    val p = tmp()
    val ex = intercept[IllegalArgumentException] {
      Strategies.writeCurated(spark, df((1, "a", "d1")), p, "upsert", Nil)
    }
    assert(ex.getMessage.toLowerCase.contains("primary key"))
  }

  test("unknown curated strategy raises (generic_load_script.py:172-173)") {
    val ex = intercept[IllegalArgumentException] {
      Strategies.writeCurated(spark, df((1, "a", "d1")), tmp(), "merge", Nil)
    }
    assert(ex.getMessage.contains("merge"))
  }

  test("unknown landing strategy warns and skips (FInal/load_script.py:203-204)") {
    val p = tmp()
    Strategies.writeLanding(df((1, "a", "d1")), p, "bogus")
    assert(!Strategies.tableExists(spark, p))
  }

  test("upsert cleans its stage and backup scratch dirs after the swap") {
    val p = tmp()
    Strategies.writeCurated(spark, df((1, "a", "d1")), p, "upsert", Seq("id"))
    Strategies.writeCurated(spark, df((1, "A", "d1")), p, "upsert", Seq("id"))
    val parent = new java.io.File(p).getParentFile
    val stray = parent.listFiles().map(_.getName)
      .filter(n => n.contains("__stage_") || n.contains("__bak_"))
    assert(stray.isEmpty, s"leftover scratch dirs: ${stray.mkString(",")}")
    assert(contents(p) == Set((1, "A", "d1")))
  }

  test("compaction shrinks file count without changing contents") {
    val p = tmp()
    // 6 tiny appends -> many small files in dt=d1
    (1 to 6).foreach(i =>
      Strategies.writeCurated(spark, df((i, s"v$i", "d1")), p, "append", Nil))
    val before = contents(p)
    def nFiles = new java.io.File(s"$p/dt=d1").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 6)
    Strategies.compact(spark, p)
    assert(nFiles == 1, s"expected 1 file after compaction, got $nFiles")
    assert(contents(p) == before)
    // scratch cleaned
    val stray = new java.io.File(p).getParentFile.listFiles().map(_.getName)
      .filter(n => n.contains("__stage_") || n.contains("__bak_"))
    assert(stray.isEmpty)
  }

  test("escapable dt values round-trip through upsert swap and compaction") {
    val p = tmp()
    // ':' and '%' are Hive-escaped in partition dir names; raw-path
    // construction would address dirs Spark never wrote
    val weird = "20:24%06"
    Strategies.writeCurated(spark, df((1, "a", weird)), p, "upsert", Seq("id"))
    Strategies.writeCurated(spark, df((1, "A", weird), (2, "b", weird)),
      p, "upsert", Seq("id"))
    assert(contents(p) == Set((1, "A", weird), (2, "b", weird)))
    Strategies.compact(spark, p)
    assert(contents(p) == Set((1, "A", weird), (2, "b", weird)))
  }

  test("landing append is unpartitioned and raw (W4)") {
    val p = tmp()
    Strategies.writeLanding(Seq((1, "a")).toDF("id", "v"), p, "append")
    val back = spark.read.parquet(p)
    assert(back.columns.toSeq == Seq("id", "v")) // no dt: pre-derivation
    assert(back.count() == 1)
  }

  /** Table path on the fault-injectable filesystem (same local disk,
    * but every FileSystem call Strategies makes goes through FaultFS). */
  private def faultTmp(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFS].getName)
    "faultfs://" + tmp()
  }

  private def scratchDirs(p: String, kind: String): Seq[java.io.File] = {
    val local = new java.io.File(new java.net.URI(p).getPath)
    local.getParentFile.listFiles().toSeq
      .filter(_.getName.contains(kind))
  }

  test("crash BEFORE any live dir moves: table untouched, plain re-run recovers") {
    val p = faultTmp()
    Strategies.writeCurated(spark, df((1, "a", "d1")), p, "upsert", Seq("id"))
    // fail the FIRST rename of the swap (live -> backup): the staged
    // write completed, nothing has moved yet
    FaultFS.failRenameDst = ".*__bak_[^/]*/dt=d1"
    try {
      val ex = intercept[java.io.IOException] {
        Strategies.writeCurated(spark,
          df((1, "A", "d1"), (2, "b", "d1")), p, "upsert", Seq("id"))
      }
      assert(ex.getMessage.contains("injected"))
    } finally FaultFS.failRenameDst = null
    // live table is exactly the pre-merge state; the staged copy
    // survives OUTSIDE the table path (readers can't see it)
    assert(contents(p) == Set((1, "a", "d1")))
    assert(scratchDirs(p, "__stage_").nonEmpty)
    // recovery = delete leftovers, re-run the same batch
    scratchDirs(p, "__stage_").foreach(
      d => org.apache.commons.io.FileUtils.deleteDirectory(d))
    scratchDirs(p, "__bak_").foreach(
      d => org.apache.commons.io.FileUtils.deleteDirectory(d))
    Strategies.writeCurated(spark,
      df((1, "A", "d1"), (2, "b", "d1")), p, "upsert", Seq("id"))
    assert(contents(p) == Set((1, "A", "d1"), (2, "b", "d1")))
  }

  test("crash MID-SWAP (live moved aside): both copies survive, runbook recovers") {
    val p = faultTmp()
    Strategies.writeCurated(spark, df((1, "a", "d1")), p, "upsert", Seq("id"))
    // fail the SECOND rename (staged -> live), i.e. after the live dir
    // was already moved aside — the worst crash point
    FaultFS.failRenameDst = ".*/t/dt=d1"
    try {
      val ex = intercept[java.io.IOException] {
        Strategies.writeCurated(spark,
          df((1, "A", "d1"), (2, "b", "d1")), p, "upsert", Seq("id"))
      }
      assert(ex.getMessage.contains("injected"))
    } finally FaultFS.failRenameDst = null
    val local = new java.io.File(new java.net.URI(p).getPath)
    // the live dir is gone (crashed mid-swap)...
    assert(!new java.io.File(local, "dt=d1").exists())
    // ...but BOTH copies survive on disk: the previous partition in the
    // backup dir, the merged partition in the stage dir
    val bak = scratchDirs(p, "__bak_")
    val stage = scratchDirs(p, "__stage_")
    assert(bak.size == 1 && stage.size == 1)
    val oldRows = spark.read.parquet(s"${bak.head}/dt=d1")
      .select("id", "v").as[(Int, String)].collect().toSet
    assert(oldRows == Set((1, "a")))
    val mergedRows = spark.read.parquet(s"${stage.head}/dt=d1")
      .select("id", "v").as[(Int, String)].collect().toSet
    assert(mergedRows == Set((1, "A"), (2, "b")))
    // recovery runbook (Strategies.stagedPartitionSwap doc): restore the
    // bak dir under the table path, drop scratch, re-run the batch
    assert(new java.io.File(bak.head, "dt=d1")
      .renameTo(new java.io.File(local, "dt=d1")))
    org.apache.commons.io.FileUtils.deleteDirectory(bak.head)
    org.apache.commons.io.FileUtils.deleteDirectory(stage.head)
    assert(contents(p) == Set((1, "a", "d1"))) // restored pre-merge state
    Strategies.writeCurated(spark,
      df((1, "A", "d1"), (2, "b", "d1")), p, "upsert", Seq("id"))
    assert(contents(p) == Set((1, "A", "d1"), (2, "b", "d1")))
    // the recovered table keeps working for later loads
    Strategies.writeCurated(spark, df((3, "c", "d1")), p, "upsert", Seq("id"))
    assert(contents(p) ==
      Set((1, "A", "d1"), (2, "b", "d1"), (3, "c", "d1")))
  }
}

/** Test-only Hadoop filesystem (`faultfs://` scheme): a local
  * filesystem whose `rename` throws when the destination path matches
  * the armed regex — lets the spec drive Strategies through a mid-swap
  * crash via the REAL code path (Spark committer renames included),
  * not a simulation of the on-disk state. Extends RawLocalFileSystem
  * (not LocalFileSystem): the checksum wrapper's INNER raw fs would
  * reject faultfs:// paths in checkPath. Instantiated reflectively by
  * Hadoop, hence top-level with a no-arg constructor; armed state lives
  * in the companion so the cached FS instance sees updates. */
class FaultFS extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "faultfs"
  override def getUri: java.net.URI = java.net.URI.create("faultfs:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    val pat = FaultFS.failRenameDst
    if (pat != null && dst.toUri.getPath.matches(pat))
      throw new java.io.IOException(s"injected rename failure -> $dst")
    val ok = super.rename(src, dst)
    if (ok) {
      val ppat = FaultFS.probeRenameDst
      if (ppat != null && dst.toUri.getPath.matches(ppat)) {
        // one-shot, and disarmed BEFORE the probe runs: the probe
        // itself reads through this filesystem (that is its point)
        FaultFS.probeRenameDst = null
        val p = FaultFS.probe
        FaultFS.probe = null
        if (p != null) p()
      }
    }
    ok
  }
}

object FaultFS {
  /** Regex over the rename DESTINATION path; null = disarmed. */
  @volatile var failRenameDst: String = null

  /** One-shot probe: [[probe]] runs immediately AFTER the first
    * successful rename whose destination matches this regex — the
    * "concurrent reader at exactly this instant" seam the
    * [[SwapReaderSpec]] visibility tests are built on. */
  @volatile var probeRenameDst: String = null
  @volatile var probe: () => Unit = null
}
