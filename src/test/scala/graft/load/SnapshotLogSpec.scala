package graft.load

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Snapshot-log time travel over the upsert lifecycle: manifests,
  * retirement resolution, inheritance of untouched partitions, crash
  * consistency (no manifest ⇒ no version), compaction versioning, and
  * the vacuum retention trade. */
class SnapshotLogSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-snapshot").toString + "/t"

  private def df(rows: (Int, String, String)*): DataFrame =
    rows.toSeq.toDF("id", "v", "dt")

  private def up(p: String, rows: (Int, String, String)*): Unit =
    Strategies.writeCurated(spark, df(rows: _*), p, "upsert", Seq("id"))

  private def at(p: String, v: Int): Set[(Int, String, String)] =
    Strategies.readAtVersion(spark, p, v)
      .select("id", "v", "dt").as[(Int, String, String)].collect().toSet

  private def live(p: String): Set[(Int, String, String)] =
    Strategies.readCurated(spark, p)
      .select("id", "v", "dt").as[(Int, String, String)].collect().toSet

  test("each upsert commits a version; every version reads back exactly") {
    val p = tmp()
    up(p, (1, "a", "d1"))                    // v1: first load
    up(p, (1, "A", "d1"), (2, "b", "d1"))    // v2: same-dt merge
    up(p, (3, "c", "d2"))                    // v3: new-dt insert
    assert(SnapshotLog.versions(spark, p) == Seq(1, 2, 3))
    assert(at(p, 1) == Set((1, "a", "d1")))
    assert(at(p, 2) == Set((1, "A", "d1"), (2, "b", "d1")))
    assert(at(p, 3) == Set((1, "A", "d1"), (2, "b", "d1"), (3, "c", "d2")))
    assert(at(p, 3) == live(p))
    // plain readers and the existence probe never see the log
    assert(Strategies.tableExists(spark, p))
    intercept[IllegalArgumentException](at(p, 7)) // unknown version
  }

  test("partitions untouched by later versions are inherited from the live dir") {
    val p = tmp()
    up(p, (1, "a", "d1"), (2, "b", "d2"))    // v1 writes both dts
    up(p, (2, "B", "d2"))                    // v2 touches ONLY d2
    // v1's d1 was never superseded: resolves to the LIVE dir; its d2
    // resolves to the copy retired by v2
    assert(at(p, 1) == Set((1, "a", "d1"), (2, "b", "d2")))
    assert(at(p, 2) == Set((1, "a", "d1"), (2, "B", "d2")))
  }

  test("escapable dt values round-trip through manifests and retirement") {
    val p = tmp()
    val dt = "2024/06:28=x\tz" // slash, colon, equals, tab
    up(p, (1, "a", dt))
    up(p, (1, "A", dt), (2, "b", dt))
    assert(at(p, 1) == Set((1, "a", dt)))
    assert(at(p, 2) == Set((1, "A", dt), (2, "b", dt)))
  }

  test("compaction commits a version and the pre-compaction version stays readable") {
    val p = tmp()
    up(p, (1, "a", "d1"))
    up(p, (1, "A", "d1"), (2, "b", "d1"))
    Strategies.compact(spark, p)
    assert(SnapshotLog.versions(spark, p) == Seq(1, 2, 3))
    // same contents before/after compaction, against retired file sets
    assert(at(p, 2) == at(p, 3))
    assert(at(p, 1) == Set((1, "a", "d1")))
  }

  test("crash mid-swap commits NO version; recovery restores the log's state") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFS].getName)
    val p = "faultfs://" + tmp()
    up(p, (1, "a", "d1"))
    FaultFS.failRenameDst = ".*/t/dt=d1" // staged -> live, live already aside
    try intercept[java.io.IOException](up(p, (1, "A", "d1")))
    finally FaultFS.failRenameDst = null
    // the manifest write never ran: the log still describes v1 only
    assert(SnapshotLog.versions(spark, p) == Seq(1))
    // v1's copy is in the bak dir mid-recovery, so a v1 read fails
    // LOUDLY (live dir missing) rather than returning partial data
    intercept[java.io.IOException](at(p, 1))
    // runbook: restore bak under the table path, drop scratch, re-run
    val local = new java.io.File(new java.net.URI(p).getPath)
    val baks = local.getParentFile.listFiles().toSeq
      .filter(_.getName.contains("__bak_"))
    assert(baks.size == 1)
    assert(new java.io.File(baks.head, "dt=d1")
      .renameTo(new java.io.File(local, "dt=d1")))
    local.getParentFile.listFiles()
      .filter(f => f.getName.contains("__bak_") ||
        f.getName.contains("__stage_"))
      .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
    assert(at(p, 1) == Set((1, "a", "d1"))) // log consistent again
    up(p, (1, "A", "d1")) // re-run commits v2
    assert(SnapshotLog.versions(spark, p) == Seq(1, 2))
    assert(at(p, 1) == Set((1, "a", "d1")))
    assert(at(p, 2) == Set((1, "A", "d1")))
  }

  test("append to a versioned table invalidates the log instead of going stale") {
    val p = tmp()
    up(p, (1, "a", "d1"))
    up(p, (1, "A", "d1"))
    assert(SnapshotLog.versions(spark, p) == Seq(1, 2))
    // an append writes outside the manifest protocol — keeping the log
    // would let readAtVersion(2) silently MISS this row
    Strategies.writeCurated(spark, df((9, "x", "d1")), p, "append", Nil)
    assert(live(p) == Set((1, "A", "d1"), (9, "x", "d1")))
    assert(SnapshotLog.versions(spark, p).isEmpty)
    intercept[IllegalArgumentException](at(p, 2)) // loud, not stale
  }

  test("orphaned retired dir from a crashed commit is moved aside, not collided with") {
    val p = tmp()
    up(p, (1, "a", "d1"))
    // simulate the commit crash window: retired/v2 exists (the crashed
    // run's retire renames ran) but v2's manifest was never written
    val orphan = new java.io.File(
      new java.io.File(p, "_graft_log/retired"), "v00000002/dt=d1")
    assert(orphan.mkdirs())
    assert(new java.io.File(orphan, "stranded.parquet").createNewFile())
    assert(SnapshotLog.versions(spark, p) == Seq(1)) // no v2 committed
    up(p, (1, "A", "d1")) // roll forward: next commit reuses v2 cleanly
    assert(SnapshotLog.versions(spark, p) == Seq(1, 2))
    assert(at(p, 1) == Set((1, "a", "d1")))
    assert(at(p, 2) == Set((1, "A", "d1")))
    // the stranded copy was preserved aside, invisible to resolution
    val aside = new java.io.File(p, "_graft_log/retired").listFiles()
      .filter(_.getName.startsWith(".orphan_v00000002"))
    assert(aside.length == 1)
    assert(new java.io.File(aside.head, "dt=d1/stranded.parquet").exists())
  }

  test("randomized upsert sequence: every version replays its recorded state exactly") {
    // model check: a deterministic pseudo-random sequence of merge
    // batches over 3 dts; after each commit the expected table state is
    // maintained independently in a driver-side map, and at the end
    // EVERY version must reconstruct its recorded state — catches any
    // drift in manifest inheritance, retirement resolution, or file
    // listing across arbitrary touch patterns.
    val p = tmp()
    val rnd = new scala.util.Random(42)
    val model = scala.collection.mutable.Map.empty[(Int, String), String]
    val states = Seq.newBuilder[Set[(Int, String, String)]]
    for (step <- 1 to 8) {
      val batch = (0 until (1 + rnd.nextInt(4))).map { _ =>
        (rnd.nextInt(6), s"v$step-${rnd.nextInt(100)}",
          s"d${1 + rnd.nextInt(3)}")
      }.groupBy(r => (r._1, r._3)).map(_._2.head).toSeq // unique (pk,dt)
      Strategies.writeCurated(spark, df(batch: _*), p, "upsert", Seq("id"))
      batch.foreach { case (id, v, dt) => model((id, dt)) = v }
      states += model.map { case ((id, dt), v) => (id, v, dt) }.toSet
    }
    val recorded = states.result()
    assert(SnapshotLog.versions(spark, p) == (1 to 8))
    (1 to 8).foreach { v =>
      assert(at(p, v) == recorded(v - 1), s"version $v diverged")
    }
  }

  test("readAtVersion plan width is bounded by VERSION count, not partition count") {
    // 64 dts across 4 versions: the reconstruction must group
    // partitions by physical root (live + one retired dir per
    // superseding version) into multi-path scans — not build a
    // 64-way union of single-partition reads
    val p = tmp()
    val dts = (1 to 64).map(i => f"d$i%02d")
    up(p, dts.zipWithIndex.map { case (dt, i) => (i, "a", dt) }: _*) // v1
    up(p, (0, "A", "d01"))                                          // v2
    up(p, (1, "B", "d02"), (2, "C", "d03"))                         // v3
    up(p, (0, "Z", "d01"))                                          // v4
    assert(SnapshotLog.versions(spark, p) == Seq(1, 2, 3, 4))
    def scanCount(v: Int): Int =
      Strategies.readAtVersion(spark, p, v).queryExecution.optimizedPlan
        .collect {
          case l: org.apache.spark.sql.execution.datasources
            .LogicalRelation => l
        }.size
    (1 to 4).foreach { v =>
      assert(scanCount(v) <= 5, s"version $v plan has ${scanCount(v)} " +
        "scans — width must be bounded by versions+1, not dt count")
    }
    // and the reconstruction stays exact, including inherited dts
    assert(at(p, 1).size == 64)
    assert(at(p, 1).contains((0, "a", "d01")))
    assert(at(p, 2).contains((0, "A", "d01")))
    assert(at(p, 2).contains((1, "a", "d02"))) // d02 still v1's copy at v2
    assert(at(p, 4) == live(p))
  }

  test("vacuum drops old retired copies: old versions fail loudly, recent ones read") {
    val p = tmp()
    up(p, (1, "a", "d1"))
    up(p, (1, "b", "d1"))
    up(p, (1, "c", "d1"))
    SnapshotLog.vacuum(spark, p, keepLast = 1)
    // v1's copy lived in retired/v2 (≤ horizon) — gone, loud failure
    val ex = intercept[java.io.IOException](at(p, 1))
    assert(ex.getMessage.contains("vacuumed"))
    // v2 resolves through retired/v3 (> horizon) — still readable
    assert(at(p, 2) == Set((1, "b", "d1")))
    assert(at(p, 3) == Set((1, "c", "d1")))
  }
}
