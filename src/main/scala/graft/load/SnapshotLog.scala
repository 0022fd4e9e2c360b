package graft.load

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.slf4j.LoggerFactory

/** Versioned snapshot log for a curated table — read-at-version
  * semantics over the loader's staged-atomic-swap merge, the
  * Delta/Iceberg capability the reference CONFIGURES but never uses
  * (`/root/reference/bootstrap.sh:60-64` installs the Delta jars; no
  * script ever time-travels).
  *
  * Layout, all inside `<table>/_graft_log` (underscore-prefixed, so
  * Spark's file index, `Strategies.tableExists`, and every plain
  * reader ignore it):
  *
  *   _graft_log/v00000001.manifest      one per committed write
  *   _graft_log/retired/v00000002/dt=X  the copy of dt=X superseded
  *                                      BY version 2 (i.e. the copy
  *                                      that was live at version 1)
  *
  * A manifest records, for each dt partition the commit touched, the
  * data-file names now live in that partition and whether a previous
  * copy was retired. Partitions NOT touched by a commit are inherited
  * from earlier manifests at read time, so a commit's metadata cost is
  * O(touched partitions) — never a full-table listing, the property
  * that keeps commits metadata-cheap at 100 TB (a daily merge touches
  * one dt). Manifests are written to a temp name and renamed in, and
  * only AFTER every swap rename has succeeded: a crash mid-swap leaves
  * no manifest, so the log still describes the last consistent
  * version, and the swap's existing bak/stage recovery runbook
  * (Strategies.stagedPartitionSwap) restores that state.
  *
  * Reading version V resolves each partition's last-touch ≤ V file
  * list against its physical location: the LIVE dir if no later
  * version replaced it, else `retired/vM` for the smallest toucher
  * M > V (that retirement holds exactly the copy live at V, because no
  * version in (V, M) touched the partition). File lists are explicit,
  * so a partially-rewritten live dir can only fail loudly
  * (file-not-found), never silently return mixed-version rows.
  *
  * Retention is the standard table-format trade: every merge retains
  * the superseded partition copy until [[vacuum]] drops retired copies
  * older than the keep horizon (manifests stay — they are tiny and
  * later versions inherit file lists through them; a vacuumed
  * version's read fails with an explicit error instead of wrong data).
  *
  * dt values are stored percent-encoded so adversarial partition
  * values (`/`, `:`, `=`, whitespace — the ingest_escaped_dt family)
  * round-trip through the line-oriented manifest format.
  *
  * SINGLE-WRITER assumption: commits are serialized by the caller (the
  * loader runs one batch per table at a time, the reference's model —
  * `generic_load_script.py` is invoked per-table per-arrival). The
  * manifest rename carries a put-if-absent existence guard so a racing
  * second writer fails loudly instead of silently replacing the winner
  * (RawLocalFileSystem's rename(2) would otherwise clobber), but the
  * check-then-rename pair is NOT atomic — true multi-writer commits
  * need a coordinating lock service, exactly as Delta on S3 does. */
object SnapshotLog {

  private val log = LoggerFactory.getLogger(getClass)

  private def logDir(path: String) = s"$path/_graft_log"
  private def manifestPath(path: String, v: Int) =
    f"${logDir(path)}/v$v%08d.manifest"
  private def retiredDir(path: String, v: Int) =
    f"${logDir(path)}/retired/v$v%08d"

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")
  private def escDt(dt: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(dt)

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One touched partition in one manifest. */
  final case class Entry(dt: String, files: Seq[String],
      retiredPrev: Boolean)
  final case class Manifest(version: Int, entries: Seq[Entry])

  /** Committed versions, ascending (empty: table has no log — written
    * before versioning, or by the non-swap strategies). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val fs = fsOf(spark, path)
    val dir = new Path(logDir(path))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{8}\\.manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .sorted
  }

  private def readManifest(fs: FileSystem, path: String,
      v: Int): Manifest = {
    val in = fs.open(new Path(manifestPath(path, v)))
    val lines = try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    } finally in.close()
    val touched = scala.collection.mutable.LinkedHashMap
      .empty[String, (Boolean, Vector[String])]
    lines.filter(_.nonEmpty).foreach { line =>
      line.split("\t", -1).toSeq match {
        case Seq("dt", e, r) => touched(dec(e)) = (r == "1", Vector.empty)
        case Seq("f", e, name) =>
          val k = dec(e)
          // an `f` line whose `dt` declaration is missing is the same
          // corruption class as an unparseable line — same loud error,
          // not a bare NoSuchElementException
          val (r, fsx) = touched.getOrElse(k,
            throw new java.io.IOException(
              s"corrupt manifest v$v for $path: file line for " +
                s"undeclared partition '$line'"))
          touched(k) = (r, fsx :+ name)
        case other => throw new java.io.IOException(
          s"corrupt manifest v$v for $path: '$line'")
      }
    }
    Manifest(v, touched.toSeq.map { case (dt, (r, f)) =>
      Entry(dt, f, r) }.toVector)
  }

  /** List a live dt dir's DATA file names (metadata `_`/`.` entries
    * excluded, matching what Spark reads). */
  private def dataFiles(fs: FileSystem, dir: Path): Seq[String] =
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .sorted

  /** Record a committed swap: move each superseded copy from the
    * swap's bak dir into this commit's retired dir, then write the
    * manifest (temp + rename — the manifest's existence IS the
    * commit). Called by [[Strategies.stagedPartitionSwap]] after every
    * rename has succeeded; `touched` carries (raw dt, hadLiveCopy).
    * Returns the new version, or None when the table has no snapshot
    * log (append/overwrite-history tables stay unversioned) — ONE
    * log-dir listing serves both the versioned-probe and the
    * next-version computation.
    *
    * Crash window: a death BETWEEN a retire rename and the manifest
    * rename leaves an ORPHANED `retired/vN` (no `vN.manifest`) holding
    * the crashed run's superseded copies — the swap itself succeeded,
    * so the right recovery is roll-FORWARD (re-run the batch; the
    * merge is idempotent). The next commit moves any such orphan
    * aside to `retired/.orphan_vN_<run>` (dot-prefixed: invisible to
    * version resolution, bytes preserved for manual inspection) so
    * the version number can be reused cleanly instead of colliding. */
  private[load] def commit(spark: SparkSession, path: String,
      bak: String, touched: Seq[(String, Boolean)]): Option[Int] = {
    val fs = fsOf(spark, path)
    val existing = versions(spark, path)
    if (existing.isEmpty) return None
    Some(commitNext(spark, fs, path, bak, touched,
      existing.last + 1))
  }

  private def commitNext(spark: SparkSession, fs: FileSystem,
      path: String, bak: String, touched: Seq[(String, Boolean)],
      v: Int): Int = {
    val retired = new Path(retiredDir(path, v))
    if (fs.exists(retired)) {
      // orphan of a crashed previous commit at this version number
      val aside = new Path(retired.getParent,
        f".orphan_v$v%08d_" + java.util.UUID.randomUUID()
          .toString.take(8))
      if (!fs.rename(retired, aside))
        throw new java.io.IOException(
          s"Failed to move orphaned $retired aside to $aside")
      log.warn("Moved orphaned retired dir {} (crashed commit, no " +
        "manifest) aside to {} — superseded copies preserved there",
        retired: Any, aside: Any)
    }
    if (touched.exists(_._2)) fs.mkdirs(retired)
    touched.foreach { case (dt, hadLive) =>
      if (hadLive) {
        val from = new Path(s"$bak/dt=${escDt(dt)}")
        if (!fs.rename(from, new Path(retired, s"dt=${escDt(dt)}")))
          throw new java.io.IOException(
            s"Failed to retire $from into $retired")
      }
    }
    val body = touched.map { case (dt, hadLive) =>
      val files = dataFiles(fs, new Path(s"$path/dt=${escDt(dt)}"))
      (s"dt\t${enc(dt)}\t${if (hadLive) "1" else "0"}" +:
        files.map(f => s"f\t${enc(dt)}\t$f")).mkString("\n")
    }.mkString("", "\n", "\n")
    val tmp = new Path(logDir(path), s".v$v.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dest = new Path(manifestPath(path, v))
    // put-if-absent guard (see module scaladoc): a lost-race concurrent
    // writer fails HERE instead of having its rename silently replace
    // the winning commit's manifest on local rename(2) semantics
    if (fs.exists(dest))
      throw new java.io.IOException(
        s"Concurrent commit detected: manifest v$v already exists for " +
          s"$path (snapshot commits are single-writer)")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"Failed to commit manifest v$v")
    v
  }

  /** First-load commit: seeds the log with version 1 over everything
    * the overwrite just wrote (listing is one directory scan of the
    * partitions the write itself produced — a first load writes them
    * all by definition). Unlike [[commit]] this runs on a table with
    * NO log yet — that is its job. */
  private[load] def commitInitial(spark: SparkSession,
      path: String): Int = {
    val fs = fsOf(spark, path)
    val dts = fs.listStatus(new Path(path)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt="))
      .map(s => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(s.getPath.getName.stripPrefix("dt=")))
    commitNext(spark, fs, path, bak = "", dts.map(_ -> false),
      versions(spark, path).lastOption.getOrElse(0) + 1)
  }

  /** Invalidate the log: an append/overwrite write to a versioned
    * table changes data OUTSIDE the manifest protocol, so keeping the
    * log would let `readAtVersion(latest)` silently return stale rows
    * — against this module's never-silently-wrong contract. The log
    * dir is moved aside (dot-prefixed, bytes preserved), so every
    * subsequent version read fails loudly with "no snapshot log". */
  private[load] def invalidate(spark: SparkSession, path: String,
      reason: String): Unit = {
    val fs = fsOf(spark, path)
    val dir = new Path(logDir(path))
    if (!fs.exists(dir)) return
    val aside = new Path(path,
      "._graft_log_invalid_" +
        java.util.UUID.randomUUID().toString.take(8))
    if (!fs.rename(dir, aside))
      throw new java.io.IOException(
        s"Failed to invalidate snapshot log $dir ($reason)")
    log.warn("Snapshot log for {} invalidated ({}) — moved aside to " +
      "{}; read_at_version now fails loudly instead of returning " +
      "stale data", path, reason, aside)
  }

  /** The table exactly as of `version`. Fails loudly on an unknown
    * version and on a vacuumed one (retired copy gone) — never
    * silently returns newer or partial data. */
  def readAtVersion(spark: SparkSession, path: String,
      version: Int): DataFrame = {
    val fs = fsOf(spark, path)
    val all = versions(spark, path)
    require(all.contains(version),
      s"version $version not in snapshot log for $path " +
        s"(have: ${all.mkString(",")})")
    val manifests = all.map(v => readManifest(fs, path, v))
    // last touch ≤ version wins per partition (whole-dir swap semantics)
    val lastTouch: Map[String, Entry] = manifests
      .filter(_.version <= version)
      .flatMap(m => m.entries.map(e => e.dt -> e)).toMap
    val later = manifests.filter(_.version > version)
    // Group partitions by their physical ROOT — the live table dir, or
    // one retired dir per superseding version — and issue ONE
    // multi-path read per root with `basePath` partition discovery
    // recovering `dt` from the directory names. Plan width is then
    // bounded by VERSION count, never partition count: a 10k-dt table
    // reconstructs through a handful of scan nodes instead of a
    // 10k-way union of single-partition reads.
    val byRoot = lastTouch.toSeq.sortBy(_._1)
      .map { case (dt, entry) =>
        val supersededBy = later
          .find(_.entries.exists(_.dt == dt)) // ascending → smallest
          .map(_.version)
        val root = supersededBy.fold(path)(m => retiredDir(path, m))
        (root, dt, entry)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
    val perRoot = byRoot.map { case (root, dts) =>
      val files = dts.flatMap { case (_, dt, entry) =>
        val loc = s"$root/dt=${escDt(dt)}"
        if (!fs.exists(new Path(loc)))
          throw new java.io.IOException(
            s"version $version of $path: partition dt=$dt copy at $loc " +
              "is gone (vacuumed?) — cannot reconstruct this version")
        entry.files.map(f => s"$loc/$f")
      }
      // cast pins dt to the log's string semantics even under a session
      // with partition-type inference enabled (GraftSession disables it)
      spark.read.option("basePath", root).parquet(files: _*)
        .withColumn("dt", col("dt").cast("string"))
    }
    require(perRoot.nonEmpty, s"version $version of $path is empty")
    perRoot.reduce(_ unionByName _)
  }

  /** Drop retired partition copies for versions ≤ (latest − keepLast),
    * bounding retention. Manifests are kept (tiny, and later versions
    * inherit untouched-partition file lists through them); reads of
    * vacuumed versions fail explicitly in [[readAtVersion]]. */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Unit = {
    require(keepLast >= 0, s"keepLast must be >= 0, got $keepLast")
    val fs = fsOf(spark, path)
    val all = versions(spark, path)
    if (all.isEmpty) return
    val horizon = all.max - keepLast
    all.filter(_ <= horizon).foreach { v =>
      val dir = new Path(retiredDir(path, v))
      if (fs.exists(dir)) fs.delete(dir, true)
    }
  }
}
