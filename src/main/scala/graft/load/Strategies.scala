package graft.load

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** Zone writes + load strategies (SURVEY.md §2.4/§2.6: W1–W5, J1/J2, O1).
  *
  * The curated zone is plain partitioned Parquet (no Delta jar ships with
  * this Spark — SURVEY §7.1), so the reference's Delta `MERGE`
  * (/root/reference/FInal/load_script.py:94-102,
  * generic_load_script.py:158-164) is re-expressed relationally:
  * anti-join the target on `primary_key :+ dt` and union the source —
  * `whenMatchedUpdateAll` ≡ matched target rows replaced by their source
  * versions, `whenNotMatchedInsertAll` ≡ unmatched source rows unioned in.
  *
  * Scale design: the merge is PARTITION-SCOPED. Only the `dt` partitions
  * present in the source batch are read (partition pruning), merged, and
  * atomically swapped via a staging directory; at 100 TB a daily batch
  * touches one partition dir, not the table. The one driver-side
  * materialization is the batch's distinct `dt` list — bounded by dates
  * per batch, not data size (the same collect dynamic partition
  * overwrite does internally).
  */
object Strategies {

  private val log = LoggerFactory.getLogger(getClass)

  /** Overwrite accepts both generations' spellings (v1 `truncate`,
    * v2 `overwrite` — SURVEY §2.9.3). */
  private val OverwriteNames = Set("overwrite", "truncate")

  private def ensureConf(spark: SparkSession): Unit =
    // dt partition values like "2024-06-28" would otherwise be inferred
    // as DATE on read-back, silently changing the curated schema.
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")

  /** S5 — merge-target existence probe (the Delta `isDeltaTable` twin:
    * FInal/load_script.py:92). True iff the path exists and contains
    * any DATA entry — `_`/`.`-prefixed metadata files (Spark ignores
    * them too, e.g. the backfill ledger) don't make a dataless dir a
    * table, matching the "bare empty dir is not a table" contract. */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** W4 — landing write: unpartitioned, pre-`dt` raw projection
    * (v2 ordering, FInal/load_script.py:197-204). Unknown strategy warns
    * and SKIPS the write, exactly like the reference. */
  def writeLanding(df: DataFrame, path: String, strategy: String): Unit =
    strategy match {
      case "append" => df.write.mode("append").parquet(path)
      case s if OverwriteNames(s) => df.write.mode("overwrite").parquet(path)
      case other =>
        log.warn(s"Unknown landing_load_strategy: $other. Skipping landing write.")
    }

  /** W1/W2/W3 + J1/J2 — curated write under a load strategy. `df` must
    * already carry the `dt` partition column. */
  def writeCurated(spark: SparkSession, df: DataFrame, path: String,
      strategy: String, primaryKey: Seq[String],
      sortColumns: Seq[String] = Nil): Unit = {
    ensureConf(spark)
    // O1 — the v2 global orderBy-before-write is implemented as
    // cluster-within-partition (range-partition on dt + sort columns,
    // then sort within each task): same file-local ordering intent, no
    // single global range shuffle bottleneck, and it actually survives
    // the partitioned write (SURVEY §2.9.9). Range (not hash) on
    // dt+sortCols: a typical batch carries ONE dt value, and hashing dt
    // alone would funnel the whole batch through a single task.
    def clustered(d: DataFrame): DataFrame =
      if (sortColumns.isEmpty) d
      else d.repartitionByRange((("dt" +: sortColumns)).map(col): _*)
        .sortWithinPartitions(sortColumns.map(col): _*)
    strategy match {
      case "append" =>
        // append writes outside the manifest protocol: a versioned
        // table's log would go silently stale — invalidate it instead
        // (version reads then fail loudly; see SnapshotLog.invalidate)
        SnapshotLog.invalidate(spark, path, "append write")
        clustered(df).write.mode("append").partitionBy("dt").parquet(path)
      case s if OverwriteNames(s) =>
        SnapshotLog.invalidate(spark, path, "overwrite write")
        clustered(df).write.mode("overwrite").partitionBy("dt").parquet(path)
      case "upsert" =>
        if (primaryKey.isEmpty)
          throw new IllegalArgumentException(
            "Primary key is required for upsert strategy")
        if (!tableExists(spark, path)) {
          // J2 — first-load fallback: plain overwrite partitioned by dt
          // (FInal/load_script.py:104-109). Same duplicate-merge-key
          // probe as the merge path: a first batch with duplicate
          // (pk, dt) rows would otherwise seed the table with a broken
          // PK invariant that every later merge depends on. Cached:
          // the probe and the write are two actions over the same
          // (possibly CSV-parsing) source plan.
          val cached = df.cache()
          try {
            requireUniqueMergeKeys(cached, primaryKey :+ "dt")
            clustered(cached).write.mode("overwrite").partitionBy("dt")
              .parquet(path)
            // version 1 of the table's snapshot log: every later merge
            // swap commits a new version (read_at_version support)
            SnapshotLog.commitInitial(spark, path)
          } finally cached.unpersist()
        } else {
          upsertMerge(spark, clustered(df), path, primaryKey)
        }
      case other =>
        throw new IllegalArgumentException(
          s"Unknown curated load strategy: $other")
    }
  }

  /** Fail loudly when `df` holds duplicate rows for the merge key.
    * DELIBERATELY STRICTER than Delta MERGE, which only errors when
    * multiple source rows match an existing TARGET row (insert-only
    * duplicates slip through and corrupt PK uniqueness): under this
    * loader's contract a batch is keyed by (pk, dt), so any duplicate —
    * matched or not — is a malformed batch. Applied identically on the
    * merge path (fused with the dt-list aggregation there) and the
    * first-load path. */
  private def requireUniqueMergeKeys(df: DataFrame, keys: Seq[String]): Unit =
    locateDuplicateMergeKey(df, keys).foreach(throwDuplicateMergeKey(keys, _))

  private def locateDuplicateMergeKey(df: DataFrame,
      keys: Seq[String]): Option[String] =
    df.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
      .headOption.map(_.toSeq.init.mkString("[", ", ", "]"))

  private def throwDuplicateMergeKey(keys: Seq[String],
      example: String): Nothing =
    throw new IllegalArgumentException(
      "Upsert source contains duplicate rows for merge key " +
        s"(${keys.mkString(", ")}), e.g. $example" +
        " — dedup the batch (e.g. keep-latest) before merging")

  /** J1/W5 — partition-scoped upsert merge into existing parquet target.
    * Merge keys are `primaryKey :+ dt` (the reference's condition always
    * appends `target.dt = source.dt`, generic_load_script.py:158), so the
    * same business key on a new date inserts rather than updates, and the
    * merge only ever needs the touched `dt` partitions of the target. */
  private def upsertMerge(spark: SparkSession, source: DataFrame,
      path: String, primaryKey: Seq[String]): Unit = {
    val keys = primaryKey :+ "dt"
    // Cache the source: it is read three times (dt list, anti-join,
    // union) and may itself be a non-trivial plan.
    val src = source.cache()
    try {
      // ONE aggregation job yields both the touched-dt list and the
      // duplicate-merge-key probe (see requireUniqueMergeKeys for the
      // contract — deliberately stricter than Delta, which lets
      // insert-only duplicates through): a source batch with duplicate
      // (pk, dt) rows would here be silently unioned in whole,
      // corrupting PK uniqueness — fail loudly instead.
      val dtStats = src.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("dt")).agg(max(col("__n")).as("__maxn"))
        .collect()
      if (dtStats.exists(_.getLong(1) > 1))
        // The probe already PROVED a duplicate exists — throw
        // unconditionally. The second scan only decorates the error
        // with an example key; if recomputation can't re-find one
        // (evicted cache + unstable upstream), still fail.
        throwDuplicateMergeKey(keys,
          locateDuplicateMergeKey(src, keys)
            .getOrElse("(offender not reproducible on re-scan)"))
      val touchedDts = dtStats.map(_.getString(0)).toSeq
      val target = spark.read.parquet(path)
        .filter(col("dt").isin(touchedDts: _*)) // partition-pruned scan
      val kept = target.join(
        src.select(keys.map(col): _*), keys, "left_anti")
      val merged = kept.unionByName(src.select(target.columns.map(col): _*))

      // Staged swap: write the merged slice next to the table, move each
      // live dt dir ASIDE (never deleted first), move the staged dir
      // into place, and only then clean up. If any rename fails, both
      // the staged copy and the moved-aside live copy survive on disk
      // for recovery — no code path can destroy the only copy of a
      // partition. Backup dirs live OUTSIDE the table path so a crashed
      // run's leftovers are never picked up as partitions by readers.
      stagedPartitionSwap(spark, merged, path, touchedDts)
    } finally src.unpersist()
  }

  /** Hive-style escaping of a partition VALUE as it appears in the
    * directory name — paths must be built from the escaped form or a dt
    * containing ':', '%', '=' etc. would address a dir Spark never
    * wrote (delegates to Spark's own escaper so the two can't drift). */
  private def escDt(dt: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(dt)

  /** Write `df` (which must carry `dt`) to a staging dir, then swap the
    * given dt partitions into the live table: live dirs are moved ASIDE
    * (to a backup dir outside the table path) before staged dirs move
    * in, and scratch is deleted only after every rename AND a
    * swapped-in existence check succeed — a failure leaves both copies
    * on disk for recovery; no code path can destroy the only copy of a
    * partition. `dts` are RAW partition values; paths use the
    * Hive-escaped form Spark writes.
    *
    * READER VISIBILITY (SwapReaderSpec pins all three): a concurrent
    * plain-path reader gets NO snapshot isolation across partitions —
    * mid-swap it can see a per-partition MIX (one dt new, another
    * still old) and, inside a single partition's two renames, a brief
    * absence window. That is inherent to whole-dir renames without an
    * atomic multi-dir commit (the guarantee class of Hive/Spark
    * dynamic partition overwrite). Within one partition there is never
    * a torn old/new file blend — the unit of motion is the dt dir.
    * Readers needing a consistent snapshot use
    * [[Strategies.readAtVersion]]: mid-swap it fails loudly (explicit
    * file lists cannot silently mix versions), and from the commit on,
    * every logged version reads exactly again.
    *
    * Recovery runbook (StrategiesSpec exercises both crash points): a
    * failure BEFORE any live dir moved leaves the table untouched —
    * just delete the `__stage_*`/`__bak_*` leftovers and re-run the
    * load. A failure mid-swap leaves the affected partition's previous
    * copy under `<table>__bak_<run>/dt=*` and the new copy under
    * `<table>__stage_<run>/dt=*`: move each bak dir back under the
    * table path, delete both scratch dirs, and re-run — the merge
    * recomputes from the restored target, so the re-run is idempotent
    * for the same batch. */
  private def stagedPartitionSwap(spark: SparkSession, df: DataFrame,
      path: String, dts: Seq[String]): Unit = {
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val stage = path + "__stage_" + runId
    val bak = path + "__bak_" + runId
    df.write.mode("overwrite").partitionBy("dt").parquet(stage)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def mv(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"Failed to rename $from -> $to")
    fs.mkdirs(new Path(bak))
    val swapped = Seq.newBuilder[(String, Boolean)]
    dts.foreach { dt =>
      val dirName = s"dt=${escDt(dt)}"
      val live = new Path(s"$path/$dirName")
      val staged = new Path(s"$stage/$dirName")
      val hasLive = fs.exists(live)
      val hasStaged = fs.exists(staged)
      if (!hasStaged) {
        // The staged write produced no dir for this dt. If live data
        // exists, moving it aside then deleting scratch would destroy
        // it (e.g. an escaping mismatch) — refuse loudly. With no live
        // data either, there is simply nothing to swap.
        if (hasLive) throw new java.io.IOException(
          s"Staged output missing partition dir $dirName under $stage; " +
            s"aborting swap to protect $live")
      } else {
        if (hasLive) mv(live, new Path(s"$bak/$dirName"))
        mv(staged, live)
        swapped += (dt -> hasLive)
      }
    }
    // All partitions swapped. On a versioned table (snapshot log seeded
    // by the first upsert load) the superseded copies RETIRE into the
    // log — manifest write is the commit point, after every rename —
    // instead of being deleted; an unversioned table (append/overwrite
    // history, or pre-log) keeps the old drop-the-backup behavior
    // (commit itself probes the log with its single listing and
    // returns None). A crash before the RETIRE renames leaves no new
    // version and the bak/stage runbook above restores the logged
    // state; a crash between retire and the manifest rename leaves an
    // orphaned retired dir that the next commit moves aside — see
    // SnapshotLog.commit's crash-window note (recovery there is
    // roll-forward: the swap already applied, re-run the batch).
    SnapshotLog.commit(spark, path, bak, swapped.result())
    fs.delete(new Path(stage), true)
    fs.delete(new Path(bak), true)
  }

  /** Small-file compaction for a curated table: rewrite each (or a
    * subset of) dt partition(s) into ~targetBytes output files via the
    * same staged atomic swap the merge uses. The append strategy
    * produces one file set per batch, so a hot partition accumulates
    * tiny files until scan overhead dominates — compaction restores
    * scan efficiency without changing contents.
    *
    * Concurrency contract: requires NO concurrent writer to the
    * partitions being compacted (rows appended between the snapshot
    * read and the swap would be lost with the old file set) — schedule
    * it in the ingest cadence's gaps, per partition. Readers see the
    * old file set, then the new one, with a brief absence window during
    * the two renames; retry-on-missing readers (normal at this layer
    * without a table format) are unaffected.
    *
    * `dts` takes RAW partition values; directory listing unescapes
    * Hive-encoded names so escapable dt values round-trip. */
  def compact(spark: SparkSession, path: String,
      dts: Seq[String] = Nil,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    ensureConf(spark)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val targets =
      if (dts.nonEmpty) dts
      else fs.listStatus(new Path(path)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt="))
        .map(s => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(s.getPath.getName.stripPrefix("dt=")))
    targets.foreach { dt =>
      val part = new Path(s"$path/dt=${escDt(dt)}")
      val bytes = fs.getContentSummary(part).getLength
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val df = spark.read.parquet(part.toString)
        .withColumn("dt", org.apache.spark.sql.functions.lit(dt))
        .repartition(nFiles)
      stagedPartitionSwap(spark, df, path, Seq(dt))
    }
  }

  /** Read a curated table back (partition inference disabled so `dt`
    * stays a string, matching what was written). */
  def readCurated(spark: SparkSession, path: String): DataFrame = {
    ensureConf(spark)
    spark.read.parquet(path)
  }

  /** Read the curated table exactly as of a snapshot version — the
    * time-travel surface over the merge's staged swaps (see
    * [[SnapshotLog]] for the manifest/retirement model and its
    * retention/vacuum trade). Versions exist for upsert-lifecycle
    * tables (the first load seeds version 1; every merge or compaction
    * swap commits the next). */
  def readAtVersion(spark: SparkSession, path: String,
      version: Int): DataFrame = {
    ensureConf(spark)
    SnapshotLog.readAtVersion(spark, path, version)
  }
}
