package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.slf4j.LoggerFactory

import graft.config.TableConfig
import graft.lake.LakeLayout
import graft.load.Strategies
import graft.transform.Derive

/** The config-driven generic loader — the reference's reason to exist
  * (macro lifecycle: SURVEY.md §3;
  * /root/reference/FInal/load_script.py:164-219,
  * /root/reference/generic_load_script.py:113-173).
  *
  * One run = one inbound CSV file:
  *   read CSV (schema'd or all-string) → projection → landing write
  *   (raw, pre-`dt`) → dt derivation from filename → audit columns →
  *   curated write under the configured strategy.
  *
  * Differences from the reference, all deliberate (SURVEY §2.9):
  * gzip handled by Spark's native `.csv.gz` codec instead of a
  * driver-local gunzip; v2 landing ordering (raw before dt); both
  * overwrite spellings accepted; v1's `"unknown"` dt fallback kept;
  * Delta MERGE re-expressed as a partition-scoped parquet merge.
  */
object GenericLoader {

  private val log = LoggerFactory.getLogger(getClass)

  final case class LoadRun(
      csvPath: String,
      sourceSystem: String,
      table: String,
      config: TableConfig,
      layout: LakeLayout,
      actor: String = "graft-spark",
      clock: Option[Timestamp] = None)

  /** S2/S3 — CSV scan: header + delimiter, with the config's explicit
    * StructType when declared, else every column string (v1 mode).
    * `.csv.gz` inputs decompress in the scan (S1).
    *
    * Quote escaping is RFC-4180 (`""` inside a quoted field — Spark's
    * default is backslash, which no warehouse export produces); fields
    * containing the delimiter need no option. Embedded NEWLINES need
    * the per-table `multiline` config flag: Spark then parses whole
    * files (`multiLine`), which makes them non-splittable — an opt-in
    * cost, never the default (see TableConfig). */
  def readCsv(spark: SparkSession, path: String, config: TableConfig): DataFrame = {
    val r = spark.read
      .option("header", true)
      .option("delimiter", config.delimiter)
      .option("escape", "\"")
      .option("multiLine", config.multiline)
    config.structType.fold(r.csv(path))(s => r.schema(s).csv(path))
  }

  /** Execute one load; returns the curated table read back. */
  def run(spark: SparkSession, lr: LoadRun): DataFrame = {
    val cfg = lr.config
    log.info(s"Loading ${lr.sourceSystem}/${lr.table} from ${lr.csvPath} " +
      s"(curated=${cfg.curatedLoadStrategy}, landing=${cfg.landingLoadStrategy})")

    val projected = Derive.project(readCsv(spark, lr.csvPath, cfg),
      cfg.selectColumns)
    val landingDf =
      if (cfg.sortColumns.nonEmpty)
        projected.sortWithinPartitions(cfg.sortColumns.map(
          org.apache.spark.sql.functions.col): _*)
      else projected

    val landingPath = lr.layout.landingPath(lr.sourceSystem, lr.table)
    Strategies.writeLanding(landingDf, landingPath, cfg.landingLoadStrategy)

    val dt = Derive.dtFromFileName(lr.csvPath)
    // Timestamp normalization is a CURATION concern: landing stays a
    // raw byte-faithful copy of the feed; the curated zone gets typed
    // event times per the config's timestamp_normalize declaration.
    val curated = Derive.withAudit(
      Derive.withDt(
        Derive.normalizeTimestamps(projected, cfg.timestampNormalize),
        dt), lr.actor, lr.clock)

    val curatedPath = lr.layout.curatedPath(lr.sourceSystem, lr.table)
    Strategies.writeCurated(spark, curated, curatedPath,
      cfg.curatedLoadStrategy, cfg.primaryKey, cfg.sortColumns)
    Strategies.readCurated(spark, curatedPath)
  }
}

/** Backfill entry: replay every not-yet-processed inbound file for one
  * table in filename order through the loader — the catch-up companion
  * to the event-per-file dispatcher (each reference invocation handles
  * exactly one landed object; after an outage the backlog needs a
  * driver).
  *
  * Idempotent across reruns: processed file BASENAMES (stable across
  * relative/absolute/symlinked spellings of the inbound dir; unique by
  * the filename-ordered contract) are recorded in a ledger stored as a
  * SIBLING of the curated table dir (`<table>__backfill.log` — outside
  * the table path, so overwrite/truncate-strategy loads that wipe the
  * table dir can't erase the history, and readers never see it) via
  * the Hadoop FileSystem API, so it works on object-store lakes where
  * java.nio would silently treat an s3a:// URI as a local path. Files
  * already in the ledger are skipped — replaying the same backlog
  * cannot double-load an append-strategy table. The ledger update
  * lands AFTER its load commits, so a crash between the two replays at
  * most the one in-flight file (at-least-once; upsert tables absorb
  * even that).
  * Usage: `BackfillMain <inbound_dir> <source_system> <table>` with the
  * same env contract as IngestMain. */
object Backfill {

  /** Replay every not-yet-processed inbound CSV through the loader;
    * returns the files processed THIS run (empty when the ledger already
    * covers the backlog). All filesystem access goes through the
    * session's `hadoopConfiguration` so `spark.hadoop.*` settings (s3a
    * credentials/endpoint passed via Spark conf) reach the listing and
    * the ledger — a bare `new Configuration()` would silently drop
    * them. */
  def run(spark: SparkSession, inboundDir: String, sourceSystem: String,
      table: String, config: TableConfig, layout: LakeLayout,
      clock: Option[Timestamp] = None,
      actor: String = "graft-spark"): Seq[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    // Hadoop FS listing (same API as the ledger below): an s3a:// or
    // hdfs:// inbound dir lists correctly instead of being treated as
    // a local path by java.nio.
    val inboundPath = new org.apache.hadoop.fs.Path(inboundDir)
    val inboundFs = inboundPath.getFileSystem(hconf)
    val files = inboundFs.listStatus(inboundPath)
      .map(_.getPath.toString).sorted.toSeq
      .filter(f => f.endsWith(".csv") || f.endsWith(".csv.gz"))
    if (files.isEmpty)
      throw new IllegalArgumentException(s"No CSV files under $inboundDir")
    val ledgerPath = new org.apache.hadoop.fs.Path(
      layout.curatedPath(sourceSystem, table).stripSuffix("/")
        + "__backfill.log")
    val fs = ledgerPath.getFileSystem(hconf)
    def readLedger(): Set[String] =
      if (fs.exists(ledgerPath)) {
        val in = fs.open(ledgerPath)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toSet
        finally in.close()
      } else Set.empty
    // full rewrite, not append: S3A and friends don't support append
    def writeLedger(entries: Set[String]): Unit = {
      val out = fs.create(ledgerPath, true)
      try out.write(entries.toSeq.sorted.mkString("", "\n", "\n")
        .getBytes("UTF-8"))
      finally out.close()
    }
    var done: Set[String] = readLedger()
    def base(f: String) = new org.apache.hadoop.fs.Path(f).getName
    val todo = files.filterNot(f => done.contains(base(f)))
    todo.foreach { f =>
      GenericLoader.run(spark, GenericLoader.LoadRun(
        f, sourceSystem, table, config, layout, actor, clock))
      done = done + base(f)
      writeLedger(done)
    }
    todo
  }
}

object BackfillMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println(
        "Usage: BackfillMain <inbound_dir> <source_system> <table_name>")
      sys.exit(1)
    }
    val Array(inboundDir, sourceSystem, table) = args
    val layout = LakeLayout.fromEnv()
    val config = TableConfig.fromFile(layout.configPath(sourceSystem, table))
    val builder = SparkSession.builder()
      .appName("graft-backfill")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .getOrCreate()
    try {
      val processed = Backfill.run(
        spark, inboundDir, sourceSystem, table, config, layout)
      if (processed.isEmpty)
        System.err.println("All files already processed")
    } finally spark.stop()
  }
}

/** E3/E4 — the 4-argument entry contract of the reference's dispatcher
  * (`spark-submit load_script.py <inbound_folder> <source_system>
  * <table_name> <file_path>`, /root/reference/FInal/script.sh:78), with
  * zone roots from the LANDING/CONFIG/CURATED env contract. */
object IngestMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 4) {
      System.err.println(
        "Usage: IngestMain <inbound_folder> <source_system> <table_name> <file_path>")
      sys.exit(1)
    }
    val Array(inbound, sourceSystem, table, filePath) = args
    val layout = LakeLayout.fromEnv()
    val config = TableConfig.fromFile(layout.configPath(sourceSystem, table))
    val builder = SparkSession.builder()
      .appName("graft-generic-loader")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; standalone runs (the v1
    // bare-python path, Script.sh:66) get a local default.
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .getOrCreate()
    try {
      val csv =
        if (filePath.startsWith("/") || filePath.contains("://")) filePath
        else s"${layout.landingRoot.stripSuffix("/")}/$inbound/$sourceSystem/$table/$filePath"
      GenericLoader.run(spark,
        GenericLoader.LoadRun(csv, sourceSystem, table, config, layout))
    } finally spark.stop()
  }
}
