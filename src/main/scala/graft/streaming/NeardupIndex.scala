package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.slf4j.LoggerFactory

/** Retention layer for the streaming near-dup signature index — the
  * piece that makes [[NeardupStream]]'s "run forever" story true.
  *
  * The stream appends one `batch_id=<id>` directory per micro-batch
  * (idempotent under foreachBatch replay). Left alone, two costs grow
  * without bound: the directory count itself, and the per-micro-batch
  * LISTING of the index (`spark.read.parquet(root)` walks every batch
  * dir on every arrival). This object bounds both:
  *
  *  - [[read]] lists ONLY the index root (one `listStatus`) plus the
  *    compaction log, and reads the LIVE batch dirs by explicit path —
  *    listing cost is proportional to the live dir count, which
  *    compaction keeps small, never to the all-time batch count;
  *  - [[compact]] folds every live batch dir (the seed included) into
  *    a single `batch_id=compact<gen>` directory.
  *
  * Crash safety follows [[graft.load.SnapshotLog]]'s
  * manifest-existence-is-commit discipline, including its append-only
  * file layout: each committed compaction is ONE immutable file
  * `_compactions/c<gen>` (temp + rename to a FRESH name — the rename
  * IS the commit; nothing ever rewrites an existing commit file). The
  * consolidated dir is INVISIBLE to [[read]] until its commit file
  * lands. A crash after the consolidated write but before the commit
  * rename leaves an unlogged `compact<gen>` dir that readers ignore
  * and the next compaction overwrites; a crash after the commit but
  * before the folded dirs are deleted is benign — the log already
  * marks them folded, so readers skip them and the next [[compact]]
  * (or a manual sweep) removes them. At no crash point can a
  * signature be read twice or lost. Single-writer, like the snapshot
  * log: one stream owns one index directory.
  *
  * Commit file format: the folded `batch_id=*` dir names, one per
  * line (no escaping needed; batch ids are stream-generated longs,
  * `seed`, or `compact<gen>`). */
object NeardupIndex {

  private val log = LoggerFactory.getLogger(getClass)

  private def logDir(dir: String) = new Path(dir, "_compactions")
  private def commitPath(dir: String, gen: Int) =
    new Path(logDir(dir), f"c$gen%08d")

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed compactions, ascending: generation → folded dir names. */
  private def committed(fs: FileSystem,
      dir: String): Seq[(Int, Seq[String])] = {
    val d = logDir(dir)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("c\\d{8}") => n.stripPrefix("c").toInt }
      .sorted
      .map { gen =>
        val in = fs.open(commitPath(dir, gen))
        val folded =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .filter(_.nonEmpty).toVector
          finally in.close()
        gen -> (folded: Seq[String])
      }
  }

  /** The batch dirs a reader must see: every `batch_id=*` child that
    * (a) finished writing (`_SUCCESS` present — an in-flight append is
    * invisible), (b) is not folded by a committed compaction, and
    * (c) if it is a `compact*` dir, is itself committed (an unlogged
    * one is a crashed attempt). */
  private[graft] def liveBatchDirs(spark: SparkSession,
      dir: String): Seq[String] = {
    val fs = fsOf(spark, dir)
    val cs = committed(fs, dir)
    val folded = cs.flatMap(_._2).toSet
    val committedGens =
      cs.map { case (gen, _) => s"batch_id=compact$gen" }.toSet
    fs.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .filter(n => fs.exists(new Path(s"$dir/$n/_SUCCESS")))
      .filterNot(folded)
      .filter(n => !n.startsWith("batch_id=compact") || committedGens(n))
      .sorted
  }

  /** Read the live index — one root listing + the log, then an
    * explicit multi-path scan (`basePath` recovers the `batch_id` and
    * `band` partition columns). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val live = liveBatchDirs(spark, dir)
    require(live.nonEmpty, s"near-dup index at $dir has no live batches")
    spark.read.option("basePath", dir)
      .parquet(live.map(n => s"$dir/$n"): _*)
  }

  /** Fold all live batch dirs into one `batch_id=compact<gen>` dir and
    * commit it to the log; physically deletes the folded dirs after
    * the commit (best-effort — a leftover is invisible to readers).
    * No-op when the index is already a single directory. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val live = liveBatchDirs(spark, dir)
    if (live.size <= 1) return
    val gen = committed(fs, dir).lastOption.fold(1) { case (g, _) => g + 1 }
    val target = s"batch_id=compact$gen"
    // consolidated copy first — readers keep using the folded dirs
    // until the commit file flips visibility atomically (overwrite
    // clobbers a crashed earlier attempt at this same uncommitted gen)
    spark.read.option("basePath", dir)
      .parquet(live.map(n => s"$dir/$n"): _*)
      .select("doc_id", "band", "sig")
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$dir/$target")
    val tmp = new Path(logDir(dir), f".c$gen%08d.tmp")
    val out = fs.create(tmp, true)
    try out.write(live.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val dest = commitPath(dir, gen)
    // fresh-name rename is the commit; existence guard mirrors
    // SnapshotLog's single-writer put-if-absent discipline
    if (fs.exists(dest))
      throw new java.io.IOException(
        s"Concurrent compaction detected: $dest already exists")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(
        s"Failed to commit compaction $gen for $dir")
    log.info("Compacted near-dup index {}: folded {} dirs into {}",
      dir, live.size.toString, target)
    live.foreach(n => fs.delete(new Path(s"$dir/$n"), true))
  }
}
