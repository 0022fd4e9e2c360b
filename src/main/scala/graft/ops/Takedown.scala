package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

import graft.util.Tables
import graft.util.Tables.t

/** X85 — takedown/deletion propagation: the compliance delete a real
  * corpus operator runs weekly (DMCA, GDPR erasure, opt-out lists).
  * Given a doc_id list, produce the WRITE-BACK that removes those
  * documents (and their embeddings) from the lake, retire the removed
  * rows for audit/restore, and emit the per-source deletion manifest
  * the compliance report is built from. The reference's loader only
  * ever merges rows IN (`FInal/generic_load_script.py` upsert — no
  * delete path exists there), so this is an extension operator
  * mandated by the training-data-pipeline surface.
  *
  * Mechanics, chosen for the 100 TB shape:
  *
  *  - FILE-GRANULAR rewrite: only parquet files that CONTAIN a
  *    takedown row are rewritten (row-group surgery via
  *    `_metadata.file_path`); untouched files are retained by HARD
  *    LINK — zero bytes copied, the copy-on-write economics every
  *    table format (Delta/Iceberg DELETE) relies on. The affected
  *    file list is collected to the driver — bounded by affected-file
  *    count, ~|takedown list| at worst, never corpus size.
  *  - RETIRED COPY first: the removed rows are persisted under
  *    `_deleted/` BEFORE the live rewrite (the [[graft.load.SnapshotLog]]
  *    retire-then-swap ordering), so a crash between the two steps
  *    loses nothing and restore/audit reads are one parquet scan.
  *  - The new corpus is a NEW directory keyed by
  *    (source path, documents listing tag, embeddings listing tag,
  *    takedown fingerprint) and `_SUCCESS`-gated like every derived
  *    store. Because all five persisted index stores (gate stats,
  *    MinHash signatures, set-sim, edit-distance, IVF) key their OWN
  *    paths by the corpus listing tag, pointing them at the
  *    post-takedown dir re-keys and rebuilds them without the deleted
  *    docs — the propagation contract IndexFreshnessSpec walks.
  *
  * The registered query uses the deterministic takedown list
  * `doc_id % 97 == 0` (≈1% of the corpus, the weekly-compliance
  * scale) and emits the manifest with `n_after` computed by READING
  * BACK the rewritten corpus — a write-back that dropped the wrong
  * rows hash-fails the oracle's arithmetic, not just a spec. */
object Takedown {

  private val log = LoggerFactory.getLogger(getClass)

  /** Deterministic takedown list of the registered query. */
  val TakedownMod = 97

  private def hit(idCol: Column): Column =
    pmod(idCol, lit(TakedownMod)) === 0

  /** Execute (or reuse) the takedown write-back for `dir`'s corpus
    * tables; returns the post-takedown lake dir, which carries
    * `documents.parquet`, `embeddings.parquet` and the `_deleted/`
    * retirement — readable by [[Tables.t]] exactly like a testdata
    * dir, which is what lets every downstream index build re-key onto
    * it unchanged. */
  def takedownStore(spark: SparkSession, dir: String): String = {
    val out = s"target/graft_takedown/${Tables.pathTag(dir)}_" +
      Tables.listingTag(spark, s"$dir/documents.parquet") + "_" +
      Tables.listingTag(spark, s"$dir/embeddings.parquet") +
      s"_m$TakedownMod"
    // the gate is a ROOT-level marker touched LAST — Spark's own
    // per-table _SUCCESS lands before the hard-link retention loop
    // runs, so gating on those would permanently memoize a corpus
    // missing its untouched files after a crash mid-link (review r14)
    if (!Tables.successExists(spark, out)) {
      rewriteTable(spark, s"$dir/documents.parquet",
        s"$out/documents.parquet", s"$out/_deleted/documents",
        df => df.withColumn("_hit", hit(col("doc_id"))))
      rewriteTable(spark, s"$dir/embeddings.parquet",
        s"$out/embeddings.parquet", s"$out/_deleted/embeddings",
        df => df.withColumn("_hit", hit(col("vec_id"))))
      Files.write(Paths.get(out, "_SUCCESS"), Array.empty[Byte])
      log.info(s"takedown write-back committed at $out")
    }
    out
  }

  /** File-granular delete of marked rows from the table at `src` into
    * `dst`, retiring the removed rows at `retired` FIRST. `withHit`
    * appends the boolean `_hit` drop marker — a predicate for the X85
    * takedown list, a broadcast drop-list join for the X76b dedup
    * write-back — so every write-back shares ONE rewrite/retire/link
    * implementation. */
  private[graft] def rewriteTable(spark: SparkSession, src: String,
      dst: String, retired: String,
      withHit: DataFrame => DataFrame): Unit = {
    val df = withHit(spark.read.parquet(src).withColumn("_f",
      regexp_extract(col("_metadata.file_path"), "[^/]+$", 0)))
    // bounded collect: one row per AFFECTED FILE (≤ |drop list|)
    val affected = df.filter(col("_hit")).select(col("_f")).distinct()
      .collect().map(_.getString(0)).toSet
    // retire first: the restore path must exist before the live swap
    df.filter(col("_hit")).drop("_f", "_hit")
      .write.mode("overwrite").parquet(retired)
    val survivors =
      if (affected.isEmpty) df.limit(0).drop("_f", "_hit")
      else df.filter(col("_f").isin(affected.toSeq: _*) && !col("_hit"))
        .drop("_f", "_hit")
    survivors.write.mode("overwrite").parquet(dst)
    // untouched files: retained by hard link (zero-copy), copy as the
    // cross-device fallback. A single-FILE table lists as itself and
    // is always affected-or-empty, so this loop is dir-shaped only.
    val p = new Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory) {
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith(".")
            && !affected.contains(name)) {
          val target = Paths.get(dst, name)
          try Files.createLink(target, Paths.get(src, name))
          catch { case _: UnsupportedOperationException |
              _: java.nio.file.FileSystemException =>
            Files.copy(Paths.get(src, name), target,
              StandardCopyOption.COPY_ATTRIBUTES)
          }
          ()
        }
      }
    }
  }

  /** X85 registered query — the deletion manifest: per source, corpus
    * size before, rows removed, rows AFTER (read back from the
    * rewritten corpus — proving the write, not the plan), and the
    * removed token/char mass for the compliance report.
    *
    * Scale shape: two scans of the source table (before-counts +
    * removed mass — one logical scan each, source-sized rollups), one
    * scan of the rewritten corpus, and the write-back itself is
    * affected-file-bounded and `_SUCCESS`-memoized (the weekly run
    * rewrites once; every report after reads). */
  def takedownPropagate(spark: SparkSession, dir: String): DataFrame = {
    val store = takedownStore(spark, dir)
    // ONE conditional-aggregation scan for before/removed (the
    // oracle's FILTER shape) — a groupBy-per-stage join on "source"
    // silently LOSES the null-source group's removal counts (null
    // join keys never match; the GROUP-BY oracle keeps them — a
    // cross-engine divergence a crawl corpus with a malformed source
    // field would trigger; found by the hostile battery)
    val isHit = hit(col("doc_id"))
    val br = t(spark, dir, "documents")
      .withColumn("rm_tok", when(isHit,
        size(TextAnalysis.tokens(col("text"))).cast("long")))
      .withColumn("rm_chars", when(isHit, col("n_chars")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(isHit, 1L).otherwise(0L)).as("n_removed"),
        sum(col("rm_tok")).as("removed_tokens"),
        sum(col("rm_chars")).as("removed_chars"))
    val a = spark.read.parquet(s"$store/documents.parquet")
      .groupBy(col("source").as("a_source"))
      .agg(count(lit(1)).as("n_after"))
    // null-SAFE join: the null-source group's survivors must attach
    br.join(a, col("source") <=> col("a_source"), "left")
      .select(col("source"), col("n_before"), col("n_removed"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"))
      .orderBy("source")
  }

  // ---- X76b: apply-dedup write-back ----------------------------------

  /** The NON-CANONICAL near-dup members — every doc whose component
    * label (min doc_id, [[Dedup.minLabelComponents]] over the X3
    * MinHash pairs) is not itself: the rows [[Dedup.dedupCanonical]]'s
    * manifest says to collapse. Bounded by pair participation, ≪
    * corpus. */
  private[graft] def neardupDropIds(spark: SparkSession,
      dir: String): DataFrame =
    Dedup.minLabelComponents(
      Dedup.nearDupPairsCached(spark, dir)
        .select(col("doc_a"), col("doc_b")))
      .filter(col("doc_id") =!= col("grp"))
      .select(col("doc_id").as("drop_id"))

  /** Execute (or reuse) the DEDUP write-back: the X76 canonical
    * manifest, APPLIED. [[Dedup.dedupCanonical]] names each near-dup
    * group's keeper; until round 15 nothing consumed that manifest —
    * this store drops every non-canonical member from the lake
    * through the SAME file-granular retire-then-rewrite as the X85
    * takedown (hard-linked untouched files, `_deleted/` retirement
    * written first, root `_SUCCESS` last), with the drop marker a
    * BROADCAST join against the bounded drop-id relation instead of a
    * predicate. Embeddings drop by the same ids (vector rows of
    * collapsed documents must not keep serving similarity search —
    * the IndexFreshnessSpec re-key contract then rebuilds every
    * persisted index without them). Keyed by the corpus listing tags;
    * the drop list is corpus-derived and deterministic, so the tags
    * fully identify it. */
  def dedupApplyStore(spark: SparkSession, dir: String): String = {
    val out = s"target/graft_dedup_apply/${Tables.pathTag(dir)}_" +
      Tables.listingTag(spark, s"$dir/documents.parquet") + "_" +
      Tables.listingTag(spark, s"$dir/embeddings.parquet")
    if (!Tables.successExists(spark, out)) {
      // pair-participant-sized; checkpointed so the two rewrites and
      // the affected-file collects don't re-run the MinHash chain
      val drops = neardupDropIds(spark, dir).localCheckpoint()
      def withDropHit(idName: String)(df: DataFrame): DataFrame =
        df.join(broadcast(drops.withColumn("_h", lit(true))),
            col(idName) === col("drop_id"), "left")
          .withColumn("_hit", coalesce(col("_h"), lit(false)))
          .drop("drop_id", "_h")
      rewriteTable(spark, s"$dir/documents.parquet",
        s"$out/documents.parquet", s"$out/_deleted/documents",
        withDropHit("doc_id"))
      rewriteTable(spark, s"$dir/embeddings.parquet",
        s"$out/embeddings.parquet", s"$out/_deleted/embeddings",
        withDropHit("vec_id"))
      Files.write(Paths.get(out, "_SUCCESS"), Array.empty[Byte])
      log.info(s"dedup write-back committed at $out")
    }
    out
  }

  /** X76b registered query — the dedup-application manifest: per
    * source, corpus size before, non-canonical members removed, rows
    * AFTER read back from the rewritten corpus (proving the write,
    * not the plan — the takedown discipline), and the removed char
    * mass. Same conditional-agg + null-safe-join shape as
    * [[takedownPropagate]] so a null-source group keeps its counts.
    *
    * Scale shape: the drop list is pair-bounded and broadcast; one
    * conditional-agg scan of the source corpus, one scan of the
    * rewritten corpus, and the write-back itself is
    * affected-file-bounded and `_SUCCESS`-memoized. */
  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    val store = dedupApplyStore(spark, dir)
    val drops = neardupDropIds(spark, dir)
    val br = t(spark, dir, "documents")
      .join(broadcast(drops.withColumn("_h", lit(true))),
        col("doc_id") === col("drop_id"), "left")
      .withColumn("_rm", coalesce(col("_h"), lit(false)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("_rm"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("_rm"), col("n_chars"))).as("removed_chars"))
    val a = spark.read.parquet(s"$store/documents.parquet")
      .groupBy(col("source").as("a_source"))
      .agg(count(lit(1)).as("n_after"))
    br.join(a, col("source") <=> col("a_source"), "left")
      .select(col("source"), col("n_before"), col("n_removed"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"))
      .orderBy("source")
  }
}
