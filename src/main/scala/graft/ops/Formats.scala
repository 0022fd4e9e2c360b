package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, dsum, pathTag}

/** Source/sink format surface beyond CSV+parquet: ORC and JSON-lines
  * roundtrips. Each query WRITES the orders table through the format
  * and reads it back before aggregating; the paired oracle runs the
  * same aggregate on the ORIGINAL parquet — so a green row proves the
  * format path is content-preserving (types, nulls, numeric fidelity),
  * not just that the write succeeded.
  *
  * Timestamps cross the formats as `unix_micros` longs: JSON has no
  * timestamp type (only strings, whose parsing round-trip is
  * tz-fragile), and pinning the representation makes the two
  * roundtrips directly comparable. Doubles survive JSON because Spark
  * serializes them with Java's shortest-exact representation and
  * parses them back correctly rounded.
  *
  * Scale: a format roundtrip is scan → write → scan, all distributed;
  * the JSON read passes an explicit schema, so no inference job scans
  * the data twice. Outputs land under `target/graft_formats/` (local
  * scratch; a cluster deployment would point at the lake). */
object Formats {

  /** Orders with the timestamp pinned to micros — the exchange schema
    * for both formats. */
  private def ordersFlat(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
      col("o_orderpriority"))

  private def roundtrip(spark: SparkSession, dir: String,
      fmt: String): DataFrame = {
    val out = s"target/graft_formats/${fmt}_${pathTag(dir)}"
    val flat = ordersFlat(spark, dir)
    flat.write.format(fmt).mode("overwrite").save(out)
    // explicit schema: identical types back, and (for JSON) no
    // schema-inference pre-pass over the written files
    spark.read.format(fmt).schema(flat.schema).load(out)
  }

  private def summarize(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_date_us")).as("min_date_us"),
        max(col("o_date_us")).as("max_date_us"),
        sum(col("o_custkey")).as("custkey_sum"))
      .orderBy("o_orderstatus", "o_orderpriority")

  /** ORC write → read → aggregate; oracle = same aggregate on parquet. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    summarize(roundtrip(spark, dir, "orc"))

  /** JSON-lines write → read → aggregate; oracle likewise. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame =
    summarize(roundtrip(spark, dir, "json"))

  /** CSV write → read → aggregate — completes the text-format matrix
    * (the loader's INPUT format as a sink). Explicit schema on
    * re-read (headerless, positional), so no inference pass; doubles
    * survive because Spark writes shortest-exact representations and
    * parses them back correctly rounded (same argument as JSON). */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame =
    summarize(roundtrip(spark, dir, "csv"))

  /** S6 — BINARY-DIRECTORY source (`binaryFile`): the entry path of a
    * multimodal lake — a directory of opaque per-asset files (images,
    * audio, here one file per document's bytes) read as
    * (path, length, content) rows, featurized without ever parsing
    * content as text. The harness materializes the fixture files
    * executor-side (`foreachPartition`, parallel, never a driver
    * collect — on a cluster the target would be shared storage), then
    * reads them back through the real source and emits per-asset
    * (id-from-path, byte length, content md5). The oracle recomputes
    * length/md5 from the documents table directly, so the gate proves
    * the file write → binary scan round trip is byte-exact. At 100 TB
    * the source's partition-parallel listing + `pathGlobFilter`/
    * recursive lookup are the standard corpus-crawl knobs; content
    * rides as an opaque binary column exactly like
    * [[Multimodal]]'s payloads. */
  def binaryIngest(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Paths
      .get(s"target/graft_formats/binary_${pathTag(dir)}").toAbsolutePath
    graft.util.Scratch.deleteRecursive(out)
    java.nio.file.Files.createDirectories(out)
    val outStr = out.toString
    t(spark, dir, "documents").select(col("doc_id"), col("text"))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outStr/doc_${r.getLong(0)}.bin"),
            r.getString(1).getBytes("UTF-8"))
          ()
        }
      }
    spark.read.format("binaryFile").load(outStr)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")
  }

  /** Parquet schema EVOLUTION roundtrip: batch 1 writes (orderkey,
    * custkey); batch 2 appends the same dir with an extra
    * `o_totalprice` column; a `mergeSchema` read reconciles both file
    * schemas (old files surface the new column as NULL). The aggregate
    * separates the two generations via null-ness, and the oracle
    * recomputes it from the ORIGINAL parquet with the same even/odd
    * split — green proves the evolved read loses nothing. File sources
    * don't validate appended schemas, which is exactly why mergeSchema
    * (off by default: every footer must be read at planning time — at
    * 100 TB turn it on per-read, not globally) exists. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = s"target/graft_formats/evolve_${pathTag(dir)}"
    val ord = t(spark, dir, "orders")
    val even = col("o_orderkey") % 2 === 0
    // overwrite clears the dir, so re-runs are idempotent
    ord.filter(even).select("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(out)
    ord.filter(!even).select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("append").parquet(out)
    spark.read.option("mergeSchema", "true").parquet(out)
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_evolved"),
        sum(col("o_custkey")).as("custkey_sum"),
        dsum(col("o_totalprice")).as("evolved_price_sum"))
  }

  // ---- X93: content-type sniffing ------------------------------------

  /** Committed binary fixture (`scripts/gen_bin_fixture.py`) — both
    * engines sniff the SAME bytes on disk, the robots_rules pattern. */
  val BinmixDir = s"${Ingest.FixtureDir}/corpus/binmix"

  /** Magic-byte table, FIRST match wins; hex is uppercase in both
    * engines (`hex()` in Spark and DuckDB). The classification CASE
    * chain on both sides is generated from this one constant. */
  val MagicTypes: Seq[(String, String)] = Seq(
    "FFD8FF" -> "jpeg",
    "89504E470D0A1A0A" -> "png",
    "474946383961" -> "gif",
    "474946383761" -> "gif",
    "255044462D" -> "pdf",
    "504B0304" -> "zip",
    "504B0506" -> "zip")

  /** ext (lowercased) → the type its name promises; anything else
    * promises `unknown`. */
  val ExtTypes: Seq[(String, String)] = Seq(
    "jpg" -> "jpeg", "jpeg" -> "jpeg", "png" -> "png", "gif" -> "gif",
    "pdf" -> "pdf", "zip" -> "zip")

  /** X93 — content-type sniffing over a binary asset directory (the
    * multimodal ingest gate a crawl pipeline runs before routing
    * bytes to decoders): detect each file's REAL type from its magic
    * bytes, compare against what the extension promises, and roll up
    * per detected type — file count, byte mass, and how many
    * extensions LIE (the mislabeled-asset rate that poisons a decoder
    * fleet if admitted unchecked). Detection is a first-match prefix
    * walk over [[MagicTypes]] on the UPPERCASE hex of the first 8
    * bytes; files shorter than a magic, decoys with the magic
    * mid-file, and corrupted magic bytes all fall to `unknown`
    * (fixture plants each shape).
    *
    * Scale shape: `binaryFile` scan → per-file projection (8-byte
    * substring + hex + CASE chain; the content column is never
    * shuffled) → one map-side-combined agg on the bounded type key.
    * At 100 TB of assets this runs at scan speed; the rollup is
    * type-bounded. */
  /** First-match magic-byte classification of a `content` column —
    * shared by X93's rollup and X106's dup report. */
  private def detectedType: org.apache.spark.sql.Column = {
    val px = hex(substring(col("content"), 1, 8))
    MagicTypes.foldRight(lit("unknown"): org.apache.spark.sql.Column) {
      case ((pfx, tp), acc) => when(px.startsWith(pfx), lit(tp)).otherwise(acc)
    }
  }

  def mimeSniff(spark: SparkSession, dir: String): DataFrame = {
    val detected = detectedType
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val promised = ExtTypes.foldRight(lit("unknown"): org.apache.spark.sql.Column) {
      case ((e, tp), acc) => when(ext === e, lit(tp)).otherwise(acc)
    }
    spark.read.format("binaryFile").load(BinmixDir)
      .select(detected.as("detected"), promised.as("promised"),
        col("length"))
      .groupBy(col("detected"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).as("n_bytes"),
        sum(when(col("promised") =!= col("detected"), 1L).otherwise(0L))
          .as("n_ext_mismatch"))
      .orderBy("detected")
  }

  /** X106 — exact BINARY dedup over the asset directory: the same
    * bytes re-uploaded under different names/extensions collapse to
    * one group — the asset-side twin of X1's text dedup, and the step
    * a multimodal pipeline runs before decoding anything twice (a
    * popular image recrawled under ten URLs is one decode, not ten).
    * Content identity is `md5(content)` over the RAW bytes — the
    * earlier `md5(hex(content))` spelling materialized a 2× string
    * copy of every asset in the scan projection, doubling transient
    * row memory at 100 TB of assets for nothing. The digest is a
    * grouping key only, not an output column: DuckDB 1.0.0 has no
    * binary md5 (`md5(VARCHAR)` only), so the oracle groups by the
    * blob itself and both engines identify groups by the canonical
    * member name instead.
    *
    * Member names are the RAW path basename: Spark's `binaryFile`
    * `path` (`FileStatus.getPath.toString`) does NOT percent-encode —
    * probed empirically: a space and a literal `%20` both arrive raw,
    * exactly as the oracle's `read_blob` filename does — so any
    * decoding step would be the divergence, not the cure (url_decode
    * THROWS on a literal `%` name and would fold a literal `%20`
    * into a space the on-disk name doesn't have). The fixture pins
    * raw-vs-raw equality with dup groups whose names carry a space,
    * a literal `%`, and a literal `%20`.
    *
    * Output: one row per DUPLICATE group (singletons are not a dedup
    * finding), with the detected type (same bytes → same magic; `min`
    * is just the one value), total byte mass, the sorted `+`-joined
    * member names — `collect_list`, multiplicity preserved, so a
    * recursive load with duplicate basenames would still agree with
    * `n_files` — and the canonical keeper (min name — deterministic
    * under re-runs).
    *
    * Scale shape: per-file hash projection (content never shuffles —
    * only the 16-byte digest and the name do) → one digest-keyed
    * map-side-combined agg; at 100 TB of assets the shuffle carries
    * digests, not bytes. */
  def assetDedup(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(BinmixDir)
      .select(md5(col("content")).as("k"),
        detectedType.as("detected"), col("length"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"))
      .groupBy(col("k"))
      .agg(min(col("detected")).as("detected"),
        count(lit(1)).as("n_files"),
        sum(col("length")).as("n_bytes"),
        array_join(array_sort(collect_list(col("name"))), "+")
          .as("files"),
        min(col("name")).as("canonical"))
      .filter(col("n_files") >= 2)
      .drop("k")
      .orderBy("canonical")
}
