package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Shared table readers + determinism helpers for oracle-paired queries.
  *
  * The driver's correctness gate hash-compares our parquet output against
  * DuckDB running `SparkEntry.oracleSql` on the same tables, so every
  * floating-point aggregate must be bit-identical across two independent
  * engines. Strategy: per-row double arithmetic is IEEE-identical in both,
  * so we do row math in double, then accumulate EXACTLY via decimal(30,8)
  * (sum order no longer matters), and cast the final value back to double.
  */
object Tables {

  /** All driver testdata tables (TESTDATA.md / FIXTURES.md §B). */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Session invariants every oracle-paired query depends on. Applied on
    * every table read (idempotent) so behavior never depends on which
    * query ran first or on the harness having pre-set them:
    *  - UTC session TZ: timestamp literals, NTZ→TZ casts, and
    *    unix_micros must agree with the DuckDB oracle regardless of
    *    host TZ;
    *  - nanosAsLong: lets a parquet TIMESTAMP(NANOS) column read as a
    *    BIGINT instead of failing the whole scan in Spark 4 (a no-op
    *    for µs/ms-unit files); [[t]] then converts it adaptively. */
  def ensureSessionConf(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureSessionConf(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" => normalizeEventTs(df)
      // The TPC-H date columns face the same drift class as events.ts
      // (the driver regenerates testdata between rounds): adapt any
      // plausible encoding to the engine-facing naive timestamp. On
      // today's files these are pass-throughs — bit-identical plans.
      case "orders" => normalizeNaiveTs(df, "o_orderdate")
      case "lineitem" => normalizeNaiveTs(df, "l_shipdate")
      case _ => df
    }
  }

  /** Per-row epoch-integer → micros SQL, shared by every adaptive
    * reader and the ingest `auto` unit: epoch values for 1973–2200
    * occupy disjoint decades per unit (seconds ~1e8.., millis ~1e11..,
    * micros ~1e14.., nanos ~1e17..), so a CASE over abs(v) classifies
    * the unit without a driver peek. The magnitude dispatch therefore
    * ASSUMES epochs in 1973–2200 — a pre-1973 millis value (~6e10)
    * reads as seconds; that domain is stated at the config surface
    * (TableConfig `timestamp_normalize` docs) as well as here. All
    * integer space (never `/` — a nano epoch ~1.7e18 exceeds 2^53 and
    * double math would corrupt microseconds), and the nanos branch is
    * FLOOR division (the mod-correction below), not `DIV`'s
    * truncate-toward-zero: DuckDB's `//` floors, so a negative
    * (pre-1970) nano epoch not divisible by 1000 would otherwise
    * diverge by 1 µs between the engines. Identical to `DIV` for
    * non-negative epochs. `q` must be a BIGINT-typed SQL fragment. */
  def epochMicrosSql(q: String): String = s"""CASE
      WHEN abs($q) >= 100000000000000000
        THEN ($q - ((($q % 1000) + 1000) % 1000)) DIV 1000
      WHEN abs($q) >= 100000000000000 THEN $q
      WHEN abs($q) >= 100000000000 THEN $q * 1000
      ELSE $q * 1000000 END"""

  /** Normalize `events.ts` to session-TZ TimestampType whatever the
    * parquet unit is — the driver has regenerated testdata across
    * timestamp units before (NANOS through round 7, micros from round
    * 8), and a hardwired conversion broke 16 queries when it flipped.
    * By read schema:
    *  - LongType: a raw epoch column (the NANOS file read under
    *    `nanosAsLong`, or a plain int64 epoch a future regeneration
    *    could ship) — unit classified per row by [[epochMicrosSql]]'s
    *    magnitude dispatch, so a nanos→micros-as-long drift cannot
    *    silently misread by 1000×;
    *  - TimestampNTZType: a µs/ms file with isAdjustedToUTC=false
    *    (what pandas writes) — reinterpret as instant via NTZ→TZ cast,
    *    identity on the epoch value under the UTC session;
    *  - TimestampType: already an instant — pass through.
    * DuckDB's `epoch_us(ts)` on the same file yields the same micros in
    * every case, so oracles are unit-drift-proof. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr(s"timestamp_micros(${epochMicrosSql("ts")})"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other — expected " +
          "BIGINT (nanos), TIMESTAMP_NTZ, or TIMESTAMP")
    }

  /** Drift-proof a NAIVE-timestamp column (the TPC-H date columns —
    * wall-clock dates with no instant semantics; queries compare them
    * to unzoned literals, so the engine-facing type is TIMESTAMP_NTZ,
    * today's on-disk encoding = pass-through). Adaptations mirror
    * [[normalizeEventTs]]: a NANOS file reads as LongType under
    * `nanosAsLong` (integer-space DIV); date32 and instant encodings
    * cast to NTZ (identity on the wall-clock value under the UTC
    * session). */
  def normalizeNaiveTs(df: DataFrame, name: String): DataFrame =
    df.schema(name).dataType match {
      case TimestampNTZType => df
      case LongType =>
        val q = "`" + name + "`"
        df.withColumn(name,
          expr(s"timestamp_micros(${epochMicrosSql(q)})")
            .cast(TimestampNTZType))
      case TimestampType | org.apache.spark.sql.types.DateType =>
        df.withColumn(name, col(name).cast(TimestampNTZType))
      case other => throw new IllegalStateException(
        s"$name read as unsupported type $other — expected BIGINT " +
          "(nanos), DATE, TIMESTAMP_NTZ, or TIMESTAMP")
    }

  /** The OPPOSITE scan correction to [[fanOut]] (r16, guide §6/§2.2):
    * coalesce a MANY-SMALL-FILES scan down to a scale-adaptive
    * partition count. File-split packing caps at ~32 files per split
    * (`openCostInBytes` charging), so a store of thousands of
    * KB-sized assets scans as hundreds of near-empty partitions and
    * every downstream stage over it (or over a checkpoint of it)
    * re-schedules that many tiny tasks — profiled at sf0.1 as
    * 215-task stages over the 6,876-file video store, repeated per
    * consumer job. Target count = max(one wave of cores,
    * totalBytes / maxPartitionBytes): never fewer tasks than the
    * cluster can run at once, never partitions bigger than the
    * configured split size — so a store whose BYTES demand more
    * partitions keeps them (a 100 TB store is untouched; only the
    * small-file pathology collapses). `coalesce` merges without a
    * shuffle: the decode closures downstream then run once per
    * merged partition over locally-read bytes. */
  def packScan(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxPB = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val byBytes = (bytes / maxPB).toLong + 1L
    // ONE wave of cores (ADVICE r16 suggested 2-3 waves of balancing
    // slack for skewed stores; MEASURED at sf0.1/32 and rejected: two
    // waves cost +0.4-0.6 s per decode consumer — multimodal_pack
    // 1.54→2.01 s, asset_gc 1.62→2.18 s cold — because doubling the
    // task count doubles the per-task scheduling+decode-setup floor
    // while the fixture has no skew to balance. At sizes where skew
    // slack matters, byBytes dominates the max() anyway, so the wave
    // count is moot; the straggler guard at scale is AQE + speculative
    // execution, not a smaller coalesce target).
    val target = math.max(
      spark.sparkContext.defaultParallelism.toLong, byBytes)
    df.coalesce(math.min(target, Int.MaxValue.toLong).toInt)
  }

  /** Spread a SCAN across the cluster before CPU-heavy per-row work.
    * A small parquet file is one row group, so Spark reads it as ONE
    * partition regardless of maxPartitionBytes, and every downstream
    * map stage (tokenize/shingle/hash/vector-fold) runs single-threaded
    * — profiled 3-5× slowdowns at sf0.1. At 100 TB the scan already has
    * thousands of splits and this is a no-op, so the round-robin
    * shuffle only ever moves small data. Call it on freshly-read frames
    * only: `.rdd` on a pure scan plans without running jobs, but on a
    * join/agg under AQE it can trigger stage execution. Results are
    * retry-safe — Spark local-sorts before round-robin partitioning
    * (SPARK-23207), and our consumers are order-insensitive aggs.
    *
    * Guarded to bare scans (relation + column-level Project/Filter):
    * for any derived frame (join/agg/...) this is an identity, because
    * probing `.rdd` there can trigger stage execution under AQE and the
    * tiny-scan problem it solves doesn't exist post-shuffle anyway.
    * FanOutSpec asserts the scan probe runs zero jobs. */
  def fanOut(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def scanOnly(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case _: Project | _: Filter | _: SubqueryAlias =>
        p.children.forall(scanOnly)
      case _ => false
    }
    if (!scanOnly(df.queryExecution.analyzed)) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  /** Correctly-rounded decimal→double conversion, shared by every
    * oracle-paired aggregate (dsum, window/streaming sums): the cast
    * goes THROUGH A STRING because above 2^53 in scaled-integer space
    * the engines' native decimal→double conversions differ by 1 ulp
    * (DuckDB divides the int128 by 10^scale in floating point; Spark
    * rounds via BigDecimal), while string→double parsing is correctly
    * rounded in both — caught at sf0.1 where sf0.01 magnitudes never
    * triggered it. DuckDB twin: `CAST(CAST(x AS VARCHAR) AS DOUBLE)`. */
  def decToDouble(c: Column): Column = c.cast("string").cast("double")

  /** Filesystem-safe tag of an sf dir, for scoping scratch table/path
    * names per dataset (bucketed tables, format-roundtrip outputs). */
  def pathTag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** `_SUCCESS`-marker probe for a memoized derived store — the
    * companion of [[listingTag]]: gate every store reuse on the marker
    * (a partially-written directory from a crashed run has none). */
  def successExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Content fingerprint of a source table from its FILE LISTING
    * (names, lengths, mtimes — no data scan, no Spark job). Embed it
    * in any memoized derived-store path: `target/` scratch outlives
    * testdata refreshes, and a store derived from a previous data
    * generation must self-invalidate rather than silently serve stale
    * rows. Catches refreshes a row count or min/max fingerprint would
    * miss (same-cardinality regeneration, shifted spans). */
  def listingTag(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).map(st =>
      s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
  }

  /** Exact (order-independent) sum of a double column: accumulate in
    * decimal, return double via [[decToDouble]]. DuckDB twin:
    * `CAST(CAST(sum(CAST(x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)`. */
  def dsum(c: Column): Column = decToDouble(sum(c.cast(DecimalType(30, 8))))

  /** Deterministic average: exact decimal sum / count, divided in double.
    * DuckDB twin:
    * `CAST(CAST(sum(CAST(x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)/count(*)`
    * (string-routed like [[dsum]]) — do NOT use DuckDB's avg() (double
    * accumulated in nondeterministic partition order). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** 32-bit md5-prefix hash as a long — the engine's ONE deterministic
    * cross-engine hash (sampling coins, KMV ranks, posting fingerprints
    * all derive from it). Any change here must change every paired
    * DuckDB oracle, whose twin is
    * `CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT)`. */
  def md5Long32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Salted deterministic bucket in [0, mod): the content-derived coin
    * for reproducible sampling/sharding (never an RNG — the same row
    * lands in the same bucket on every run, engine, and retry). DuckDB
    * twin: `CAST(... md5('salt' || CAST(k AS VARCHAR)) ...) % mod`. */
  def md5Bucket(salt: String, key: Column, mod: Int): Column =
    pmod(md5Long32(concat(lit(salt), key.cast("string"))), lit(mod))
}
