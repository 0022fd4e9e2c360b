package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, fanOut}

/** Data-inspection / change-capture operators a lake pipeline runs
  * between loads:
  *
  *  - [[snapshotDiff]] — CDC-style diff of two keyed snapshots into
  *    insert/update/delete rows. One full-outer sort-merge join on the
  *    primary key; the change classification and the null-safe payload
  *    comparison are per-row projections, so the whole operator is one
  *    shuffle of each snapshot regardless of scale. This is the
  *    building block for incremental downstream refresh (ship only the
  *    diff) and for load-to-load regression checks.
  *
  *  - [[tableProfile]] — per-column stats (rows, nulls, exact distinct,
  *    min/max) in ONE pass over the table: a single multi-distinct
  *    aggregate (Spark plans it as one Expand + aggregation, not one
  *    scan per column) whose wide result row is unpivoted to a row per
  *    column. The lake-maintenance "what does this table look like"
  *    primitive — schema drift, null regressions, key-cardinality
  *    checks — without N scans for N columns.
  *
  * Reference semantics: generic lake maintenance over the reference's
  * customers feed (`/root/reference/FInal/load_script.py:33-236`
  * upserts day files; the diff of two day files is exactly what its
  * merge applies). */
object Inspect {

  /** Diff `oldDf`→`newDf` on `pk`: rows keyed present-only-in-new are
    * `insert`, present-only-in-old are `delete`, and present-in-both
    * with any `compare` column differing (null-safe) are `update`;
    * unchanged rows are dropped. Output: pk, change_type, then
    * old_/new_ pairs of every compared column. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, pk: Seq[String],
      compare: Seq[String]): DataFrame = {
    val o = oldDf.select(pk.map(col) ++
      compare.map(c => col(c).as(s"old_$c")) :+
      lit(true).as("__in_old"): _*)
    val n = newDf.select(pk.map(col) ++
      compare.map(c => col(c).as(s"new_$c")) :+
      lit(true).as("__in_new"): _*)
    // using-column join coalesces the pk across sides, so the key is
    // usable regardless of which side the row came from
    val joined = o.join(n, pk, "full_outer")
    // empty compare list = keys-only diff: inserts/deletes still
    // classify, matched keys count as unchanged
    val same: Column = compare
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    joined
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .otherwise(lit("update")))
      .filter(col("change_type") =!= "update" || !same)
      .select(pk.map(col) ++ Seq(col("change_type")) ++
        compare.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Fixture customers day-file reader (explicit schema, quoted fields
    * — mirrors the loader's declared-schema read). */
  private def day(spark: SparkSession, file: String): DataFrame =
    spark.read
      .schema("id INT, name STRING, city STRING, bal DOUBLE, junk STRING")
      .option("header", "true")
      .csv(s"${Ingest.FixtureDir}/inbound/sap/customers/$file")

  /** Registered diff of the two committed fixture days: 5 updates
    * (ids 1-5, every payload column changed, including a NULL→value on
    * bal), 5 inserts (26-30), 15 deletes (6-25). */
  def fixtureDayDiff(spark: SparkSession, dir: String): DataFrame =
    snapshotDiff(
        day(spark, "customers_20240628.csv"),
        day(spark, "customers_20240629.csv"),
        Seq("id"), Seq("name", "city", "bal"))
      .orderBy("id")

  /** One-pass profile of named columns: (column_name, n_rows, n_nulls,
    * n_distinct, min/max as strings). Exact distincts — at true scale
    * swap `countDistinct` for `approx_count_distinct` per column; the
    * plan shape (single Expand-based multi-distinct aggregate) is the
    * same. Double columns are excluded by the caller when oracle parity
    * matters: engines disagree on double→string rendering, not on the
    * values themselves. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // positional alias suffixes + escaped name literals: column names
    // that aren't bare SQL identifiers (spaces, dots — common from CSV
    // headers) must not reach the selectExpr parser unquoted
    val wide = df.agg(
      count(lit(1)).as("__n"),
      (cols.zipWithIndex.flatMap { case (c, i) => Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$i"),
        countDistinct(col(c)).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
      }): _*)
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      val esc = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$esc', __n, __nulls_$i, __nd_$i, __min_$i, __max_$i"
    }.mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stacked) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
      .orderBy("column_name")
  }

  /** Scale form of [[tableProfile]]: `approx_count_distinct`
    * (HyperLogLog++) in place of the exact distinct. Exact multi-column
    * distinct needs the Expand (rows × ncols+1) and keeps per-group
    * state proportional to column cardinality — the one measured
    * scale-killer in this repo (2.51× time growth on 10× data). The HLL
    * sketch is constant-size (rsd 1.5% ≈ a few KB per column) and fully
    * mergeable, so this plan drops the Expand entirely: one plain
    * partial+final aggregate pass at any table size. No DuckDB oracle
    * (sketch estimates are engine-specific); InspectSpec bounds the
    * error against the exact twin instead. */
  def tableProfileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.015): DataFrame = {
    val wide = df.agg(
      count(lit(1)).as("__n"),
      (cols.zipWithIndex.flatMap { case (c, i) => Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$i"),
        approx_count_distinct(col(c), rsd).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
      }): _*)
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      val esc = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$esc', __n, __nulls_$i, __nd_$i, __min_$i, __max_$i"
    }.mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stacked) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
      .orderBy("column_name")
  }

  /** The REGISTERED gate form of [[tableProfileApprox]]: the HLL
    * estimate is engine-specific, but its error contract is checkable
    * in-engine — run the exact profile AND the sketch profile, join
    * their per-column rows, and emit a deterministic `approx_ok`
    * boolean (|approx − exact| ≤ max(1, relTol·exact); relTol = 5σ of
    * the sketch's rsd). The emitted row is the exact profile + the
    * boolean, all DuckDB-reproducible, so a sketch drifting out of its
    * guarantee turns the gate row red. Two SEPARATE aggregation
    * passes + a 4-row broadcast join deliberately: folding
    * `countDistinct` and the HLL into ONE aggregate triggers Spark's
    * multi-distinct Expand rewrite, which evaluates every non-distinct
    * aggregate — including the KB-sized HLL buffer — once per
    * (distinct-value, gid) group under a SortAggregate (measured 50s
    * vs ~3s at sf0.1 for this 4-column profile). The exact pass is
    * still paid on purpose: this is the verification harness; the
    * 100 TB serving shape remains the Expand-free
    * [[tableProfileApprox]]. */
  def tableProfileApproxGate(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.015, relTol: Double = 0.075): DataFrame = {
    val exact = tableProfile(df, cols)
    val approx = tableProfileApprox(df, cols, rsd)
      .select(col("column_name"), col("n_distinct").as("__approx_nd"))
    exact.join(broadcast(approx), Seq("column_name"))
      .withColumn("approx_ok",
        abs(col("__approx_nd") - col("n_distinct")).cast("double") <=
          greatest(lit(1.0),
            lit(relTol) * col("n_distinct").cast("double")))
      .drop("__approx_nd")
      .orderBy("column_name")
  }

  /** Registered gate twin of [[ordersProfile]] — exact profile plus the
    * in-engine-audited HLL bound boolean (see
    * [[tableProfileApproxGate]]). */
  def ordersProfileApproxGate(spark: SparkSession, dir: String): DataFrame =
    tableProfileApproxGate(fanOut(t(spark, dir, "orders")),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  /** Referential-integrity audit across the star schema: orphan counts
    * for every FK relation, in ONE pass per fact table. The correlated
    * NOT-EXISTS form (which the oracle keeps) would be one anti-join —
    * and one fact scan — per relation; instead each fact table is
    * scanned once, left-joined to bare key projections of its parents,
    * and the per-relation orphan counts are conditional sums over the
    * null-ness flags in a single aggregate. Dims stay un-forced
    * (AQE broadcasts what fits; `orders` is data-scaled and shuffles). */
  def fkViolations(spark: SparkSession, dir: String): DataFrame = {
    def keyOf(table: String, c: String, flag: String): DataFrame =
      t(spark, dir, table).select(col(c)).distinct()
        .withColumn(flag, lit(true))
    val li = fanOut(t(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey"))
      .join(keyOf("orders", "o_orderkey", "__o"),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(keyOf("part", "p_partkey", "__p"),
        col("l_partkey") === col("p_partkey"), "left")
      .join(keyOf("supplier", "s_suppkey", "__s"),
        col("l_suppkey") === col("s_suppkey"), "left")
      // coalesce: an EMPTY fact table must report 0 orphans (matching
      // the NOT EXISTS oracle form), not sum()'s NULL-on-no-rows
      .agg(coalesce(sum(col("__o").isNull.cast("long")), lit(0L))
          .as("li_orders"),
        coalesce(sum(col("__p").isNull.cast("long")), lit(0L)).as("li_part"),
        coalesce(sum(col("__s").isNull.cast("long")), lit(0L))
          .as("li_supplier"))
    val ord = t(spark, dir, "orders").select("o_custkey")
      .join(keyOf("customer", "c_custkey", "__c"),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(coalesce(sum(col("__c").isNull.cast("long")), lit(0L))
        .as("ord_customer"))
    val wide = li.crossJoin(ord)
    wide.selectExpr("stack(4, " +
        "'lineitem->orders', li_orders, 'lineitem->part', li_part, " +
        "'lineitem->supplier', li_supplier, 'orders->customer', ord_customer" +
        ") AS (relation, n_orphans)")
      .orderBy("relation")
  }

  /** Fixed-width numeric histogram: bucket = floor(value / width).
    * Pure map + one partial+final count aggregate; floor of a double
    * division is bit-identical across engines, so the bucketing — and
    * the oracle — is exact. */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / lit(width)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        graft.util.Tables.dsum(col(valueCol)).as("sum_value"))
      .orderBy("bucket")

  /** Registered 25k-wide histogram of order prices (~20 buckets at the
    * testdata's price range). */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame =
    histogram(t(spark, dir, "orders"), "o_totalprice", 25000.0)

  /** Registered profile over the orders table's non-double columns
    * (double min/max render differently across engines; their VALUES
    * are exact — see q1's decimal sums — only the string form differs). */
  def ordersProfile(spark: SparkSession, dir: String): DataFrame =
    tableProfile(fanOut(t(spark, dir, "orders")),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  /** Registered HLL twin of [[ordersProfile]] — the shape that runs at
    * 100 TB (rows-only in the gate; InspectSpec asserts <5% relative
    * distinct error vs the exact twin). */
  def ordersProfileApprox(spark: SparkSession, dir: String): DataFrame =
    tableProfileApprox(fanOut(t(spark, dir, "orders")),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  /** One declarative data-quality expectation: `metric` must satisfy
    * `metric <= threshold` (every common constraint — null ratio,
    * out-of-domain count, duplicate count — normalizes to "violations
    * ≤ bound", with 0 for hard constraints). */
  final case class Expect(name: String, metric: Column, threshold: Double)

  /** Declarative one-pass data-quality audit — the validation gate a
    * pipeline runs before consuming a table. ALL expectation metrics
    * are computed in a SINGLE aggregate over one scan (violation
    * counts are conditional sums that fold into the same partial agg;
    * the one `countDistinct` pins uniqueness via the standard Expand
    * plan), then unpivoted to one row per expectation with its
    * measured metric and pass/fail. At 100 TB this is one pass over
    * the table however many expectations are declared — running each
    * check as its own query would scan the lake once per rule.
    * Metrics are exact integer counts carried as doubles (≤ 2^53), so
    * the DuckDB oracle reproduces them bit-for-bit.
    *
    * NULL-safety: a `sum(when(...))` metric over ZERO input rows is
    * NULL, which would make the verdict neither green nor red —
    * metrics coalesce to 0 ("no violations observed"), so an empty
    * table fails only the expectations that exist to catch emptiness.
    * The unpivot is built from struct LITERALS (no SQL-text
    * interpolation), so names need no escaping and non-finite
    * thresholds (NaN/±Inf) are legal values, not parse errors. */
  def dqAudit(df: DataFrame, expects: Seq[Expect]): DataFrame = {
    require(expects.nonEmpty, "dqAudit: no expectations given")
    val wide = df.agg(
      coalesce(expects.head.metric.cast("double"), lit(0.0)).as("__m_0"),
      expects.tail.zipWithIndex.map { case (e, i) =>
        coalesce(e.metric.cast("double"), lit(0.0)).as(s"__m_${i + 1}")
      }: _*)
    val rows = expects.zipWithIndex.map { case (e, i) =>
      struct(
        lit(e.name).as("check_name"),
        col(s"__m_$i").as("metric"),
        lit(e.threshold).as("threshold"))
    }
    wide.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.metric"), col("r.threshold"))
      .withColumn("pass", col("metric") <= col("threshold"))
      .orderBy("check_name")
  }

  /** Registered audit (`dq_audit`) over orders: row presence, pk
    * uniqueness, completeness, value range, status domain, date
    * envelope — the table's contract as one green/red frame. */
  def ordersDqAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    dqAudit(o, Seq(
      // hard floor on volume: violations = max(0, 1 - n)
      Expect("a_nonempty",
        when(count(lit(1)) >= 1, lit(0L)).otherwise(lit(1L)), 0),
      Expect("b_pk_unique",
        count(lit(1)) - countDistinct(col("o_orderkey")), 0),
      Expect("c_price_complete",
        count(lit(1)) - count(col("o_totalprice")), 0),
      Expect("d_price_positive",
        sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)), 0),
      Expect("e_status_domain",
        sum(when(not(col("o_orderstatus").isin("O", "F", "P")), 1L)
          .otherwise(0L)), 0),
      Expect("f_date_envelope",
        sum(when(
          col("o_orderdate").cast("date") < to_date(lit("1990-01-01")) ||
          col("o_orderdate").cast("date") > to_date(lit("2005-12-31")), 1L)
          .otherwise(0L)), 0),
      // a NULL date passes the envelope comparisons vacuously — the
      // range gate needs its own completeness expectation
      Expect("g_date_complete",
        count(lit(1)) - count(col("o_orderdate")), 0)))
  }

  /** X94 — event-volume anomaly detection (the telemetry-QC twin of
    * the DQ audit: "did some event type spike or die yesterday?"):
    * per (event_type, day) counts z-scored against that type's own
    * daily series — population mean/variance from EXACT integer sums
    * (Σn, Σn², k), so `mean`, `var`, `sd` and every `z` are single
    * IEEE-exact double ops both engines reproduce bit-for-bit (no
    * decimal accumulator needed: the sums are BIGINTs; the house
    * `ln`-free discipline applies — sqrt IS correctly-rounded IEEE).
    * Constant series (var = 0, via the exact-int identity k·Σn² = Σn²·k
    * ⇔ all equal) are guarded BEFORE sqrt: a tiny negative var from
    * `msq − mean²` rounding would otherwise go NaN, and Spark and SQL
    * engines disagree on NaN comparison semantics — the one
    * cross-engine trap in this operator.
    *
    * Output keeps EVERY bucket (z + flag, |z| ≥ [[AnomalyZ]]), so the
    * result is a monitoring series, not just the alert rows.
    *
    * Scale shape: one map-side-combined (type, day) count agg, one
    * type-keyed stats agg (type-bounded), broadcast the stats back,
    * per-row z projection. At 100 TB of events the bucket agg is the
    * only corpus-sized term. */
  val AnomalyZ = 2.5

  def eventAnomaly(spark: SparkSession, dir: String): DataFrame =
    eventAnomalyFrom(t(spark, dir, "events"))

  /** [[eventAnomaly]] over an arbitrary (event_type, ts) relation —
    * specs plant spike/constant/two-bucket series here. */
  private[graft] def eventAnomalyFrom(events: DataFrame): DataFrame = {
    // checkpoint at the BUCKET boundary ((type × day)-bounded — tiny):
    // stats and the join-back both read it, so the corpus-sized events
    // scan runs exactly once
    val buckets = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // Σn² accumulates in DECIMAL(38,0): a long×long square overflows
    // (silently, non-ANSI) once one (type, day) bucket passes ~3.04e9
    // events — exactly the "100 TB of events" bucket mass this
    // operator exists for — while DuckDB promotes to HUGEINT. The
    // decimal square keeps both engines exact to 1e38; the one cast
    // to double below is then correctly rounded from the same exact
    // integer on both sides.
    val stats = buckets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("sn"),
        sum(col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)"))
          .as("snn"))
    val mean = col("sn").cast("double") / col("k").cast("double")
    val msq = col("snn").cast("double") / col("k").cast("double")
    buckets.join(broadcast(stats), Seq("event_type"))
      .withColumn("mean", mean)
      .withColumn("vr", msq - (mean * mean))
      .withColumn("z",
        when(col("vr") > 0.0,
          (col("n").cast("double") - col("mean")) / sqrt(col("vr")))
          .otherwise(lit(0.0)))
      .select(col("event_type"),
        unix_micros(col("day")).as("day_us"),
        col("n"), col("mean"), col("z"),
        (col("vr") > 0.0 && abs(col("z")) >= AnomalyZ).as("is_anomaly"))
      .orderBy("event_type", "day_us")
  }
}
