package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables.{t, dsum, davg}

/** Relational analytics extension operators (SURVEY.md §2.8 X6–X15).
  *
  * All plans are declarative DataFrame compositions — Catalyst handles
  * predicate pushdown, column pruning, partial aggregation and join
  * selection. Small dimensions (region/nation/supplier) are explicitly
  * broadcast; fact-fact joins shuffle on their keys and rely on AQE for
  * skew at scale.
  */
object Analytics {

  /** X7 — grouped aggregation, TPC-H Q1 shape (pricing summary).
    * Partial+final hash agg; scan prunes to 8 of 11 columns and pushes
    * the shipdate filter into the parquet reader. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** X6 + join — top-10 revenue orders (TPC-H Q3 shape).
    * customer is a fact-scaled table, so NO broadcast hint on it — AQE
    * picks broadcast at small SF and SMJ/shuffled-hash at scale from the
    * runtime size estimate. orders⨝lineitem shuffles on orderkey; final
    * top-k is TakeOrderedAndProject (per-partition heap, no global sort)
    * — the 100 TB-safe top-k. */
  def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** X7 + multi-join — revenue by nation (TPC-H Q5 shape). Constant-size
    * dimensions (nation=25, region=5 rows at every SF) are broadcast;
    * customer is data-scaled so its join is left to AQE (broadcast at
    * small SF, shuffle join at 100 TB); single shuffle for the group-by. */
  def q5RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region")
    val nation = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** X7 + 4-way join — revenue by supplier nation × part brand (TPC-H
    * Q9 shape, over the tables this schema provides). part and supplier
    * are data-scaled (no broadcast hint — AQE decides); nation is
    * constant-size and broadcast; the p_size filter pushes into the
    * part scan. */
  def q9RevenueByNationBrand(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val part = t(spark, dir, "part")
      .filter(col("p_size") >= 25)
      .select("p_partkey", "p_brand")
    val supp = t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nation = t(spark, dir, "nation")
    li.join(part, li("l_partkey") === part("p_partkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name", "p_brand")
  }

  /** X6 — pure top-k with a total-order tie-breaker. */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** X8 — rollup over the region→nation hierarchy (customer counts +
    * account balance). Expand+agg; grand-total rows carry nulls. */
  def rollupNation(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    cust
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** X8 — cube over orderstatus × orderpriority. */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** X1 — exact deduplication (distinct on a projection). Physical plan
    * is partial+final hash aggregate — no driver state, AQE-skew-safe. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_orderkey")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus", "l_orderkey")

  /** X2 — keep-latest dedup: newest order per customer
    * (generalizes the reference's J1 upsert to N-version input,
    * generic_load_script.py:158-164). Single shuffle on the partition
    * key; row_number is streamed within each sorted partition. */
  def dedupKeepLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey")
  }

  /** X9 — window analytics on the events table: per-user ordered
    * lag/rank/running sum. One shuffle on user_id. */
  def windowEvents(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("run_value",
        graft.util.Tables.decToDouble(
          sum(col("value").cast("decimal(30,8)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"),
        col("event_type"), col("prev_type"), col("run_value"))
      .orderBy("user_id", "rn")
  }

  /** X10 — tumbling event-time window (batch form of the streaming
    * groupBy(window(...)); the streaming twin lives in
    * [[graft.streaming.StreamingOps.tumblingCounts]]). */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("w_start_us", "event_type")

  /** X10 — SLIDING (hopping) event-time windows: 1-hour windows every
    * 15 minutes, so each event contributes to 4 overlapping windows.
    * Spark's `window(ts, len, slide)` plans this as a generator (one
    * row per covering window) feeding a normal partial+final aggregate
    * — the 4× row expansion happens map-side, pre-combine, so the
    * shuffle still carries only (window, type) partials. The oracle
    * reproduces the expansion with an explicit 0..3 hop join. */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("w_start_us", "event_type")

  /** X10 — session windows via gaps-and-islands (30-minute gap): the
    * stateless batch formulation; the stateful streaming twin is
    * session_window() under Structured Streaming. Same SQL algorithm
    * runs in the DuckDB oracle — two independent implementations. */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapSec = 30 * 60
    t(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapSec * 1000000L,
          lit(1)).otherwise(lit(0)))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("sess_start_us"),
        unix_micros(max(col("ts"))).as("sess_end_us"),
        dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "sess_id")
  }

  /** X11 — set operations: customer nations present in BUILDING segment
    * but absent from MACHINERY (EXCEPT), and present in both (INTERSECT). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    def seg(s: String) =
      cust.filter(col("c_mktsegment") === s).select(col("c_nationkey"))
    val only = seg("BUILDING").except(seg("MACHINERY"))
      .withColumn("tag", lit("building_only"))
    val both = seg("BUILDING").intersect(seg("MACHINERY"))
      .withColumn("tag", lit("both"))
    only.unionByName(both).orderBy("tag", "c_nationkey")
  }

  /** X12 — left-semi: customers that have at least one order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders").select("o_custkey")
    t(spark, dir, "customer")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** X12 — left-anti: customers with no 1998 orders (the relational core
    * of the reference's MERGE, generic_load_script.py:158-164). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select("o_custkey")
    t(spark, dir, "customer")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** X13 — as-of join: for each event, the latest order of the same user
    * placed at-or-before the event time (DuckDB twin: ASOF JOIN).
    *
    * Implementation: union-then-window merge. Events and orders are
    * tagged and unioned on a common schema, then ONE window per user in
    * (time, kind, orderkey) order carries the last-seen order forward
    * (`last(..., ignoreNulls)`); event rows read the carry. Orders sort
    * before events at equal timestamps, so an order placed exactly at the
    * event time qualifies (at-or-before); among equal-time orders the
    * highest orderkey wins — matching the oracle's
    * `row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC)`.
    *
    * Scale: a single shuffle on user_id and linear work per row — no
    * intermediate events×orders fan-out, unlike the naive range-predicate
    * equi-join whose cardinality is quadratic per user. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("ts").as("t"), lit(1).as("kind"),
        col("event_id"),
        lit(null).cast("long").as("ok"),
        lit(null).cast("timestamp").as("od"))
    // o_orderdate is parquet TIMESTAMP_NTZ; session TZ is UTC so the
    // cast to instant-typed timestamp is lossless.
    val ord = t(spark, dir, "orders")
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("t"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey").as("ok"),
        col("o_orderdate").cast("timestamp").as("od"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("kind"), col("ok"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.unionByName(ord)
      .withColumn("carry",
        last(when(col("kind") === 0, struct(col("od"), col("ok"))),
          ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"),
        col("carry.ok").as("asof_orderkey"),
        unix_micros(col("carry.od")).as("asof_orderdate_us"))
      .orderBy("event_id")
  }

  /** X14 — JSON scalar functions over events.props. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** X7 — distinct-counting aggregation (exact). The plan is the
    * two-phase expand+agg Catalyst generates for multiple DISTINCT
    * aggregates; at 100 TB swap exact distincts for
    * approx_count_distinct (HLL sketch, exercised in AnalyticsSpec —
    * approx results are not cross-engine comparable). */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"))
      .orderBy("o_orderstatus")

  /** X8 — grouping sets (non-hierarchical: per-status totals and
    * per-priority totals computed in one expand+agg pass). */
  def groupingSetsOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** X11 — multiset EXCEPT ALL: customer keys' order multiplicities
    * minus their post-1998 multiplicities; aggregated for a
    * deterministic comparison (proves bag, not set, semantics). */
  def exceptAllOrders(spark: SparkSession, dir: String): DataFrame = {
    val all = t(spark, dir, "orders").select("o_custkey")
    val recent = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select("o_custkey")
    all.exceptAll(recent)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_pre98"))
      .orderBy("o_custkey")
  }

  /** X14 — the fuller JSON scalar surface: from_json with an explicit
    * schema and the json_tuple generator (complementing
    * [[jsonExtract]]'s get_json_object). */
  def jsonFunctions(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k_struct"),
        json_tuple(col("props"), "k").as("k_tuple"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k_struct")).as("sum_k"),
        count(col("k_tuple")).as("n_tuple"),
        min(col("k_tuple").cast("int")).as("min_k"),
        max(col("k_tuple").cast("int")).as("max_k"))
      .orderBy("event_type")

  /** X9b — sessionized conversion funnel: per user session (30-minute
    * gap), did a `view` precede a `click`, and did that `click` precede
    * a `purchase`? One shuffle on user_id for the sessionization window
    * (shared with sessionWindow), then a per-session min-timestamp
    * comparison — the standard ordered-funnel formulation that avoids
    * self-joins entirely. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    val sessions = t(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs,
          lit(1)).otherwise(lit(0)))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    def firstTs(tpe: String) =
      min(when(col("event_type") === tpe, unix_micros(col("ts"))))
    val perSession = sessions
      .groupBy(col("user_id"), col("sess_id"))
      .agg(firstTs("view").as("t_view"),
        firstTs("click").as("t_click"),
        firstTs("purchase").as("t_purchase"))
      .select(
        col("user_id"), col("sess_id"),
        col("t_view").isNotNull.as("has_view"),
        (col("t_click") > col("t_view")).as("clicked_after_view"),
        (col("t_purchase") > col("t_click")).as("purchased_after_click"))
    perSession
      .agg(
        count(lit(1)).as("n_sessions"),
        count(when(col("has_view"), 1)).as("n_view"),
        count(when(col("clicked_after_view"), 1)).as("n_view_click"),
        count(when(col("clicked_after_view") &&
          col("purchased_after_click"), 1)).as("n_view_click_purchase"))
  }

  /** X15 — date/string/math scalar suite over orders. */
  def scalarSuite(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        unix_micros(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_eoy"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        upper(substring(col("o_orderpriority"), 1, 4)).as("prio4"),
        col("o_totalprice").cast("decimal(18,1)").cast("double").as("price_r1"),
        abs(col("o_totalprice") - lit(100000.0)).as("dist_100k"),
        floor(col("o_totalprice") / 1000.0).cast("long").as("price_kbin"))
      .orderBy("o_orderkey")

  /** X7/X12 + 6-way join — bilateral shipping volume between two
    * nations by year (TPC-H Q7 shape): lineitem⨝supplier⨝orders⨝
    * customer, nation joined twice under different roles. Both nation
    * dims are pre-filtered to the two nations of interest and joined
    * EARLY on their fact side (supplier before orders, customer right
    * after its key appears), so the selective inner joins drop ~23/25
    * of fact rows before the widest join runs — at 100 TB that is the
    * difference between shuffling the full lineitem⨝orders product and
    * ~8% of it. The residual pair filter only removes the (A,A)/(B,B)
    * combos. Nation broadcasts are constant-size at every SF; fact-side
    * joins shuffle on their keys and are AQE-planned. */
  def q7VolumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    val supp = t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ord = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val nation = t(spark, dir, "nation")
      .filter(col("n_name").isin(nationA, nationB))
    val sn = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val cn = nation.select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(sn), supp("s_nationkey") === col("sn_key"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(cn), cust("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB)
        || (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** X6/X7 — top customers by revenue lost to returned items in one
    * quarter (TPC-H Q10 shape). The returnflag and date filters push
    * into the fact scans; final top-20 is TakeOrderedAndProject. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .select("o_orderkey", "o_custkey")
    val cust = t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    val nation = t(spark, dir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** X7 + group-filter-join-back — large-quantity orders (TPC-H Q18
    * shape): aggregate lineitem by order, HAVING on the sum, then join
    * the surviving (rare) orders back to their header and customer.
    * The having-filtered aggregate is tiny relative to the fact table,
    * so AQE broadcasts it into the join-back — the anti-pattern this
    * replaces is joining FIRST and filtering after. */
  def q18LargeOrders(spark: SparkSession, dir: String,
      minQty: Double = 300.0): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = t(spark, dir, "customer").select("c_custkey", "c_name")
    big.join(ord, big("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        // parquet o_orderdate is TIMESTAMP_NTZ; session is pinned UTC,
        // so the ltz cast is wall-clock identity (matches epoch_us)
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  /** X7 + outer join over pre-aggregation — customer order-count
    * distribution (TPC-H Q13 shape). Orders are aggregated to
    * (custkey, count) BEFORE the join, so the customer join sees one
    * row per active customer instead of every order — at 100 TB the
    * shuffle carries the pre-aggregated counts (map-side combined),
    * not the fact table. Customers with no qualifying orders come back
    * via the left join as count 0. Second aggregate (the distribution)
    * groups a customer-sized input down to a handful of rows. */
  def q13OrderDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    t(spark, dir, "customer").select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** X12 + scalar-subquery broadcast — dormant above-average customers
    * by nation (TPC-H Q22 shape): customers whose balance exceeds the
    * positive-balance average and who placed no orders on/after the
    * cutoff. The global average is a 1-row aggregate cross-joined in
    * (Catalyst broadcasts it — no shuffle); dormancy is a left-anti
    * join against the date-filtered orders (the filter pushes into the
    * orders scan, so the anti join's build side shrinks with the
    * cutoff). The threshold compare is done in decimal with bounded
    * precision — `bal * n_pos > sum_pos` instead of `bal > avg` — so
    * no engine-specific decimal division exists to diverge: products
    * and sums of DECIMAL(12,2)×DECIMAL(10,0) are exact in both
    * engines. */
  def q22DormantRich(spark: SparkSession, dir: String,
      cutoff: String = "1999-01-01"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cust = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val pos = cust.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast(DecimalType(12, 2))).as("sum_pos"),
        count(lit(1)).cast(DecimalType(10, 0)).as("n_pos"))
    val active = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(cutoff))
      .select(col("o_custkey"))
    cust.join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(pos))
      .filter(col("c_acctbal").cast(DecimalType(12, 2)) * col("n_pos")
        > col("sum_pos"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_nationkey")
  }

  /** X7 under a hot key — two-phase salted aggregation over events
    * (Skew.saltedAgg): partial sums per (event_type, salt) spread a
    * hot event_type across reducers, then partials re-aggregate by the
    * real key. Decimal accumulation keeps the regrouped sum EXACTLY
    * equal to a direct one (decimal addition is associative — doubles
    * aren't), so the salted plan is oracle-checked against the plain
    * GROUP BY it replaces. */
  def skewAgg(spark: SparkSession, dir: String, nSalts: Int = 16): DataFrame = {
    import graft.util.{Skew, Tables}
    Skew.saltedAgg(
      t(spark, dir, "events").select(col("event_type"), col("value")),
      keys = Seq("event_type"), nSalts = nSalts,
      partialAggs = Seq(
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 8)))
          .as("psum"),
        count(lit(1)).as("pn")),
      finalAggs = Seq(
        Tables.decToDouble(sum(col("psum"))).as("sum_value"),
        sum(col("pn")).as("n_events")))
      .orderBy("event_type")
  }

  /** Salted shuffle join (Skew.saltedJoin) registered end-to-end: the
    * big side's rows get a content-derived salt, the small side is
    * replicated once per salt, and the join runs on (key, salt) — a
    * hot key's rows land on nSalts reducers instead of one. The
    * fixture's event types are near-uniform (SkewSpec exercises the
    * skewed case on synthetic data); what the oracle pins is the
    * salting CONTRACT — the salted join's result is exactly the plain
    * join's, so the mitigation can be dropped into any hot-key join
    * without changing answers. The small side here is a 5-row literal
    * weights dim, the worst case for replication cost (×nSalts of
    * almost nothing). */
  def skewJoin(spark: SparkSession, dir: String, nSalts: Int = 16): DataFrame = {
    import spark.implicits._
    val weights = Seq(
      ("click", 1.0), ("view", 0.5), ("purchase", 10.0),
      ("signup", 5.0), ("error", 0.0))
      .toDF("event_type", "weight")
    val events = t(spark, dir, "events")
      .select(col("event_type"), col("value"))
    graft.util.Skew.saltedJoin(events, weights,
        keys = Seq("event_type"), nSalts = nSalts)
      .groupBy(col("event_type"))
      .agg(
        dsum(col("value") * col("weight")).as("weighted_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  // ---- X107: event-sequence mining -------------------------------------

  /** Top-k cut of the path spectrum — deep enough to see past the
    * head, bounded for the presentation. */
  val PathTopK = 20

  /** X107 — event-SEQUENCE mining: the most common 3-step event-type
    * paths across all user timelines — the DISCOVERY twin of the
    * fixed-pattern X9b funnel (the funnel asks "how many users walked
    * THE path"; this asks "which paths do users actually walk", the
    * relation funnels are designed from). Per user, events order by
    * (ts, event_id — the unique tiebreak both engines replay), each
    * consecutive triple contributes one `a > b > c` path, and the
    * global top-[[PathTopK]] is cut by (count DESC, path ASC) — a
    * total order.
    *
    * Scale shape: one user-keyed window (per-user timelines are
    * bounded; the lead pair rides ONE window spec → one exchange),
    * then a map-side-combined path count — the path domain is
    * |event_types|³-bounded, so the final agg and the top-k sort are
    * tiny at any corpus size. */
  def eventPaths(spark: SparkSession, dir: String): DataFrame =
    eventPathsFrom(t(spark, dir, "events"))

  /** [[eventPaths]] over an arbitrary events relation — specs plant
    * hand-ordered timelines here. */
  private[graft] def eventPathsFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(" > ", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(PathTopK)
  }
}
