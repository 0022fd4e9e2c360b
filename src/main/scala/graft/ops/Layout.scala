package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables.{t, dsum, pathTag}

/** Data-layout operators — the write-side half of scan performance at
  * 100 TB. Partition pruning and clustering decide how much of the
  * lake a query READS; no amount of join/agg tuning recovers a scan
  * that touched 100× too many files.
  *
  *  - [[dppScan]]: a date-partitioned store queried through a join
  *    against a small derived dim — Spark injects DYNAMIC partition
  *    pruning (the partition list is only known at run time, from the
  *    dim's rows), so the fact scan reads the 3 matching day
  *    directories instead of 30. The lake pattern: facts partitioned
  *    by ingest date, dims selecting the dates that matter.
  *  - [[zorderBox]]: a space-filling-curve clustered store. Both box
  *    dimensions (user, day) are interleaved into a z-value; the top
  *    bits form quadtree cells that become PHYSICAL partitions, the
  *    full z-value sorts rows within files (row-group locality). A
  *    2-D box predicate prunes to the cells its rectangle intersects
  *    — neither dimension alone could prune a linear layout by both
  *    constraints. Same mechanism as Delta/Iceberg Z-ORDER
  *    clustering, expressed with plain partitioned parquet.
  *
  * Both stores are written ONCE per (session, sf dir) under
  * `target/graft_layout/` and reused (`_SUCCESS`-gated, like the
  * bucketed tables); a cluster deployment pays the layout write once
  * per ingest batch, then every downstream query prunes.
  */
object Layout {

  private def root = "target/graft_layout"

  private def exists(spark: SparkSession, path: String): Boolean =
    graft.util.Tables.successExists(spark, path)

  /** Store paths embed the source's listing fingerprint
    * ([[graft.util.Tables.listingTag]]) so a store from a previous
    * data generation self-invalidates instead of being reused. */
  private def sourceTag(spark: SparkSession, dir: String): String =
    graft.util.Tables.listingTag(spark, s"$dir/events.parquet")

  // ---------------------------------------------------------------
  // Dynamic partition pruning
  // ---------------------------------------------------------------

  /** Events re-laid-out partitioned by event date (30 directories).
    * Returns the store path ([[sourceTag]]-keyed, self-invalidating). */
  private def eventsByDay(spark: SparkSession, dir: String): String = {
    val out = s"$root/events_dt_${pathTag(dir)}_${sourceTag(spark, dir)}"
    if (!exists(spark, out)) {
      t(spark, dir, "events")
        .withColumn("dt", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("dt").parquet(out)
    }
    out
  }

  /** The 3 busiest purchase days, by EXACT decimal revenue (double
    * sums are partition-order-dependent; decimal makes the top-3
    * selection deterministic and lets DuckDB reproduce it). The
    * trailing `revenue > 0` filter marks the dim side selective. */
  private def hotDays(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dt"))
      .agg(dsum(col("value")).as("revenue"))
      .orderBy(col("revenue").desc, col("dt"))
      .limit(3)
      .filter(col("revenue") > 0.0)

  /** Registered query (`dpp_scan`): per-day event stats for the top-3
    * purchase-revenue days, read from the dt-partitioned store via a
    * join on dt. The partition list exists only in the dim's ROWS, so
    * only dynamic pruning can skip directories — LayoutSpec asserts
    * the `dynamicpruning` expression in the fact scan's partition
    * filters. Oracle = the same semi-join on the RAW parquet. */
  def dppScan(spark: SparkSession, dir: String): DataFrame = {
    graft.util.Tables.ensureSessionConf(spark)
    val store = spark.read.parquet(eventsByDay(spark, dir))
    store
      .join(hotDays(spark, dir).select(col("dt")), "dt")
      .groupBy(col("dt"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("dt"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("sum_value"), col("n_users"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // Z-order clustering
  // ---------------------------------------------------------------

  /** Grid resolution: 8 bits per dimension (256×256 cells for the
    * full z-value); the top [[CellBits]] bits of the z-value (2 per
    * dimension → 16 quadtree cells) become physical partitions. At
    * 100 TB the cell count scales with the file-count budget; the
    * in-file z-sort keeps row groups prunable below directory level
    * whatever the cell count. */
  private val DimBits = 8
  private val CellBits = 4

  /** Interleave two `DimBits`-bit grid coordinates: bit i of gx lands
    * on z bit 2i, bit i of gy on 2i+1 (built from shift/and/or
    * columns — codegen'd, no UDF). */
  private def zInterleave(gx: Column, gy: Column): Column =
    (0 until DimBits).map { i =>
      val xbit = shiftleft(shiftright(gx, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftright(gy, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xbit.bitwiseOR(ybit)
    }.reduce(_ bitwiseOR _)

  /** Data-derived layout bounds (integer math throughout so the
    * DuckDB oracle and the Scala cell enumeration agree exactly). */
  private case class Bounds(umin: Long, umax: Long,
      dmin: java.sql.Date, days: Long)

  private def bounds(spark: SparkSession, dir: String): Bounds = {
    val r = t(spark, dir, "events")
      .agg(min(col("user_id")), max(col("user_id")),
        min(to_date(col("ts"))), max(to_date(col("ts")))).head()
    val dmin = r.getDate(2)
    val days = (r.getDate(3).toLocalDate.toEpochDay -
      dmin.toLocalDate.toEpochDay) + 1
    Bounds(r.getLong(0), r.getLong(1), dmin, days)
  }

  /** Scale a value in [0, extent) to a DimBits-bit grid coordinate.
    * Spark's `/` is double division; floor-then-cast matches
    * [[gridOf]]'s truncating long division bit-for-bit only while the
    * quotient's double rounding can never cross an integer boundary.
    * The quotient is ≤ 2^DimBits (=256, ~2^-45 relative error as a
    * double), so its absolute error stays below 1 only for
    * extent < ~2^45 — NOT 2^53: past that, a boundary row's cell could
    * differ from the driver-side enumeration and rows would silently
    * vanish from box scans. `require` pins the invariant (user-id
    * spans and day counts are far inside it; a wider domain must remap
    * to offsets first, as the callers already do). */
  private def gridCoord(v: Column, extent: Long): Column = {
    require(extent > 0 && extent < (1L << 45),
      s"gridCoord extent $extent outside (0, 2^45): double-division " +
        "floor no longer matches integer division bit-for-bit")
    floor(v * lit(1L << DimBits) / lit(extent)).cast("long")
  }

  private def gridOf(v: Long, extent: Long): Long =
    v * (1L << DimBits) / extent

  /** Events clustered by z-value: partitioned by quadtree cell,
    * z-sorted within files. Written once per (session, dir). */
  private def eventsZOrdered(spark: SparkSession, dir: String,
      b: Bounds): String = {
    // sourceTag covers the stored z16/z_cell validity too: bounds are
    // a pure function of the data, so any refresh that could move them
    // changes the listing fingerprint
    val out = s"$root/events_z_${pathTag(dir)}_${sourceTag(spark, dir)}"
    if (!exists(spark, out)) {
      val gx = gridCoord(col("user_id") - lit(b.umin), b.umax - b.umin + 1)
      val gy = gridCoord(
        datediff(to_date(col("ts")), lit(b.dmin)).cast("long"), b.days)
      t(spark, dir, "events")
        .withColumn("z16", zInterleave(gx, gy))
        .withColumn("z_cell",
          shiftright(col("z16"), 2 * DimBits - CellBits))
        .repartition(col("z_cell"))
        .sortWithinPartitions(col("z16"))
        .write.mode("overwrite").partitionBy("z_cell").parquet(out)
    }
    out
  }

  /** Cells whose quadrant intersects the box [uxlo,uxhi]×[dylo,dyhi]
    * (grid coords, inclusive). Driver-side loop over 2^CellBits cells
    * — bounded by the layout constant, never by data. */
  private[ops] def selectCells(
      gxlo: Long, gxhi: Long, gylo: Long, gyhi: Long): Seq[Int] = {
    val quadShift = DimBits - CellBits / 2 // grid bits per quadrant edge
    (0 until (1 << CellBits)).filter { c =>
      // z bits (CellBits-1 .. 0) = [gy_hi gx_hi gy_lo gx_lo]
      val qx = ((c >> 2) & 1) << 1 | (c & 1)
      val qy = ((c >> 3) & 1) << 1 | ((c >> 1) & 1)
      val (cxlo, cxhi) = (qx.toLong << quadShift, ((qx + 1).toLong << quadShift) - 1)
      val (cylo, cyhi) = (qy.toLong << quadShift, ((qy + 1).toLong << quadShift) - 1)
      cxlo <= gxhi && gxlo <= cxhi && cylo <= gyhi && gylo <= cyhi
    }
  }

  /** The registered box: the second user-quartile on days 10–19 of
    * the month. User bounds are RELATIVE to the data (user counts
    * scale with sf; integer math the DuckDB oracle reproduces with
    * `//`); the 30-day span is fixture-constant, so day indices are
    * absolute. */
  private def boxU(b: Bounds): (Long, Long) = {
    val uext = b.umax - b.umin + 1
    (b.umin + uext / 4, b.umin + uext / 2 - 1)
  }
  private val BoxDLo = 9L  // day index from dmin, inclusive
  private val BoxDHi = 18L

  /** Registered query (`zorder_box`): a 2-D box scan over the
    * z-clustered store — the cell list prunes partitions statically
    * (LayoutSpec pins ≤6 of 16 cells and the `z_cell IN` partition
    * filter), the residual predicate exacts the box, and the result
    * equals the same WHERE on the raw table (the oracle). */
  def zorderBox(spark: SparkSession, dir: String): DataFrame = {
    graft.util.Tables.ensureSessionConf(spark)
    val b = bounds(spark, dir)
    val store = spark.read.parquet(eventsZOrdered(spark, dir, b))
    val (ulo, uhi) = boxU(b)
    val cells = cellsFor(b)
    val dt = to_date(col("ts"))
    store
      .filter(col("z_cell").isin(cells: _*))
      .filter(col("user_id").between(ulo, uhi) &&
        datediff(dt, lit(b.dmin)).between(BoxDLo, BoxDHi))
      .groupBy(date_format(dt, "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("day"))
  }

  /** The cell list the registered box prunes to for these bounds. */
  private def cellsFor(b: Bounds): Seq[Int] = {
    val uext = b.umax - b.umin + 1
    val (ulo, uhi) = boxU(b)
    selectCells(
      gridOf(ulo - b.umin, uext),
      gridOf(uhi - b.umin, uext),
      gridOf(math.min(BoxDLo, b.days - 1), b.days),
      gridOf(math.min(BoxDHi, b.days - 1), b.days))
  }

  /** Spec hook: the registered box's cell list for a given sf dir. */
  private[ops] def registeredCells(spark: SparkSession,
      dir: String): Seq[Int] = cellsFor(bounds(spark, dir))
}
