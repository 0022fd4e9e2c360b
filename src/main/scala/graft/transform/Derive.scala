package graft.transform

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType,
  TimestampNTZType, TimestampType}

/** Row-level derivations P1–P5 (SURVEY.md §2.2). */
object Derive {

  /** P1 — config-driven projection (FInal/load_script.py:189-191).
    * Missing columns fail analysis, as in the reference (delegated). */
  def project(df: DataFrame, selectColumns: Option[Seq[String]]): DataFrame =
    selectColumns match {
      case Some(cols) if cols.nonEmpty => df.select(cols.map(col): _*)
      case _ => df
    }

  private val V1DatePattern = raw"(\d{8})".r.unanchored

  /** P3/P4 — filename→`dt` derivation. Primary rule is v2's
    * `file.split("/")[-1].split("_")[-1].split(".")[0]`
    * (FInal/load_script.py:207-208); when that does not yield 8 digits we
    * fall back to v1's anywhere-in-key `(\d{8})` regex and finally to
    * `"unknown"` (generic_load_script.py:120-126; decision SURVEY §2.9.7). */
  def dtFromFileName(filePath: String): String = {
    val v2 = filePath.split("/").last.split("_").last.split("\\.").head
    val eight =
      if (v2.length == 8 && v2.forall(_.isDigit)) Some(v2)
      else V1DatePattern.findFirstMatchIn(filePath).map(_.group(1))
    eight.map(d => s"${d.take(4)}-${d.slice(4, 6)}-${d.drop(6)}")
      .getOrElse("unknown")
  }

  /** Declarative per-column timestamp normalization (TableConfig's
    * `timestamp_normalize` map) — the ingest-side twin of
    * `Tables.normalizeEventTs`. Each configured column becomes a
    * session-TZ TimestampType in the CURATED zone (landing stays raw)
    * whatever the feed encodes:
    *  - integer columns: epoch in the declared unit
    *    (seconds/millis/micros/nanos), converted in INTEGER space
    *    (nanos exceed 2^53 — double math would corrupt them);
    *  - `auto` on integers: per-row magnitude dispatch — epoch values
    *    for 1973–2200 occupy disjoint decades per unit (seconds ~1e8..,
    *    millis ~1e11.., micros ~1e14.., nanos ~1e17..), so a CASE over
    *    abs(v) picks the unit; codegen'd `when` chain, no UDF, no
    *    driver peek;
    *  - string columns: SQL timestamp cast (ISO-8601 / `yyyy-MM-dd
    *    HH:mm:ss`), which both engines parse identically under UTC;
    *  - timestamp columns: NTZ reinterpreted as an instant (identity
    *    under the UTC session), instants passed through.
    * Unknown units are rejected at config parse (TableConfig). */
  def normalizeTimestamps(df: DataFrame,
      spec: Seq[(String, String)]): DataFrame =
    spec.foldLeft(df) { case (acc, (name, unit)) =>
      // Named early error: a typo'd/projected-away column would
      // otherwise surface as Spark's generic schema error deep inside
      // the load (after the landing write) or per-micro-batch.
      if (!acc.columns.contains(name)) throw new IllegalArgumentException(
        s"timestamp_normalize: column $name not present after " +
          s"projection (available: ${acc.columns.mkString(", ")})")
      // All integer-space (never `/`, which is DOUBLE division in
      // Spark SQL — a nano epoch ~1.7e18 rounds to ±256 ns as a
      // double, off-by-one micros after scaling). Widen FIRST: an
      // IntegerType seconds epoch times 1000000 would overflow in int
      // arithmetic (non-ANSI = silent wrap). The nanos branch is
      // FLOOR division (mod-correction), not `DIV`: DuckDB's `//`
      // floors, so negative sub-micro nano epochs would otherwise
      // land 1 µs apart across engines; identical for epochs ≥ 0.
      def usOf(q: String): String = unit match {
        case "seconds" => s"$q * 1000000"
        case "millis"  => s"$q * 1000"
        case "micros"  => q
        case "nanos"   => s"($q - ((($q % 1000) + 1000) % 1000)) DIV 1000"
        case "auto"    => graft.util.Tables.epochMicrosSql(q)
      }
      val esc = "`" + name.replace("`", "``") + "`"
      acc.schema(name).dataType match {
        case TimestampType => acc
        case TimestampNTZType =>
          acc.withColumn(name, col(name).cast(TimestampType))
        case StringType =>
          // v1 all-string mode carries the SAME feed: a numeric string
          // is an epoch in the declared unit (a plain timestamp cast
          // would NULL it silently); anything else is a textual
          // timestamp. TRY_CAST keeps the dispatch per-row.
          acc.withColumn(name, expr(s"""CASE
            WHEN TRY_CAST($esc AS BIGINT) IS NOT NULL
            THEN timestamp_micros(${usOf(s"TRY_CAST($esc AS BIGINT)")})
            ELSE CAST($esc AS TIMESTAMP) END"""))
        case LongType | IntegerType =>
          acc.withColumn(name,
            expr(s"timestamp_micros(${usOf(s"CAST($esc AS BIGINT)")})"))
        case other => throw new IllegalArgumentException(
          s"timestamp_normalize: column $name has unsupported source " +
            s"type $other (expected integer epoch, string, or timestamp)")
      }
    }

  /** P2 — constant `dt` partition column (FInal/load_script.py:212). */
  def withDt(df: DataFrame, dt: String): DataFrame =
    df.withColumn("dt", lit(dt))

  /** P5 — audit/metadata columns (FInal/load_script.py:213-216). The
    * clock is injectable so oracle-paired runs are deterministic; None
    * means wall-clock `current_timestamp()` like the reference. */
  def withAudit(df: DataFrame, actor: String = "graft-spark",
      clock: Option[Timestamp] = None): DataFrame = {
    val ts = clock.map(t => lit(t).cast("timestamp"))
      .getOrElse(current_timestamp())
    df.withColumn("updt_nm", lit(actor))
      .withColumn("cret_nm", lit(actor))
      .withColumn("cret_ts", ts)
      .withColumn("updt_ts", ts)
  }
}
