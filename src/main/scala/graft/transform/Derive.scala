package graft.transform

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
