package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Driver contract: exactly (sfDir, outDir). Extra args are a local
    // convenience: restrict the dump to the named queries.
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession installs the engine conf INCLUDING the
    // SparkSessionExtensions (sql_native_dot resolves float_dot from
    // SQL text — a bare builder would have no such function).
    val spark = graft.util.GraftSession
      .builder("graft-verify", Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must become a LOUD RED ROW, never a silently
    // shrunk artifact: round 7's testdata drift made 16 queries error
    // out and they simply vanished from CORRECTNESS (105 entries, zero
    // recorded failures — green at a glance). Now a failure writes an
    // error-marker parquet in the query's slot — one row, columns
    // `__query_error__`/`__message__` — which can never match any
    // oracle's schema, so the driver's compare records an explicit
    // mismatch row; `_errors.json` aggregates the messages.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // A FILTERED re-run first carries over the existing record for
    // queries OUTSIDE the filter: their error-marker parquets still
    // occupy their slots, and dropping their entries would downgrade
    // a later full check.py from the recorded exception to a generic
    // schema mismatch. Entries for the queries being re-run are
    // dropped (they're about to be refreshed either way) — and so are
    // keys no longer in the registry: a stale entry for a renamed or
    // removed query would otherwise feed check.py's no-oracle-slot
    // loop a spurious FAIL that no re-run of existing queries clears.
    if (only.nonEmpty) {
      val registered = SparkEntry.registry.map(_._1).toSet
      val p = Paths.get(s"$outDir/_errors.json")
      if (Files.exists(p)) try {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(Files.readString(p),
            classOf[java.util.LinkedHashMap[String, String]])
        m.forEach((k, v) =>
          if (!only(k) && registered(k)) errors(k) = v)
      } catch { case _: Throwable => () } // unreadable → start clean
    }
    // Clear any stale error record up front: an interrupted prior run
    // must not make a later compare FAIL slots that now hold fresh
    // passing output. (The summary is rewritten after every failure
    // below — and once at the end if carried-over entries remain — so
    // even an interrupted run leaves it accurate.)
    Files.deleteIfExists(Paths.get(s"$outDir/_errors.json"))
    def writeErrors(): Unit = {
      val json = errors
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/_errors.json"), json)
    }
    if (errors.nonEmpty) writeErrors()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name FAILED: $msg")
        errors(name) = msg
        writeErrors()
        // Marker write is best-effort: if the environment is broken
        // enough that even this write throws, the remaining queries
        // must still run and the artifacts still land.
        try {
          import spark.implicits._
          Seq((name, msg)).toDF("__query_error__", "__message__")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name: marker write also " +
            s"failed: ${m.getMessage}")
        }
      }
    }
    // A filtered run writes only the filtered oracles: check.py iterates
    // oracle keys, so a full oracle file over a partial dump would
    // compare stale or missing parquet.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    writeErrors()
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} QUERIES FAILED: " +
        errors.keys.mkString(", "))
    spark.stop()
  }
}
