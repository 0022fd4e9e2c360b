package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Per-table JSON load config — the reference's "DDL + query language"
  * (key inventory: SURVEY.md §1.4; /root/reference/FInal/load_script.py:164-175,
  * /root/reference/generic_load_script.py:94-101).
  *
  * `schema` is an ORDERED column→type-name list (JSON object order is
  * field order, matching the CSV column order). When absent, the CSV is
  * read v1-style: header names, every column string
  * (generic_load_script.py:113). When present it is applied as an
  * explicit StructType (FInal/load_script.py:187).
  */
final case class TableConfig(
    schema: Option[Seq[(String, String)]] = None,
    curatedLoadStrategy: String = "append",
    landingLoadStrategy: String = "append",
    primaryKey: Seq[String] = Nil,
    sortColumns: Seq[String] = Nil,
    selectColumns: Option[Seq[String]] = None,
    delimiter: String = ",",
    curatedScript: Option[String] = None,
    curatedTableName: Option[String] = None,
    multiline: Boolean = false,
    timestampNormalize: Seq[(String, String)] = Nil) {

  /** Explicit read schema, when declared. Nullable fields, like the
    * reference's build_schema_from_dict (FInal/load_script.py:42-54). */
  def structType: Option[StructType] = schema.map { cols =>
    StructType(cols.map { case (name, tn) =>
      StructField(name, TableConfig.typeFor(name, tn), nullable = true)
    })
  }
}

object TableConfig {

  /** Type-name → Spark type. The reference supports only IntegerType and
    * StringType and raises on anything else (FInal/load_script.py:43-52);
    * we extend the map (SURVEY.md §1.5) but keep the unknown-type error. */
  def typeFor(col: String, typeName: String): DataType = typeName match {
    case "IntegerType"   => IntegerType
    case "StringType"    => StringType
    case "LongType"      => LongType
    case "DoubleType"    => DoubleType
    case "FloatType"     => FloatType
    case "BooleanType"   => BooleanType
    case "DateType"      => DateType
    case "TimestampType" => TimestampType
    case Decimal(p, s)   => DecimalType(p.toInt, s.toInt)
    case other => throw new IllegalArgumentException(
      s"Unsupported data type: $other for column $col")
  }
  private val Decimal = raw"DecimalType\((\d+),\s*(\d+)\)".r

  private val mapper = new ObjectMapper()

  /** Parse a config JSON document. Unknown keys are ignored (the
    * reference uses dict.get with defaults). Strategies are
    * lower-cased as in FInal/load_script.py:170-171. */
  def fromJson(json: String): TableConfig = {
    val n = mapper.readTree(json)
    def strList(field: String): Seq[String] = Option(n.get(field)) match {
      case Some(a) if a.isArray => a.elements().asScala.map(_.asText()).toSeq
      case Some(s) if s.isTextual => Seq(s.asText()) // tolerate scalar
      case _ => Nil
    }
    def str(field: String, default: String): String =
      Option(n.get(field)).filter(_.isTextual).map(_.asText()).getOrElse(default)
    def optStr(field: String): Option[String] =
      Option(n.get(field)).filter(_.isTextual).map(_.asText())
    // Iterate (not .asScala on the entry Set, which would reorder):
    // JSON document order IS the CSV column order.
    val schema = Option(n.get("schema")).filter(_.isObject).map { s =>
      s.properties().iterator().asScala
        .map(e => e.getKey -> e.getValue.asText()).toSeq
    }
    val cfg = TableConfig(
      schema = schema,
      curatedLoadStrategy = str("curated_load_strategy", "append").toLowerCase,
      landingLoadStrategy = str("landing_load_strategy", "append").toLowerCase,
      primaryKey = strList("primary_key"),
      sortColumns = strList("sort_column"),
      selectColumns = Option(n.get("select_columns")).filter(_.isArray)
        .map(a => a.elements().asScala.map(_.asText()).toSeq),
      delimiter = str("delimiter", ","),
      curatedScript = optStr("curated_script"),
      curatedTableName = optStr("curated_table_name"),
      // Opt-in per table: multiline quoted fields make the file
      // NON-SPLITTABLE (one scan task per file), so it must never be a
      // global default at 100 TB — tables that need it pay for it.
      multiline = Option(n.get("multiline")).exists(_.asBoolean(false)),
      // `timestamp_normalize`: column → source unit
      // (seconds|millis|micros|nanos|auto). Declares which curated
      // columns are event times and what the feed encodes them as, so
      // a source flipping its epoch unit is a CONFIG edit, not a code
      // change — the lesson of the events.ts parquet-unit drift that
      // broke 16 queries (Tables.normalizeEventTs is the read-side
      // twin of this ingest-side capability). Validated eagerly: a
      // typo'd unit fails at config parse, not mid-load.
      // DOMAIN of `auto`: the per-row magnitude dispatch assumes
      // epochs in 1973–2200 (the units' decades are disjoint there) —
      // a pre-1973 millis value classifies as seconds, and numeric
      // strings that aren't epochs at all (e.g. yyyymmdd) classify as
      // seconds too. Feeds with such values must declare the explicit
      // unit instead of `auto`.
      timestampNormalize = Option(n.get("timestamp_normalize"))
        .filter(_.isObject).map { o =>
          o.properties().iterator().asScala
            .map(e => e.getKey -> e.getValue.asText().toLowerCase).toSeq
        }.getOrElse(Nil).map { case (c, u) =>
          if (!TimestampUnits(u)) throw new IllegalArgumentException(
            s"Unsupported timestamp unit: $u for column $c " +
              s"(expected one of ${TimestampUnits.mkString("/")})")
          c -> u
        })
    // Cross-field validation at parse time: with a declared schema, a
    // normalize entry naming an unknown column is a config typo — fail
    // here with the column named, not mid-load after the landing write.
    for (cols <- cfg.schema) {
      val known = cols.map(_._1).toSet
      val missing = cfg.timestampNormalize.collect {
        case (c, _) if !known(c) => c }
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"timestamp_normalize names columns absent from schema: " +
          s"${missing.mkString(", ")}")
    }
    cfg
  }

  val TimestampUnits: Set[String] =
    Set("seconds", "millis", "micros", "nanos", "auto")

  def fromFile(path: String): TableConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
