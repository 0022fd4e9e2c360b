package graft.config

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TableConfigSpec extends AnyFunSuite {

  test("full config parses with schema field order preserved") {
    val cfg = TableConfig.fromJson("""{
      "schema": {"id": "IntegerType", "name": "StringType",
                 "city": "StringType", "bal": "DoubleType"},
      "curated_load_strategy": "Upsert",
      "landing_load_strategy": "OVERWRITE",
      "primary_key": ["id"],
      "sort_column": ["city", "id"],
      "select_columns": ["id", "name"],
      "delimiter": "|",
      "curated_script": "x.py",
      "curated_table_name": "customers_curated"
    }""")
    assert(cfg.schema.get.map(_._1) == Seq("id", "name", "city", "bal"))
    assert(cfg.structType.get == StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("city", StringType), StructField("bal", DoubleType))
      .map(f => f.copy(nullable = true))))
    // strategies lower-cased like the reference (FInal/load_script.py:170)
    assert(cfg.curatedLoadStrategy == "upsert")
    assert(cfg.landingLoadStrategy == "overwrite")
    assert(cfg.primaryKey == Seq("id"))
    assert(cfg.sortColumns == Seq("city", "id"))
    assert(cfg.selectColumns.contains(Seq("id", "name")))
    assert(cfg.delimiter == "|")
    assert(cfg.curatedScript.contains("x.py"))
    assert(cfg.curatedTableName.contains("customers_curated"))
  }

  test("defaults match the reference's dict.get defaults") {
    val cfg = TableConfig.fromJson("{}")
    assert(cfg.schema.isEmpty && cfg.structType.isEmpty)
    assert(cfg.curatedLoadStrategy == "append")
    assert(cfg.landingLoadStrategy == "append")
    assert(cfg.primaryKey.isEmpty && cfg.sortColumns.isEmpty)
    assert(cfg.selectColumns.isEmpty && cfg.delimiter == ",")
  }

  test("unknown type name raises, like build_schema_from_dict") {
    val ex = intercept[IllegalArgumentException] {
      TableConfig.fromJson("""{"schema": {"x": "BlobType"}}""").structType
    }
    assert(ex.getMessage.contains("BlobType"))
    assert(ex.getMessage.contains("x"))
  }

  test("extended type map covers Long/Decimal/Date/Timestamp") {
    assert(TableConfig.typeFor("c", "LongType") == LongType)
    assert(TableConfig.typeFor("c", "DecimalType(12,2)") == DecimalType(12, 2))
    assert(TableConfig.typeFor("c", "DateType") == DateType)
    assert(TableConfig.typeFor("c", "TimestampType") == TimestampType)
  }

  test("timestamp_normalize parses, lower-cases units, defaults empty") {
    val cfg = TableConfig.fromJson("""{
      "timestamp_normalize": {"ev_ms": "Millis", "ev": "AUTO"}}""")
    assert(cfg.timestampNormalize ==
      Seq("ev_ms" -> "millis", "ev" -> "auto"))
    assert(TableConfig.fromJson("{}").timestampNormalize.isEmpty)
  }

  test("timestamp_normalize rejects unknown units at parse time") {
    val ex = intercept[IllegalArgumentException] {
      TableConfig.fromJson(
        """{"timestamp_normalize": {"ev": "fortnights"}}""")
    }
    assert(ex.getMessage.contains("fortnights"))
    assert(ex.getMessage.contains("ev"))
  }

  test("timestamp_normalize naming a column absent from schema fails at parse") {
    val ex = intercept[IllegalArgumentException] {
      TableConfig.fromJson("""{
        "schema": {"id": "IntegerType", "ev_ms": "LongType"},
        "timestamp_normalize": {"ev_mss": "millis"}}""")
    }
    assert(ex.getMessage.contains("ev_mss"))
    // schema-less (v1) configs defer the check to load time
    assert(TableConfig.fromJson(
      """{"timestamp_normalize": {"anything": "auto"}}""")
      .timestampNormalize.nonEmpty)
  }
}
