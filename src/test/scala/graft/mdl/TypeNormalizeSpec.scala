package graft.mdl

import org.scalatest.funsuite.AnyFunSuite

import graft.api.UtilsCli

/** The reference's type-normalization pins (`wren/tests/unit/
  * test_type_mapping.py`) against the table-driven normalizer, plus the
  * `graft utils` CLI surface.
  */
class TypeNormalizeSpec extends AnyFunSuite {
  import TypeNormalize.{parseType, parseTypes}

  test("the reference's parametrized parse_type table") {
    assert(parseType("character varying(255)", "postgres") == "VARCHAR(255)")
    assert(parseType("int8", "postgres") == "BIGINT")
    assert(parseType("INT64", "bigquery") == "BIGINT")
    assert(parseType("STRING", "bigquery") == "TEXT")
    assert(parseType("Nullable(UInt32)", "clickhouse") == "UINT")
    assert(parseType("TIMESTAMP WITH TIME ZONE", "postgres") == "TIMESTAMPTZ")
    assert(parseType("DECIMAL(10,2)", "mysql") == "DECIMAL(10, 2)")
    assert(parseType("my_custom_type", "postgres") == "my_custom_type")
    assert(parseType("", "postgres") == "")
  }

  test("dialect specials and graceful fallbacks") {
    assert(parseType("int8", "clickhouse") == "TINYINT",
      "int8 is a BYTE on ClickHouse but a BIGINT on postgres")
    assert(parseType("Nullable(DECIMAL(10,2))", "clickhouse") == "DECIMAL(10, 2)")
    assert(parseType("number(38,0)", "oracle") == "DECIMAL(38, 0)")
    assert(parseType("varchar2(100)", "oracle") == "VARCHAR(100)")
    assert(parseType("datetimeoffset", "mssql") == "TIMESTAMPTZ")
    assert(parseType("float64", "bigquery") == "DOUBLE")
    assert(parseType("double precision", "redshift") == "DOUBLE")
    // struct-ish arguments don't pretend to canonicalize — verbatim fallback
    assert(parseType("STRUCT<a INT64>", "bigquery") == "STRUCT<a INT64>")
    assert(parseType("Enum8('a' = 1)", "clickhouse") == "Enum8('a' = 1)")
  }

  test("parse_types batch: adds type, custom field, no mutation, empty") {
    val cols = Seq(
      Map[String, Any]("column" -> "id", "raw_type" -> "int8"),
      Map[String, Any]("column" -> "name", "raw_type" -> "character varying"),
      Map[String, Any]("column" -> "total", "raw_type" -> "numeric(10,2)"),
      Map[String, Any]("column" -> "created", "raw_type" -> "TIMESTAMP WITH TIME ZONE"),
      Map[String, Any]("column" -> "flag", "raw_type" -> "boolean"))
    val out = parseTypes(cols, "postgres")
    assert(out.map(_("type")) == Seq(
      "BIGINT", "VARCHAR", "DECIMAL(10, 2)", "TIMESTAMPTZ", "BOOLEAN"))
    assert(!cols.head.contains("type"), "input maps are never mutated")
    assert(parseTypes(Seq(Map("col" -> "x", "data_type" -> "INT64")),
      "bigquery", typeField = "data_type").head("type") == "BIGINT")
    assert(parseTypes(Nil, "postgres") == Nil)
  }

  test("utils CLI: parse-type and parse-types over JSON") {
    assert(UtilsCli.run(Seq("parse-type", "--type", "int8",
      "--dialect", "postgres")) == "BIGINT")
    assert(UtilsCli.run(Seq("parse-type", "--type", "character varying(255)",
      "--dialect", "postgres")) == "VARCHAR(255)")
    assert(UtilsCli.run(Seq("parse-type", "--type", "my_custom_type",
      "--dialect", "postgres")) == "my_custom_type")
    val out = UtilsCli.run(Seq("parse-types", "--dialect", "postgres"),
      stdin = """[{"column": "id", "raw_type": "int8"}]""")
    assert(out.contains("\"type\" : \"BIGINT\"") && out.contains("\"column\" : \"id\""))
    val bad = intercept[IllegalArgumentException] {
      UtilsCli.run(Seq("parse-types", "--dialect", "postgres"), stdin = "not json")
    }
    assert(bad.getMessage.contains("invalid JSON input"))
  }
}
