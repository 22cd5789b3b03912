package graft.mdl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's test_map_data_type (logical_plan/utils.rs:461-559). */
class TypeMapperSpec extends AnyFunSuite {

  private val cases: Seq[(String, DataType)] = Seq(
    "bool" -> BooleanType, "BOOLEAN" -> BooleanType,
    "tinyint" -> ByteType, "int2" -> ShortType, "smallint" -> ShortType,
    "int4" -> IntegerType, "int" -> IntegerType, "integer" -> IntegerType,
    "int8" -> LongType, "bigint" -> LongType,
    "utinyint" -> ShortType, "usmallint" -> IntegerType,
    "ubigint" -> DecimalType(20, 0), "uint64" -> DecimalType(20, 0),
    "numeric" -> DecimalType(38, 10), "decimal" -> DecimalType(38, 10),
    "decimal(18,2)" -> DecimalType(18, 2),
    "varchar" -> StringType, "char" -> StringType, "bpchar" -> StringType,
    "text" -> StringType, "string" -> StringType, "name" -> StringType,
    "float4" -> FloatType, "real" -> FloatType, "float" -> FloatType,
    "float8" -> DoubleType, "double" -> DoubleType,
    "timestamp" -> TimestampNTZType, "datetime" -> TimestampNTZType,
    "timestamptz" -> TimestampType,
    "timestamp with time zone" -> TimestampType,
    "date" -> DateType, "date32" -> DateType,
    "interval" -> DayTimeIntervalType(),
    "json" -> StringType, "uuid" -> StringType, "inet" -> StringType,
    "bytea" -> BinaryType, "blob" -> BinaryType, "varbinary" -> BinaryType,
    "time" -> StringType, "null" -> NullType,
    "hugeint" -> DecimalType(38, 0),
    // Utf8 fallback for unknown types (utils.rs:102-107)
    "no_such_type" -> StringType,
    // arrays: recursive + bare default
    "array<int64>" -> ArrayType(LongType),
    "array<array<varchar>>" -> ArrayType(ArrayType(StringType)),
    "array" -> ArrayType(StringType), "list" -> ArrayType(StringType))

  cases.foreach { case (mdl, expected) =>
    test(s"$mdl -> $expected") { assert(TypeMapper.toSpark(mdl) == expected) }
  }

  test("struct with named fields") {
    assert(TypeMapper.toSpark("struct<name string, age int>") ==
      StructType(Seq(StructField("name", StringType), StructField("age", IntegerType))))
  }

  test("anonymous struct fields become c0, c1 (utils.rs:62-91)") {
    assert(TypeMapper.toSpark("struct<string, int>") ==
      StructType(Seq(StructField("c0", StringType), StructField("c1", IntegerType))))
  }

  test("nested struct in array") {
    assert(TypeMapper.toSpark("array<struct<x double, y double>>") ==
      ArrayType(StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))))
  }
}
