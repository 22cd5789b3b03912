package graft.mdl

import org.apache.spark.sql.types._

/** MDL type string → Spark `DataType`.
  *
  * Follows the reference's Arrow mapping (wren-core/core/src/logical_plan/utils.rs:109-203
  * `map_data_type`), adapted to Spark's type lattice (SURVEY.md §1.2): unsigned ints widen
  * to the next signed type, nanosecond timestamps become microsecond timestamps, `time`
  * has no Spark equivalent (kept as string), and unknown types fall back to StringType
  * (the reference's Utf8 fallback, utils.rs:102-107). `array<T>`/`struct<...>` parse
  * recursively (utils.rs:33-98); anonymous struct fields are named c0, c1, ...
  */
object TypeMapper {

  def toSpark(mdlType: String): DataType = parse(mdlType.trim)

  private def parse(t: String): DataType = {
    val lower = t.toLowerCase
    if (lower.startsWith("array<") && lower.endsWith(">"))
      ArrayType(parse(t.substring(6, t.length - 1)))
    else if (lower == "array" || lower == "list")
      ArrayType(StringType) // bare array defaults to array<varchar> (utils.rs:115-117)
    else if (lower.startsWith("struct<") && lower.endsWith(">"))
      parseStruct(t.substring(7, t.length - 1))
    else if (lower.startsWith("decimal(") || lower.startsWith("numeric(")) {
      val args = t.substring(t.indexOf('(') + 1, t.length - 1).split(',').map(_.trim)
      val p = args(0).toInt
      val s = if (args.length > 1) args(1).toInt else 0
      DecimalType(math.min(p, DecimalType.MAX_PRECISION), math.min(s, DecimalType.MAX_SCALE))
    } else base(lower)
  }

  /** Split struct field list on top-level commas (respecting nested <...> depth). */
  private def splitTopLevel(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '<' => depth += 1; cur += '<'
      case '>' => depth -= 1; cur += '>'
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.toList.map(_.trim).filter(_.nonEmpty)
  }

  private def parseStruct(body: String): StructType = {
    val fields = splitTopLevel(body).zipWithIndex.map { case (f, i) =>
      // "name type" or bare "type" (anonymous → c0, c1, ... per utils.rs:62-91)
      val sp = f.indexOf(' ')
      val isMultiwordType = multiwordTypes.contains(f.toLowerCase)
      val looksNamed = sp > 0 && !isMultiwordType && {
        val head = f.substring(0, sp)
        !head.contains('<') && !head.contains('(')
      }
      if (looksNamed) StructField(f.substring(0, sp).trim, parse(f.substring(sp + 1).trim))
      else StructField(s"c$i", parse(f))
    }
    StructType(fields)
  }

  private val multiwordTypes: Set[String] =
    Set("timestamp with time zone", "time with time zone", "timestamp without time zone")

  private def base(t: String): DataType = t match {
    case "bool" | "boolean" => BooleanType
    case "tinyint" | "int1" => ByteType
    case "int2" | "smallint" | "int16" => ShortType
    case "int4" | "int" | "integer" | "int32" => IntegerType
    case "int8" | "bigint" | "long" | "int64" => LongType
    // unsigned: widen to next signed type (Spark has no unsigned ints)
    case "utinyint" | "uint8" => ShortType
    case "usmallint" | "uint16" => IntegerType
    case "uinteger" | "uint" | "uint32" => LongType
    case "ubigint" | "uint64" => DecimalType(20, 0)
    case "numeric" | "decimal" | "bignumeric" => DecimalType(38, 10) // utils.rs:136-137
    case "varchar" | "char" | "bpchar" | "text" | "string" | "name" => StringType
    case "float4" | "real" | "float" | "float32" => FloatType
    case "float8" | "double" | "float64" => DoubleType
    // ns timestamps truncate to Spark µs precision (documented divergence, SURVEY §1.2)
    case "timestamp" | "datetime" | "datetime64" | "timestamp_ns" => TimestampNTZType
    case s if s.startsWith("timestamptz") || s.startsWith("timestamp with time zone") =>
      TimestampType
    case "date" | "date32" => DateType
    case "interval" => DayTimeIntervalType()
    case "json" | "xml" | "uuid" | "inet" | "unknown" | "any" => StringType
    case "jsonb" | "bytea" | "bytes" | "binary" | "varbinary" | "blob" => BinaryType
    case "time" => StringType // no time-of-day type in Spark
    case "null" => NullType
    case "hugeint" => DecimalType(38, 0)
    case "uhugeint" => DecimalType(38, 0)
    case _ => StringType // Utf8 fallback for unknown types (utils.rs:102-107)
  }
}
