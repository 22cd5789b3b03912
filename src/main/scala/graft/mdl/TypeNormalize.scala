package graft.mdl

/** Raw warehouse type → canonical type-string normalization — the
  * reference's `wren/src/wren/type_mapping.py:26-60` (sqlglot's
  * `parse_one(into=DataType).sql()`), table-driven here: per-dialect alias
  * maps to sqlglot's canonical spellings, parenthesized arguments preserved
  * (re-joined `", "`-separated like sqlglot prints them), ClickHouse's
  * `Nullable(T)` unwrapped, and anything unrecognized falls through
  * UNCHANGED — the reference's graceful-fallback contract, so an exotic
  * type never breaks a schema import.
  */
object TypeNormalize {

  /** sqlglot canonical names for the cross-dialect common core. */
  private val Common: Map[String, String] = Map(
    "varchar" -> "VARCHAR", "character varying" -> "VARCHAR",
    "char" -> "CHAR", "character" -> "CHAR",
    "text" -> "TEXT", "string" -> "TEXT",
    "int" -> "INT", "integer" -> "INT",
    "bigint" -> "BIGINT", "smallint" -> "SMALLINT", "tinyint" -> "TINYINT",
    "decimal" -> "DECIMAL", "numeric" -> "DECIMAL",
    "float" -> "FLOAT", "real" -> "FLOAT",
    "double" -> "DOUBLE", "double precision" -> "DOUBLE",
    "boolean" -> "BOOLEAN", "bool" -> "BOOLEAN",
    "date" -> "DATE", "time" -> "TIME",
    "timestamp" -> "TIMESTAMP",
    "timestamp without time zone" -> "TIMESTAMP",
    "timestamptz" -> "TIMESTAMPTZ",
    "timestamp with time zone" -> "TIMESTAMPTZ",
    "datetime" -> "DATETIME",
    "json" -> "JSON", "jsonb" -> "JSONB", "uuid" -> "UUID",
    "binary" -> "BINARY", "varbinary" -> "VARBINARY",
    "bytea" -> "VARBINARY", "blob" -> "BLOB", "interval" -> "INTERVAL")

  private val PerDialect: Map[String, Map[String, String]] = Map(
    "postgres" -> Map(
      "int2" -> "SMALLINT", "int4" -> "INT", "int8" -> "BIGINT",
      "float4" -> "FLOAT", "float8" -> "DOUBLE", "serial" -> "SERIAL",
      "bigserial" -> "BIGSERIAL"),
    "redshift" -> Map(
      "int2" -> "SMALLINT", "int4" -> "INT", "int8" -> "BIGINT",
      "float4" -> "FLOAT", "float8" -> "DOUBLE", "super" -> "SUPER"),
    "bigquery" -> Map(
      "int64" -> "BIGINT", "float64" -> "DOUBLE", "bytes" -> "VARBINARY",
      "bignumeric" -> "BIGDECIMAL", "struct" -> "STRUCT", "array" -> "ARRAY"),
    "clickhouse" -> Map(
      "int8" -> "TINYINT", "int16" -> "SMALLINT", "int32" -> "INT",
      "int64" -> "BIGINT",
      "uint8" -> "UTINYINT", "uint16" -> "USMALLINT", "uint32" -> "UINT",
      "uint64" -> "UBIGINT",
      "float32" -> "FLOAT", "float64" -> "DOUBLE",
      "datetime64" -> "DATETIME64", "fixedstring" -> "FIXEDSTRING",
      "lowcardinality" -> "LOWCARDINALITY"),
    "mysql" -> Map(
      "mediumint" -> "MEDIUMINT", "longtext" -> "LONGTEXT",
      "mediumtext" -> "MEDIUMTEXT", "tinytext" -> "TINYTEXT",
      "longblob" -> "LONGBLOB", "mediumblob" -> "MEDIUMBLOB"),
    "mssql" -> Map(
      "bit" -> "BIT", "nvarchar" -> "NVARCHAR", "nchar" -> "NCHAR",
      "datetime2" -> "TIMESTAMP", "datetimeoffset" -> "TIMESTAMPTZ",
      "uniqueidentifier" -> "UUID", "money" -> "MONEY"),
    "oracle" -> Map(
      "varchar2" -> "VARCHAR", "nvarchar2" -> "NVARCHAR",
      "number" -> "DECIMAL", "binary_float" -> "FLOAT",
      "binary_double" -> "DOUBLE", "clob" -> "TEXT", "raw" -> "VARBINARY"),
    "snowflake" -> Map(
      "number" -> "DECIMAL", "float8" -> "DOUBLE", "variant" -> "VARIANT",
      "object" -> "OBJECT"))

  private val Shape = raw"^\s*([A-Za-z0-9_ ]+?)\s*(?:\(\s*(.*?)\s*\))?\s*$$".r

  /** Normalize one raw type string for a dialect; unknown shapes fall back
    * to the input verbatim (never an exception).
    */
  def parseType(typeStr: String, dialect: String): String = {
    if (typeStr == null || typeStr.isEmpty) return typeStr
    val aliases = Common ++ PerDialect.getOrElse(dialect.toLowerCase, Map.empty)
    typeStr match {
      case Shape(name, args) =>
        val key = name.trim.toLowerCase.replaceAll("\\s+", " ")
        // ClickHouse Nullable(T): unwrap and normalize T (sqlglot does the
        // same — nullability is not part of the canonical type)
        if (key == "nullable" && args != null)
          return parseType(args, dialect)
        aliases.get(key) match {
          case None => typeStr
          case Some(canon) =>
            if (args == null || args.isEmpty) canon
            else {
              val parts = args.split(",").map(_.trim).filter(_.nonEmpty)
              // non-numeric args (STRUCT fields, enum values) pass through
              // only when they re-render losslessly; else fall back whole
              if (parts.forall(_.forall(c => c.isDigit)))
                s"$canon(${parts.mkString(", ")})"
              else typeStr
            }
        }
      case _ => typeStr
    }
  }

  /** Batch form: adds `"type"` to each column map, never mutating the input
    * (type_mapping.py:45-60).
    */
  def parseTypes(
      columns: Seq[Map[String, Any]], dialect: String,
      typeField: String = "raw_type"): Seq[Map[String, Any]] =
    columns.map { c =>
      c + ("type" -> parseType(c.get(typeField).map(_.toString).getOrElse(""), dialect))
    }
}
