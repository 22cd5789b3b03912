package graft.api

import org.json4s._

/** The per-datasource SQL-knowledge blob that agent layers (MCP clients, text-to-SQL
  * assistants) fetch before generating queries — the Spark-native analogue of the
  * reference's `GET /{ds}/knowledge` route and `app/mdl/knowledge.py` resource
  * loader (text-to-SQL rule + topic instructions + correction rule, with an optional
  * per-dialect note). Content here describes THIS engine: Spark SQL semantics over a
  * deployed semantic manifest.
  */
object SqlKnowledge {

  private val textToSqlRule =
    """You are querying a semantic layer, not a raw database. A deployed manifest
      |(MDL) defines models, columns (possibly expression-backed or calculated),
      |relationships, and views; write SQL against MODEL and VIEW names only, never
      |against the underlying physical table references.
      |
      |The SQL dialect is Spark SQL (ANSI-leaning). Rules:
      |- SELECT statements only; DML/DDL is rejected by the engine policy.
      |- Use only models, views, and columns present in the deployed manifest;
      |  hidden columns and columns denied by column-level access control are not
      |  in the schema and must not be referenced.
      |- Calculated fields and relationship columns are already materialized by the
      |  planner - reference them like ordinary columns instead of re-writing their
      |  joins by hand.
      |- Quote identifiers with backticks (Spark style) when they contain special
      |  characters; double-quoted strings are string literals unless ANSI mode
      |  says otherwise.
      |- Prefer explicit column lists over SELECT * so limit pushdown and column
      |  pruning stay effective.""".stripMargin

  private val sqlCorrectionRule =
    """When a query fails, correct it with the error category in mind:
      |- UNRESOLVED_COLUMN / TABLE_OR_VIEW_NOT_FOUND: the name is not in the
      |  manifest - re-check model and column spelling against the metadata routes.
      |- Access-denied errors name the blocked column; remove it rather than
      |  aliasing around it.
      |- Type errors: Spark is stricter than DuckDB/Postgres about implicit casts -
      |  add explicit CAST(expr AS type).
      |- Window errors: frame clauses require an ORDER BY in the window spec.
      |Re-run through dry-run (dryRun=true) to validate before executing.""".stripMargin

  private val instructions: Seq[(String, String)] = Seq(
    "calculated_field" ->
      """Calculated fields are declared in the manifest and expanded by the planner
        |(to-one chains become joins; to-many aggregates pre-aggregate then join
        |back on the primary key). Query them as plain columns; do not re-implement
        |their joins.""".stripMargin,
    "date_and_time_functionality" ->
      """Timestamps are microsecond precision in the session timezone (set per query
        |via the x-wren-timezone header). Use date_trunc(unit, ts), date_bin for
        |fixed-width bins, and make_date/make_timestamp constructors. Intervals use
        |INTERVAL '1' DAY syntax.""".stripMargin,
    "array_usage" ->
      """Arrays are first-class: array(1,2,3), element_at(arr, i) (1-based),
        |explode(arr) in a LATERAL VIEW or SELECT, and higher-order functions
        |transform/filter/aggregate/zip_with with lambda syntax x -> expr.""".stripMargin,
    "semi_structured_type" ->
      """JSON strings are queried with get_json_object(col, '$.path') or
        |from_json(col, schema); json_as_* casts and json_is_* predicates from the
        |engine's function registry mirror the reference's JSON helpers.""".stripMargin,
    "structured_type" ->
      """Structs use dotted access (col.field). named_struct builds them inline;
        |star-expand with col.* in a SELECT.""".stripMargin)

  /** Dialect note per declared datasource family. The engine executes everything on
    * Spark, so the note explains how the source's types/pushdown surface through a
    * Spark scan rather than a remote dialect's quirks.
    */
  private def dialectNote(ds: String): Option[(String, String)] = {
    val d = ds.toLowerCase
    val note =
      if (d.contains("spark") || d == "local_file" || d == "localfile")
        Some("""Execution is native Spark: parquet/CSV/JSON scans with predicate
               |pushdown and column pruning; nothing is transpiled.""".stripMargin)
      else if (d.contains("postgres") || d.contains("mysql") || d.contains("mssql") ||
        d.contains("oracle") || d.contains("redshift") || d.contains("doris") ||
        d.contains("trino") || d.contains("clickhouse") || d.contains("snowflake"))
        Some("""This source is read through a partitioned JDBC scan; filters on
               |partitioning columns prune remote reads. Types map through the JDBC
               |driver - prefer ANSI types in casts.""".stripMargin)
      else if (d.contains("s3") || d.contains("gcs") || d.contains("minio"))
        Some("""Object-store files are read through Hadoop FileSystem connectors with
               |per-bucket credentials; partition-directory layouts prune by filter.""".stripMargin)
      else None
    note.map(n => s"dialect_$d" -> n)
  }

  def forDataSource(ds: String): JObject = JObject(
    "text_to_sql_rule" -> JString(textToSqlRule),
    "instructions" -> JObject(
      (instructions ++ dialectNote(ds)).map { case (k, v) => k -> (JString(v): JValue) }.toList),
    "sql_correction_rule" -> JString(sqlCorrectionRule))
}
