package graft.semantics

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Logical-plan → SQL-text unparser: the reference's `Mode::Unparse` surface
  * (`wren-core/core/src/mdl/dialect/wren_dialect.rs:41-110`, driven from
  * `mdl/mod.rs:477-541` `transform_sql_with_ctx`), re-expressed over Catalyst.
  * The reference unparses its optimized DataFusion plan to backend SQL so a
  * remote warehouse executes the semantic-layer expansion; here the OPTIMIZED
  * Catalyst plan (models/views/calc fields already expanded, subqueries
  * decorrelated) is rendered to executable SQL in a target dialect:
  *
  *   - `spark`  — self-contained Spark SQL over `parquet.`path`` scans; any bare
  *     Spark session (no deploy, no temp views) can run the text. Expressions
  *     the structural renderer doesn't know fall back to Catalyst's own
  *     `Expression.sql`, so coverage is total for this dialect.
  *   - `duckdb` — ANSI-flavored DuckDB SQL over bare table names (scan paths
  *     reduced to `basename.parquet` → `basename`, the logical-name convention
  *     the reference's unparser also emits); a curated expression subset, with
  *     a clear `UnsupportedOperationException` beyond it (the reference errors
  *     identically on constructs a dialect cannot express).
  *
  * Correct-by-construction naming: every subquery's output column is aliased to
  * the globally unique `c<exprId>`, and every reference renders that name — so
  * self-joins, reused lineage, and column shadowing cannot mis-bind, at the
  * cost of mechanical (not pretty) SQL. The top level re-aliases to the user
  * query's visible names. Unparse is planning-surface work (driver-side, no
  * jobs), so the text length — linear in plan size — is the only cost.
  */
object SqlUnparser {

  def dialectFor(name: String): Dialect =
    name.toLowerCase match {
      // Databricks SQL is Spark SQL (the reference ships both as distinct
      // sqlglot targets, data_source.py:86-87; one dialect serves both here)
      case "spark" | "databricks" => SparkDialect
      case "duckdb" => DuckDbDialect
      case "postgres" | "postgresql" => PostgresDialect
      // the reference routes Doris through its MySQLDialect (inner_dialect.rs:99)
      case "mysql" | "doris" => MySqlDialect
      case "bigquery" => BigQueryDialect
      case "clickhouse" => ClickHouseDialect
      case "snowflake" => SnowflakeDialect
      case "mssql" | "sqlserver" => MsSqlDialect
      case "oracle" => OracleDialect
      // the reference writes Trino for canner (rewriter.py:93-94); Athena's
      // engine is Trino-based and sqlglot's athena target is Trino-derived
      case "trino" | "presto" | "athena" | "canner" => TrinoDialect
      case "redshift" => RedshiftDialect
      // the reference routes its file sources through DuckDB
      // (ibis-server/app/mdl/rewriter.py:94-101), and datafusion SQL's ANSI
      // surface matches the duckdb dialect's emitted subset
      case "local_file" | "s3_file" | "minio_file" | "gcs_file" |
           "datafusion" => DuckDbDialect
      case other => throw new IllegalArgumentException(
        s"unknown unparse dialect '$other' " +
          "(spark|duckdb|postgres|mysql|bigquery|clickhouse|snowflake|mssql" +
          "|oracle|trino|redshift + databricks/doris/athena/canner/" +
          "local_file/s3_file/minio_file/gcs_file/datafusion aliases)")
    }

  /** Render `plan` as executable SQL with final columns named `outputNames`
    * (positionally aligned with `plan.output`).
    */
  def unparse(plan: LogicalPlan, outputNames: Seq[String], dialect: Dialect): String = {
    val g = new Generator(dialect, referencedIds(plan))
    val inner = g.render(plan)
    val outer = plan.output.zip(outputNames).map { case (a, n) =>
      s"${dialect.quote(g.cname(a))} AS ${dialect.quote(dialect.outputAlias(n))}" }
      .mkString(", ")
    s"SELECT $outer FROM ($inner) ${dialect.quote("t_out")}"
  }

  /** Every ExprId the rendered text can name: expression-referenced
    * attributes (recursing into subquery plans), the root output, and the
    * outputs POSITIONAL consumers need whole — UNION ALL branches and
    * DISTINCT's child. Base scans render only these columns, so the emitted
    * SQL never reads a column the query doesn't use — narrower texts, and a
    * CLAC-hidden or grant-revoked column stays out of the remote engine's
    * select list entirely.
    */
  private def referencedIds(root: LogicalPlan): Set[ExprId] = {
    val ids = scala.collection.mutable.Set.empty[ExprId]
    def addExpr(e: Expression): Unit = e.foreach {
      case a: Attribute => ids += a.exprId
      case s: SubqueryExpression => addPlan(s.plan)
      case _ => ()
    }
    def addPlan(p: LogicalPlan): Unit = {
      ids ++= p.output.map(_.exprId)
      p.foreach {
        case u: Union => u.children.foreach(c => ids ++= c.output.map(_.exprId))
        case d: Distinct => ids ++= d.child.output.map(_.exprId)
        case g: Generate => ids ++= g.requiredChildOutput.map(_.exprId)
        case _ => ()
      }
      // relations are excluded: TreeNode.expressions harvests a relation's
      // own `output` field, which would self-mark every scan column as used
      p.foreach {
        case _: LogicalRelation | _: LocalRelation => ()
        case node => node.expressions.foreach(addExpr)
      }
    }
    addPlan(root)
    ids.toSet
  }

  sealed trait Dialect {
    def quote(ident: String): String
    def relation(rootPath: String): String
    def typeName(dt: DataType): String
    def literal(l: Literal): String
    def joinKeyword(jt: JoinType): String
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String
    /** Last-resort rendering for expressions outside the structural subset;
      * `rendered` maps any expression to dialect SQL (for argument recursion).
      */
    def fallback(e: Expression, rendered: Expression => String): String
    /** Scalar function name mapping; None = not expressible. */
    def fnName(prettyName: String): Option[String]
    /** Engines without SEMI/ANTI JOIN syntax (Postgres) render those join
      * types as correlated (NOT) EXISTS instead of a join keyword.
      */
    def semiAntiAsExists: Boolean = false
    /** Rewrite a user-visible output column name the target cannot accept
      * verbatim (BigQuery's flexible-column-name restrictions).
      */
    def outputAlias(name: String): String = name
    /** Row-limit suffix. Engines without LIMIT spell it OFFSET/FETCH (SQL
      * Server additionally requires an ORDER BY for OFFSET, hence the flag)
      * or FETCH FIRST (Oracle).
      */
    def limitSuffix(n: Int, hasOrderBy: Boolean): String = s" LIMIT $n"
    /** Wrap a FROM-less SELECT for engines that require a source (Oracle's
      * dual table).
      */
    def fromless(select: String): String = select
    /** Integer division truncating toward zero (Spark's `div`). Each target
      * spells it differently — and Spark's `div` keyword parses NOWHERE else,
      * so emitting the default into another dialect would fail at execution.
      */
    def integralDivide(l: String, r: String): String = s"($l div $r)"
    /** Remainder: `%` everywhere except Oracle, whose grammar has no modulo
      * operator — `MOD(a, b)`.
      */
    def remainder(l: String, r: String): String = s"($l % $r)"
    /** Whether boolean is a first-class VALUE type (select items, aggregate
      * arguments, sort/group keys). True everywhere except T-SQL — whose
      * comparisons are predicates, not values (only BIT stores truth) — and
      * Oracle, which had no SQL boolean before 23ai. When false the generator
      * renders predicate-shaped booleans in value position via [[boolToValue]]
      * and compares value-shaped booleans with `= 1` in predicate position;
      * the reference's sqlglot targets perform the same rewrite for these
      * engines (tsql/oracle generator boolean handling).
      */
    def booleanAsValue: Boolean = true
    /** Value rendering of a predicate; consulted only when !booleanAsValue.
      * Three-valued: UNKNOWN must stay NULL — collapsing it to 0 would let
      * count() count NULL rows, merge NULL group keys into the FALSE group,
      * and show 0 where Spark shows NULL. `WHEN NOT (pred)` is FALSE exactly
      * when pred is UNKNOWN (NOT NULL = NULL), so the ELSE arm yields NULL.
      */
    def boolToValue(pred: String): String =
      s"(CASE WHEN $pred THEN 1 WHEN NOT ($pred) THEN 0 ELSE NULL END)"
    /** Whether `SELECT *, extra` must qualify the star with the FROM alias
      * (`t.*, extra`). Oracle rejects the unqualified combination outright
      * (ORA-00936); every other engine accepts both forms.
      */
    def qualifiedStarWithItems: Boolean = false
    /** NULL-safe equality (Spark's `<=>`, emitted by decorrelation and
      * null-aware join conditions). ANSI `IS NOT DISTINCT FROM` where the
      * engine parses it; MySQL spells it `<=>`; ClickHouse and Oracle have
      * neither and emulate with a composition that is never NULL — exact
      * even under NOT, since `NULL AND FALSE` is FALSE in 3-valued logic.
      */
    def nullSafeEq(l: String, r: String): String =
      s"($l IS NOT DISTINCT FROM $r)"
    /** The never-NULL emulation for engines with no null-safe-equality
      * syntax at all.
      */
    protected def nullSafeEqEmulated(l: String, r: String): String =
      s"((($l = $r) AND ($l IS NOT NULL) AND ($r IS NOT NULL)) " +
        s"OR (($l IS NULL) AND ($r IS NULL)))"
    /** Appended after an ORDER BY that carries no limit. T-SQL rejects
      * ORDER BY in views/derived tables/subqueries unless TOP, OFFSET or
      * FOR XML accompanies it (error 1033) — and the unparse shape nests
      * every Sort inside the output-renaming wrapper — so its dialect
      * appends `OFFSET 0 ROWS`, a no-op that legalizes the clause.
      */
    def bareOrderBySuffix: String = ""
    /** Whether the engine's LIKE already treats backslash as its escape with
      * no clause (Spark's semantics) AND the clause should therefore be
      * omitted — true only where the grammar has no ESCAPE clause to give
      * (GoogleSQL, ClickHouse) or the text replays on Spark itself. Standard
      * engines (DuckDB, Trino, Snowflake, Oracle, T-SQL) treat a bare
      * pattern backslash as a literal character, so omitting the clause
      * silently changes meaning (measured on DuckDB: `'a_b' LIKE 'a\_b'` is
      * FALSE bare, TRUE with the clause); on the backslash-default engines
      * (Postgres, Redshift, MySQL) the explicit clause is a no-op — emitting
      * it everywhere keeps one exact text shape that every clause-bearing
      * grammar accepts.
      */
    def likeBackslashIsDefaultEscape: Boolean = false
    /** The ESCAPE clause for a given escape character; None = the grammar has
      * no such clause (GoogleSQL, ClickHouse) and a non-default escape must
      * refuse loudly.
      */
    def likeEscapeClause(esc: Char): Option[String] =
      Some(s" ESCAPE ${literal(Literal(esc.toString))}")
    /** Literal LIKE-pattern rewrite hook: T-SQL additionally treats `[...]`
      * as a character class, so a literal `[` must neutralize to `[[]`.
      */
    def likePattern(p: String): String = p
    /** Regex spellings: match PREDICATE, replace-ALL, group extract. None =
      * the engine cannot express it (T-SQL has no regex at all; group
      * extraction where the engine's functions cannot reach the index) and
      * the renderer refuses loudly. Regex FLAVOR (Spark's Java syntax vs
      * RE2 on DuckDB/Trino/BigQuery/ClickHouse vs POSIX ARE on Postgres/
      * Oracle) is name-mapped, not translated — the reference's sqlglot
      * posture; the common class/anchor/quantifier subset agrees.
      */
    def regexpMatch(s: String, p: String): Option[String] = None
    def regexpReplaceAll(s: String, p: String, r: String): Option[String] = None
    def regexpExtract(s: String, p: String, idx: Int): Option[String] = None
    /** split_part(s, delim, n): 1-based literal-delimiter field access with
      * Spark's ''-on-overflow (Spark lowers it to element_at over an internal
      * split). None = no engine spelling with those semantics; negative
      * (from-the-end) indexes always refuse.
      */
    def splitPart(s: String, delim: String, n: Int): Option[String] = None
    /** Bitwise machinery (grouping() lowers to `shiftright(gid, n) & 1` over
      * the Expand-emitted grouping id): infix on the Postgres family, named
      * functions on Trino/Snowflake/ClickHouse, arithmetic identities on
      * engines without any bit syntax (Oracle). Shift counts here are always
      * small non-negative literals over non-negative ids.
      */
    def shiftRight(l: String, r: String): String = s"($l >> $r)"
    def shiftLeft(l: String, r: String): String = s"($l << $r)"
    def bitAnd(l: String, r: String): String = s"($l & $r)"
    def bitOr(l: String, r: String): String = s"($l | $r)"
    /** Aggregate result-type fidelity (the reference's unparser renders
      * type-aware, `wren-core/core/src/mdl/dialect/wren_dialect.rs:141-235`).
      * Spark types integral SUM as BIGINT and AVG/the stat family as DOUBLE;
      * engines that widen (DuckDB's HUGEINT, Postgres/MySQL/Oracle NUMERIC)
      * return a different type for the same call, so an executed result stops
      * matching Spark's schema even when every value agrees. Some(dt) wraps
      * the rendered call in `CAST(.. AS dt)` — a no-op on engines that already
      * agree, a type repair on those that widen.
      */
    def aggResultCast(fn: AggregateFunction): Option[DataType] = None
    /** Ranking window functions (`row_number`/`rank`/`dense_rank`/`ntile`)
      * are INT in Spark but BIGINT on most ANSI engines; engines with a
      * 32-bit integer type cast the whole `fn OVER (spec)` back. None =
      * either the engine agrees or it has no 32-bit type to cast to
      * (BigQuery INT64, Snowflake/Oracle NUMBER, MySQL's CAST sublanguage).
      */
    def rankResultCast: Option[DataType] = None
    /** Cast applied to the aggregate's ARGUMENT, for engines whose native
      * typing loses the VALUE, not just the type: SQL Server's int-typed SUM
      * overflows and its int AVG truncates; MySQL/Snowflake/Redshift integer
      * AVG rounds at a fixed fractional scale. Casting the child to Spark's
      * accumulation type makes the engine compute what Spark computes.
      */
    def aggChildCast(fn: AggregateFunction): Option[DataType] = None
    /** FROM-positioned series table function for Generate(explode(sequence)):
      * `generate_series(start, stop, step)` placed in the FROM clause and
      * column-aliased (Postgres, DuckDB — the identical spelling is what
      * keeps the Postgres text inside DuckDB's executed corpus). None =
      * the engine has no FROM-positioned series; Generate falls back to
      * [[sequenceFn]] + [[explodeCall]]/[[unnestJoin]], then refuses loudly.
      */
    def seriesFrom(start: String, stop: String, step: Option[String]): Option[String] = None
    /** ARRAY-valued rendering of Spark's `sequence(start, stop, step)`
      * (Trino `sequence`, DuckDB `generate_series`, BigQuery's
      * element-typed GENERATE_{,DATE_,TIMESTAMP_}ARRAY family — hence the
      * `et` element type, which most engines ignore). None = no array-series
      * builder for that element type — any OTHER use of the expression
      * refuses loudly rather than emitting a call the engine cannot parse.
      */
    def sequenceFn(start: String, stop: String, step: Option[String],
        et: DataType): Option[String] = None
    /** Set-returning "explode this array" call legal in a SELECT list
      * (DuckDB `unnest`, ClickHouse `arrayJoin`). */
    def explodeCall(arr: String): Option[String] = None
    /** FROM-positioned UNNEST join clause (Trino `CROSS JOIN UNNEST(a) AS
      * t(c)`, BigQuery `CROSS JOIN UNNEST(a) AS c` — no wrapping alias). */
    def unnestJoin(arr: String, alias: String, col: String): Option[String] = None
    /** ANSI interval literal halves (year-month months XOR day-time
      * microseconds; Spark's CalendarInterval folds days into micros).
      * Engines spell these too differently for one default — each opts in;
      * the default refuses loudly like any other unsupported literal.
      */
    def intervalLiteral(months: Long, micros: Long): String =
      throw new UnsupportedOperationException(
        s"${getClass.getSimpleName.stripSuffix("Dialect$").toLowerCase} " +
          "dialect: INTERVAL literal")
    protected def isIntegral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    /** Spark's `split(str, regex)` splits on a REGEX; engines whose split
      * takes a literal delimiter (BigQuery SPLIT, ClickHouse splitByString)
      * can only express the metachar-free unlimited case — extract that
      * delimiter, or None (→ refuse loudly).
      */
    protected def literalDelim(sp: StringSplit): Option[String] =
      (sp.regex, sp.limit) match {
        case (Literal(r, StringType), Literal(-1, IntegerType))
            if r != null && r.toString.nonEmpty &&
              !r.toString.exists("\\^$.|?*+()[]{}".contains(_)) =>
          Some(r.toString.replace("'", "''"))
        case _ => None
      }
    /** stddev/variance names whose Spark result is DOUBLE but whose result on
      * exact-numeric engines (Postgres, Oracle) is NUMERIC for exact inputs.
      */
    protected val statDoubleFns: Set[String] = Set(
      "stddev", "stddev_samp", "stddev_pop", "var_samp", "var_pop", "variance")
    /** The drift pattern shared by the ANSI engines: integral SUM widens
      * (DuckDB HUGEINT, Postgres sum(bigint)→NUMERIC, Snowflake/Oracle
      * NUMBER), decimal SUM/AVG widen to the engine's maximum precision, REAL
      * sums stay REAL where Spark widens float→double, and integer AVG /
      * stddev return exact NUMERIC on some engines where Spark says DOUBLE.
      * Casting back to Spark's result type is a no-op wherever the engine
      * already agrees, so the shared pattern prefers a redundant cast over
      * tracking each engine's full typing matrix.
      */
    protected def ansiAggResultCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case s: Sum => s.dataType match {
          case dt if isIntegral(dt) => Some(LongType)
          case d: DecimalType => Some(d)
          case DoubleType if s.child.dataType == FloatType => Some(DoubleType)
          case _ => None
        }
        case a: Average => a.dataType match {
          case d: DecimalType => Some(d)
          case DoubleType if a.child.dataType != DoubleType => Some(DoubleType)
          case _ => None
        }
        case f if statDoubleFns(f.prettyName.toLowerCase) &&
          f.dataType == DoubleType &&
          f.children.headOption.exists(_.dataType != DoubleType) =>
          Some(DoubleType)
        case _ => None
      }
    /** Dialects preferring ANSI `extract(field FROM x)` over Spark's
      * `year(x)`-style accessors.
      */
    def preferExtract: Boolean = false
    /** Rendering for date-field accessors (year/month/day); None = generic
      * fallback. ClickHouse overrides with its native toYear/toMonth family
      * (the reference's ClickHouseDialect mapping, inner_dialect.rs:470-540).
      */
    def dateField(field: String, child: String): Option[String] =
      if (preferExtract) Some(s"extract($field FROM $child)") else None
    /** One ORDER BY item (possibly several sort keys: engines without NULLS
      * FIRST/LAST syntax emulate the non-native placement with an `IS NULL`
      * prefix key).
      */
    def sortItem(child: String, dir: String, nullsFirst: Boolean): Seq[String] = {
      val n = if (nullsFirst) "NULLS FIRST" else "NULLS LAST"
      Seq(s"$child $dir $n")
    }
    /** Ordered string aggregation; Postgres spells it `string_agg(x, d ORDER
      * BY ...)` where DuckDB accepts the ANSI `listagg(...) WITHIN GROUP`.
      */
    def listAggSql(distinct: String, child: String, delim: String,
        order: Seq[String]): String = {
      val within =
        if (order.isEmpty) "" else s" WITHIN GROUP (ORDER BY ${order.mkString(", ")})"
      s"listagg($distinct$child, $delim)$within"
    }

    /** ANSI-flavored literal rendering shared by the executable-SQL dialects
      * (identical text modulo [[typeName]] spellings in casts).
      */
    /** [[ansiLiteral]] with backslash doubling in string values, for engines
      * whose string parser treats backslash as an escape introducer (MySQL,
      * GoogleSQL, ClickHouse, Snowflake): a raw backslash would corrupt the
      * parsed value — or error outright on GoogleSQL's strict escape set.
      */
    protected def backslashLiteral(l: Literal): String = (l.value, l.dataType) match {
      case (v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        "'" + v.toString.replace("\\", "\\\\").replace("'", "''") + "'"
      case _ => ansiLiteral(l)
    }

    protected def ansiLiteral(l: Literal): String = (l.value, l.dataType) match {
      case (null, NullType) => "NULL"
      case (null, dt) => s"CAST(NULL AS ${typeName(dt)})"
      case (v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        "'" + v.toString.replace("'", "''") + "'"
      case (v: Int, DateType) =>
        s"DATE '${java.time.LocalDate.ofEpochDay(v.toLong)}'"
      case (v: Long, _: TimestampType | _: TimestampNTZType) =>
        val i = java.time.Instant.EPOCH.plus(v, java.time.temporal.ChronoUnit.MICROS)
        val t = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        // explicit 'yyyy-MM-dd HH:mm:ss[.SSSSSS]' — LocalDateTime.toString drops
        // the seconds when zero and uses the ISO 'T', which not every engine parses
        val frac = if (t.getNano == 0) "" else f".${t.getNano / 1000}%06d"
        s"TIMESTAMP '${t.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))}$frac'"
      case (v: Boolean, BooleanType) => if (v) "TRUE" else "FALSE"
      // ANSI interval halves route through the dialect's spelling hook
      // (CalendarInterval folds its days into the micros half)
      case (v: Int, _: YearMonthIntervalType) => intervalLiteral(v.toLong, 0L)
      case (v: Long, _: DayTimeIntervalType) => intervalLiteral(0L, v)
      case (v: org.apache.spark.unsafe.types.CalendarInterval, CalendarIntervalType) =>
        intervalLiteral(v.months.toLong, v.days * 86400000000L + v.microseconds)
      case (v: Decimal, _) => v.toBigDecimal.bigDecimal.toPlainString
      case (v: Double, DoubleType) if !v.isNaN && !v.isInfinite =>
        java.math.BigDecimal.valueOf(v).toPlainString
      case (v, dt) if dt == IntegerType || dt == LongType || dt == ShortType ||
        dt == ByteType => v.toString
      case (v, dt) => throw new UnsupportedOperationException(
        s"${getClass.getSimpleName.stripSuffix("$").toLowerCase}: literal $v: ${dt.sql}")
    }

    /** Spark wraps md5's argument in a STRING→BINARY cast; engines whose MD5
      * takes text directly (BigQuery, ClickHouse, Snowflake) strip it.
      */
    protected def md5Arg(m: Md5): Expression = m.child match {
      case c: Cast if c.dataType == BinaryType &&
        c.child.dataType == StringType => c.child
      case other => other
    }

    /** UNION-ALL rendering for inline VALUES, for engines without a VALUES
      * table constructor (BigQuery, ClickHouse).
      */
    protected def unionAllValues(rows: Seq[String], alias: String,
        cols: Seq[String]): String = {
      val selects = rows.map { row =>
        val vals = row.stripPrefix("(").stripSuffix(")")
        val items = splitTop(vals).zip(cols).map { case (v, c) => s"$v AS ${quote(c)}" }
        fromless(s"SELECT ${items.mkString(", ")}")
      }
      s"(${selects.mkString(" UNION ALL ")}) ${quote(alias)}"
    }
    /** Split a rendered literal tuple on top-level commas (string literals may
      * contain commas; parens nest inside e.g. CAST(NULL AS ...)).
      */
    private def splitTop(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0; var inStr = false; var start = 0; var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 => out += s.substring(start, i).trim; start = i + 1
          case _ =>
        }
        i += 1
      }
      out += s.substring(start).trim
      out.toSeq
    }

    /** The Morton kernel's explicit shift/mask expansion (no engine builtin):
      * children bound once in a correlated scalar-subquery scope, terms
      * referencing the bindings — see the DuckDB dialect notes.
      */
    protected def mortonExpansion(
        z: graft.functions.InterleaveBits, rendered: Expression => String): String = {
      val n = z.children.size
      val mask = (1L << z.bits) - 1
      val binds = z.children.zipWithIndex.map { case (c, d) =>
        s"((${rendered(c)}) & $mask) AS ${quote(s"zb_d$d")}" }.mkString(", ")
      val terms = (0 until n).flatMap { d =>
        (0 until z.bits).map(i =>
          s"(((${quote(s"zb_d$d")} >> $i) & 1) << ${i * n + d})")
      }
      s"(SELECT CAST(${terms.mkString(" + ")} AS BIGINT) " +
        s"FROM (SELECT $binds) ${quote("zb")})"
    }
  }

  object SparkDialect extends Dialect {
    // backslash is already this engine's LIKE escape — no clause needed
    override def likeBackslashIsDefaultEscape: Boolean = true
    def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"
    def relation(rootPath: String): String = s"parquet.${quote(rootPath)}"
    def typeName(dt: DataType): String = dt.sql
    def literal(l: Literal): String = l.dataType match {
      // Literal.sql prints internal ArrayData (UnsafeArrayData@…) for array
      // values the optimizer constant-folded (e.g. sequence(...)); rebuild the
      // array(...) constructor element-wise.
      case ArrayType(et, _) if l.value != null =>
        val arr = l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        "array(" + arr.toObjectArray(et).map(v => literal(Literal(v, et))).mkString(", ") + ")"
      // Spark's string parser treats backslash as an escape introducer, but
      // Literal.sql prints the value RAW — a value containing backslashes
      // (regex \Q..\E quoting, LIKE escapes) would parse back corrupted
      case StringType if l.value != null =>
        "'" + l.value.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
      case _ => l.sql
    }
    override def sequenceFn(start: String, stop: String, step: Option[String],
        et: DataType): Option[String] =
      Some(s"sequence($start, $stop${step.map(", " + _).getOrElse("")})")
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi => "LEFT SEMI JOIN"
      case LeftAnti => "LEFT ANTI JOIN"
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      s"VALUES ${rows.mkString(", ")} AS ${quote(alias)}(${cols.map(quote).mkString(", ")})"
    def fallback(e: Expression, rendered: Expression => String): String = {
      // `.sql` prints internal forms no parser accepts (lambdafunction(...),
      // struct(...) with re-derived field names, stringsplitsql). When the
      // subtree contains one, compose `prettyName(args)` and recurse so the
      // structural renderer handles the internal node; plain subtrees keep
      // Catalyst's own (more faithful) rendering.
      val hasInternal = e.exists {
        case _: LambdaFunction | _: NamedLambdaVariable | _: CreateNamedStruct |
             _: StringSplitSQL => true
        case l: Literal => l.dataType.isInstanceOf[ArrayType] && l.value != null
        case _ => false
      }
      if (hasInternal && e.children.nonEmpty)
        s"${e.prettyName}(${e.children.map(rendered).mkString(", ")})"
      else e.sql
    }
    def fnName(prettyName: String): Option[String] = Some(prettyName)
  }

  object DuckDbDialect extends Dialect {
    // native 1-based split_part with Spark's ''-on-overflow
    override def splitPart(s: String, delim: String, n: Int): Option[String] =
      Some(s"split_part($s, $delim, $n)")
    // RE2 regex family; regexp_extract is ''-on-miss like Spark, replace
    // needs the explicit 'g' for every-match semantics
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"regexp_matches($s, $p)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"regexp_replace($s, $p, $r, 'g')")
    override def regexpExtract(s: String, p: String, idx: Int): Option[String] =
      Some(s"regexp_extract($s, $p, $idx)")
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else s"read_parquet('${rootPath.replace("'", "''")}/**/*.parquet')"
    }
    def typeName(dt: DataType): String = dt match {
      case StringType => "VARCHAR"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP"
      case _: TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"duckdb dialect: type ${other.sql}")
    }
    def literal(l: Literal): String = ansiLiteral(l)
    override def preferExtract: Boolean = true
    // `//` truncates toward zero like Spark's div (checked: -7 // 2 = -3) and
    // is exact over the full int64 range (no double rounding)
    override def integralDivide(l: String, r: String): String = s"($l // $r)"
    // DuckDB widens integral SUM to HUGEINT (the driver-caught tpch_q12
    // drift: 254 → 254.0 through pandas) and decimal SUM to DECIMAL(38,s);
    // the shared repair casts back to Spark's result type
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      ansiAggResultCast(fn)
    // DuckDB's listagg is a plain string_agg alias — it does NOT parse the
    // ANSI WITHIN GROUP clause (checked on 1.0.0); ordering goes inline
    override def listAggSql(distinct: String, child: String, delim: String,
        order: Seq[String]): String = {
      val ord = if (order.isEmpty) "" else s" ORDER BY ${order.mkString(", ")}"
      s"string_agg($distinct$child, $delim$ord)"
    }
    // DuckDB ranks in BIGINT where Spark's row_number/rank family is INT
    override def rankResultCast: Option[DataType] = Some(IntegerType)
    // date-spine machinery: generate_series is both a FROM-positioned table
    // function and (scalar context) LIST-valued, and intervals take the
    // quoted-unit-string form
    override def seriesFrom(start: String, stop: String, step: Option[String]): Option[String] =
      Some(s"generate_series($start, $stop${step.map(", " + _).getOrElse("")})")
    override def sequenceFn(start: String, stop: String, step: Option[String],
        et: DataType): Option[String] =
      Some(s"generate_series($start, $stop${step.map(", " + _).getOrElse("")})")
    override def explodeCall(arr: String): Option[String] = Some(s"unnest($arr)")
    override def intervalLiteral(months: Long, micros: Long): String =
      if (micros == 0) s"INTERVAL '$months months'"
      else if (months == 0) s"INTERVAL '$micros microseconds'"
      else s"(INTERVAL '$months months' + INTERVAL '$micros microseconds')"
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi => "SEMI JOIN"
      case LeftAnti => "ANTI JOIN"
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      s"(VALUES ${rows.mkString(", ")}) ${quote(alias)}(${cols.map(quote).mkString(", ")})"
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      // the Morton kernel has no DuckDB builtin: expand to explicit shift/mask
      // arithmetic (mask first, so arithmetic >> on the masked non-negative
      // value matches the kernel's logical shift bit-for-bit). Each child is
      // bound ONCE in a correlated scalar-subquery scope and the shift/mask
      // terms reference the binding — inlining the child into all `bits` terms
      // would grow the text multiplicatively and re-evaluate it per term on
      // engines without common-subexpression elimination.
      case z: graft.functions.InterleaveBits => mortonExpansion(z, rendered)
      // Spark folds `date + interval 'n' day` to date_add(date, n); DuckDB (like
      // Postgres) has no 2-int-arg date_add but adds days with DATE + INTEGER,
      // returning DATE — the same type Spark's date_add yields.
      case da: DateAdd => s"(${rendered(da.startDate)} + ${rendered(da.days)})"
      case ds: DateSub => s"(${rendered(ds.startDate)} - ${rendered(ds.days)})"
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"duckdb dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "length", "concat", "abs",
      "round", "floor", "ceil", "ceiling", "trim", "ltrim", "rtrim", "replace",
      "lpad", "rpad", "reverse", "greatest", "least", "nullif", "sqrt", "ln",
      "exp", "sign",
      // same name + semantics in both engines (DuckDB scalar function docs)
      "date_trunc", "md5", "concat_ws", "left", "right", "repeat", "contains",
      "pow", "power", "mod",
      // statistical aggregates: identical names + ANSI semantics in DuckDB
      "stddev_samp", "stddev_pop", "var_samp", "var_pop", "corr",
      "covar_samp", "covar_pop", "median",
      // math + string family, live-checked on DuckDB 1.0 (no sinh/cosh/tanh
      // or initcap there yet)
      "log10", "log2", "log", "degrees", "radians", "cot", "cbrt",
      "translate", "levenshtein")
    private val renamed = Map("substring" -> "substr", "instr" -> "strpos",
      "startswith" -> "starts_with", "endswith" -> "ends_with",
      "day" -> "day", "dayofmonth" -> "day")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** Postgres dialect: the reference's per-backend posture
    * (`wren-core/core/src/mdl/dialect/inner_dialect.rs:110-135` — quoting,
    * function-spelling, extract-style overrides per backend; the sqlglot layer
    * `ibis-server/app/mdl/rewriter.py:51-63` does the same server-side).
    * Differences from DuckDB carried here: `DOUBLE PRECISION`/`NUMERIC` type
    * spellings, no SEMI/ANTI JOIN syntax (rendered as correlated (NOT)
    * EXISTS), `string_agg(x, d ORDER BY ...)` for ordered string aggregation,
    * and no `ends_with`/`contains` builtins (rendered structurally over
    * `right`/`length`/`strpos`). No Postgres server exists in this sandbox, so
    * this dialect is proven by pinned-text goldens + generation-coverage gates
    * (`SqlUnparserPostgresSpec`) — the reference's own snapshot-test posture
    * for its 20 dialects (`wren-core/core/src/mdl/mod.rs:648+`).
    */
  object PostgresDialect extends Dialect {
    // native 1-based split_part with Spark's ''-on-overflow
    override def splitPart(s: String, delim: String, n: Int): Option[String] =
      Some(s"split_part($s, $delim, $n)")
    // `~` is Postgres's partial-match operator (DuckDB's same-spelled
    // operator is FULL-match — the sweep records these texts as
    // valid-but-not-DuckDB-executable); regexp_match returns a 1-based
    // group array, so index 0 (whole match) is unreachable and refuses
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"($s ~ $p)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"regexp_replace($s, $p, $r, 'g')")
    override def regexpExtract(s: String, p: String, idx: Int): Option[String] =
      if (idx < 1) None
      else Some(s"(CASE WHEN ($s IS NULL) OR ($p IS NULL) THEN NULL " +
        s"ELSE coalesce((regexp_match($s, $p))[$idx], '') END)")
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"postgres dialect: no parquet table function for directory scan $rootPath " +
          "— register the table (foreign table / COPY) under its logical name")
    }
    def typeName(dt: DataType): String = dt match {
      case StringType => "VARCHAR"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "SMALLINT" // no TINYINT in Postgres
      case DoubleType => "DOUBLE PRECISION"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP"
      case _: TimestampType => "TIMESTAMP"
      case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"postgres dialect: type ${other.sql}")
    }
    def literal(l: Literal): String = ansiLiteral(l)
    override def preferExtract: Boolean = true
    override def semiAntiAsExists: Boolean = true
    // div(numeric, numeric) is Postgres's truncating integer quotient
    // (arbitrary precision — no 2^53 double hazard on ns-epoch longs)
    override def integralDivide(l: String, r: String): String =
      s"CAST(div($l, $r) AS BIGINT)"
    // Postgres §9.21: sum(bigint)→NUMERIC, sum(real)→REAL, avg/stddev of
    // exact types→NUMERIC — all drift from Spark's BIGINT/DOUBLE results
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      ansiAggResultCast(fn)
    override def rankResultCast: Option[DataType] = Some(IntegerType)
    // generate_series in the FROM clause is the Postgres set-returning form;
    // the identical spelling parses in DuckDB (table function), which keeps
    // the Postgres texts inside the DuckDB-EXECUTED corpus
    override def seriesFrom(start: String, stop: String, step: Option[String]): Option[String] =
      Some(s"generate_series($start, $stop${step.map(", " + _).getOrElse("")})")
    override def explodeCall(arr: String): Option[String] = Some(s"unnest($arr)")
    override def intervalLiteral(months: Long, micros: Long): String =
      if (micros == 0) s"INTERVAL '$months months'"
      else if (months == 0) s"INTERVAL '$micros microseconds'"
      else s"(INTERVAL '$months months' + INTERVAL '$micros microseconds')"
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi | LeftAnti => throw new UnsupportedOperationException(
        "postgres dialect: semi/anti joins render as EXISTS (semiAntiAsExists)")
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      s"(VALUES ${rows.mkString(", ")}) AS ${quote(alias)}(${cols.map(quote).mkString(", ")})"
    override def listAggSql(distinct: String, child: String, delim: String,
        order: Seq[String]): String = {
      val ord = if (order.isEmpty) "" else s" ORDER BY ${order.mkString(", ")}"
      s"string_agg($distinct$child, $delim$ord)"
    }
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case z: graft.functions.InterleaveBits => mortonExpansion(z, rendered)
      case da: DateAdd => s"(${rendered(da.startDate)} + ${rendered(da.days)})"
      case ds: DateSub => s"(${rendered(ds.startDate)} - ${rendered(ds.days)})"
      // Postgres md5(text) yields hex text like Spark's (the Spark-inserted
      // STRING→BINARY cast is stripped — bytea md5 would need decode())
      case m: Md5 => s"md5(${rendered(md5Arg(m))})"
      // no ends_with/contains builtins: structural renderings with the same
      // three-valued null semantics (any null operand propagates to NULL)
      case ew: EndsWith =>
        s"(right(${rendered(ew.left)}, length(${rendered(ew.right)})) = ${rendered(ew.right)})"
      case ct: Contains =>
        s"(strpos(${rendered(ct.left)}, ${rendered(ct.right)}) > 0)"
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"postgres dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "length", "concat", "abs",
      "round", "floor", "ceil", "ceiling", "trim", "btrim", "ltrim", "rtrim",
      "replace", "lpad", "rpad", "reverse", "greatest", "least", "nullif",
      "sqrt", "ln", "exp", "sign", "initcap",
      "date_trunc", "concat_ws", "left", "right", "repeat",
      "pow", "power", "mod",
      // ANSI statistical aggregates (Postgres aggregate docs; no median —
      // Postgres spells that percentile_cont, out of the curated subset)
      "stddev_samp", "stddev_pop", "var_samp", "var_pop", "corr",
      "covar_samp", "covar_pop",
      // math + string family (hyperbolics are PG12+; 2-arg log is
      // numeric-only in Postgres and stays refused)
      "log10", "degrees", "radians", "cot", "cbrt", "sinh", "cosh", "tanh",
      "translate")
    private val renamed = Map("substring" -> "substr", "instr" -> "strpos",
      "startswith" -> "starts_with")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** MySQL dialect — the reference's MySQLDialect posture
    * (`inner_dialect.rs:117-135`: `btrim`→`trim`, extract-style date fields)
    * plus the grammar gaps MySQL itself imposes: backtick quoting, no FULL
    * JOIN (loud error), no SEMI/ANTI JOIN (correlated EXISTS), no NULLS
    * FIRST/LAST in ORDER BY (non-native placements emulated with an `IS NULL`
    * prefix sort key; native ones — ASC/nulls-first, DESC/nulls-last — emit
    * bare), `char_length` for character length (`length()` is BYTES in
    * MySQL), `GROUP_CONCAT(x ORDER BY ... SEPARATOR d)` for ordered string
    * aggregation, `a DIV b` integer division, and DATE + INTERVAL n DAY
    * arithmetic. No `date_trunc` and no reliable outer-reference scoping for
    * the Morton expansion's derived table — both fail loudly (curated-subset
    * posture). No MySQL server in this sandbox: proven by pinned goldens +
    * generation gates + the property sweep (`SqlUnparserPostgresSpec`'s
    * sibling tests), the reference's snapshot-test posture.
    */
  object MySqlDialect extends Dialect {
    // REGEXP is MySQL's partial-match operator; 8.0 REGEXP_REPLACE is
    // global by default; REGEXP_SUBSTR has no group access — extract refuses
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"($s REGEXP $p)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"REGEXP_REPLACE($s, $p, $r)")
    def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"mysql dialect: no parquet table function for directory scan $rootPath " +
          "— register the table under its logical name")
    }
    // MySQL CAST target types are their own sublanguage (SIGNED/CHAR/...),
    // not column types
    def typeName(dt: DataType): String = dt match {
      case StringType => "CHAR"
      case IntegerType | LongType | ShortType | ByteType | BooleanType => "SIGNED"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case DateType => "DATE"
      case TimestampNTZType => "DATETIME"
      case _: TimestampType => "DATETIME"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"mysql dialect: type ${other.sql}")
    }
    def literal(l: Literal): String = backslashLiteral(l)
    override def preferExtract: Boolean = true
    override def semiAntiAsExists: Boolean = true
    // `DIV` truncates toward zero over exact integers (MySQL reference manual)
    override def integralDivide(l: String, r: String): String = s"($l DIV $r)"
    // MySQL spells null-safe equality <=> (no IS NOT DISTINCT FROM)
    override def nullSafeEq(l: String, r: String): String = s"($l <=> $r)"
    // MySQL types integral SUM as DECIMAL; CAST AS SIGNED restores BIGINT
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      ansiAggResultCast(fn)
    // MySQL's integer AVG returns DECIMAL at a fixed 4-digit scale — rounded
    // VALUES, not just a drifted type; averaging the double-cast child makes
    // the engine compute Spark's double result (CAST AS DOUBLE, 8.0.17+)
    override def aggChildCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case a: Average if isIntegral(a.child.dataType) => Some(DoubleType)
        case _ => None
      }
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => throw new UnsupportedOperationException(
        "mysql dialect: MySQL has no FULL JOIN — rewrite as LEFT JOIN UNION " +
          "ALL anti-filtered RIGHT JOIN upstream")
      case LeftSemi | LeftAnti => throw new UnsupportedOperationException(
        "mysql dialect: semi/anti joins render as EXISTS (semiAntiAsExists)")
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    // MySQL's VALUES table constructor requires ROW() constructors and has no
    // derived-table column list `AS t(c1, c2)` — render UNION ALL of aliased
    // SELECTs instead (same path BigQuery/ClickHouse take)
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      unionAllValues(rows, alias, cols)
    override def sortItem(child: String, dir: String, nullsFirst: Boolean): Seq[String] = {
      val native = (dir == "ASC" && nullsFirst) || (dir == "DESC" && !nullsFirst)
      if (native) Seq(s"$child $dir")
      // non-native placement: a boolean prefix key — `(x IS NULL) DESC` puts
      // nulls first, `ASC` puts them last — then the value key
      else Seq(s"($child IS NULL) ${if (nullsFirst) "DESC" else "ASC"}", s"$child $dir")
    }
    override def listAggSql(distinct: String, child: String, delim: String,
        order: Seq[String]): String = {
      val ord = if (order.isEmpty) "" else s" ORDER BY ${order.mkString(", ")}"
      s"GROUP_CONCAT($distinct$child$ord SEPARATOR $delim)"
    }
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case _: graft.functions.InterleaveBits => throw new UnsupportedOperationException(
        "mysql dialect: zorder_key's bound-once expansion needs outer references " +
          "inside a derived table, which MySQL's scoping rules reject — " +
          "compute the Morton key engine-side")
      case da: DateAdd =>
        s"(${rendered(da.startDate)} + INTERVAL ${rendered(da.days)} DAY)"
      case ds: DateSub =>
        s"(${rendered(ds.startDate)} - INTERVAL ${rendered(ds.days)} DAY)"
      case sw: StartsWith =>
        s"(left(${rendered(sw.left)}, char_length(${rendered(sw.right)})) = ${rendered(sw.right)})"
      case ew: EndsWith =>
        s"(right(${rendered(ew.left)}, char_length(${rendered(ew.right)})) = ${rendered(ew.right)})"
      case ct: Contains =>
        s"(instr(${rendered(ct.left)}, ${rendered(ct.right)}) > 0)"
      // MySQL has no date_trunc: literal-unit truncation renders through
      // DATE_FORMAT (the reference's sqlglot MySQL target emits the same
      // shape); a non-literal or sub-supported unit still refuses loudly
      case tt: TruncTimestamp => tt.format match {
        case Literal(u, StringType) if u != null =>
          val fmt = u.toString.toLowerCase match {
            case "year" | "yyyy" | "yy" => "%Y-01-01 00:00:00"
            case "month" | "mon" | "mm" => "%Y-%m-01 00:00:00"
            case "day" | "dd" => "%Y-%m-%d 00:00:00"
            case "hour" => "%Y-%m-%d %H:00:00"
            case "minute" => "%Y-%m-%d %H:%i:00"
            case "second" => "%Y-%m-%d %H:%i:%s"
            case other => throw new UnsupportedOperationException(
              s"mysql dialect: date_trunc unit '$other' has no DATE_FORMAT model")
          }
          s"CAST(DATE_FORMAT(${rendered(tt.timestamp)}, '$fmt') AS DATETIME)"
        case _ => throw new UnsupportedOperationException(
          "mysql dialect: date_trunc needs a literal unit to render as DATE_FORMAT")
      }
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"mysql dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "concat", "abs",
      "round", "floor", "ceil", "ceiling", "trim", "ltrim", "rtrim", "replace",
      "lpad", "rpad", "reverse", "greatest", "least", "nullif", "sqrt", "ln",
      "exp", "sign", "md5", "concat_ws", "left", "right", "repeat", "instr",
      "pow", "power", "mod",
      // MySQL 8 statistical aggregates (no corr/covar in MySQL)
      "stddev_samp", "stddev_pop", "var_samp", "var_pop",
      // math family: LOG(B,X) is base-first like Spark's 2-arg log
      "log10", "log2", "log", "degrees", "radians", "cot")
    private val renamed = Map(
      "substring" -> "substr",
      // MySQL length() counts BYTES; char_length matches Spark's semantics
      "length" -> "char_length",
      "btrim" -> "trim")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** BigQuery dialect — the reference ships a DEDICATED BigQueryDialect
    * (`inner_dialect.rs:137-384`: its own function registries, `col_alias`
    * special-character encoding, datetime-diff transforms, unnest-as-table
    * posture). Carried here: backtick quoting, the reference's exact
    * `_<codepoint>` encoding for output aliases BigQuery column names cannot
    * hold, STRING/INT64/FLOAT64/NUMERIC CAST targets (BIGNUMERIC past
    * NUMERIC's 9-digit scale), EXISTS-rendered semi/anti joins,
    * `DIV(a, b)` truncating division, `DATE_ADD/SUB(d, INTERVAL n DAY)`,
    * `STRING_AGG(x, d ORDER BY ...)`, `TO_HEX(MD5(x))` (BigQuery's MD5
    * returns BYTES where Spark's returns hex text), `TIMESTAMP_TRUNC(ts,
    * UNIT)` (argument order reversed, unit a keyword), and UNION-ALL-rendered
    * inline VALUES (no VALUES table constructor in BigQuery). The Morton
    * expansion fails loudly (correlated references inside a derived table are
    * outside BigQuery's decorrelation). No BigQuery in this sandbox: pinned
    * goldens + generation gates + the property sweep, the reference's own
    * snapshot posture.
    */
  object BigQueryDialect extends Dialect {
    // RE2 family: REGEXP_CONTAINS is the partial-match predicate,
    // REGEXP_REPLACE is global; REGEXP_EXTRACT's group selection is
    // pattern-driven, not index-driven — extract refuses
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"REGEXP_CONTAINS($s, $p)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"REGEXP_REPLACE($s, $p, $r)")
    // backslash is already this engine's LIKE escape — no clause needed
    override def likeBackslashIsDefaultEscape: Boolean = true
    // no ESCAPE clause in this grammar; backslash is already the
    // engine's LIKE escape, so only a CUSTOM escape must refuse
    override def likeEscapeClause(esc: Char): Option[String] = None
    def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"
    // GoogleSQL expands arrays with a FROM-positioned UNNEST whose alias IS
    // the element column (no wrapping table alias); its series builders are
    // ELEMENT-TYPED — GENERATE_ARRAY / GENERATE_DATE_ARRAY /
    // GENERATE_TIMESTAMP_ARRAY — and interval literals are unquoted
    // single-unit `INTERVAL n UNIT`
    override def unnestJoin(arr: String, alias: String, col: String): Option[String] =
      Some(s"CROSS JOIN UNNEST($arr) AS $col")
    override def sequenceFn(start: String, stop: String, step: Option[String],
        et: DataType): Option[String] = {
      val tail = step.map(", " + _).getOrElse("")
      et match {
        case DateType => Some(s"GENERATE_DATE_ARRAY($start, $stop$tail)")
        case _: TimestampType => Some(s"GENERATE_TIMESTAMP_ARRAY($start, $stop$tail)")
        case dt if isIntegral(dt) => Some(s"GENERATE_ARRAY($start, $stop$tail)")
        case _ => None
      }
    }
    override def intervalLiteral(months: Long, micros: Long): String =
      if (micros == 0) {
        if (months % 12 == 0) s"INTERVAL ${months / 12} YEAR"
        else s"INTERVAL $months MONTH"
      } else if (months == 0) {
        Seq("DAY" -> 86400000000L, "HOUR" -> 3600000000L,
            "MINUTE" -> 60000000L, "SECOND" -> 1000000L)
          .collectFirst { case (u, f) if micros % f == 0 =>
            s"INTERVAL ${micros / f} $u" }
          .getOrElse(throw new UnsupportedOperationException(
            "bigquery dialect: sub-second INTERVAL literal"))
      } else throw new UnsupportedOperationException(
        "bigquery dialect: mixed year-month + day-time INTERVAL literal")
    // the reference's flexible-column-name encoding (inner_dialect.rs:157-178)
    private val aliasSpecial: Set[Char] = Set(
      '!', '"', '$', '(', ')', '*', ',', '.', '/', ';', '?', '@', '[', '\\',
      ']', '^', '`', '{', '}', '~')
    override def outputAlias(name: String): String =
      if (!name.exists(aliasSpecial)) name
      else name.flatMap(c => if (aliasSpecial(c)) s"_${c.toInt}" else c.toString)
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"bigquery dialect: no parquet table function for directory scan $rootPath " +
          "— register an external table under the logical name")
    }
    def typeName(dt: DataType): String = dt match {
      case StringType => "STRING"
      case IntegerType | LongType | ShortType | ByteType => "INT64"
      case DoubleType | FloatType => "FLOAT64"
      case BooleanType => "BOOL"
      case DateType => "DATE"
      case TimestampNTZType => "DATETIME"
      case _: TimestampType => "TIMESTAMP"
      case d: DecimalType =>
        if (d.scale <= 9 && d.precision <= 38) s"NUMERIC(${d.precision},${d.scale})"
        else s"BIGNUMERIC(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"bigquery dialect: type ${other.sql}")
    }
    // GoogleSQL's quote escape is \' — it does NOT treat '' inside a
    // single-quoted string as an escaped quote (backslashLiteral inherits
    // ansiLiteral's '' doubling, which misparses there), so quote AND
    // backslash both escape with the backslash introducer
    def literal(l: Literal): String = (l.value, l.dataType) match {
      case (v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        "'" + v.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
      case _ => backslashLiteral(l)
    }
    override def preferExtract: Boolean = true
    override def semiAntiAsExists: Boolean = true
    override def integralDivide(l: String, r: String): String = s"DIV($l, $r)"
    // GoogleSQL has no `%` operator — remainder is the MOD function
    override def remainder(l: String, r: String): String = s"MOD($l, $r)"
    // GoogleSQL sums NUMERIC at fixed (38,9) and averages it to NUMERIC —
    // both drift from Spark's widened decimal result; INT64 sum/avg agree
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      ansiAggResultCast(fn)
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi | LeftAnti => throw new UnsupportedOperationException(
        "bigquery dialect: semi/anti joins render as EXISTS (semiAntiAsExists)")
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    // no VALUES table constructor in BigQuery: a UNION ALL of aliased SELECTs
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      unionAllValues(rows, alias, cols)
    override def listAggSql(distinct: String, child: String, delim: String,
        order: Seq[String]): String = {
      val ord = if (order.isEmpty) "" else s" ORDER BY ${order.mkString(", ")}"
      s"STRING_AGG($distinct$child, $delim$ord)"
    }
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case _: graft.functions.InterleaveBits => throw new UnsupportedOperationException(
        "bigquery dialect: zorder_key's bound-once expansion needs outer " +
          "references inside a derived table, outside BigQuery's decorrelation " +
          "— compute the Morton key engine-side")
      case da: DateAdd =>
        s"DATE_ADD(${rendered(da.startDate)}, INTERVAL ${rendered(da.days)} DAY)"
      case ds: DateSub =>
        s"DATE_SUB(${rendered(ds.startDate)}, INTERVAL ${rendered(ds.days)} DAY)"
      // BigQuery's MD5 returns BYTES; Spark's returns lowercase hex STRING
      case m: Md5 => s"TO_HEX(MD5(${rendered(md5Arg(m))}))"
      // argument order reversed and the unit is a KEYWORD, not a string
      case t: TruncTimestamp => t.format match {
        case Literal(f, StringType) if f != null &&
            Set("year", "quarter", "month", "week", "day", "hour", "minute",
              "second")(f.toString.toLowerCase) =>
          s"TIMESTAMP_TRUNC(${rendered(t.timestamp)}, ${f.toString.toUpperCase})"
        case other => throw new UnsupportedOperationException(
          s"bigquery dialect: date_trunc with unit $other")
      }
      case ct: Contains =>
        s"(STRPOS(${rendered(ct.left)}, ${rendered(ct.right)}) > 0)"
      // GoogleSQL SPLIT takes a LITERAL delimiter, Spark's split a regex —
      // only the metachar-free unlimited form translates
      case sp: StringSplit if literalDelim(sp).isDefined =>
        s"SPLIT(${rendered(sp.str)}, '${literalDelim(sp).get}')"
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"bigquery dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "length", "concat", "abs",
      "round", "floor", "trim", "ltrim", "rtrim", "replace",
      "lpad", "rpad", "reverse", "greatest", "least", "nullif", "sqrt", "ln",
      "exp", "sign", "left", "right", "repeat", "mod",
      "starts_with", "ends_with", "initcap", "translate", "cot",
      "stddev_samp", "stddev_pop", "var_samp", "var_pop", "corr",
      "covar_samp", "covar_pop")
    private val renamed = Map(
      "levenshtein" -> "EDIT_DISTANCE",
      "substring" -> "substr", "instr" -> "strpos",
      "startswith" -> "starts_with", "endswith" -> "ends_with",
      "ceil" -> "ceil", "ceiling" -> "ceil",
      "pow" -> "pow", "power" -> "pow",
      "btrim" -> "trim")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** ClickHouse dialect — the reference's ClickHouseDialect maps standard
    * date_part fields to ClickHouse's native camelCase functions, including
    * the day-of-week modulo adjustment (`inner_dialect.rs:452-540`); carried
    * here over the curated renderer plus ClickHouse's own grammar facts:
    * NATIVE `LEFT SEMI JOIN`/`LEFT ANTI JOIN` keywords (no EXISTS rewrite
    * needed), `intDiv(a, b)`, camelCase function spellings (case-SENSITIVE in
    * ClickHouse: nullIf, startsWith, stddevSamp, ...), `lengthUTF8`/
    * `reverseUTF8` for character semantics (the byte-wise `length`/`reverse`
    * would diverge from Spark on non-ASCII), `replaceAll`, `position`,
    * `lower(hex(MD5(x)))`, `CAST(NULL AS Nullable(T))` null literals, and
    * UNION-ALL-rendered inline VALUES. Ordered string aggregation and the
    * Morton expansion fail loudly. No ClickHouse in this sandbox: pinned
    * goldens + generation gates + the property sweep.
    */
  object ClickHouseDialect extends Dialect {
    // match() is the RE2 partial-match predicate; replaceRegexpAll is the
    // every-occurrence form; extract()'s group choice is positional-first,
    // not indexed — extract refuses
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"match($s, $p)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"replaceRegexpAll($s, $p, $r)")
    // backslash is already this engine's LIKE escape — no clause needed
    override def likeBackslashIsDefaultEscape: Boolean = true
    // no ESCAPE clause in this grammar; backslash is already the
    // engine's LIKE escape, so only a CUSTOM escape must refuse
    override def likeEscapeClause(esc: Char): Option[String] = None
    // ClickHouse accepts BOTH backticks and ANSI double quotes for
    // identifiers under default settings; the double-quote spelling keeps
    // the texts inside the ANSI surface, so the subset free of
    // ClickHouse-only functions is executable by the DuckDB sweep (the
    // backtick form parked EVERY text outside any second parser's grammar)
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"clickhouse dialect: no parquet table function for directory scan $rootPath " +
          "— register a table under the logical name (or use the file() engine)")
    }
    def typeName(dt: DataType): String = dt match {
      case StringType => "String"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case ShortType => "Int16"
      case ByteType => "Int8"
      case DoubleType => "Float64"
      case FloatType => "Float32"
      case BooleanType => "Bool"
      case DateType => "Date32"
      // ClickHouse DateTime64 is wall-clock (no tz attribute unless one is
      // spelled) — the faithful landing for BOTH Spark timestamp flavors
      case TimestampNTZType => "DateTime64(6)"
      case _: TimestampType => "DateTime64(6)"
      case d: DecimalType => s"Decimal(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"clickhouse dialect: type ${other.sql}")
    }
    // ClickHouse types are non-nullable by default (a bare CAST(NULL AS T)
    // fails — the target must be Nullable(T)), and the ANSI DATE '...' /
    // TIMESTAMP '...' literal introducers are not part of its grammar — use
    // the native toDate32/toDateTime64 constructors instead.
    def literal(l: Literal): String = (l.value, l.dataType) match {
      case (null, NullType) => "NULL"
      case (null, dt) => s"CAST(NULL AS Nullable(${typeName(dt)}))"
      case (v: Int, DateType) =>
        s"toDate32('${java.time.LocalDate.ofEpochDay(v.toLong)}')"
      case (v: Long, _: TimestampType | _: TimestampNTZType) =>
        val i = java.time.Instant.EPOCH.plus(v, java.time.temporal.ChronoUnit.MICROS)
        val t = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        val frac = if (t.getNano == 0) "" else f".${t.getNano / 1000}%06d"
        s"toDateTime64('${t.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))}$frac', 6)"
      case _ => backslashLiteral(l)
    }
    // extract() exists in ClickHouse but the reference maps to the native
    // functions, including the dow modulo trick — mirror it
    override def dateField(field: String, child: String): Option[String] =
      field.toLowerCase match {
        case "year" => Some(s"toYear($child)")
        case "quarter" => Some(s"toQuarter($child)")
        case "month" => Some(s"toMonth($child)")
        case "week" => Some(s"toISOWeek($child)")
        case "day" => Some(s"toDayOfMonth($child)")
        case "hour" => Some(s"toHour($child)")
        case "minute" => Some(s"toMinute($child)")
        case "second" => Some(s"toSecond($child)")
        case _ => None
      }
    override def integralDivide(l: String, r: String): String = s"intDiv($l, $r)"
    // no IS NOT DISTINCT FROM in ClickHouse's grammar
    override def nullSafeEq(l: String, r: String): String = nullSafeEqEmulated(l, r)
    // ClickHouse bit machinery is function-spelled (no &/>> operators)
    override def shiftRight(l: String, r: String): String = s"bitShiftRight($l, $r)"
    override def shiftLeft(l: String, r: String): String = s"bitShiftLeft($l, $r)"
    override def bitAnd(l: String, r: String): String = s"bitAnd($l, $r)"
    override def bitOr(l: String, r: String): String = s"bitOr($l, $r)"
    // ClickHouse count() is UInt64 (Spark: signed BIGINT); sums of Int32
    // widen to Int64 as Spark does, decimals widen precision differently
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case _: Count => Some(LongType)
        case other => ansiAggResultCast(other)
      }
    // ClickHouse row_number/rank are UInt64; Spark's are INT
    override def rankResultCast: Option[DataType] = Some(IntegerType)
    // arrayJoin is ClickHouse's SELECT-positioned row expander; no
    // timestamp-stepped series builder, so explode(sequence(...)) refuses
    override def explodeCall(arr: String): Option[String] = Some(s"arrayJoin($arr)")
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      // native semi/anti join kinds — ClickHouse JOIN docs
      case LeftSemi => "LEFT SEMI JOIN"
      case LeftAnti => "LEFT ANTI JOIN"
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      unionAllValues(rows, alias, cols)
    override def listAggSql(distinct: String, child: String, delim: String,
        order: Seq[String]): String =
      throw new UnsupportedOperationException(
        "clickhouse dialect: ordered string aggregation (listagg) — ClickHouse's " +
          "groupArray carries no deterministic ORDER BY; aggregate engine-side")
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case _: graft.functions.InterleaveBits => throw new UnsupportedOperationException(
        "clickhouse dialect: zorder_key's bound-once expansion needs outer " +
          "references inside a derived table — compute the Morton key engine-side")
      case da: DateAdd => s"(${rendered(da.startDate)} + ${rendered(da.days)})"
      case ds: DateSub => s"(${rendered(ds.startDate)} - ${rendered(ds.days)})"
      // Spark dayofweek is 1-7 Sunday-first; toDayOfWeek is 1-7 Monday-first —
      // the reference's modulo adjustment, shifted to Spark's 1-based frame
      case dw: DayOfWeek => s"((toDayOfWeek(${rendered(dw.child)}) % 7) + 1)"
      // ClickHouse MD5 returns FixedString(16) bytes; Spark yields lowercase hex
      case m: Md5 => s"lower(hex(MD5(${rendered(md5Arg(m))})))"
      case ct: Contains =>
        s"(position(${rendered(ct.left)}, ${rendered(ct.right)}) > 0)"
      // splitByString takes (delimiter, str) — REVERSED from Spark — and a
      // literal delimiter; only the metachar-free unlimited split translates
      case sp: StringSplit if literalDelim(sp).isDefined =>
        s"splitByString('${literalDelim(sp).get}', ${rendered(sp.str)})"
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"clickhouse dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "concat", "abs", "round",
      "floor", "ceil", "sqrt", "exp", "sign", "greatest", "least",
      "trim", "ltrim", "rtrim", "lpad", "rpad", "repeat", "left", "right",
      "concat_ws", "date_trunc", "ln", "corr",
      "log10", "log2", "degrees", "radians", "sinh", "cosh", "tanh",
      "translate")
    private val renamed = Map(
      "levenshtein" -> "editDistance",
      "ceiling" -> "ceil",
      "length" -> "lengthUTF8",   // byte-wise `length` diverges on non-ASCII
      "reverse" -> "reverseUTF8",
      "replace" -> "replaceAll",
      "nullif" -> "nullIf",
      "substring" -> "substring",
      "startswith" -> "startsWith",
      "endswith" -> "endsWith",
      "instr" -> "position",
      "pow" -> "pow", "power" -> "pow", "mod" -> "modulo",
      "stddev_samp" -> "stddevSamp", "stddev_pop" -> "stddevPop",
      "var_samp" -> "varSamp", "var_pop" -> "varPop",
      "covar_samp" -> "covarSamp", "covar_pop" -> "covarPop",
      "median" -> "median")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** Snowflake dialect (`inner_dialect.rs:421-427` — the reference treats it
    * as near-ANSI with an unnest-posture override; ours carries the real
    * spelling differences): double-quoted identifiers, NUMBER(p,s)/FLOAT/
    * TIMESTAMP_NTZ CAST targets, EXISTS-rendered semi/anti joins,
    * `DATEADD(day, n, d)` date arithmetic, `CAST(TRUNC(l / r) AS BIGINT)`
    * integer division (Snowflake `/` is exact NUMBER division — no 2^53
    * double hazard — and TRUNC matches Spark's toward-zero semantics),
    * `LISTAGG(x, d) WITHIN GROUP (ORDER BY ...)` (the ANSI default),
    * native STARTSWITH/ENDSWITH/CONTAINS, MD5 returning hex text like
    * Spark's. The Morton expansion fails loudly (correlated derived-table
    * scoping is outside Snowflake's documented decorrelation). No Snowflake
    * in this sandbox: pinned goldens + generation gates + the sweep.
    */
  object SnowflakeDialect extends Dialect {
    // native 1-based split_part with Spark's ''-on-overflow
    override def splitPart(s: String, delim: String, n: Int): Option[String] =
      Some(s"split_part($s, $delim, $n)")
    // Snowflake's REGEXP_LIKE / REGEXP operator are FULL-match (unlike
    // Oracle's partial REGEXP_LIKE) — the partial-match predicate is
    // position-based; NULL inputs propagate through the comparison
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"(REGEXP_INSTR($s, $p) > 0)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"REGEXP_REPLACE($s, $p, $r)")
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"snowflake dialect: no parquet table function for directory scan $rootPath " +
          "— register an external table under the logical name")
    }
    def typeName(dt: DataType): String = dt match {
      case StringType => "VARCHAR"
      case IntegerType | LongType | ShortType | ByteType => "NUMBER(38,0)"
      case DoubleType | FloatType => "FLOAT"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP_NTZ"
      case _: TimestampType => "TIMESTAMP_NTZ" // session-TZ-free rendering
      case d: DecimalType => s"NUMBER(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"snowflake dialect: type ${other.sql}")
    }
    def literal(l: Literal): String = backslashLiteral(l)
    override def preferExtract: Boolean = true
    override def semiAntiAsExists: Boolean = true
    // Snowflake / on NUMBER is exact decimal division; TRUNC is toward zero,
    // matching Spark's div over the full int64 range
    override def integralDivide(l: String, r: String): String =
      s"CAST(TRUNC($l / $r) AS BIGINT)"
    // Snowflake types integral SUM as NUMBER(38,0) (≡ its BIGINT — cast is
    // documentation-grade) and rounds integer AVG at NUMBER scale — averaging
    // the FLOAT-cast child computes Spark's double values
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      ansiAggResultCast(fn)
    // Snowflake bit machinery is function-spelled (BITAND/BITSHIFTRIGHT)
    override def shiftRight(l: String, r: String): String = s"BITSHIFTRIGHT($l, $r)"
    override def shiftLeft(l: String, r: String): String = s"BITSHIFTLEFT($l, $r)"
    override def bitAnd(l: String, r: String): String = s"BITAND($l, $r)"
    override def bitOr(l: String, r: String): String = s"BITOR($l, $r)"
    override def aggChildCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case a: Average if isIntegral(a.child.dataType) => Some(DoubleType)
        case _ => None
      }
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi | LeftAnti => throw new UnsupportedOperationException(
        "snowflake dialect: semi/anti joins render as EXISTS (semiAntiAsExists)")
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      s"(VALUES ${rows.mkString(", ")}) AS ${quote(alias)}(${cols.map(quote).mkString(", ")})"
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case _: graft.functions.InterleaveBits => throw new UnsupportedOperationException(
        "snowflake dialect: zorder_key's bound-once expansion needs outer " +
          "references inside a derived table, outside Snowflake's documented " +
          "decorrelation — compute the Morton key engine-side")
      case da: DateAdd =>
        s"DATEADD(day, ${rendered(da.days)}, ${rendered(da.startDate)})"
      case ds: DateSub =>
        s"DATEADD(day, -(${rendered(ds.days)}), ${rendered(ds.startDate)})"
      // Snowflake MD5 takes VARCHAR and yields hex text like Spark's
      case m: Md5 => s"md5(${rendered(md5Arg(m))})"
      // Snowflake POSITION(needle, haystack) takes the needle FIRST —
      // Spark's instr is (haystack, needle), so the generic child-order
      // fallback would search with the arguments swapped
      case si: StringInstr =>
        s"position(${rendered(si.substr)}, ${rendered(si.str)})"
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"snowflake dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "length", "concat", "abs",
      "round", "floor", "ceil", "trim", "ltrim", "rtrim", "replace",
      "lpad", "rpad", "reverse", "greatest", "least", "nullif", "sqrt", "ln",
      "exp", "sign", "left", "right", "repeat", "mod",
      // MD5 returns hex VARCHAR in Snowflake, same as Spark
      "md5", "date_trunc", "concat_ws",
      "stddev_samp", "stddev_pop", "var_samp", "var_pop", "corr",
      "covar_samp", "covar_pop", "median",
      // LOG(base, expr) is base-first like Spark's 2-arg log
      "degrees", "radians", "cot", "sinh", "cosh", "tanh", "cbrt",
      "translate", "initcap", "log")
    private val renamed = Map(
      "levenshtein" -> "EDITDISTANCE",
      "substring" -> "substr",
      "startswith" -> "STARTSWITH", "endswith" -> "ENDSWITH",
      "contains" -> "CONTAINS",
      "ceiling" -> "ceil", "pow" -> "pow", "power" -> "pow",
      "btrim" -> "trim")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** SQL Server dialect (reference `MsSqlDialect`, `inner_dialect.rs:405-418`
    * — btrim→trim; the real grammar differences live here): no LIMIT —
    * `OFFSET 0 ROWS FETCH NEXT n ROWS ONLY`, which REQUIRES an ORDER BY, so a
    * bare limit gets the standard `ORDER BY (SELECT NULL)` stub; no NULLS
    * FIRST/LAST — non-native placements emulate with a `CASE WHEN x IS NULL`
    * prefix key (T-SQL has no boolean-valued sort expressions, so the MySQL
    * dialect's bare `(x IS NULL)` form would not parse); `DATEPART(field, x)`
    * date accessors; `CHARINDEX(needle, haystack)` with REVERSED argument
    * order vs Spark's instr; `CAST((l / r) AS BIGINT)` integer division
    * (T-SQL `/` on integers already truncates; the cast covers decimal
    * operands); `LOWER(CONVERT(VARCHAR(32), HASHBYTES('MD5', x), 2))`;
    * `STRING_AGG(x, d) WITHIN GROUP (ORDER BY ...)`; STDEV/STDEVP/VAR/VARP
    * spellings; `LEN` for length (documented T-SQL trailing-space caveat);
    * NVARCHAR(MAX)/DATETIME2(6)/BIT CAST targets (a bare `CAST(x AS VARCHAR)`
    * silently truncates to 30 chars — never emitted). lpad/rpad and the
    * Morton expansion fail loudly. Snapshot posture (no SQL Server here).
    */
  object MsSqlDialect extends Dialect {
    // T-SQL LIKE additionally treats [...] as a character class
    override def likePattern(p: String): String = p.replace("[", "[[]")
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"mssql dialect: no parquet table function for directory scan $rootPath " +
          "— register the table under its logical name")
    }
    def typeName(dt: DataType): String = dt match {
      case StringType => "NVARCHAR(MAX)"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      // FLOAT(53) IS T-SQL's double (bare FLOAT defaults to it) — the
      // explicit precision keeps the text faithful on engines where bare
      // FLOAT is float32 (DuckDB reads float(p>=25) as float64, measured)
      case DoubleType => "FLOAT(53)"
      case FloatType => "REAL"
      case BooleanType => "BIT"
      case DateType => "DATE"
      // DATETIME2 carries no offset — T-SQL's wall-clock landing for both
      // Spark timestamp flavors (the tz-aware one is DATETIMEOFFSET, which
      // the corpus never projects; session tz is UTC so values coincide)
      case TimestampNTZType => "DATETIME2(6)"
      case _: TimestampType => "DATETIME2(6)"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"mssql dialect: type ${other.sql}")
    }
    def literal(l: Literal): String = l.dataType match {
      // no TRUE/FALSE keywords in T-SQL, and no DATE/TIMESTAMP introducers —
      // typed literals go through explicit CASTs of their text form
      case BooleanType if l.value != null =>
        if (l.value.asInstanceOf[Boolean]) "CAST(1 AS BIT)" else "CAST(0 AS BIT)"
      case DateType if l.value != null =>
        s"CAST('${java.time.LocalDate.ofEpochDay(l.value.asInstanceOf[Int].toLong)}' AS DATE)"
      case _: TimestampType | _: TimestampNTZType if l.value != null =>
        val i = java.time.Instant.EPOCH.plus(
          l.value.asInstanceOf[Long], java.time.temporal.ChronoUnit.MICROS)
        val t = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        val frac = if (t.getNano == 0) "" else f".${t.getNano / 1000}%06d"
        s"CAST('${t.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))}$frac' AS DATETIME2(6))"
      case _ => ansiLiteral(l)
    }
    override def dateField(field: String, child: String): Option[String] =
      Some(s"DATEPART($field, $child)")
    override def semiAntiAsExists: Boolean = true
    // T-SQL booleans are predicates, never values: a comparison cannot be
    // selected, aggregated, or sorted. The trait's CASE WHEN 1/0 (INT, not
    // BIT) is the right value form — BIT would break min/max/sum, whose T-SQL
    // operand rules reject the bit type.
    override def booleanAsValue: Boolean = false
    // error 1033: ORDER BY in a derived table needs TOP/OFFSET/FOR XML
    override def bareOrderBySuffix: String = " OFFSET 0 ROWS"
    override def integralDivide(l: String, r: String): String =
      s"CAST(($l / $r) AS BIGINT)"
    // SQL Server keeps the ARGUMENT type: COUNT is INT, SUM(int) is INT
    // (overflows where Spark's BIGINT doesn't), AVG(int) is INT (truncated
    // values), decimal AVG preserves the input scale — so int sums accumulate
    // as BIGINT, int averages as FLOAT, and decimal averages over the child
    // pre-cast to Spark's result type
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case _: Count => Some(LongType)
        case other => ansiAggResultCast(other)
      }
    override def aggChildCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case s: Sum if isIntegral(s.child.dataType) &&
          s.child.dataType != LongType => Some(LongType)
        case a: Average if isIntegral(a.child.dataType) => Some(DoubleType)
        case a: Average => a.dataType match {
          case d: DecimalType => Some(d)
          case _ => None
        }
        case _ => None
      }
    // T-SQL's ROW_NUMBER/RANK return bigint; Spark's are INT
    override def rankResultCast: Option[DataType] = Some(IntegerType)
    // T-SQL has & and | but no shift operators; RIGHT_SHIFT/LEFT_SHIFT are
    // SQL Server 2022+ (the reference's sqlglot target emits the same)
    override def shiftRight(l: String, r: String): String = s"RIGHT_SHIFT($l, $r)"
    override def shiftLeft(l: String, r: String): String = s"LEFT_SHIFT($l, $r)"
    override def limitSuffix(n: Int, hasOrderBy: Boolean): String =
      if (hasOrderBy) s" OFFSET 0 ROWS FETCH NEXT $n ROWS ONLY"
      else s" ORDER BY (SELECT NULL) OFFSET 0 ROWS FETCH NEXT $n ROWS ONLY"
    override def sortItem(child: String, dir: String, nullsFirst: Boolean): Seq[String] = {
      val native = (dir == "ASC" && nullsFirst) || (dir == "DESC" && !nullsFirst)
      if (native) Seq(s"$child $dir")
      else Seq(s"(CASE WHEN $child IS NULL THEN 1 ELSE 0 END) " +
        s"${if (nullsFirst) "DESC" else "ASC"}", s"$child $dir")
    }
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi | LeftAnti => throw new UnsupportedOperationException(
        "mssql dialect: semi/anti joins render as EXISTS (semiAntiAsExists)")
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      s"(VALUES ${rows.mkString(", ")}) AS ${quote(alias)}(${cols.map(quote).mkString(", ")})"
    override def listAggSql(distinct: String, child: String, delim: String,
        order: Seq[String]): String = {
      val within =
        if (order.isEmpty) "" else s" WITHIN GROUP (ORDER BY ${order.mkString(", ")})"
      s"STRING_AGG($distinct$child, $delim)$within"
    }
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case _: graft.functions.InterleaveBits => throw new UnsupportedOperationException(
        "mssql dialect: zorder_key's bound-once expansion needs outer references " +
          "inside a derived table (T-SQL requires APPLY for lateral correlation) " +
          "— compute the Morton key engine-side")
      case da: DateAdd =>
        s"DATEADD(day, ${rendered(da.days)}, ${rendered(da.startDate)})"
      case ds: DateSub =>
        s"DATEADD(day, -(${rendered(ds.days)}), ${rendered(ds.startDate)})"
      // SQL Server 2022's DATETRUNC takes a keyword unit, like BigQuery
      case t: TruncTimestamp => t.format match {
        case Literal(f, StringType) if f != null &&
            Set("year", "quarter", "month", "week", "day", "hour", "minute",
              "second")(f.toString.toLowerCase) =>
          s"DATETRUNC(${f.toString.toLowerCase}, ${rendered(t.timestamp)})"
        case other => throw new UnsupportedOperationException(
          s"mssql dialect: date_trunc with unit $other")
      }
      // CHARINDEX takes (needle, haystack) — Spark's instr is (haystack, needle)
      case si: StringInstr =>
        s"CHARINDEX(${rendered(si.substr)}, ${rendered(si.str)})"
      case sw: StartsWith =>
        s"(LEFT(${rendered(sw.left)}, LEN(${rendered(sw.right)})) = ${rendered(sw.right)})"
      case ew: EndsWith =>
        s"(RIGHT(${rendered(ew.left)}, LEN(${rendered(ew.right)})) = ${rendered(ew.right)})"
      case ct: Contains =>
        s"(CHARINDEX(${rendered(ct.right)}, ${rendered(ct.left)}) > 0)"
      case m: Md5 =>
        s"LOWER(CONVERT(VARCHAR(32), HASHBYTES('MD5', ${rendered(md5Arg(m))}), 2))"
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"mssql dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "concat", "abs", "round",
      "floor", "sqrt", "exp", "sign", "trim", "ltrim", "rtrim", "replace",
      "reverse", "greatest", "least", "nullif", "left", "right", "concat_ws",
      // 2-arg LOG is argument-REVERSED in T-SQL (LOG(x, base)) and refuses
      "log10", "degrees", "radians", "cot", "translate")
    private val renamed = Map(
      // LEN ignores trailing spaces (documented T-SQL quirk)
      "length" -> "LEN",
      "ceil" -> "CEILING", "ceiling" -> "CEILING",
      "ln" -> "LOG", "pow" -> "POWER", "power" -> "POWER",
      "repeat" -> "REPLICATE", "substring" -> "SUBSTRING",
      "btrim" -> "trim",
      "stddev_samp" -> "STDEV", "stddev_pop" -> "STDEVP",
      "var_samp" -> "VAR", "var_pop" -> "VARP")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** Oracle dialect (reference `OracleDialect`, `inner_dialect.rs:383-398` —
    * uppercase-default identifier quoting; the grammar differences live
    * here): every FROM-less SELECT gains `FROM dual`; LIMIT renders as ANSI
    * `FETCH FIRST n ROWS ONLY` (12c+); `%` does not exist — `MOD(a, b)`; the
    * n-ary `concat` folds to the `||` operator (Oracle's CONCAT is strictly
    * binary); `CAST(TRUNC(l / r) AS NUMBER(19,0))` integer division over
    * exact NUMBER arithmetic; `LOWER(RAWTOHEX(STANDARD_HASH(x, 'MD5')))`;
    * VARCHAR2/NUMBER/BINARY_DOUBLE CAST targets (BOOLEAN per 23ai). Inline
    * VALUES render as UNION ALL over dual; reverse/concat_ws and the Morton
    * expansion fail loudly. Snapshot posture (no Oracle here).
    */
  object OracleDialect extends Dialect {
    // Oracle's REGEXP_LIKE is a partial-match CONDITION (predicate
    // position only — consistent with booleanAsValue=false);
    // REGEXP_REPLACE replaces every occurrence by default; REGEXP_SUBSTR's
    // miss semantics (NULL, and '' IS NULL in Oracle) cannot express
    // Spark's ''-on-miss — extract refuses
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"REGEXP_LIKE($s, $p)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"REGEXP_REPLACE($s, $p, $r)")
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"oracle dialect: no parquet table function for directory scan $rootPath " +
          "— register the table (external table) under its logical name")
    }
    def typeName(dt: DataType): String = dt match {
      case StringType => "VARCHAR2(4000)"
      case IntegerType => "NUMBER(10,0)"
      case LongType => "NUMBER(19,0)"
      case ShortType => "NUMBER(5,0)"
      case ByteType => "NUMBER(3,0)"
      case DoubleType => "BINARY_DOUBLE"
      case FloatType => "BINARY_FLOAT"
      case BooleanType => "BOOLEAN" // 23ai; earlier servers have no SQL boolean
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP"
      case _: TimestampType => "TIMESTAMP"
      case d: DecimalType => s"NUMBER(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"oracle dialect: type ${other.sql}")
    }
    def literal(l: Literal): String = l.dataType match {
      // pre-23ai Oracle has no TRUE/FALSE keywords; booleans travel as 0/1
      // (booleanAsValue=false keeps every boolean context numeric)
      case BooleanType if l.value != null =>
        if (l.value.asInstanceOf[Boolean]) "1" else "0"
      case _ => ansiLiteral(l)
    }
    override def preferExtract: Boolean = true
    override def semiAntiAsExists: Boolean = true
    // no SQL boolean before 23ai: predicates in value position become
    // CASE WHEN 1/0, value-shaped booleans in predicate position compare = 1
    override def booleanAsValue: Boolean = false
    // `SELECT *, extra` is ORA-00936 — the star must qualify as `t.*`
    override def qualifiedStarWithItems: Boolean = true
    // no IS NOT DISTINCT FROM in Oracle's grammar (any version)
    override def nullSafeEq(l: String, r: String): String = nullSafeEqEmulated(l, r)
    override def integralDivide(l: String, r: String): String =
      s"CAST(TRUNC($l / $r) AS NUMBER(19,0))"
    // Oracle types every aggregate as NUMBER — count/sum/avg/stddev all
    // need the CAST back to Spark's BIGINT/DOUBLE/decimal result
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case _: Count => Some(LongType)
        case a: Average if a.dataType == DoubleType => Some(DoubleType)
        case other => ansiAggResultCast(other)
      }
    // Oracle SQL has no shift operators and only BITAND: shifts render as
    // exact power-of-two arithmetic (counts are small literals over
    // non-negative grouping ids), OR via the inclusion-exclusion identity
    override def shiftRight(l: String, r: String): String =
      s"TRUNC($l / POWER(2, $r))"
    override def shiftLeft(l: String, r: String): String = s"($l * POWER(2, $r))"
    override def bitAnd(l: String, r: String): String = s"BITAND($l, $r)"
    override def bitOr(l: String, r: String): String =
      s"($l + $r - BITAND($l, $r))"
    override def remainder(l: String, r: String): String = s"MOD($l, $r)"
    override def limitSuffix(n: Int, hasOrderBy: Boolean): String =
      s" FETCH FIRST $n ROWS ONLY"
    override def fromless(select: String): String = s"$select FROM dual"
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi | LeftAnti => throw new UnsupportedOperationException(
        "oracle dialect: semi/anti joins render as EXISTS (semiAntiAsExists)")
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      unionAllValues(rows, alias, cols) // pre-23 Oracle has no VALUES clause
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case _: graft.functions.InterleaveBits => throw new UnsupportedOperationException(
        "oracle dialect: zorder_key's bound-once expansion needs outer references " +
          "inside a derived table (Oracle requires LATERAL) — compute the " +
          "Morton key engine-side")
      case da: DateAdd => s"(${rendered(da.startDate)} + ${rendered(da.days)})"
      case ds: DateSub => s"(${rendered(ds.startDate)} - ${rendered(ds.days)})"
      // TRUNC(ts, fmt) with Oracle's format-model spellings for the unit
      case t: TruncTimestamp => t.format match {
        case Literal(f, StringType) if f != null &&
            Map("year" -> "YYYY", "quarter" -> "Q", "month" -> "MM",
              "week" -> "IW", "day" -> "DD", "hour" -> "HH24",
              "minute" -> "MI").contains(f.toString.toLowerCase) =>
          val fmt = Map("year" -> "YYYY", "quarter" -> "Q", "month" -> "MM",
            "week" -> "IW", "day" -> "DD", "hour" -> "HH24",
            "minute" -> "MI")(f.toString.toLowerCase)
          s"TRUNC(${rendered(t.timestamp)}, '$fmt')"
        case other => throw new UnsupportedOperationException(
          s"oracle dialect: date_trunc with unit $other")
      }
      // Oracle CONCAT is strictly binary; fold n-ary concat into ||
      case c: Concat if c.children.size >= 2 =>
        c.children.map(rendered).mkString("(", " || ", ")")
      case sw: StartsWith =>
        s"(SUBSTR(${rendered(sw.left)}, 1, LENGTH(${rendered(sw.right)})) = ${rendered(sw.right)})"
      case ew: EndsWith =>
        s"(SUBSTR(${rendered(ew.left)}, -LENGTH(${rendered(ew.right)})) = ${rendered(ew.right)})"
      case ct: Contains =>
        s"(INSTR(${rendered(ct.left)}, ${rendered(ct.right)}) > 0)"
      case m: Md5 =>
        s"LOWER(RAWTOHEX(STANDARD_HASH(${rendered(md5Arg(m))}, 'MD5')))"
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"oracle dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "length", "abs", "round",
      "floor", "ceil", "sqrt", "exp", "ln", "sign", "trim", "ltrim", "rtrim",
      "replace", "lpad", "rpad", "greatest", "least", "nullif", "instr",
      "stddev_samp", "stddev_pop", "var_samp", "var_pop", "corr",
      "covar_samp", "covar_pop", "median",
      // LOG(base, expr) is base-first like Spark's; no degrees/radians/cot/
      // cbrt/log10 in Oracle's function set
      "sinh", "cosh", "tanh", "translate", "initcap", "log")
    private val renamed = Map(
      "substring" -> "SUBSTR", "ceiling" -> "ceil",
      "pow" -> "POWER", "power" -> "POWER", "mod" -> "MOD",
      "btrim" -> "trim")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** Trino dialect — the reference's lingua franca: its ibis server PARSES
    * every planned SQL as Trino (`ibis-server/app/mdl/rewriter.py:89`
    * `_get_read_dialect` returns `"trino"`) and WRITES Trino for the trino,
    * athena, and canner data sources (`rewriter.py:93-94`,
    * `app/model/data_source.py:69-87`). Near-ANSI with Trino's own edges:
    * no SEMI/ANTI syntax (EXISTS), `strpos`/`starts_with` but NO string
    * `left`/`right`/`repeat` (Trino's `repeat` builds an ARRAY — never
    * emitted for strings) and no `ends_with` (structural rendering over
    * substr/length), MD5 over VARBINARY (`lower(to_hex(md5(to_utf8(x))))`),
    * `date_add('day', n, d)` unit-string form, LISTAGG that REQUIRES a
    * WITHIN GROUP clause (unordered listagg renders as
    * `array_join(array_agg(x), d)`), and exact toward-zero integer division
    * via the remainder identity `(l - l % r) / r` (Trino `%` keeps the
    * dividend's sign, so the quotient matches Spark's `div` over the full
    * int64 range — no double rounding). Correlated outer references inside
    * a derived table are outside Trino's documented decorrelation support,
    * so the Morton expansion fails loudly. No Trino server in this sandbox:
    * pinned goldens + generation gates, plus the grammar sweep's Trino texts
    * EXECUTED in DuckDB (shared ANSI core) by `tools/unparse_sweep.py`.
    */
  object TrinoDialect extends Dialect {
    // Trino's split_part is NULL-on-overflow where Spark is '' — the
    // guard keeps NULL inputs NULL
    override def splitPart(s: String, delim: String, n: Int): Option[String] =
      Some(s"(CASE WHEN ($s IS NULL) OR ($delim IS NULL) THEN NULL " +
        s"ELSE coalesce(split_part($s, $delim, $n), '') END)")
    // regexp_like is Trino's partial-match predicate; replace is global by
    // default; extract is NULL-on-miss where Spark is '' (NULL inputs stay
    // NULL through the guard)
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"regexp_like($s, $p)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"regexp_replace($s, $p, $r)")
    override def regexpExtract(s: String, p: String, idx: Int): Option[String] =
      Some(s"(CASE WHEN ($s IS NULL) OR ($p IS NULL) THEN NULL " +
        s"ELSE coalesce(regexp_extract($s, $p, $idx), '') END)")
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"trino dialect: no parquet table function for directory scan $rootPath " +
          "— register the table (hive/iceberg catalog) under its logical name")
    }
    def typeName(dt: DataType): String = dt match {
      case StringType => "VARCHAR"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP"
      case _: TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"trino dialect: type ${other.sql}")
    }
    def literal(l: Literal): String = ansiLiteral(l)
    override def preferExtract: Boolean = true
    override def semiAntiAsExists: Boolean = true
    // (l - l % r) / r: exact toward-zero quotient with no double detour —
    // bigint `/` would already truncate, but this form is also exact for
    // DECIMAL operands (the subtraction leaves an exactly divisible value)
    override def integralDivide(l: String, r: String): String =
      s"CAST((($l - ($l % $r)) / $r) AS BIGINT)"
    // Trino sums decimals at (38,s) and its decimal AVG PRESERVES the input
    // scale (rounded values vs Spark's s+4) — averaging the child pre-cast to
    // Spark's result type makes Trino keep Spark's scale. Integral-SUM casts
    // are no-ops on Trino (already BIGINT) and keep the sandbox's DuckDB
    // execution of these texts type-exact (DuckDB sums integrals as HUGEINT)
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      ansiAggResultCast(fn)
    override def rankResultCast: Option[DataType] = Some(IntegerType)
    // Trino's series builder is the ARRAY-valued sequence(), expanded with a
    // FROM-positioned UNNEST; interval literals are single-unit quoted-value
    override def sequenceFn(start: String, stop: String, step: Option[String],
        et: DataType): Option[String] =
      Some(s"sequence($start, $stop${step.map(", " + _).getOrElse("")})")
    override def unnestJoin(arr: String, alias: String, col: String): Option[String] =
      Some(s"CROSS JOIN UNNEST($arr) AS $alias($col)")
    override def intervalLiteral(months: Long, micros: Long): String =
      if (micros == 0) {
        if (months % 12 == 0) s"INTERVAL '${months / 12}' YEAR"
        else s"INTERVAL '$months' MONTH"
      } else if (months == 0) {
        Seq("DAY" -> 86400000000L, "HOUR" -> 3600000000L,
            "MINUTE" -> 60000000L, "SECOND" -> 1000000L)
          .collectFirst { case (u, f) if micros % f == 0 =>
            s"INTERVAL '${micros / f}' $u" }
          .getOrElse(throw new UnsupportedOperationException(
            "trino: sub-second INTERVAL literal"))
      } else throw new UnsupportedOperationException(
        "trino: mixed year-month + day-time INTERVAL literal")
    // Trino bit machinery is function-spelled (bitwise_and/bitwise_right_shift)
    override def shiftRight(l: String, r: String): String =
      s"bitwise_right_shift($l, $r)"
    override def shiftLeft(l: String, r: String): String =
      s"bitwise_left_shift($l, $r)"
    override def bitAnd(l: String, r: String): String = s"bitwise_and($l, $r)"
    override def bitOr(l: String, r: String): String = s"bitwise_or($l, $r)"
    override def aggChildCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case a: Average => a.dataType match {
          case d: DecimalType => Some(d)
          case _ => None
        }
        case _ => None
      }
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi | LeftAnti => throw new UnsupportedOperationException(
        "trino dialect: semi/anti joins render as EXISTS (semiAntiAsExists)")
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      s"(VALUES ${rows.mkString(", ")}) AS ${quote(alias)}(${cols.map(quote).mkString(", ")})"
    // Trino's LISTAGG grammar REQUIRES WITHIN GROUP; the unordered form
    // renders as array_join(array_agg(x), d) instead of invalid SQL
    override def listAggSql(distinct: String, child: String, delim: String,
        order: Seq[String]): String =
      if (order.isEmpty) s"array_join(array_agg($distinct$child), $delim)"
      else s"listagg($distinct$child, $delim) WITHIN GROUP (ORDER BY ${order.mkString(", ")})"
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case _: graft.functions.InterleaveBits => throw new UnsupportedOperationException(
        "trino dialect: zorder_key's bound-once expansion needs outer " +
          "references inside a derived table, outside Trino's documented " +
          "decorrelation support — compute the Morton key engine-side")
      case da: DateAdd =>
        s"date_add('day', ${rendered(da.days)}, ${rendered(da.startDate)})"
      case ds: DateSub =>
        s"date_add('day', -(${rendered(ds.days)}), ${rendered(ds.startDate)})"
      // Trino MD5 is VARBINARY→VARBINARY; Spark's STRING→BINARY cast maps to
      // to_utf8, to_hex yields uppercase where Spark emits lowercase
      case m: Md5 => s"lower(to_hex(md5(to_utf8(${rendered(md5Arg(m))}))))"
      // no ends_with builtin: structural rendering with Spark's null/empty
      // semantics (s='' → true via substr past the end returning '')
      case ew: EndsWith =>
        val (x, s) = (rendered(ew.left), rendered(ew.right))
        s"((length($x) >= length($s)) AND (substr($x, length($x) - length($s) + 1) = $s))"
      // Trino's contains(array, elem) is ARRAY containment, not substring
      case ct: Contains =>
        s"(strpos(${rendered(ct.left)}, ${rendered(ct.right)}) > 0)"
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"trino dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "length", "concat", "abs",
      "round", "floor", "ceil", "ceiling", "trim", "ltrim", "rtrim", "replace",
      "lpad", "rpad", "reverse", "greatest", "least", "nullif", "sqrt", "ln",
      "exp", "sign", "date_trunc", "concat_ws", "pow", "power", "mod",
      // ANSI statistical aggregates (Trino aggregate docs; no bare median —
      // Trino spells that approx_percentile, out of the curated subset)
      "stddev_samp", "stddev_pop", "var_samp", "var_pop", "corr",
      "covar_samp", "covar_pop",
      // math family (log(b,x) is base-first like Spark); no cot in Trino
      "log10", "log2", "log", "degrees", "radians", "sinh", "cosh", "tanh",
      "cbrt", "translate")
    private val renamed = Map("substring" -> "substr", "instr" -> "strpos",
      "levenshtein" -> "levenshtein_distance",
      "startswith" -> "starts_with", "btrim" -> "trim")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  /** Redshift dialect — the reference transpiles to sqlglot's `redshift`
    * (`app/model/data_source.py:78`, `rewriter.py:96-100` default branch), a
    * Postgres-family target whose REAL divergences from the Postgres dialect
    * are carried here: no `div()` function (integer `/` already truncates
    * toward zero in Redshift's PG-8 lineage; decimal operands go through
    * `TRUNC`), no `starts_with` builtin (structural `left`/`length`
    * rendering), LISTAGG WITHIN GROUP instead of `string_agg(... ORDER BY)`,
    * and NO VALUES table constructor (inline rows render as UNION ALL —
    * Redshift only accepts VALUES in INSERT). The Morton expansion fails
    * loudly: Redshift's correlated-subquery decorrelation rejects outer
    * references inside derived tables. Snapshot posture (no server here);
    * the grammar sweep's Redshift texts are DuckDB-executed like Postgres's.
    */
  object RedshiftDialect extends Dialect {
    // native 1-based split_part with Spark's ''-on-overflow
    override def splitPart(s: String, delim: String, n: Int): Option[String] =
      Some(s"split_part($s, $delim, $n)")
    // Postgres-heritage `~` partial match; REGEXP_REPLACE replaces every
    // occurrence by default; REGEXP_SUBSTR cannot reach Spark's group/miss
    // semantics, so extract refuses
    override def regexpMatch(s: String, p: String): Option[String] =
      Some(s"($s ~ $p)")
    override def regexpReplaceAll(s: String, p: String, r: String): Option[String] =
      Some(s"REGEXP_REPLACE($s, $p, $r)")
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def relation(rootPath: String): String = {
      val base = rootPath.stripSuffix("/").split('/').last
      if (base.endsWith(".parquet")) quote(base.stripSuffix(".parquet"))
      else throw new UnsupportedOperationException(
        s"redshift dialect: no parquet table function for directory scan $rootPath " +
          "— register the table (Spectrum external table) under its logical name")
    }
    def typeName(dt: DataType): String = dt match {
      // Redshift's widest varchar is the explicit 65535 — it has no
      // SQL-Server-style VARCHAR(MAX) (caught by the DuckDB-executed sweep)
      case StringType => "VARCHAR(65535)"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "SMALLINT" // no TINYINT in Redshift
      case DoubleType => "DOUBLE PRECISION"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP"
      case _: TimestampType => "TIMESTAMP"
      case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
      case other => throw new UnsupportedOperationException(
        s"redshift dialect: type ${other.sql}")
    }
    def literal(l: Literal): String = ansiLiteral(l)
    override def preferExtract: Boolean = true
    override def semiAntiAsExists: Boolean = true
    // no div() in Redshift; integer `/` truncates toward zero already and
    // TRUNC covers decimal operands (exact NUMERIC arithmetic, no doubles)
    override def integralDivide(l: String, r: String): String =
      s"CAST(TRUNC($l / $r) AS BIGINT)"
    // Redshift sums decimals at (38,s); its integer AVG returns an INTEGER
    // TYPE — truncated VALUES — so the child is averaged as DOUBLE PRECISION.
    // Redshift's ranking functions return BIGINT; Spark's are INT
    override def rankResultCast: Option[DataType] = Some(IntegerType)
    // The integral-SUM cast is a no-op on Redshift (already BIGINT) and keeps
    // the sandbox's DuckDB execution of these texts type-exact (HUGEINT sums)
    override def aggResultCast(fn: AggregateFunction): Option[DataType] =
      ansiAggResultCast(fn)
    override def aggChildCast(fn: AggregateFunction): Option[DataType] =
      fn match {
        case a: Average if isIntegral(a.child.dataType) => Some(DoubleType)
        case _ => None
      }
    def joinKeyword(jt: JoinType): String = jt match {
      case Inner => "JOIN"
      case Cross => "CROSS JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi | LeftAnti => throw new UnsupportedOperationException(
        "redshift dialect: semi/anti joins render as EXISTS (semiAntiAsExists)")
      case other => throw new UnsupportedOperationException(
        s"unparse: join type $other")
    }
    def values(rows: Seq[String], alias: String, cols: Seq[String]): String =
      unionAllValues(rows, alias, cols) // Redshift: VALUES only in INSERT
    // ANSI LISTAGG WITHIN GROUP (Redshift has no string_agg) = trait default
    def fallback(e: Expression, rendered: Expression => String): String = e match {
      case _: graft.functions.InterleaveBits => throw new UnsupportedOperationException(
        "redshift dialect: zorder_key's bound-once expansion needs outer " +
          "references inside a derived table, outside Redshift's documented " +
          "correlated-subquery patterns — compute the Morton key engine-side")
      case da: DateAdd => s"(${rendered(da.startDate)} + ${rendered(da.days)})"
      case ds: DateSub => s"(${rendered(ds.startDate)} - ${rendered(ds.days)})"
      // Redshift MD5 takes VARCHAR and yields hex text like Spark's (the
      // Spark-inserted STRING→BINARY cast is stripped)
      case m: Md5 => s"md5(${rendered(md5Arg(m))})"
      // no starts_with/ends_with/contains builtins (Postgres-family posture)
      case sw: StartsWith =>
        s"(left(${rendered(sw.left)}, length(${rendered(sw.right)})) = ${rendered(sw.right)})"
      case ew: EndsWith =>
        s"(right(${rendered(ew.left)}, length(${rendered(ew.right)})) = ${rendered(ew.right)})"
      case ct: Contains =>
        s"(strpos(${rendered(ct.left)}, ${rendered(ct.right)}) > 0)"
      // Redshift CONCAT is strictly binary; fold n-ary concat into ||
      case c: Concat if c.children.size >= 2 =>
        c.children.map(rendered).mkString("(", " || ", ")")
      case _ => fnName(e.prettyName) match {
        case Some(n) => s"$n(${e.children.map(rendered).mkString(", ")})"
        case None => throw new UnsupportedOperationException(
          s"redshift dialect: unsupported expression ${e.prettyName} in ${e.sql}")
      }
    }
    private val direct = Set("upper", "lower", "length", "abs",
      "round", "floor", "ceil", "ceiling", "trim", "btrim", "ltrim", "rtrim",
      "replace", "lpad", "rpad", "reverse", "greatest", "least", "nullif",
      "sqrt", "ln", "exp", "sign", "initcap",
      "date_trunc", "left", "right", "repeat", "mod",
      // Redshift aggregate docs: stddev/var families + MEDIAN exist;
      // corr/covar do not — they fail loudly
      "stddev_samp", "stddev_pop", "var_samp", "var_pop", "median",
      // math + string family (no hyperbolics in Redshift)
      "degrees", "radians", "cot", "cbrt", "translate")
    private val renamed = Map("substring" -> "substr", "instr" -> "strpos",
      // Redshift's single-argument LOG is base-10
      "log10" -> "LOG",
      "pow" -> "POWER", "power" -> "POWER")
    def fnName(prettyName: String): Option[String] = {
      val p = prettyName.toLowerCase
      if (direct(p)) Some(p) else renamed.get(p)
    }
  }

  private final class Generator(dialect: Dialect, referenced: Set[ExprId]) {
    private var counter = 0
    private def freshAlias(): String = { counter += 1; s"t$counter" }

    // Globally-unique per-ExprId names, numbered in first-visit order rather
    // than by raw exprId: exprIds are JVM-lifetime counters, so using them
    // verbatim would make the emitted text differ run-to-run and break golden
    // comparisons; visit order is a function of the plan alone.
    private val names = scala.collection.mutable.LinkedHashMap.empty[ExprId, String]
    def cname(a: Attribute): String =
      names.getOrElseUpdate(a.exprId, s"c${names.size + 1}")
    private def cnameById(id: ExprId): String =
      names.getOrElseUpdate(id, s"c${names.size + 1}")
    private def q(s: String) = dialect.quote(s)
    private def sub(plan: LogicalPlan): String =
      s"(${render(plan)}) ${q(freshAlias())}"

    private def selectItem(ne: NamedExpression): String = ne match {
      case al: Alias => s"${rv(al.child)} AS ${q(cnameById(al.exprId))}"
      case a: Attribute => s"${q(cname(a))} AS ${q(cname(a))}"
      case other => throw new UnsupportedOperationException(
        s"unparse: named expression $other")
    }

    /** Boolean value/predicate bridging for dialects without first-class
      * boolean values ([[Dialect.booleanAsValue]] = false — T-SQL, Oracle):
      * those grammars split booleans into PREDICATES (WHERE/ON/CASE WHEN) and
      * VALUES (select items, aggregate args, sort keys) with no implicit
      * coercion either way. [[rv]] renders an expression in value position — a
      * predicate-shaped boolean wraps into the dialect's CASE WHEN 1/0 form;
      * [[rp]] renders in predicate position — a value-shaped boolean (column,
      * literal, CASE result) compares `= 1`, with NULL propagating identically
      * (NULL = 1 is NULL, as the NULL boolean was). Every other dialect: both
      * are exactly [[re]].
      */
    private def valueShaped(e: Expression): Boolean = e match {
      case al: Alias => valueShaped(al.child)
      // aggregates and windows over booleans convert their CHILD (reAgg
      // renders via rv), so the call itself already yields a 0/1 value —
      // wrapping it again would put a value where CASE WHEN needs a predicate
      case _: Attribute | _: Literal | _: Cast | _: CaseWhen | _: If |
           _: Coalesce | _: ScalarSubquery | _: AggregateExpression |
           _: WindowExpression => true
      case _ => false
    }
    def rv(e: Expression): String =
      if (!dialect.booleanAsValue && e.dataType == BooleanType && !valueShaped(e))
        dialect.boolToValue(re(e))
      else re(e)
    def rp(e: Expression): String =
      if (!dialect.booleanAsValue && e.dataType == BooleanType && valueShaped(e))
        s"(${re(e)} = 1)"
      else re(e)

    def render(plan: LogicalPlan): String = plan match {
      case Project(list, _: OneRowRelation) =>
        dialect.fromless(s"SELECT ${list.map(selectItem).mkString(", ")}")
      // column pruning can empty the list entirely (a count(*) subquery needs
      // only row multiplicity); SQL demands at least one item
      case Project(Nil, child) =>
        s"SELECT 1 AS ${q(freshAlias())} FROM ${sub(child)}"
      case Project(list, child) =>
        s"SELECT ${list.map(selectItem).mkString(", ")} FROM ${sub(child)}"
      case Filter(cond, child) =>
        s"SELECT * FROM ${sub(child)} WHERE ${rp(cond)}"
      case a: Aggregate =>
        val groups = if (a.groupingExpressions.isEmpty) ""
          else s" GROUP BY ${a.groupingExpressions.map(rv).mkString(", ")}"
        s"SELECT ${a.aggregateExpressions.map(selectItem).mkString(", ")}" +
          s" FROM ${sub(a.child)}$groups"
      // Engines without SEMI/ANTI JOIN syntax express those join types as
      // correlated (NOT) EXISTS — sound here because every column name is
      // globally unique, so the condition's references bind unambiguously to
      // the outer (left) scope and the subquery's own columns.
      case j: Join if dialect.semiAntiAsExists &&
          (j.joinType == LeftSemi || j.joinType == LeftAnti) =>
        val leftAlias = q(freshAlias())
        val neg = if (j.joinType == LeftAnti) "NOT " else ""
        val cond = j.condition.map(rp).getOrElse("TRUE")
        s"SELECT $leftAlias.* FROM (${render(j.left)}) $leftAlias " +
          s"WHERE ${neg}EXISTS (SELECT 1 FROM ${sub(j.right)} WHERE $cond)"
      case j: Join =>
        val kw = dialect.joinKeyword(j.joinType)
        val leftAlias = q(freshAlias())
        val projection = j.joinType match {
          case LeftSemi | LeftAnti => s"$leftAlias.*"
          case _ => "*"
        }
        val on = j.condition.map(c => s" ON ${rp(c)}").getOrElse("")
        s"SELECT $projection FROM (${render(j.left)}) $leftAlias $kw ${sub(j.right)}$on"
      case s: Sort =>
        s"SELECT * FROM ${sub(s.child)} ORDER BY " +
          s.order.flatMap(reSort).mkString(", ") + dialect.bareOrderBySuffix
      case GlobalLimit(IntegerLiteral(n), child) =>
        val inner = child match {
          case LocalLimit(IntegerLiteral(_), grandchild) => grandchild
          case other => other
        }
        // ORDER BY immediately under LIMIT must stay in the same SELECT: both
        // engines are free to ignore a subquery-level ORDER BY, which would
        // turn top-K into an arbitrary K.
        inner match {
          case s: Sort =>
            s"SELECT * FROM ${sub(s.child)} ORDER BY " +
              s"${s.order.flatMap(reSort).mkString(", ")}" +
              dialect.limitSuffix(n, hasOrderBy = true)
          case other =>
            s"SELECT * FROM ${sub(other)}" + dialect.limitSuffix(n, hasOrderBy = false)
        }
      case w: Window =>
        val extra = w.windowExpressions.map(selectItem)
        // Oracle rejects `SELECT *, extra` — a star combined with other select
        // items must be alias-qualified (`t.*`). Inlined sub() so the alias is
        // allocated AFTER the child renders (freshAlias numbering is
        // visit-order-stable for the goldens) and can qualify the star.
        val childSql = render(w.child)
        val alias = q(freshAlias())
        val star = if (dialect.qualifiedStarWithItems) s"$alias.*" else "*"
        s"SELECT ${(star +: extra).mkString(", ")} FROM ($childSql) $alias"
      case u: Union =>
        u.children.map(c => s"(${render(c)})").mkString(" UNION ALL ")
      case d: Distinct =>
        s"SELECT DISTINCT * FROM ${sub(d.child)}"
      case sa: SubqueryAlias => render(sa.child)
      // GROUPING SETS / ROLLUP / CUBE lower to Expand: one projection per
      // grouping set over the same child. UNION ALL of plain SELECTs is the
      // dialect-neutral exact equivalent (the grouping_id column is just one
      // more projected literal per branch).
      case ex: Expand =>
        ex.projections.map { proj =>
          val items = proj.zip(ex.output).map { case (e2, attr) =>
            s"${rv(e2)} AS ${q(cname(attr))}"
          }.mkString(", ")
          s"SELECT $items FROM ${sub(ex.child)}"
        }.mkString(" UNION ALL ")
      // UNNEST / table functions (explode, posexplode, inline, sequence …) —
      // generators are all function-shaped, so compose prettyName over re()
      // (falling back to `.sql` would re-break on internal literals).
      // LATERAL VIEW is Spark syntax: other dialects must refuse loudly rather
      // than emit text their engine cannot parse.
      case g: Generate if dialect == SparkDialect =>
        val gen = s"${g.generator.prettyName}(${g.generator.children.map(re).mkString(", ")})"
        val outer = if (g.outer) " OUTER" else ""
        val cols = g.generatorOutput.map(a => q(cname(a))).mkString(", ")
        s"SELECT * FROM ${sub(g.child)} LATERAL VIEW$outer $gen " +
          s"${q(freshAlias())} AS $cols"
      // Non-Spark engines have no LATERAL VIEW; a single-column non-outer
      // explode renders in the engine's own row-expansion idiom, preferring
      // (a) a FROM-positioned series table function for explode(sequence(..))
      // — the date-spine shape cumulative metrics emit — then (b) a
      // SELECT-positioned set-returning call (DuckDB unnest, ClickHouse
      // arrayJoin), then (c) CROSS JOIN UNNEST (Trino, BigQuery). Engines
      // providing none of these refuse loudly, as does any other generator.
      case g: Generate =>
        def refuse(): Nothing = throw new UnsupportedOperationException(
          s"unparse: generator ${g.generator.prettyName} (LATERAL VIEW) is not " +
            "expressible in this dialect")
        g.generator match {
          case e: Explode if !g.outer && g.generatorOutput.size == 1 =>
            val col = q(cname(g.generatorOutput.head))
            val childCols = g.requiredChildOutput.map(a => q(cname(a)))
            // ONLY a genuine one-row child may be elided: column pruning
            // empties a real table's projection too (Project(Nil, scan)),
            // and its row MULTIPLICITY still multiplies the exploded rows —
            // those render through sub(child)'s `SELECT 1 AS ..` shape
            val oneRow = g.child match {
              case _: OneRowRelation => true
              case Project(_, _: OneRowRelation) => true
              case _ => false
            }
            // Spark's sequence over DATEs yields DATEs, but every engine's
            // series builder that takes an interval step yields TIMESTAMPs
            // (DuckDB generate_series, Postgres's timestamp overload) — a
            // CAST back to DATE repairs the drift (a no-op on Trino, whose
            // sequence(date, date, interval) already yields dates)
            val needsDateRepair = e.child.isInstanceOf[Sequence] &&
              (e.child.dataType match {
                case ArrayType(DateType, _) => true
                case _ => false
              })
            def repair(x: String): String =
              if (needsDateRepair) s"CAST($x AS DATE)" else x
            e.child match {
              // constant-folded array (the optimizer folds
              // sequence(lit, lit, lit) — the cumulative-metric date spine —
              // into a literal): explode(literal) IS an inline table, and
              // every dialect already has a pinned VALUES / UNION-ALL
              // spelling, so ALL engines get this shape
              case lit0: Literal
                  if lit0.value != null && lit0.dataType.isInstanceOf[ArrayType] =>
                val et = lit0.dataType.asInstanceOf[ArrayType].elementType
                val elems = lit0.value
                  .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
                  .toObjectArray(et)
                if (elems.isEmpty) {
                  // the zero-row shape must still carry the child's columns:
                  // upstream operators reference them by name even though no
                  // row can flow (typed NULLs keep every engine's inference
                  // consistent with the non-empty CROSS JOIN shape)
                  val nulls = g.requiredChildOutput.map(a =>
                    s"CAST(NULL AS ${dialect.typeName(a.dataType)}) AS ${q(cname(a))}") :+
                    s"CAST(NULL AS ${dialect.typeName(et)}) AS $col"
                  dialect.fromless(s"SELECT ${nulls.mkString(", ")}") +
                    " WHERE 1 = 0"
                }
                else {
                  val rows = elems.toSeq.map(v =>
                    "(" + dialect.literal(Literal(v, et)) + ")")
                  val rel = dialect.values(rows, freshAlias(),
                    Seq(cname(g.generatorOutput.head)))
                  if (oneRow) s"SELECT $col FROM $rel"
                  else s"SELECT ${(childCols :+ col).mkString(", ")} " +
                    s"FROM ${sub(g.child)} CROSS JOIN $rel"
                }
              // non-foldable series: the engine's FROM-positioned series
              // table function — but only when the bounds carry no lateral
              // column references OR the dialect has no SELECT-positioned
              // alternative. DuckDB rejects lateral parameters to table
              // functions ("does not support lateral join column
              // parameters") while its scalar unnest(generate_series(..))
              // correlates fine, so correlated spines there ride the generic
              // explodeCall path below; Postgres, whose set-returning
              // generate_series IS implicitly LATERAL in FROM, keeps this
              // branch for both shapes.
              // guard probes with CONSTANT placeholders (as sequenceFn /
              // explodeCall already do): re(bound) in a guard would advance
              // the freshAlias counter on a discarded render when a bound
              // holds a scalar subquery, making alias numbering depend on
              // guard evaluation — the real bounds render exactly once below
              case s: Sequence
                  if dialect.seriesFrom("0", "1",
                      s.stepOpt.map(_ => "1")).isDefined &&
                    (s.references.isEmpty ||
                      dialect.sequenceFn("0", "1", None, IntegerType).isEmpty ||
                      dialect.explodeCall("x").isEmpty) =>
                val fn = dialect.seriesFrom(re(s.start), re(s.stop),
                  s.stepOpt.map(re)).get
                val rel = s"$fn ${q(freshAlias())}($col)"
                val colItem = if (needsDateRepair) s"${repair(col)} AS $col" else col
                if (oneRow) s"SELECT $colItem FROM $rel"
                else s"SELECT ${(childCols :+ colItem).mkString(", ")} " +
                  s"FROM ${sub(g.child)} CROSS JOIN $rel"
              case arrExpr =>
                dialect.explodeCall(re(arrExpr)) match {
                  case Some(call) =>
                    val items = (childCols :+ s"${repair(call)} AS $col").mkString(", ")
                    if (oneRow) dialect.fromless(s"SELECT $items")
                    else s"SELECT $items FROM ${sub(g.child)}"
                  case None =>
                    dialect.unnestJoin(re(arrExpr), q(freshAlias()), col) match {
                      case Some(join) =>
                        val colItem =
                          if (needsDateRepair) s"${repair(col)} AS $col" else col
                        val items = (childCols :+ colItem).mkString(", ")
                        val from =
                          if (oneRow) s"(${dialect.fromless("SELECT 1")}) ${q(freshAlias())}"
                          else sub(g.child)
                        s"SELECT $items FROM $from $join"
                      case None => refuse()
                    }
                }
            }
          case _ => refuse()
        }
      // Pure early-prune inserted under a Window + rank filter (e.g. rn <= k):
      // the Window/Filter above reproduce the semantics, so the text form just
      // passes through — the target engine re-derives its own pushdown.
      case wgl: WindowGroupLimit => render(wgl.child)
      case lr: LogicalRelation =>
        val path = lr.relation match {
          case fs: HadoopFsRelation
              if fs.fileFormat.isInstanceOf[
                org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
            fs.location.rootPaths.head.toString
          case fs: HadoopFsRelation => throw new UnsupportedOperationException(
            s"unparse: ${fs.fileFormat.toString} scan carries reader options " +
              "(schema/header/format conf) that standalone SQL text cannot express")
          case other => throw new UnsupportedOperationException(
            s"unparse: non-file relation ${other.getClass.getSimpleName}")
        }
        // scan only what the plan above names (referencedIds): narrower text,
        // and a column the query never uses — CLAC-hidden, grant-revoked —
        // never reaches the remote engine's select list. A scan consumed
        // purely for row multiplicity (count(*)) keeps a constant instead.
        val kept = lr.output.filter(a => referenced(a.exprId))
        val cols =
          if (kept.nonEmpty) kept.map(a => s"${q(a.name)} AS ${q(cname(a))}")
          else Seq(s"1 AS ${q(freshAlias())}")
        s"SELECT ${cols.mkString(", ")} FROM ${dialect.relation(path)}"
      case lr: LocalRelation =>
        val cols = lr.output.map(cname)
        if (lr.data.isEmpty) {
          val nulls = lr.output.map(a =>
            s"CAST(NULL AS ${dialect.typeName(a.dataType)}) AS ${q(cname(a))}")
          dialect.fromless(s"SELECT ${nulls.mkString(", ")}") + " WHERE 1 = 0"
        } else {
          val rows = lr.data.map { row =>
            lr.output.zipWithIndex.map { case (a, i) =>
              dialect.literal(Literal(row.get(i, a.dataType), a.dataType))
            }.mkString("(", ", ", ")")
          }
          s"SELECT * FROM ${dialect.values(rows, freshAlias(), cols)}"
        }
      case _: OneRowRelation => dialect.fromless("SELECT 1")
      case other => throw new UnsupportedOperationException(
        s"unparse: plan node ${other.getClass.getSimpleName} is not SQL-expressible here")
    }

    private def reSort(so: SortOrder): Seq[String] = {
      val dir = so.direction match {
        case Ascending => "ASC"; case Descending => "DESC" }
      dialect.sortItem(rv(so.child), dir, so.nullOrdering == NullsFirst)
    }

    /** Render an aggregate call. `applyResultCast = false` for window usage,
      * where the fidelity CAST must wrap the whole `fn OVER (spec)` text (the
      * WindowExpression case applies it) — `CAST(sum(x) AS ..) OVER (..)`
      * parses nowhere.
      */
    private def reAgg(ae: AggregateExpression,
        applyResultCast: Boolean = true): String = {
      val d = if (ae.isDistinct) "DISTINCT " else ""
      def arg(c: Expression): String =
        dialect.aggChildCast(ae.aggregateFunction) match {
          case Some(dt) => s"CAST(${rv(c)} AS ${dialect.typeName(dt)})"
          case None => rv(c)
        }
      val call = ae.aggregateFunction match {
        case Count(Seq(Literal(1, _))) if !ae.isDistinct => "count(*)"
        case c: Count => s"count($d${c.children.map(rv).mkString(", ")})"
        case s: Sum => s"sum($d${arg(s.child)})"
        case m: Min => s"min(${rv(m.child)})"
        case m: Max => s"max(${rv(m.child)})"
        case a: Average => s"avg($d${arg(a.child)})"
        // `.sql` prints the ordering as a bare third argument; the parseable
        // form is WITHIN GROUP (or the dialect's own spelling — string_agg
        // with inline ORDER BY on Postgres).
        case la: ListAgg =>
          dialect.listAggSql(d, re(la.child), re(la.delimiter),
            la.orderExpressions.flatMap(reSort))
        case other => dialect.fallback(
          renameRefs(if (ae.isDistinct) ae else other), re)
      }
      dialect.aggResultCast(ae.aggregateFunction) match {
        case Some(dt) if applyResultCast =>
          s"CAST($call AS ${dialect.typeName(dt)})"
        case _ => call
      }
    }

    def re(e: Expression): String = e match {
      case a: AttributeReference => q(cname(a))
      case al: Alias => re(al.child)
      case l: Literal => dialect.literal(l)
      case c: Cast => s"CAST(${re(c.child)} AS ${dialect.typeName(c.dataType)})"
      case co: CheckOverflow =>
        s"CAST(${re(co.child)} AS ${dialect.typeName(co.dataType)})"
      case k: KnownFloatingPointNormalized => re(k.child)
      case n: org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero =>
        re(n.child)
      // before the generic BinaryArithmetic case: its symbol is Spark's `div`
      // keyword, which no other engine parses
      case id: IntegralDivide => dialect.integralDivide(re(id.left), re(id.right))
      case r0: Remainder => dialect.remainder(re(r0.left), re(r0.right))
      // bitwise forms (grouping() over Expand, bit flags): operator spellings
      // differ per engine, so each routes through its dialect hook
      case ba: BitwiseAnd => dialect.bitAnd(re(ba.left), re(ba.right))
      case bo: BitwiseOr => dialect.bitOr(re(bo.left), re(bo.right))
      case sr: ShiftRight => dialect.shiftRight(re(sr.left), re(sr.right))
      case sl: ShiftLeft => dialect.shiftLeft(re(sl.left), re(sl.right))
      case And(l, r) => s"(${rp(l)} AND ${rp(r)})"
      case Or(l, r) => s"(${rp(l)} OR ${rp(r)})"
      case Not(c) => s"(NOT ${rp(c)})"
      case IsNull(c) => s"(${re(c)} IS NULL)"
      case IsNotNull(c) => s"(${re(c)} IS NOT NULL)"
      case e: EqualNullSafe =>
        dialect.nullSafeEq(rv(e.left), rv(e.right))
      case b: BinaryComparison => s"(${rv(b.left)} ${b.symbol} ${rv(b.right)})"
      case b: BinaryArithmetic => s"(${re(b.left)} ${b.symbol} ${re(b.right)})"
      case u: UnaryMinus => s"(- ${re(u.child)})"
      case i: In => s"(${rv(i.value)} IN (${i.list.map(rv).mkString(", ")}))"
      case i: InSet =>
        val items = i.hset.toSeq.map(v =>
          dialect.literal(Literal(v, i.child.dataType))).sorted
        s"(${re(i.child)} IN (${items.mkString(", ")}))"
      case l: Like =>
        // Spark's LIKE escapes with backslash (or an explicit ESCAPE char);
        // standard-conforming engines treat a bare pattern's backslash as a
        // literal, so the clause must travel with the text (see
        // Dialect.likeBackslashIsDefaultEscape). Literal patterns also route
        // through likePattern (T-SQL bracket-class neutralization).
        val pat = l.right match {
          case Literal(p, StringType) if p != null =>
            dialect.literal(Literal(dialect.likePattern(p.toString)))
          case other => rv(other)
        }
        val clause =
          if (l.escapeChar != '\\')
            dialect.likeEscapeClause(l.escapeChar).getOrElse(
              throw new UnsupportedOperationException(
                s"unparse: LIKE ESCAPE '${l.escapeChar}' has no spelling in " +
                  "this dialect"))
          else if (!dialect.likeBackslashIsDefaultEscape)
            dialect.likeEscapeClause('\\').getOrElse("")
          else ""
        s"(${rv(l.left)} LIKE $pat$clause)"
      // locate(sub, str) from position 1 IS instr(str, sub) — reusing each
      // dialect's audited instr mapping (strpos / POSITION / CHARINDEX with
      // their per-engine argument orders) instead of a second spelling table
      case sl: StringLocate if sl.start == Literal(1) =>
        re(StringInstr(sl.str, sl.substr))
      // split_part: Spark lowers it to element_at over an internal split;
      // engines with a native split_part(s, d, n) of the same 1-based
      // ''-on-overflow semantics render it directly (checked on DuckDB)
      case ea: ElementAt => (ea.left, ea.right) match {
        case (sp: StringSplitSQL, IntegerLiteral(n)) if n >= 1 =>
          (sp.delimiter match {
            case Literal(d, StringType) if d != null =>
              dialect.splitPart(rv(sp.str), dialect.literal(Literal(d.toString)), n)
            case _ => None
          }).getOrElse(dialect.fallback(renameRefs(ea), rv))
        case _ => dialect.fallback(renameRefs(ea), rv)
      }
      // Regex family: route through the dialect's spellings; a None hook or
      // an inexpressible shape (non-literal/flavor-specific replacement,
      // non-default start position, unreachable group index) falls back —
      // i.e. renders on Spark, refuses loudly everywhere else.
      case r0: RLike =>
        dialect.regexpMatch(rv(r0.left), rv(r0.right))
          .getOrElse(dialect.fallback(renameRefs(r0), rv))
      case rr: RegExpReplace =>
        // Spark replaces EVERY match from position 1; a replacement carrying
        // `$n`/`\n` group references is flavor-specific (Java `$1` vs RE2/
        // POSIX `\1`), so only plain-text replacements translate
        val globalFromStart = rr.pos match {
          case IntegerLiteral(1) => true
          case _ => false
        }
        val plainReplacement = rr.rep match {
          case Literal(v, StringType) if v != null =>
            !v.toString.contains('$') && !v.toString.contains('\\')
          case _ => false
        }
        (if (globalFromStart && plainReplacement)
          dialect.regexpReplaceAll(rv(rr.subject), rv(rr.regexp), rv(rr.rep))
        else None)
          .getOrElse(dialect.fallback(renameRefs(rr), rv))
      case re0: RegExpExtract =>
        (re0.idx match {
          case IntegerLiteral(i) =>
            dialect.regexpExtract(rv(re0.subject), rv(re0.regexp), i)
          case _ => None
        }).getOrElse(dialect.fallback(renameRefs(re0), rv))
      case cw: CaseWhen =>
        val branches = cw.branches.map { case (p, v) =>
          s"WHEN ${rp(p)} THEN ${rv(v)}" }.mkString(" ")
        val els = cw.elseValue.map(v => s" ELSE ${rv(v)}").getOrElse("")
        s"(CASE $branches$els END)"
      case If(p, t, f) => s"(CASE WHEN ${rp(p)} THEN ${rv(t)} ELSE ${rv(f)} END)"
      case c: Coalesce => s"coalesce(${c.children.map(rv).mkString(", ")})"
      case s: Substring =>
        val fn = dialect.fnName("substring").getOrElse("substring")
        s"$fn(${re(s.str)}, ${re(s.pos)}, ${re(s.len)})"
      // array series builder: spellings differ per engine (Trino sequence,
      // DuckDB generate_series) and most engines have NONE — the generic
      // prettyName fallback would emit `sequence(...)` text those engines
      // cannot parse, so this refuses loudly instead
      case s: Sequence =>
        dialect.sequenceFn(re(s.start), re(s.stop), s.stepOpt.map(re),
            s.dataType match { case ArrayType(e, _) => e; case other => other })
          .getOrElse(throw new UnsupportedOperationException(
            s"unparse: sequence(...) has no ${dialect.getClass.getSimpleName
              .stripSuffix("$").toLowerCase} spelling"))
      case y: Year => extractOr(y, "year")
      case m: Month => extractOr(m, "month")
      case d: DayOfMonth => extractOr(d, "day")
      case ae: AggregateExpression => reAgg(ae)
      case we: WindowExpression =>
        // lag/lead carry an internal exact-offset frame that SQL forbids
        // spelling out; every other function keeps its frame text.
        val suppressFrame = we.windowFunction.isInstanceOf[OffsetWindowFunction]
        val call =
          s"${reWindowFn(we.windowFunction)} OVER (${reSpec(we.windowSpec, suppressFrame)})"
        // aggregate-over-window keeps the same engine result-type drift as the
        // grouped form, and ranking functions drift INT→BIGINT on most
        // engines; either fidelity CAST wraps the whole OVER text
        we.windowFunction match {
          case ae: AggregateExpression =>
            dialect.aggResultCast(ae.aggregateFunction)
              .map(dt => s"CAST($call AS ${dialect.typeName(dt)})")
              .getOrElse(call)
          case _: RowNumber | _: Rank | _: DenseRank | _: NTile =>
            dialect.rankResultCast
              .map(dt => s"CAST($call AS ${dialect.typeName(dt)})")
              .getOrElse(call)
          case _ => call
        }
      // Higher-order functions: Catalyst's `.sql` prints the internal
      // `lambdafunction(...)` form, which no parser accepts — render the
      // public arrow syntax instead.
      case lf: LambdaFunction =>
        val args = lf.arguments.map(v => q(cnameById(v.exprId)))
        val head = if (args.size == 1) args.head else args.mkString("(", ", ", ")")
        s"$head -> ${re(lf.function)}"
      case v: NamedLambdaVariable => q(cnameById(v.exprId))
      case hof: HigherOrderFunction =>
        s"${hof.prettyName}(${hof.children.map(re).mkString(", ")})"
      // split_part lowers to the internal literal-delimiter StringSplitSQL;
      // the public `split` takes a regex, so quote the literal.
      case sp: StringSplitSQL =>
        sp.delimiter match {
          case Literal(d, StringType) if d != null =>
            // route through dialect.literal so escape-introducer string
            // parsers (Spark's own included) carry \Q..\E's backslashes
            val quoted = java.util.regex.Pattern.quote(d.toString)
            s"split(${re(sp.str)}, ${dialect.literal(Literal(quoted))})"
          case other => throw new UnsupportedOperationException(
            s"unparse: split with non-literal delimiter $other")
        }
      // struct literals: `.sql` of CreateNamedStruct collapses to struct(...),
      // re-deriving field names from the renamed columns — branches of an
      // array(...) would then disagree on the struct type. named_struct keeps
      // the declared field names.
      case cns: CreateNamedStruct =>
        s"named_struct(${cns.children.map(re).mkString(", ")})"
      // Uncorrelated scalar subqueries survive optimization as expressions (the
      // optimizer only decorrelates the correlated ones into joins); render the
      // subplan inline. A correlated one reaching here cannot be expressed as
      // standalone text — fail loudly.
      case s: ScalarSubquery =>
        if (s.outerAttrs.nonEmpty) throw new UnsupportedOperationException(
          s"unparse: correlated scalar subquery ${s.sql} was not decorrelated")
        s"(${render(s.plan)})"
      case other => dialect.fallback(renameRefs(other), rv)
    }

    private def extractOr(e: UnaryExpression, field: String): String =
      dialect.dateField(field, re(e.child))
        .getOrElse(dialect.fallback(renameRefs(e), rv))

    private def reWindowFn(f: Expression): String = f match {
      case _: RowNumber => "row_number()"
      case _: Rank => "rank()"
      case _: DenseRank => "dense_rank()"
      case ae: AggregateExpression => reAgg(ae, applyResultCast = false)
      case other => dialect.fallback(renameRefs(other), rv)
    }

    private def reSpec(spec: WindowSpecDefinition, suppressFrame: Boolean = false): String = {
      val parts = if (spec.partitionSpec.isEmpty) ""
        else s"PARTITION BY ${spec.partitionSpec.map(rv).mkString(", ")}"
      val order = if (spec.orderSpec.isEmpty) ""
        else s"ORDER BY ${spec.orderSpec.flatMap(reSort).mkString(", ")}"
      val frame = spec.frameSpecification match {
        case _ if suppressFrame => ""
        case UnspecifiedFrame => ""
        case f: SpecifiedWindowFrame
          if f.frameType == RangeFrame && f.lower == UnboundedPreceding &&
            f.upper == CurrentRow =>
          "" // both engines' default frame with ORDER BY
        case f: SpecifiedWindowFrame =>
          val kind = f.frameType match {
            case RowFrame => "ROWS"
            case RangeFrame => "RANGE"
          }
          // Spark stores offset bounds as signed literals: negative = PRECEDING
          def bound(e: Expression): String = e match {
            case UnboundedPreceding => "UNBOUNDED PRECEDING"
            case UnboundedFollowing => "UNBOUNDED FOLLOWING"
            case CurrentRow => "CURRENT ROW"
            case IntegerLiteral(n) if n < 0 => s"${-n} PRECEDING"
            case IntegerLiteral(n) => s"$n FOLLOWING"
            case other => throw new UnsupportedOperationException(
              s"unparse: window frame bound $other")
          }
          s"$kind BETWEEN ${bound(f.lower)} AND ${bound(f.upper)}"
      }
      Seq(parts, order, frame).filter(_.nonEmpty).mkString(" ")
    }

    /** For dialect fallbacks that render via Catalyst's own `.sql`: rewrite
      * attribute names to the unparser's unique c<exprId> names first — and
      * DROP qualifiers (`events`.`c8` would not resolve against the generated
      * subquery aliases) — so the fallback text binds to the same subquery
      * columns as the structural path.
      */
    private def renameRefs(e: Expression): Expression = e.transform {
      case a: AttributeReference => a.withName(cname(a)).withQualifier(Seq.empty)
    }
  }
}
