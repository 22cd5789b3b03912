package graft.mdl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Draft-manifest generation from an existing data source — the first thing a
  * new user does, and what the reference ships as an agent walkthrough
  * (`skills/wren-generate-mdl/SKILL.md`: discover schema → normalize types →
  * scaffold models/relationships; phases 2–4): scan a parquet directory or a
  * JDBC schema and emit a [[Manifest]] skeleton with
  *
  *   - one model per table with typed columns (type names chosen to
  *     round-trip through [[TypeMapper.toSpark]]),
  *   - a PRIMARY-KEY CANDIDATE per model from a uniqueness probe, and
  *   - RELATIONSHIP SUGGESTIONS from name/type matching against other
  *     models' probed keys (the skill's "infer from naming conventions"
  *     phase-3 rule, adapted to prefixed warehouse schemas).
  *
  * The output is a DRAFT for human review — exactly the skill's contract.
  * Deterministic given the source tables, so a generated manifest can sit
  * behind an oracle-checked gate entry (m40).
  *
  * Scale shape (100 TB source): the probe is ONE map-side-combined aggregate
  * pass per table over a row-bounded slice (`probeRows`; parquet `limit`
  * terminates the scan early), computing count/nulls/approx-distinct for
  * every key-typed column at once — never a pass per column. Columns the
  * approx pass shortlists (distinct ≈ rows, zero nulls) get ONE exact
  * count-distinct pass, capped at [[maxExactCandidates]] columns so the
  * expanding multi-distinct aggregate stays bounded. Sample-level uniqueness
  * is a CANDIDATE, not a proof — the model's description says so, and
  * `probeRows = 0` forces a full-table probe when the caller wants one.
  */
object GenerateMdl {

  /** Uniqueness-probe evidence for one column (distinct is exact for
    * shortlisted columns, approximate otherwise).
    */
  final case class ColumnProbe(
      column: String, rows: Long, distinct: Long, nulls: Long, exact: Boolean) {
    def unique: Boolean = exact && nulls == 0 && distinct == rows
  }

  /** A generated manifest plus the probe evidence it was drafted from. */
  final case class Draft(
      manifest: Manifest,
      probes: Map[String, Seq[ColumnProbe]],
      notes: Seq[String])

  /** Columns of these types are key candidates (probed for uniqueness). */
  private def keyTyped(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  private val maxExactCandidates = 4

  /** Spark type → MDL type string; total, and round-trips through
    * [[TypeMapper.toSpark]] (pinned in GenerateMdlSpec).
    */
  def mdlTypeName(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double"
    case StringType => "varchar"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case _: TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case BinaryType => "binary"
    case ArrayType(e, _) => s"array<${mdlTypeName(e)}>"
    case StructType(fs) =>
      s"struct<${fs.map(f => s"${f.name} ${mdlTypeName(f.dataType)}").mkString(", ")}>"
    case other => other.sql.toLowerCase // Utf8-compatible fallback spelling
  }

  /** Draft from every `*.parquet` table under `dir` (file or directory form). */
  def fromParquetDir(
      spark: SparkSession, dir: String,
      catalog: String = "graft", schema: String = "draft",
      probeRows: Long = 1000000L): Draft = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = fs.listStatus(p).toSeq
      .map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .map(t => t.getName.stripSuffix(".parquet") -> spark.read.parquet(t.toString))
    require(tables.nonEmpty, s"no *.parquet tables under $dir")
    fromTables(spark, tables, catalog, schema, probeRows)
  }

  /** Draft from a JDBC source. With `tables` empty, the table list comes from
    * JDBC metadata (current schema's TABLE entries).
    */
  def fromJdbc(
      spark: SparkSession, url: String, tables: Seq[String] = Nil,
      props: java.util.Properties = new java.util.Properties,
      catalog: String = "graft", schema: String = "draft",
      probeRows: Long = 1000000L): Draft = {
    val names =
      if (tables.nonEmpty) tables
      else {
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
          val out = scala.collection.mutable.ListBuffer.empty[String]
          while (rs.next()) out += rs.getString("TABLE_NAME")
          out.toList.sorted
        } finally conn.close()
      }
    require(names.nonEmpty, s"no tables visible at $url")
    fromTables(spark, names.map(n => n -> spark.read.jdbc(url, n, props)),
      catalog, schema, probeRows)
  }

  /** Core: draft from named frames (the parquet/JDBC fronts both land here). */
  def fromTables(
      spark: SparkSession, tables: Seq[(String, DataFrame)],
      catalog: String, schema: String, probeRows: Long): Draft = {
    val notes = scala.collection.mutable.ListBuffer.empty[String]
    val probes: Map[String, Seq[ColumnProbe]] = tables.map { case (name, df) =>
      name -> probeKeys(if (probeRows > 0) df.limit(probeRows.toInt) else df)
    }.toMap

    val pks: Map[String, Option[String]] = tables.map { case (name, df) =>
      name -> pickPk(name, df.schema, probes(name))
    }.toMap
    pks.collect { case (t, None) =>
      notes += s"$t: no single-column unique key found — set primary_key manually " +
        "(composite keys are outside the draft's inference)"
    }

    val models = tables.map { case (name, df) =>
      Model(
        name = name,
        tableReference = Some(TableReference(table = name)),
        primaryKey = pks(name),
        columns = df.schema.fields.toList.map(f =>
          Column(f.name, mdlTypeName(f.dataType))),
        properties = Map("description" ->
          (s"drafted by GenerateMdl from '$name'" + pks(name).fold("")(k =>
            s"; primary key '$k' is a uniqueness-probe CANDIDATE — confirm " +
              "before production"))))
    }.toList

    val relationships = suggestRelationships(tables, pks, probes)
    Draft(
      Manifest(catalog = catalog, schema = schema, models = models,
        relationships = relationships),
      probes, notes.toList)
  }

  /** One aggregate pass computing (rows, nulls, approx-distinct) for every
    * key-typed column, then ONE exact count-distinct pass over the approx
    * shortlist. No per-column scans.
    */
  private def probeKeys(df: DataFrame): Seq[ColumnProbe] = {
    val cands = df.schema.fields.filter(f => keyTyped(f.dataType)).map(_.name).toSeq
    if (cands.isEmpty) return Nil
    val aggs = count(lit(1)).alias("__rows") +: cands.flatMap(c => Seq(
      count(col(c)).alias(s"__n_$c"),
      approx_count_distinct(col(c), 0.01).alias(s"__d_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")
    val approx = cands.map { c =>
      val nn = row.getAs[Long](s"__n_$c")
      ColumnProbe(c, rows, row.getAs[Long](s"__d_$c"), rows - nn, exact = false)
    }
    // shortlist: plausibly unique under the approx error, no nulls
    val shortlist = approx
      .filter(p => p.nulls == 0 && p.distinct >= (rows * 0.97).toLong)
      .sortBy(p => -p.distinct).take(maxExactCandidates).map(_.column)
    if (shortlist.isEmpty || rows == 0) return approx
    val exactAggs = shortlist.map(c => countDistinct(col(c)).alias(s"__x_$c"))
    val xr = df.agg(exactAggs.head, exactAggs.tail: _*).head()
    approx.map { p =>
      if (shortlist.contains(p.column))
        p.copy(distinct = xr.getAs[Long](s"__x_${p.column}"), exact = true)
      else p
    }
  }

  /** Among exactly-unique candidates, prefer key-looking names (the table
    * name or a `key`/`id` suffix), then schema position.
    */
  private def pickPk(
      table: String, schema: StructType, probes: Seq[ColumnProbe]): Option[String] = {
    val unique = probes.filter(_.unique).map(_.column).toSet
    if (unique.isEmpty) return None
    val pos = schema.fieldNames.zipWithIndex.toMap
    def score(c: String): (Int, Int) = {
      val l = c.toLowerCase
      val named =
        if (l.contains(table.toLowerCase.stripSuffix("s")) ||
          l.endsWith("key") || l.endsWith("id") || l.endsWith("_id")) 0 else 1
      (named, pos(c))
    }
    Some(unique.toSeq.minBy(score))
  }

  /** Suggested FK edges: model A's column x points at model B's probed key p
    * when the names match (exactly, or on the post-prefix stem for 1–2-char
    * prefixed warehouse schemas — `o_custkey` ⇒ `custkey` ⇒ `c_custkey`; the
    * stem must be ≥ 5 chars so generic `_id` suffixes never cross-link) and
    * the Spark types are equal. MANY_TO_ONE unless x itself probed unique
    * (then ONE_TO_ONE). Deterministic order: by (A, x, B).
    */
  private def suggestRelationships(
      tables: Seq[(String, DataFrame)],
      pks: Map[String, Option[String]],
      probes: Map[String, Seq[ColumnProbe]]): List[Relationship] = {
    def stem(c: String): String = {
      val l = c.toLowerCase
      val us = l.indexOf('_')
      if (us >= 1 && us <= 2) l.substring(us + 1) else l
    }
    val types: Map[(String, String), DataType] = (for {
      (t, df) <- tables; f <- df.schema.fields
    } yield (t, f.name) -> f.dataType).toMap
    val targets: Seq[(String, String)] = // (model, pk)
      tables.flatMap { case (t, _) => pks(t).map(t -> _) }
    (for {
      (a, df) <- tables
      x <- df.schema.fields.map(_.name)
      (b, p) <- targets
      if b != a && !pks(a).contains(x)
      if x.equalsIgnoreCase(p) ||
        (stem(x) == stem(p) && stem(x).length >= 5)
      if types((a, x)) == types((b, p))
    } yield {
      val xUnique = probes(a).exists(pr => pr.column == x && pr.unique)
      Relationship(
        name = s"${a}_$b",
        models = List(a, b),
        joinType = if (xUnique) JoinType.OneToOne else JoinType.ManyToOne,
        condition = s""""$a"."$x" = "$b"."$p"""")
    }).sortBy(r => (r.models.head, r.condition)).toList
  }
}
