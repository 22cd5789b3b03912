package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.Semantic

/** Property sweep for the SEMANTIC-LAYER unparse path: queries generated
  * against deployed MDL *models* (expression-backed columns, to-one and
  * nested calculated fields, to-many CalculationPlanNode aggregates, two-hop
  * relationship chains, views, model-to-model joins) are rendered per dialect
  * by `GraftSession.transformSql` and must round-trip. The raw-table sweep
  * ([[SqlUnparserPropertyGrammar]]) proves the RENDERING of relational
  * shapes; this one proves the MODEL-EXPANSION × dialect product — the
  * reference's Mode::Unparse applied to its semantic analyzer output
  * (`wren-core/core/src/mdl/mod.rs:477-541`), which is the text its users
  * actually ship to warehouses. `tools/semantic_sweep.py` executes the
  * duckdb/postgres/trino/redshift texts in DuckDB against the physical
  * parquet and value-compares with Spark executing the semantic query
  * (→ SEMANTIC_SWEEP.json); this spec holds the in-sbt legs: every dialect
  * renders (or refuses loudly) for every seed, and the spark-dialect text
  * replayed on the deploying session returns exactly the semantic result.
  */
object SemanticUnparseGrammar {
  /** Seed count for all consumers (generation gates, spark round-trip, the
    * DuckDB-executed sweep: 80 seeds × 4 executed dialects = 320 slots).
    */
  val Seeds: Int = 80

  /** One deterministic semantic query per seed, written against model names.
    * Aggregates stay engine-deterministic (decimal accumulation, double only
    * at the surface); every query orders by a unique key or compares as a
    * set downstream.
    */
  def genQuery(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    val k = 1000 + rnd.nextInt(4000)
    val bal = 1000 + rnd.nextInt(8000)
    val ostatus = pick(Seq("'O'", "'F'", "'P'"))
    rnd.nextInt(14) match {
      case 0 =>
        // expression column + to-one calc + nested calc in one projection
        s"SELECT o_orderkey, order_cust, cust_segment, cust_nation " +
          s"FROM m_orders WHERE o_orderkey <= $k ORDER BY o_orderkey"
      case 1 =>
        // nested-calc grouping over a decimal-exact aggregate
        s"SELECT cust_nation, count(*) AS n, " +
          s"cast(sum(o_price_dec) as double) AS rev " +
          s"FROM m_orders WHERE o_orderstatus = $ostatus " +
          s"GROUP BY cust_nation ORDER BY cust_nation"
      case 2 =>
        // to-many CalculationPlanNode fields + two-hop to-one chain
        s"SELECT c_custkey, nation_name, region_name, order_count " +
          s"FROM m_customer WHERE order_count >= ${1 + rnd.nextInt(3)} " +
          s"ORDER BY c_custkey LIMIT ${20 + rnd.nextInt(200)}"
      case 3 =>
        // to-many aggregate re-aggregated under a two-hop grouping key
        s"SELECT region_name, cast(sum(total_spent) as double) AS spent, " +
          s"count(*) AS n FROM m_customer " +
          s"WHERE c_acctbal > $bal GROUP BY region_name ORDER BY region_name"
      case 4 =>
        // ranking window partitioned by a CALC column — the INT/BIGINT rank
        // repair must survive the model expansion
        s"SELECT o_orderkey, rn FROM (SELECT o_orderkey, row_number() OVER (" +
          s"PARTITION BY cust_segment ORDER BY o_orderkey) AS rn " +
          s"FROM m_orders WHERE o_orderkey <= $k) w " +
          s"WHERE rn <= ${1 + rnd.nextInt(5)} ORDER BY o_orderkey"
      case 5 =>
        // MDL view expansion (ExpandWrenViewRule) + filter over view output
        s"SELECT o_orderkey, o_custkey, o_totalprice FROM v_big_orders " +
          s"WHERE o_custkey % ${2 + rnd.nextInt(4)} = ${rnd.nextInt(2)} " +
          s"ORDER BY o_orderkey"
      case 6 =>
        // model-to-model join: calc column from one side, physical from both
        s"SELECT n.n_name AS nation, count(*) AS c FROM m_customer c " +
          s"JOIN m_nation n ON c.c_nationkey = n.n_nationkey " +
          s"WHERE c.c_acctbal > $bal GROUP BY n.n_name ORDER BY n.n_name"
      case 7 =>
        // IN-subquery across models (decorrelates to semi join over BOTH
        // model expansions)
        s"SELECT o_orderkey, cust_segment FROM m_orders " +
          s"WHERE o_custkey IN (SELECT c_custkey FROM m_customer " +
          s"WHERE c_acctbal > $bal) AND o_orderkey <= $k ORDER BY o_orderkey"
      case 8 =>
        // two-hop calc on the fact table (lineitem → orders → customer)
        s"SELECT cust_segment, order_status, count(*) AS n FROM m_lineitem " +
          s"WHERE l_orderkey <= $k GROUP BY cust_segment, order_status " +
          s"ORDER BY cust_segment, order_status"
      case 10 =>
        // v2 metric view + metric-on-metric folded in as a scalar subquery
        s"SELECT o_orderstatus AS st, n_orders, revenue, " +
          s"(SELECT total FROM total_revenue) AS grand FROM status_revenue " +
          s"WHERE n_orders >= ${1 + rnd.nextInt(3)} ORDER BY st"
      case 11 =>
        // time-grain rollup view generated from the metric's timeGrain
        s"SELECT cast(odate as date) AS mon, o_orderstatus AS st, n_orders " +
          s"FROM status_revenue_odate_month WHERE n_orders > ${rnd.nextInt(3)} " +
          s"ORDER BY mon, st"
      case 12 =>
        // cumulative metric over the monthly date spine (Generate/sequence)
        s"SELECT cast(mon as date) AS mon, cast(cum_revenue as double) AS cum " +
          s"FROM cum_monthly_revenue ORDER BY mon" +
          (if (rnd.nextBoolean()) s" LIMIT ${4 + rnd.nextInt(20)}" else "")
      case 13 =>
        // CORRELATED date spine: bounds reference the host row, so the
        // unparse must emit the engine's lateral idiom (DuckDB scalar
        // unnest(generate_series) — executed; Postgres implicit-LATERAL /
        // Trino UNNEST(sequence) — valid but outside DuckDB's parser;
        // Redshift refuses, counted as `refused`)
        s"SELECT o_orderkey, cast(d as date) AS d FROM m_orders " +
          s"LATERAL VIEW explode(sequence(o_orderdate, " +
          s"date_add(o_orderdate, ${1 + rnd.nextInt(3)}), interval 1 day)) g AS d " +
          s"WHERE o_orderkey <= $k ORDER BY o_orderkey, d"
      case _ =>
        // date machinery through an expression-backed DATE column
        s"SELECT cast(year(o_orderdate) as bigint) AS y, count(*) AS n, " +
          s"cast(min(o_price_dec) as double) AS lo FROM m_orders " +
          s"WHERE o_orderdate >= date '199${6 + rnd.nextInt(2)}-0${1 + rnd.nextInt(9)}-01' " +
          s"GROUP BY year(o_orderdate) ORDER BY y"
    }
  }

  /** Governed productions (round-11 ask #7): queries against the RLAC/CLAC
    * fixture model ([[graft.queries.Semantic.aclManifest]]'s `sec_customer`)
    * with per-seed session properties — the @property-substituted row filter
    * and the level-gated `c_name` column BAKE INTO the optimized plan before
    * unparse, so every emitted dialect text must carry the governance with
    * it. Occupy sweep indices [Seeds, Seeds + GovernedSeeds) so
    * `tools/semantic_sweep.py`'s contiguous numbering executes them
    * unchanged.
    */
  val GovernedSeeds: Int = 30

  private val Segments =
    Seq("BUILDING", "AUTOMOBILE", "MACHINERY", "FURNITURE", "HOUSEHOLD")

  /** (sql, session properties) for governed seed i in [0, GovernedSeeds). */
  def genGoverned(seed: Int): (String, Map[String, String]) = {
    val rnd = new scala.util.Random(0x5eed + seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val segment = pick(Segments)
    val level = seed % 2 // alternate CLAC allow/deny so both schemas render
    val props = Map("Session_segment" -> segment, "Session_level" -> level.toString)
    val k = 500 + rnd.nextInt(2500)
    val bal = 500 + rnd.nextInt(9000)
    val sql = rnd.nextInt(6) match {
      case 0 =>
        // RLAC filter baked into a plain projection
        s"SELECT c_custkey, c_mktsegment FROM sec_customer " +
          s"WHERE c_custkey <= $k ORDER BY c_custkey"
      case 1 =>
        // CLAC schema gate: star expansion includes c_name iff level = 1
        s"SELECT * FROM sec_customer ORDER BY c_custkey LIMIT ${10 + rnd.nextInt(40)}"
      case 2 =>
        // governed aggregate (decimal-exact accumulation, double surface)
        s"SELECT count(*) AS n, " +
          s"cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS bal " +
          s"FROM sec_customer WHERE c_custkey <= ${k * 2}"
      case 3 =>
        // governed grouping
        s"SELECT c_nationkey, count(*) AS n FROM sec_customer " +
          s"WHERE c_acctbal > $bal GROUP BY c_nationkey ORDER BY c_nationkey"
      case 4 =>
        // ranking window over the governed rows (INT/BIGINT rank repair)
        s"SELECT c_custkey, rn FROM (SELECT c_custkey, cast(row_number() OVER (" +
          s"ORDER BY c_custkey) as bigint) AS rn FROM sec_customer " +
          s"WHERE c_custkey <= $k) w WHERE rn <= ${5 + rnd.nextInt(20)} " +
          s"ORDER BY c_custkey"
      case _ =>
        // governed scalar subquery (both occurrences carry the RLAC filter)
        s"SELECT c_custkey, c_acctbal FROM sec_customer " +
          s"WHERE c_acctbal > (SELECT cast(max(c_acctbal) as double) / 2 " +
          s"FROM sec_customer) ORDER BY c_custkey"
    }
    (sql, props)
  }
}

class SemanticUnparsePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)

  private val dialects = Seq("spark", "duckdb", "postgres", "mysql",
    "bigquery", "clickhouse", "snowflake", "mssql", "oracle", "trino",
    "redshift")

  test("every dialect renders (or refuses loudly) every semantic seed") {
    for (d <- dialects) {
      var refused = 0
      for (seed <- 0 until SemanticUnparseGrammar.Seeds) {
        val sql = SemanticUnparseGrammar.genQuery(seed)
        try {
          val text = session.transformSql(sql, d)
          assert(text.startsWith("SELECT"), s"dialect=$d seed=$seed\n$sql")
          DialectLint.lint(d, s"seed=$seed", text)
        } catch {
          case _: UnsupportedOperationException => refused += 1
          case e: Exception =>
            throw new AssertionError(s"dialect=$d seed=$seed failed\n$sql", e)
        }
      }
      assert(refused <= SemanticUnparseGrammar.Seeds / 5,
        s"$d refused $refused/${SemanticUnparseGrammar.Seeds} semantic seeds")
    }
  }

  test("every dialect renders (or refuses loudly) every GOVERNED seed") {
    val acl = GraftEngine.deployOnDir(spark, Semantic.aclManifest, TestSpark.sfDir,
      Map("Session_segment" -> "BUILDING", "Session_level" -> "1"))
    for (d <- dialects) {
      var refused = 0
      for (seed <- 0 until SemanticUnparseGrammar.GovernedSeeds) {
        val (sql, props) = SemanticUnparseGrammar.genGoverned(seed)
        try {
          val text = acl.withProperties(props).transformSql(sql, d)
          assert(text.startsWith("SELECT"), s"dialect=$d gseed=$seed\n$sql")
          DialectLint.lint(d, s"gseed=$seed", text)
          // the RLAC predicate must have survived into the text: the
          // substituted segment literal appears (plain SELECTs keep it as a
          // filter; aggregates may fold it into the scan filter — either way
          // the literal is in the emitted SQL)
          assert(text.contains(props("Session_segment")),
            s"dialect=$d gseed=$seed: governed text lost the RLAC literal\n$text")
        } catch {
          case _: UnsupportedOperationException => refused += 1
          case e: Exception =>
            throw new AssertionError(s"dialect=$d gseed=$seed failed\n$sql", e)
        }
      }
      assert(refused <= SemanticUnparseGrammar.GovernedSeeds / 5,
        s"$d refused $refused/${SemanticUnparseGrammar.GovernedSeeds} governed seeds")
    }
  }

  test("spark-dialect GOVERNED text replays to the governed result") {
    val acl = GraftEngine.deployOnDir(spark, Semantic.aclManifest, TestSpark.sfDir,
      Map("Session_segment" -> "BUILDING", "Session_level" -> "1"))
    for (seed <- 0 until SemanticUnparseGrammar.GovernedSeeds) {
      val (sql, props) = SemanticUnparseGrammar.genGoverned(seed)
      val sess = acl.withProperties(props)
      val df = sess.query(sql)
      val text = sess.transformSql(sql, "spark")
      val replayed = spark.sql(text)
      assert(replayed.columns.toSeq == df.columns.toSeq, s"gseed=$seed\n$sql\n$text")
      // CLAC: level 0 must have dropped c_name from any star expansion
      if (props("Session_level") == "0")
        assert(!replayed.columns.contains("c_name"), s"gseed=$seed leaked c_name")
      val rows = replayed.collect()
      assert(rows.map(_.toString).sorted.toSeq ==
        df.collect().map(_.toString).sorted.toSeq, s"gseed=$seed\n$sql\n$text")
      // RLAC: a replay on a BARE session (no deployment, no props) returns
      // only the governed segment's rows
      if (replayed.columns.contains("c_mktsegment"))
        assert(rows.forall(_.getAs[String]("c_mktsegment") == props("Session_segment")),
          s"gseed=$seed: replayed text returned ungoverned rows")
    }
  }

  test("spark-dialect semantic text replays to the semantic result (80 seeds)") {
    for (seed <- 0 until SemanticUnparseGrammar.Seeds) {
      val sql = SemanticUnparseGrammar.genQuery(seed)
      try {
        val df = session.query(sql)
        val text = session.transformSql(sql, "spark")
        val replayed = spark.sql(text)
        assert(replayed.columns.toSeq == df.columns.toSeq, s"seed=$seed\n$sql\n$text")
        assert(replayed.collect().map(_.toString).sorted.toSeq ==
          df.collect().map(_.toString).sorted.toSeq, s"seed=$seed\n$sql\n$text")
      } catch {
        case e: AssertionError => throw e
        case e: Exception =>
          throw new AssertionError(s"seed=$seed failed\n$sql", e)
      }
    }
  }
}
