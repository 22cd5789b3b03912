package graft.planner

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.Semantic

class PlannerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def deployed = GraftEngine.deployOnDir(spark, Semantic.manifest, dir)

  test("model view expansion + expression column") {
    val row = deployed.query(
      "SELECT o_orderkey, o_custkey, order_cust FROM m_orders WHERE o_orderkey = 1")
      .collect().head
    assert(row.getString(2) == s"${row.getLong(0)}_${row.getLong(1)}")
  }

  test("relationship calc must not change row counts (model.slt:40-44)") {
    val sess = deployed
    val plain = sess.query("SELECT count(*) FROM m_orders").collect().head.getLong(0)
    val withCalc = sess.query("SELECT count(cust_segment), count(*) FROM m_orders").collect().head
    assert(withCalc.getLong(1) == plain)
  }

  test("to-many calc equals a manual pre-aggregation") {
    val sess = deployed
    val calc = sess.query(
      "SELECT c_custkey, cast(total_spent as double) ts FROM m_customer ORDER BY c_custkey")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    val manual = spark.read.parquet(s"$dir/customer.parquet").alias("c")
      .join(
        spark.read.parquet(s"$dir/orders.parquet")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("ts")),
        col("c.c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c.c_custkey"), col("ts")).orderBy("c_custkey")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(calc.toSeq == manual.toSeq)
  }

  test("two-hop calculated field traverses both relationships") {
    val n = deployed.query(
      "SELECT count(*) FROM m_lineitem WHERE cust_segment IS NOT NULL").collect().head.getLong(0)
    assert(n > 0)
  }

  test("RLAC: missing required session property throws (access_control.rs:33-118)") {
    val e = intercept[GraftException] {
      GraftEngine.deployOnDir(spark, Semantic.aclManifest, dir, Map.empty)
    }
    assert(e.getMessage.contains("session_segment"))
  }

  test("RLAC filters rows by substituted @property") {
    val sess = GraftEngine.deployOnDir(spark, Semantic.aclManifest, dir,
      Map("session_segment" -> "BUILDING", "session_level" -> "1"))
    val segs = sess.query("SELECT DISTINCT c_mktsegment FROM sec_customer").collect()
    assert(segs.map(_.getString(0)).toSeq == Seq("BUILDING"))
  }

  test("CLAC: failing rule drops the column from the schema (context.rs:343-365)") {
    val sess = GraftEngine.deployOnDir(spark, Semantic.aclManifest, dir,
      Map("session_segment" -> "BUILDING", "session_level" -> "0"))
    assert(!sess.query("SELECT * FROM sec_customer").columns.contains("c_name"))
    val ok = GraftEngine.deployOnDir(spark, Semantic.aclManifest, dir,
      Map("session_segment" -> "BUILDING", "session_level" -> "1"))
    assert(ok.query("SELECT * FROM sec_customer").columns.contains("c_name"))
  }

  test("namespace strip: catalog.schema.model resolves (mdl/mod.rs:530-537)") {
    val n = deployed.query(
      "SELECT count(*) FROM graft.amalgam.m_orders").collect().head.getLong(0)
    assert(n > 0)
  }

  test("limit pushdown clamps results (context.rs:271-320)") {
    assert(deployed.query("SELECT * FROM m_orders", limit = Some(7)).count() == 7)
  }

  test("dryRun validates without executing; invalid SQL throws") {
    val sess = deployed
    sess.dryRun("SELECT o_orderkey FROM m_orders")
    intercept[Exception] { sess.dryRun("SELECT no_such_col FROM m_orders") }
  }

  test("nested calculated field resolves through the target model's own calc") {
    val rows = deployed.query(
      "SELECT o_orderkey, cust_nation FROM m_orders WHERE o_orderkey <= 20 ORDER BY o_orderkey")
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getString(1).startsWith("NATION_")))
  }

  test("cyclic calculated-field dependency is rejected (plan.rs:322-326 is_dag)") {
    import graft.mdl._
    val cyc = Manifest(
      catalog = "g", schema = "s",
      models = List(
        Model("a", tableReference = Some(TableReference(table = "nation")),
          primaryKey = Some("n_nationkey"),
          columns = List(
            Column("n_nationkey", "int"), Column("n_regionkey", "int"),
            Column("b_ref", "a", relationship = Some("ab")),
            Column("from_b", "varchar", isCalculated = true,
              expression = Some("\"b_ref\".\"from_a\"")))),
        Model("b", tableReference = Some(TableReference(table = "region")),
          primaryKey = Some("r_regionkey"),
          columns = List(
            Column("r_regionkey", "int"),
            Column("a_ref", "b", relationship = Some("ab")),
            Column("from_a", "varchar", isCalculated = true,
              expression = Some("\"a_ref\".\"from_b\""))))),
      relationships = List(
        Relationship("ab", List("a", "b"), JoinType.OneToOne,
          "\"a\".\"n_regionkey\" = \"b\".\"r_regionkey\"")))
    val e = intercept[Exception] {
      GraftEngine.deployOnDir(spark, cyc, dir)
    }
    assert(e.getMessage.contains("cyclic"), e.getMessage)
  }

  test("cube materializes the CUBE lattice over the base model") {
    val sess = GraftEngine.deployOnDir(spark, Semantic.manifest, dir)
    val cube = sess.materializeCube("orders_cube")
    val total = cube.filter("cust_segment IS NULL AND o_orderstatus IS NULL")
      .select("n").head.getLong(0)
    val base = sess.query("SELECT count(*) FROM m_orders").head.getLong(0)
    assert(total == base, "grand-total cell must equal the base row count")
  }

  test("cached:true models persist spill-safely") {
    val m = Semantic.manifest
    // the cached=true copy differs structurally, so the deploy cache misses
    val withCache = m.copy(models = m.models.map(mm =>
      if (mm.name == "m_region") mm.copy(cached = true) else mm))
    val sess = GraftEngine.deployOnDir(spark, withCache, dir)
    val level = sess.modelDF("m_region").storageLevel
    assert(level.useMemory || level.useDisk, s"expected persisted, got $level")
    assert(sess.modelDF("m_nation").storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE, "uncached models stay unpersisted")
  }

  // ---- parse-based lineage + governed join sides (regressions) ----

  import graft.mdl._

  private def ordersCols = List(
    Column("o_orderkey", "bigint"), Column("o_custkey", "bigint"),
    Column("o_totalprice", "double"))

  test("1 + sum(rel.col) is an aggregate calc, not a to-many error") {
    val m = Manifest(
      catalog = "g", schema = "s",
      models = List(
        Model("h_customer", tableReference = Some(TableReference(table = "customer")),
          primaryKey = Some("c_custkey"),
          columns = List(
            Column("c_custkey", "bigint"),
            Column("orders_of", "h_orders", relationship = Some("co")),
            Column("spent_plus", "double", isCalculated = true,
              expression = Some("1 + sum(\"orders_of\".\"o_totalprice\")")))),
        Model("h_orders", tableReference = Some(TableReference(table = "orders")),
          columns = ordersCols)),
      relationships = List(
        Relationship("co", List("h_customer", "h_orders"), JoinType.OneToMany,
          "\"h_customer\".\"c_custkey\" = \"h_orders\".\"o_custkey\"")))
    val rows = GraftEngine.deployOnDir(spark, m, dir)
      .query("SELECT c_custkey, spent_plus FROM h_customer WHERE spent_plus IS NOT NULL")
      .collect()
    assert(rows.nonEmpty, "aggregate calc with a leading scalar term must plan and run")
  }

  test("dotted text inside a string literal is never rewritten as a path") {
    val m = Manifest(
      catalog = "g", schema = "s",
      models = List(
        Model("l_orders", tableReference = Some(TableReference(table = "orders")),
          columns = ordersCols :+
            Column("cust_ref", "l_customer", relationship = Some("oc")) :+
            Column("tagged", "varchar", isCalculated = true,
              expression =
                Some("concat('cust_ref.c_mktsegment: ', \"cust_ref\".\"c_mktsegment\")"))),
        Model("l_customer", tableReference = Some(TableReference(table = "customer")),
          primaryKey = Some("c_custkey"),
          columns = List(Column("c_custkey", "bigint"), Column("c_mktsegment", "varchar")))),
      relationships = List(
        Relationship("oc", List("l_orders", "l_customer"), JoinType.ManyToOne,
          "\"l_orders\".\"o_custkey\" = \"l_customer\".\"c_custkey\"")))
    val v = GraftEngine.deployOnDir(spark, m, dir)
      .query("SELECT tagged FROM l_orders WHERE tagged IS NOT NULL LIMIT 1")
      .collect().head.getString(0)
    assert(v.startsWith("cust_ref.c_mktsegment: "), s"literal corrupted: $v")
  }

  test("bare double-quoted identifier is an identifier, not a string literal") {
    val m = Manifest(
      catalog = "g", schema = "s",
      models = List(
        Model("q_orders", tableReference = Some(TableReference(table = "orders")),
          columns = ordersCols :+
            Column("double_price", "double", isCalculated = true,
              expression = Some("\"o_totalprice\" * 2")))),
      relationships = Nil)
    val r = GraftEngine.deployOnDir(spark, m, dir)
      .query("SELECT o_totalprice, double_price FROM q_orders LIMIT 5").collect()
    assert(r.nonEmpty && r.forall(row => row.getDouble(1) == row.getDouble(0) * 2))
  }

  private def governedManifest(clacThreshold: Option[String]) = Manifest(
    catalog = "g", schema = "s",
    models = List(
      Model("g_orders", tableReference = Some(TableReference(table = "orders")),
        columns = ordersCols :+
          Column("cust_ref", "g_customer", relationship = Some("goc")) :+
          Column("cust_seg", "varchar", isCalculated = true,
            expression = Some("\"cust_ref\".\"c_mktsegment\""))),
      Model("g_customer", tableReference = Some(TableReference(table = "customer")),
        primaryKey = Some("c_custkey"),
        columns = List(
          Column("c_custkey", "bigint"),
          Column("c_mktsegment", "varchar",
            columnLevelAccessControl = clacThreshold.map(t =>
              ColumnLevelAccessControl("seg_level",
                List(SessionProperty("session_level", required = false,
                  defaultExpr = Some("0"))),
                ClacOperator.GreaterThanOrEquals, t)))),
        rowLevelAccessControls = List(
          RowLevelAccessControl("seg_only",
            List(SessionProperty("session_segment", required = true)),
            "\"c_mktsegment\" = @session_segment")))),
    relationships = List(
      Relationship("goc", List("g_orders", "g_customer"), JoinType.ManyToOne,
        "\"g_orders\".\"o_custkey\" = \"g_customer\".\"c_custkey\"")))

  test("calc-field join side applies the related model's RLAC (no row leak)") {
    val sess = GraftEngine.deployOnDir(spark, governedManifest(None), dir,
      Map("session_segment" -> "BUILDING"))
    val total = sess.query("SELECT count(*) FROM g_orders").collect().head.getLong(0)
    val raw = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(total == raw, "left join must not drop host rows")
    val segs = sess.query(
      "SELECT DISTINCT cust_seg FROM g_orders WHERE cust_seg IS NOT NULL").collect()
    assert(segs.map(_.getString(0)).toSeq == Seq("BUILDING"),
      "rows of other segments leaked through the calculated field")
  }

  test("calc-field referencing a CLAC-denied related column is rejected") {
    val e = intercept[GraftException] {
      GraftEngine.deployOnDir(spark, governedManifest(Some("1")), dir,
        Map("session_segment" -> "BUILDING", "session_level" -> "0"))
    }
    assert(e.getMessage.contains("Access denied"), e.getMessage)
    // the same manifest deploys once the session meets the rule
    val ok = GraftEngine.deployOnDir(spark, governedManifest(Some("1")), dir,
      Map("session_segment" -> "BUILDING", "session_level" -> "1"))
    assert(ok.query("SELECT cust_seg FROM g_orders WHERE cust_seg IS NOT NULL").count() > 0)
  }

  test("per-query properties re-resolve RLAC without redeploy; base session intact") {
    val sess = GraftEngine.deployOnDir(spark, Semantic.aclManifest, dir,
      Map("session_segment" -> "BUILDING", "session_level" -> "1"))
    val auto = sess.query("SELECT DISTINCT c_mktsegment FROM sec_customer",
      Map("session_segment" -> "AUTOMOBILE")).collect()
    assert(auto.map(_.getString(0)).toSeq == Seq("AUTOMOBILE"))
    // the deploy-time session still answers with its own properties
    val base = sess.query("SELECT DISTINCT c_mktsegment FROM sec_customer").collect()
    assert(base.map(_.getString(0)).toSeq == Seq("BUILDING"))
    // identical overrides reuse the same derived session
    assert(sess.withProperties(Map("session_segment" -> "AUTOMOBILE")) eq
      sess.withProperties(Map("session_segment" -> "AUTOMOBILE")))
  }

  test("per-query timezone binds into the analyzed plan") {
    val sess = deployed
    val sql = "SELECT date_format(timestamp '2024-01-01 00:00:00+00:00', 'HH') AS h"
    val utc = sess.query(sql).collect().head.getString(0)
    val ny = sess.query(sql, Map("timezone" -> "America/New_York")).collect().head.getString(0)
    assert(utc == "00" && ny == "19", s"utc=$utc ny=$ny")
    // session conf restored after analysis
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("stripNamespace leaves catalog.schema text inside string literals alone") {
    val v = deployed.query(
      "SELECT 'graft.amalgam.m_orders' AS s FROM graft.amalgam.m_orders LIMIT 1")
      .collect().head.getString(0)
    assert(v == "graft.amalgam.m_orders")
  }

  test("stripNamespace leaves quoted identifiers containing catalog.schema text alone") {
    // a backtick-quoted IDENTIFIER containing the namespace text is one name, not a
    // qualifier — it must survive the strip (while the FROM qualifier still strips)
    val df = deployed.query(
      "SELECT o_orderkey AS `graft.amalgam.weird` FROM graft.amalgam.m_orders LIMIT 1")
    assert(df.columns.toSeq == Seq("graft.amalgam.weird"))
  }

  test("hidden columns are excluded from the view projection") {
    val m = Semantic.manifest
    val hidden = m.copy(models = m.models.map(mm =>
      if (mm.name == "m_orders")
        mm.copy(columns = mm.columns.map(c =>
          if (c.name == "o_orderpriority") c.copy(isHidden = true) else c))
      else mm))
    val sess = GraftEngine.deployOnDir(spark, hidden, dir)
    assert(!sess.query("SELECT * FROM m_orders").columns.contains("o_orderpriority"))
  }
}
