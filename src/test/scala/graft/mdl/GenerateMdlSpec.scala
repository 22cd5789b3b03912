package graft.mdl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the MDL auto-generation draft (round-14 #3; reference
  * `skills/wren-generate-mdl/SKILL.md` phases 2–4): the probed primary keys,
  * the suggested relationship set (with its negative space — no generic `_id`
  * cross-links, no self/duplicate edges), type round-tripping, the no-unique-
  * key table, the deploy-and-query path, and the CLI surface.
  */
class GenerateMdlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val draft =
    GenerateMdl.fromParquetDir(spark, "/root/testdata/sf0.001")
  private lazy val m = draft.manifest

  test("one model per table, columns typed, types round-trip to the read schema") {
    val tables = Seq("customer", "documents", "embeddings", "events",
      "lineitem", "nation", "orders", "part", "region", "supplier")
    assert(m.models.map(_.name) === tables)
    m.models.foreach { md =>
      val actual = spark.read
        .parquet(s"/root/testdata/sf0.001/${md.name}.parquet").schema
      assert(md.columns.map(_.name) === actual.fieldNames.toList)
      md.columns.zip(actual.fields).foreach { case (c, f) =>
        assert(TypeMapper.toSpark(c.`type`) === f.dataType,
          s"${md.name}.${c.name}: '${c.`type`}' does not round-trip to ${f.dataType}")
      }
    }
  }

  test("uniqueness-probed primary-key candidates; lineitem correctly gets none") {
    val pks = m.models.map(md => md.name -> md.primaryKey).toMap
    assert(pks === Map(
      "customer" -> Some("c_custkey"), "nation" -> Some("n_nationkey"),
      "region" -> Some("r_regionkey"), "orders" -> Some("o_orderkey"),
      "part" -> Some("p_partkey"), "supplier" -> Some("s_suppkey"),
      "documents" -> Some("doc_id"), "events" -> Some("event_id"),
      "embeddings" -> Some("vec_id"), "lineitem" -> None))
    // the gap is surfaced as a note, not silently absent
    assert(draft.notes.exists(_.startsWith("lineitem:")))
    // probe evidence for a pk is exact-unique, not approximate
    val cust = draft.probes("customer").find(_.column == "c_custkey").get
    assert(cust.exact && cust.unique)
  }

  test("relationship suggestions: the seven real FK edges, and only those") {
    val got = m.relationships.map(r =>
      (r.name, r.joinType, r.condition)).toSet
    assert(got === Set(
      ("customer_nation", JoinType.ManyToOne,
        "\"customer\".\"c_nationkey\" = \"nation\".\"n_nationkey\""),
      ("lineitem_orders", JoinType.ManyToOne,
        "\"lineitem\".\"l_orderkey\" = \"orders\".\"o_orderkey\""),
      ("lineitem_part", JoinType.ManyToOne,
        "\"lineitem\".\"l_partkey\" = \"part\".\"p_partkey\""),
      ("lineitem_supplier", JoinType.ManyToOne,
        "\"lineitem\".\"l_suppkey\" = \"supplier\".\"s_suppkey\""),
      ("nation_region", JoinType.ManyToOne,
        "\"nation\".\"n_regionkey\" = \"region\".\"r_regionkey\""),
      ("orders_customer", JoinType.ManyToOne,
        "\"orders\".\"o_custkey\" = \"customer\".\"c_custkey\""),
      // at sf0.001 the 10 suppliers land on 10 DISTINCT nations, so the probe
      // correctly reports the FK unique and the skill's "unique FK ⇒
      // one_to_one" rule fires — data-driven inference can only see the data
      ("supplier_nation", JoinType.OneToOne,
        "\"supplier\".\"s_nationkey\" = \"nation\".\"n_nationkey\"")))
    // negative space: the generic `_id` stems (vec_id/doc_id/event_id/user_id)
    // must never cross-link — the >=5-char stem rule
    assert(!m.relationships.exists(_.condition.contains("vec_id")))
    assert(!m.relationships.exists(_.condition.contains("user_id")))
  }

  test("naming-convention FK inference: <table>_id / <table_singular>_id (skill fallback)") {
    import spark.implicits._
    val customers = Seq((1, "ada"), (2, "bob")).toDF("id", "name")
    val orders = Seq((1, 1, 9), (2, 2, 9)).toDF("id", "customer_id", "partner_id")
    val parties = Seq((1, "gala")).toDF("id", "theme")
    val invites = Seq((10, 1)).toDF("id", "party_id")
    val d = GenerateMdl.fromTables(spark,
      Seq("customers" -> customers, "orders" -> orders,
        "parties" -> parties, "invites" -> invites),
      "graft", "draft", probeRows = Int.MaxValue.toLong)
    val conds = d.manifest.relationships.map(_.condition).toSet
    // the rails/dbt shape the reference skill prescribes as the no-constraint
    // fallback (skills/wren-generate-mdl/SKILL.md:253-254)
    assert(conds.contains(""""orders"."customer_id" = "customers"."id""""), conds)
    // plural inverse: parties ⇒ party_id
    assert(conds.contains(""""invites"."party_id" = "parties"."id""""), conds)
    // no table called partner(s) — the convention never free-associates
    assert(!conds.exists(_.contains("partner_id")), conds)
  }

  test("the draft deploys and a query through a suggested edge runs") {
    val sess = graft.GraftEngine.deployOnDir(spark, m, "/root/testdata/sf0.001")
    val out = sess.query(
      """SELECT c_mktsegment, count(*) AS n
        |FROM graft.draft.orders JOIN graft.draft.customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin).collect()
    assert(out.length === 5 && out.map(_.getLong(1)).sum > 0)
  }

  test("mdlTypeName is total over the exotic types") {
    import org.apache.spark.sql.types._
    assert(GenerateMdl.mdlTypeName(ArrayType(FloatType)) === "array<real>")
    assert(TypeMapper.toSpark(GenerateMdl.mdlTypeName(
      StructType(Seq(StructField("a", LongType))))) ===
      StructType(Seq(StructField("a", LongType))))
    assert(GenerateMdl.mdlTypeName(DecimalType(12, 3)) === "decimal(12,3)")
  }

  test("fromJdbc drafts from JDBC metadata (table list discovered, types mapped)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_genjdbc_").toString
    val url = s"jdbc:derby:$tmp/db;create=true"
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.mode("overwrite").jdbc(url, "NATION", new java.util.Properties)
    val d = GenerateMdl.fromJdbc(spark, url)
    assert(d.manifest.models.map(_.name) === List("NATION"))
    val nm = d.manifest.models.head
    assert(nm.primaryKey.map(_.toLowerCase) === Some("n_nationkey"))
    assert(nm.columns.map(_.name.toLowerCase) ===
      List("n_nationkey", "n_name", "n_regionkey"))
    graft.util.Fs.deleteTree(tmp)
  }

  test("fromJdbc: DECLARED constraints win — PK overrides probe, FKs become edges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_genfk_").toString
    val url = s"jdbc:derby:$tmp/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // PK on CODE, not ID: at two rows BOTH columns probe unique, and ID
      // outranks CODE on the name heuristic — only the declared key picks CODE
      st.executeUpdate("CREATE TABLE DEPT (" +
        "ID INT, CODE INT NOT NULL PRIMARY KEY, TITLE VARCHAR(20))")
      // FK column name shares no stem with the referenced key: the inference
      // fallback can NEVER suggest this edge — only the declared FK can
      st.executeUpdate("CREATE TABLE EMP (" +
        "EMP_ID INT NOT NULL PRIMARY KEY, HOME INT REFERENCES DEPT (CODE), " +
        "NAME VARCHAR(20))")
      // composite FK: must surface as a note, never a half-imported edge
      st.executeUpdate("CREATE TABLE PAIRREF (" +
        "A INT NOT NULL, B INT NOT NULL, PRIMARY KEY (A, B))")
      st.executeUpdate("CREATE TABLE USESPAIR (" +
        "U_ID INT NOT NULL PRIMARY KEY, A INT, B INT, " +
        "FOREIGN KEY (A, B) REFERENCES PAIRREF (A, B))")
      st.executeUpdate("INSERT INTO DEPT VALUES (1, 10, 'eng'), (2, 20, 'ops')")
      st.executeUpdate("INSERT INTO EMP VALUES (100, 10, 'ada'), (101, 10, 'bob')")
      st.executeUpdate("INSERT INTO PAIRREF VALUES (1, 1)")
      st.executeUpdate("INSERT INTO USESPAIR VALUES (7, 1, 1)")
    } finally conn.close()

    val d = GenerateMdl.fromJdbc(spark, url)
    val m2 = d.manifest
    assert(m2.model("DEPT").get.primaryKey === Some("CODE"),
      "declared PK must override the name-heuristic probe pick (ID)")
    assert(m2.model("DEPT").get.description.exists(_.contains("DECLARED")))
    assert(m2.model("PAIRREF").get.primaryKey === None,
      "composite declared PK stays unset")
    assert(d.notes.exists(n => n.contains("PAIRREF") && n.contains("composite")))
    val fk = m2.relationship("EMP_DEPT")
    assert(fk.isDefined, s"declared FK edge missing: ${m2.relationships}")
    assert(fk.get.condition === "\"EMP\".\"HOME\" = \"DEPT\".\"CODE\"")
    assert(fk.get.joinType === JoinType.ManyToOne,
      "HOME is non-unique in the data (two rows share 10) — many-to-one")
    assert(d.notes.exists(n => n.contains("USESPAIR") && n.contains("composite")),
      "composite FK must surface as a note")
    assert(!m2.relationships.exists(_.models.contains("USESPAIR")),
      "composite FK must not become a half-imported edge")
    graft.util.Fs.deleteTree(tmp)
  }

  test("partitioned directory tables: probe prefix recurses, keeps partition cols") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_genpart_").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("bucket", org.apache.spark.sql.functions.expr(
        "cast(o_orderkey % 4 as int)"))
    src.write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$tmp/orders_p.parquet")
    // probeBytes=1 forces the file-subset prefix INSIDE the partition tree —
    // the flat-listing bug saw only dt=… directories (zero leaf files) and
    // silently fell back to a full probe
    val d = GenerateMdl.fromParquetDir(spark, tmp, probeBytes = 1L)
    val md = d.manifest.model("orders_p").get
    assert(md.columns.map(_.name).contains("bucket"),
      "partition-derived column must survive into the drafted model")
    assert(md.primaryKey === Some("o_orderkey"))
    val rows = d.probes("orders_p").head.rows
    assert(rows > 0 && rows < src.count(),
      s"probe must be bounded to a leaf-file prefix (probed $rows)")
    graft.util.Fs.deleteTree(tmp)
  }

  test("two FK columns linking the same model pair get column-disambiguated names") {
    import spark.implicits._
    val cust = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val ord = Seq((10L, 1L, 2L), (11L, 2L, 2L))
      .toDF("o_orderkey", "billing_custkey", "shipping_custkey")
    val d = GenerateMdl.fromTables(spark,
      Seq("cust" -> cust, "ord" -> ord), "graft", "draft", probeRows = 0,
      declaredFks = Seq(
        ("ord", "billing_custkey", "cust", "c_custkey"),
        ("ord", "shipping_custkey", "cust", "c_custkey")))
    val names = d.manifest.relationships.map(_.name)
    assert(names.toSet === Set("ord_billing_custkey_cust",
      "ord_shipping_custkey_cust"),
      s"duplicate a_b names would leave one edge unreachable: $names")
    // find-first resolution now reaches BOTH edges
    assert(d.manifest.relationship("ord_billing_custkey_cust").get.condition
      .contains("billing_custkey"))
    assert(d.manifest.relationship("ord_shipping_custkey_cust").get.condition
      .contains("shipping_custkey"))
  }

  test("probeRows at/past Int.MaxValue probes the FULL table, never a wrapped limit") {
    import spark.implicits._
    // 2^32+10 .toInt wraps to 10 — the old code probed 10 rows and called
    // nearly every column unique, contradicting the full-probe contract
    val t = (1L to 100L).map(i => (i, i % 7)).toDF("id", "grp")
    val d = GenerateMdl.fromTables(spark, Seq("t" -> t), "graft", "draft",
      probeRows = (1L << 32) + 10L)
    assert(d.probes("t").head.rows === 100L)
    assert(d.manifest.model("t").get.primaryKey === Some("id"))
  }

  test("CLI ingest: raw CSV/JSONL -> typed parquet -> draft -> deploy -> query") {
    import java.nio.file.Files
    val raw = Files.createTempDirectory("graft_ing_raw_")
    val proj = Files.createTempDirectory("graft_ing_proj_")
    def csvOf(table: String, fileName: String): Unit = {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$table.parquet")
      val body = (df.columns.mkString(",") +: df.collect().toSeq.map(r =>
        df.columns.indices.map(i => String.valueOf(r.get(i))).mkString(",")))
        .mkString("\n")
      Files.write(raw.resolve(fileName), body.getBytes("UTF-8"))
    }
    // mixed formats + a dirty table name the sanitizer must land queryable
    csvOf("customer", "Customer List.csv")
    csvOf("orders", "orders.csv")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "event_type").limit(200)
    Files.write(raw.resolve("events.jsonl"),
      ev.toJSON.collect().mkString("\n").getBytes("UTF-8"))

    val msg = graft.api.ContextCli.run(Seq("ingest",
      "--from", raw.toString, "--path", proj.toString, "--force"))
    assert(msg.contains("Landed 3 raw tables"), msg)
    // sanitized landing: "Customer List.csv" -> customer_list.parquet, typed
    val landedCust =
      spark.read.parquet(s"$raw/landed/customer_list.parquet")
    assert(landedCust.count() === 150)
    assert(landedCust.schema("c_acctbal").dataType ===
      org.apache.spark.sql.types.DoubleType, "csv landing lost inferred types")
    // the customer-orders FK edge is inferred across the two landed CSVs
    assert(msg.contains("orders_customer_list") || msg.contains("orders_customer"),
      s"expected a suggested orders->customer edge in:\n$msg")
    // the deploy+smoke-query loop closed: every model counted
    assert(msg.contains("customer_list: 150 rows") &&
      msg.contains("orders: 1500 rows") && msg.contains("events: 200 rows"), msg)
    // and the written project validates
    assert(graft.api.ContextCli.run(
      Seq("validate", "--path", proj.toString)).contains("Project is valid."))
    graft.util.Fs.deleteTree(raw.toString)
    graft.util.Fs.deleteTree(proj.toString)
  }

  test("ingest dispositions: append adds, merge upserts (batch wins), errors are loud") {
    import java.nio.file.Files
    val raw1 = Files.createTempDirectory("graft_disp1_")
    val raw2 = Files.createTempDirectory("graft_disp2_")
    val out = Files.createTempDirectory("graft_displand_").toString
    def writeCsv(dir: java.nio.file.Path, rows: Seq[String]): Unit =
      Files.write(dir.resolve("people.csv"),
        ("id,name,score" +: rows).mkString("\n").getBytes("UTF-8"))
    writeCsv(raw1, Seq("1,ada,10", "2,bob,20", "3,cey,30"))
    writeCsv(raw2, Seq("2,BOB2,21", "4,dee,40")) // update id 2, insert id 4

    // first land (any disposition bootstraps the table)
    LandRaw.land(spark, raw1.toString, out, "merge", Map("*" -> "id"))
    // APPEND: rows accumulate (5 = 3 + 2), duplicates allowed
    LandRaw.land(spark, raw2.toString, out, "append")
    assert(spark.read.parquet(s"$out/people.parquet").count() === 5)
    // re-bootstrap, then MERGE: batch wins on id 2, id 4 inserted, 1/3 survive
    LandRaw.land(spark, raw1.toString, out, "replace")
    LandRaw.land(spark, raw2.toString, out, "merge", Map("people" -> "id"))
    val got = spark.read.parquet(s"$out/people.parquet")
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got === Map(1 -> ("ada", 10), 2 -> ("BOB2", 21),
      3 -> ("cey", 30), 4 -> ("dee", 40)))
    // loud errors: merge without a key; append across drifted schemas
    val e1 = intercept[IllegalArgumentException] {
      LandRaw.land(spark, raw2.toString, out, "merge")
    }
    assert(e1.getMessage.contains("merge-key"))
    val raw3 = Files.createTempDirectory("graft_disp3_")
    Files.write(raw3.resolve("people.csv"),
      "id,name\n9,zed".getBytes("UTF-8")) // score column dropped
    val e2 = intercept[IllegalArgumentException] {
      LandRaw.land(spark, raw3.toString, out, "append")
    }
    assert(e2.getMessage.contains("schema drift"))
    Seq(raw1.toString, raw2.toString, raw3.toString, out)
      .foreach(graft.util.Fs.deleteTree)
  }

  test("re-landing refreshes cached listings: a deployed session survives a merge") {
    import java.nio.file.Files
    val raw1 = Files.createTempDirectory("graft_rl1_")
    val raw2 = Files.createTempDirectory("graft_rl2_")
    val out = Files.createTempDirectory("graft_rlland_").toString
    Files.write(raw1.resolve("people.csv"),
      "id,name\n1,ada\n2,bob\n3,cey".getBytes("UTF-8"))
    Files.write(raw2.resolve("people.csv"),
      "id,name\n2,BOB2\n4,dee".getBytes("UTF-8"))
    LandRaw.land(spark, raw1.toString, out, "replace")
    val draft = GenerateMdl.fromParquetDir(spark, out)
    val sess = graft.GraftEngine.deployOnDir(spark, draft.manifest, out)
    def n(): Long = sess.query("SELECT count(*) AS n FROM graft.draft.people")
      .collect()(0).getLong(0)
    assert(n() === 3)
    // the merge REWRITES people.parquet under the deployed session's feet:
    // Spark's cached file listing chases deleted part files
    // (FAILED_READ_FILE.FILE_NOT_EXIST) until the session refreshes its
    // source indexes — the documented re-land contract
    LandRaw.land(spark, raw2.toString, out, "merge", Map("*" -> "id"))
    val stale = intercept[org.apache.spark.SparkException] { n() }
    assert(stale.getMessage.contains("FAILED_READ_FILE"),
      s"expected the stale-listing failure class, got: ${stale.getMessage}")
    sess.refresh()
    assert(n() === 4, "refreshed session must see the post-merge row set")
    Seq(raw1.toString, raw2.toString, out).foreach(graft.util.Fs.deleteTree)
  }

  test("CLI generate writes a project that validates and builds back to the draft") {
    val out = java.nio.file.Files.createTempDirectory("graft_genctx_")
    val msg = graft.api.ContextCli.run(Seq("generate",
      "--from", "/root/testdata/sf0.001", "--path", out.toString, "--force"))
    assert(msg.contains("10 models") && msg.contains("7 suggested relationships"))
    assert(msg.contains("lineitem: (none found)"))
    assert(graft.api.ContextCli.run(
      Seq("validate", "--path", out.toString)).contains("Project is valid."))
    val rebuilt = YamlProject.buildManifest(out)
    assert(rebuilt.models.map(_.name).toSet === m.models.map(_.name).toSet)
    assert(rebuilt.relationships.map(_.name).toSet ===
      m.relationships.map(_.name).toSet)
    graft.util.Fs.deleteTree(out.toString)
  }
}
