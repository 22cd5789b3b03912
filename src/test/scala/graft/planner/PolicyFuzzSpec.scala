package graft.planner

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._

/** Fuzzes the ACCESS-CONTROL surface the way ManifestFuzzSpec fuzzes model
  * structure: random RLAC conditions (string equality / numeric threshold /
  * conjunction, with the property value drawn from the live data or just
  * outside its range) and random CLAC thresholds, each checked against the
  * raw parquet filtered DIRECTLY — the policy must reproduce exactly the
  * rows/columns the condition names (reference:
  * wren-core/core/src/mdl/access_control.rs:33-118, context.rs:343-365).
  */
class PolicyFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  private lazy val segments: Seq[String] =
    spark.read.parquet(s"$dir/customer.parquet")
      .select("c_mktsegment").distinct().collect().map(_.getString(0)).sorted.toSeq

  private def manifest(seed: Int, rlacCond: String, props: List[SessionProperty],
      clacThreshold: Option[String]): Manifest = Manifest(
    catalog = "graft", schema = "fuzz",
    models = List(Model(
      name = s"pz${seed}_customer",
      tableReference = Some(TableReference(table = "customer")),
      primaryKey = Some("c_custkey"),
      columns = List(
        Column("c_custkey", "bigint"),
        clacThreshold match {
          case Some(th) => Column("c_name", "varchar",
            columnLevelAccessControl = Some(ColumnLevelAccessControl(
              "name_gate", List(SessionProperty("lvl")),
              ClacOperator.GreaterThanOrEquals, th)))
          case None => Column("c_name", "varchar")
        },
        Column("c_nationkey", "int"), Column("c_acctbal", "double"),
        Column("c_mktsegment", "varchar")),
      rowLevelAccessControls = List(RowLevelAccessControl(
        s"gate$seed", props, rlacCond)))))

  for (seed <- 0 until 10) {
    test(s"seed $seed: fuzzed RLAC/CLAC reproduce a direct filter exactly") {
      val rnd = new Random(2000 + seed)
      val raw = spark.read.parquet(s"$dir/customer.parquet")
      val seg = segments(rnd.nextInt(segments.length))
      val minbal = rnd.nextInt(5000)
      val lvl = rnd.nextInt(3) // CLAC threshold is 1: lvl 0 hides, 1-2 shows
      val shape = rnd.nextInt(3)
      val (cond, props, oracleFiltered) = shape match {
        case 0 => // string equality against a LIVE segment value
          ("\"c_mktsegment\" = @seg",
            List(SessionProperty("seg", required = true)),
            raw.filter(col("c_mktsegment") === seg))
        case 1 => // numeric threshold (property arrives as a string literal)
          ("\"c_acctbal\" >= @minbal",
            List(SessionProperty("minbal", required = true)),
            raw.filter(col("c_acctbal") >= minbal))
        case _ => // conjunction of both
          ("\"c_mktsegment\" = @seg AND \"c_acctbal\" >= @minbal",
            List(SessionProperty("seg", required = true),
              SessionProperty("minbal", required = true)),
            raw.filter(col("c_mktsegment") === seg && col("c_acctbal") >= minbal))
      }
      val m = manifest(seed, cond, props, clacThreshold = Some("1"))
      val sess = GraftEngine.deployOnDir(spark, m, dir, Map(
        "seg" -> seg, "minbal" -> minbal.toString, "lvl" -> lvl.toString))

      // rows: exactly the direct filter, keys and all
      val got = sess.query(
        s"SELECT c_custkey FROM pz${seed}_customer ORDER BY c_custkey")
        .collect().map(_.getLong(0)).toSeq
      val want = oracleFiltered.select("c_custkey").orderBy("c_custkey")
        .collect().map(_.getLong(0)).toSeq
      assert(got == want, s"RLAC rows diverged (seed $seed, shape $shape)")

      // columns: CLAC drops c_name exactly when lvl < 1
      val colsNow = sess.query(s"SELECT * FROM pz${seed}_customer").columns.toSet
      assert(colsNow.contains("c_name") == (lvl >= 1),
        s"CLAC gate wrong at lvl=$lvl (seed $seed)")

      // the DIALECT TEXT shipped to a remote engine must embed the policy:
      // the substituted RLAC literal is in the WHERE, and a CLAC-hidden
      // column never appears (the inner scan lists physical column names)
      for (d <- Seq("duckdb", "postgres")) {
        val text = sess.transformSql(s"SELECT * FROM pz${seed}_customer", d)
        if (shape != 1) assert(text.contains(s"'$seg'"),
          s"RLAC segment literal missing from $d text:\n$text")
        if (shape != 0) assert(text.contains(minbal.toString),
          s"RLAC threshold missing from $d text:\n$text")
        assert(text.contains("c_name") == (lvl >= 1),
          s"CLAC leak/over-drop in $d text at lvl=$lvl:\n$text")
      }

      // a missing REQUIRED property must refuse the deployment loudly
      val e = intercept[Exception] {
        GraftEngine.deployOnDir(spark, manifest(seed, cond, props, None), dir, Map.empty)
      }
      assert(props.map(_.name).exists(e.getMessage.contains),
        s"missing-property error must name the property: ${e.getMessage}")
    }
  }
}
