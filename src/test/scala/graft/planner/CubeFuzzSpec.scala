package graft.planner

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._

/** Fuzzes CUBE materialization (the manifest surface the reference carries
  * inert and this engine executes as a CUBE() rollup view): random dimension
  * subsets, a random time dimension at a random grain, and random measures
  * over a fuzzed model — each materialized view compared against a direct
  * `base.cube(dims).agg(measures)` built from the raw parquet.
  */
class CubeFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def rowsOf(df: DataFrame): Seq[Seq[Option[String]]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i =>
        Option(r.get(i)).map {
          case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
          case v => v.toString
        }))
      .sortBy(_.map(_.getOrElse("<null>")).mkString("|"))

  for (seed <- 0 until 8) {
    test(s"seed $seed: fuzzed cube materialization equals a direct cube()") {
      val rnd = new Random(3000 + seed)
      val dims = rnd.shuffle(List("o_orderstatus", "o_orderpriority"))
        .take(1 + rnd.nextInt(2)).sorted
      val grain = Seq("month", "year")(rnd.nextInt(2))
      val useTime = rnd.nextBoolean()
      val op = Seq("sum", "min", "max")(rnd.nextInt(3))
      val mn = s"cz${seed}_orders"

      val manifest = Manifest("graft", "fuzz",
        models = List(Model(
          name = mn,
          tableReference = Some(TableReference(table = "orders")),
          primaryKey = Some("o_orderkey"),
          columns = List(
            Column("o_orderkey", "bigint"), Column("o_orderstatus", "varchar"),
            Column("o_orderpriority", "varchar"), Column("o_totalprice", "double"),
            Column("o_orderdate", "date",
              expression = Some("cast(o_orderdate as date)"))))),
        cubes = List(Cube(s"cube$seed", baseObject = mn,
          measures = List(
            CubeMeasure("n", "count(*)"),
            CubeMeasure("m1", s"$op(cast(o_totalprice as decimal(18,2)))")),
          dimensions = dims,
          timeDimensions = if (useTime) List(s"o_orderdate:$grain") else Nil)))

      val sess = GraftEngine.deployOnDir(spark, manifest, dir)
      sess.materializeCube(s"cube$seed")
      val sel = (dims ++ (if (useTime) List(s"o_orderdate_$grain") else Nil) ++
        List("n", "m1")).mkString(", ")
      val got = rowsOf(sess.query(s"SELECT $sel FROM cube$seed"))

      val raw = spark.read.parquet(s"$dir/orders.parquet")
        .withColumn("__d", col("o_orderdate").cast("date"))
      val oDims = dims.map(col) ++
        (if (useTime) List(date_trunc(grain, col("__d")).as(s"o_orderdate_$grain"))
         else Nil)
      val oMeasure = op match {
        case "sum" => sum(col("o_totalprice").cast("decimal(18,2)"))
        case "min" => min(col("o_totalprice").cast("decimal(18,2)"))
        case "max" => max(col("o_totalprice").cast("decimal(18,2)"))
      }
      // select by OUTPUT name so both sides carry the same column order
      val oracleCols = dims ++
        (if (useTime) List(s"o_orderdate_$grain") else Nil) ++ List("n", "m1")
      val oracle = raw.cube(oDims: _*)
        .agg(count(lit(1)).as("n"), oMeasure.as("m1"))
        .select(oracleCols.map(col): _*)
      assert(got == rowsOf(oracle), s"cube diverged (seed $seed)")
    }
  }
}
