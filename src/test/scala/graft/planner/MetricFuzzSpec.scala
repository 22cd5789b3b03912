package graft.planner

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._

/** Fuzzes the v2 METRIC surface the way ManifestFuzzSpec fuzzes models:
  * random dimensions/measures/time grains over random base models, plus a
  * random cumulative metric, each checked against an independent oracle —
  * grouped metrics and grains against a direct DataFrame groupBy, the
  * cumulative running value against a DRIVER-SIDE fold over the collected
  * rows (a second, fully independent implementation of the spine semantics:
  * reference CumulativeMetric.java:31-44 + Window.java:29-36).
  */
class MetricFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private case class Base(
      table: String, pk: String, pkType: String,
      dims: List[String], nums: List[String], dateCol: Option[String])
  private val bases = List(
    Base("orders", "o_orderkey", "bigint",
      List("o_orderstatus", "o_orderpriority"), List("o_totalprice"),
      Some("o_orderdate")),
    Base("lineitem", "l_orderkey", "bigint",
      List("l_returnflag", "l_linestatus"), List("l_quantity", "l_extendedprice"),
      Some("l_shipdate")),
    Base("customer", "c_custkey", "bigint",
      List("c_mktsegment"), List("c_acctbal"), None))

  private def rowsOf(df: DataFrame): Seq[Seq[Option[String]]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i =>
        Option(r.get(i)).map {
          case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
          case v => v.toString
        }))
      .sortBy(_.map(_.getOrElse("<null>")).mkString("|"))

  for (seed <- 0 until 12) {
    test(s"seed $seed: random metric/grain/cumulative match independent oracles") {
      val rnd = new Random(1000 + seed)
      val b = bases(rnd.nextInt(bases.length))
      val mn = s"mz${seed}_${b.table}"
      val dimCount = rnd.nextInt(b.dims.length + 1) // 0..all
      val dims = rnd.shuffle(b.dims).take(dimCount).sorted
      val num = b.nums(rnd.nextInt(b.nums.length))
      val op = Seq("sum", "min", "max", "avg")(rnd.nextInt(4))
      val measureExpr = s"$op(cast($num as decimal(18,2)))"
      val useGrain = b.dateCol.isDefined && rnd.nextBoolean()
      val grainPart = Seq("month", "year", "quarter")(rnd.nextInt(3))
      val cumOp = Seq("sum", "count", "min", "max")(rnd.nextInt(4))
      val useCum = b.dateCol.isDefined

      val cols =
        List(Column(b.pk, b.pkType)) ++
        b.dims.map(Column(_, "varchar")) ++
        b.nums.map(Column(_, "double")) ++
        b.dateCol.map(d => Column(d, "date",
          expression = Some(s"cast($d as date)"))).toList ++
        List(Column("mdec", "decimal(18,2)",
          expression = Some(s"cast($num as decimal(18,2))")))

      val manifest = Manifest("graft", "fuzz",
        models = List(Model(
          name = mn,
          tableReference = Some(TableReference(table = b.table)),
          primaryKey = Some(b.pk),
          columns = cols)),
        metrics = List(Metric(s"met$seed", baseObject = mn,
          dimension = dims.map(Column(_, "varchar")),
          measure = List(
            Column("n", "bigint", expression = Some("count(*)")),
            Column("m1", "decimal(28,2)", expression = Some(measureExpr))),
          timeGrain = if (useGrain)
            List(TimeGrain("g", b.dateCol.get, List(grainPart))) else Nil)),
        cumulativeMetrics = if (useCum)
          List(CumulativeMetric(s"cum$seed", baseObject = mn,
            measure = CumulativeMeasure(s"c_val", operator = cumOp, refColumn = "mdec"),
            window = MetricWindow("period", b.dateCol.get, "month",
              "1995-01-01", "1995-12-31")))
        else Nil)

      val sess = GraftEngine.deployOnDir(spark, manifest, dir)
      val raw = spark.read.parquet(s"$dir/${b.table}.parquet")

      // (1) the metric view = a direct groupBy over the raw scan
      val sel = (dims :+ "n" :+ "m1").mkString(", ")
      val got = rowsOf(sess.query(s"SELECT $sel FROM met$seed"))
      val aggCols = Seq(count(lit(1)).as("n"),
        (op match {
          case "sum" => sum(col(num).cast("decimal(18,2)"))
          case "min" => min(col(num).cast("decimal(18,2)"))
          case "max" => max(col(num).cast("decimal(18,2)"))
          case "avg" => avg(col(num).cast("decimal(18,2)"))
        }).as("m1"))
      val oracle =
        if (dims.isEmpty) raw.agg(aggCols.head, aggCols.tail: _*)
        else raw.groupBy(dims.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      assert(got == rowsOf(oracle), s"metric diverged (seed $seed)")

      // (2) the time-grain rollup view = groupBy dims + date_trunc
      if (useGrain) {
        val gsel = (dims :+ "g" :+ "n").mkString(", ")
        val gotG = rowsOf(sess.query(s"SELECT $gsel FROM met${seed}_g_$grainPart"))
        val truncd = raw.withColumn("__d", col(b.dateCol.get).cast("date"))
        val oracleG = truncd.groupBy(
          (dims.map(col) :+ date_trunc(grainPart, col("__d")).as("g")): _*)
          .agg(count(lit(1)).as("n"))
        assert(gotG == rowsOf(oracleG), s"grain rollup diverged (seed $seed)")
      }

      // (3) the cumulative metric = a DRIVER-SIDE fold over collected rows:
      //     per-month partials folded left-to-right across the spine, null
      //     until the first populated period (running sum/min/max of nothing
      //     is NULL, matching SQL window semantics over absent partials)
      if (useCum) {
        val gotC = rowsOf(sess.query(
          s"SELECT cast(period as date) AS p, c_val FROM cum$seed"))
        val rows = raw
          .select(col(b.dateCol.get).cast("date").as("d"),
            col(num).cast("decimal(18,2)").as("v"))
          .where(col("d") >= lit("1995-01-01") && col("d") <= lit("1995-12-31"))
          .collect()
          .map(r => (r.getDate(0).toLocalDate, BigDecimal(r.getDecimal(1))))
        val byMonth = rows.groupBy(t => (t._1.getYear, t._1.getMonthValue))
        val months = (1 to 12).map(m => (1995, m))
        var acc: Option[BigDecimal] = None
        var cnt: Option[Long] = None
        val expected = months.map { m =>
          byMonth.get(m).foreach { vs =>
            val part = cumOp match {
              case "sum" | "count" => vs.map(_._2).sum
              case "min" => vs.map(_._2).min
              case "max" => vs.map(_._2).max
            }
            cumOp match {
              case "count" => cnt = Some(cnt.getOrElse(0L) + vs.size)
              case "sum" => acc = Some(acc.getOrElse(BigDecimal(0)) + part)
              case "min" => acc = Some(acc.map(_.min(part)).getOrElse(part))
              case "max" => acc = Some(acc.map(_.max(part)).getOrElse(part))
            }
          }
          val v = if (cumOp == "count") cnt.map(_.toString)
            else acc.map(_.underlying.stripTrailingZeros.toPlainString)
          Seq(Some(f"1995-${m._2}%02d-01"), v)
        }.sortBy(_.map(_.getOrElse("<null>")).mkString("|"))
        assert(gotC == expected, s"cumulative metric diverged (seed $seed):" +
          s"\ngot:      $gotC\nexpected: $expected")
      }
    }
  }
}
