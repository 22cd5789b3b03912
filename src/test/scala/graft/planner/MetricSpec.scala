package graft.planner

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._

/** v2 metric semantics: rollup views, metric-on-metric ordering, time-grain views,
  * and cumulative windows (incl. the avg-of-avgs trap: cumulative avg must be
  * running-sum / running-count, not an average of period averages).
  */
class MetricSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def manifest = Manifest(
    catalog = "g", schema = "m",
    models = List(Model(
      "mo", tableReference = Some(TableReference(table = "orders")),
      primaryKey = Some("o_orderkey"),
      columns = List(
        Column("o_orderkey", "bigint"), Column("o_orderstatus", "varchar"),
        Column("o_totalprice", "double"),
        Column("price_dec", "decimal(18,2)",
          expression = Some("cast(o_totalprice as decimal(18,2))")),
        Column("odate", "date", expression = Some("cast(o_orderdate as date)"))))),
    metrics = List(
      Metric("by_status", baseObject = "mo",
        dimension = List(Column("o_orderstatus", "varchar")),
        measure = List(Column("n", "bigint", expression = Some("count(*)"))),
        timeGrain = List(TimeGrain("g", "odate", List("year", "month")))),
      Metric("grand", baseObject = "by_status", // metric-on-metric
        measure = List(Column("total_n", "bigint", expression = Some("sum(n)"))))),
    cumulativeMetrics = List(
      CumulativeMetric("cum_avg", baseObject = "mo",
        measure = CumulativeMeasure("running_avg", "double", "avg", "o_totalprice"),
        window = MetricWindow("mon", "odate", "month", "1995-01-01", "1995-06-01"))))

  private lazy val session = GraftEngine.deployOnDir(spark, manifest, TestSpark.sfDir)

  test("metric and metric-on-metric views roll up correctly") {
    val statuses = session.query("SELECT sum(n) AS t FROM by_status").head.getLong(0)
    val grand = session.query("SELECT total_n FROM grand").head.getLong(0)
    val direct = session.query("SELECT count(*) AS c FROM mo").head.getLong(0)
    assert(statuses == direct && grand == direct)
  }

  test("time grains register one view per date part") {
    assert(session.query("SELECT count(*) FROM by_status_g_year").head.getLong(0) > 0)
    val monthly = session.query(
      "SELECT g, sum(n) AS n FROM by_status_g_month GROUP BY g").collect()
    assert(monthly.length > 12) // multi-year orders data
  }

  test("cumulative avg is running-sum over running-count, not avg of period avgs") {
    val rows = session.query(
      "SELECT mon, running_avg FROM cum_avg ORDER BY mon").collect()
    assert(rows.length == 6) // Jan..Jun 1995 spine
    val expected = session.query(
      """SELECT avg(o_totalprice) FROM mo
        |WHERE odate >= date '1995-01-01' AND odate < date '1995-04-01'
        |""".stripMargin).head.getDouble(0)
    assert(math.abs(rows(2).getDouble(1) - expected) < 1e-9)
  }

  test("unknown cumulative operator fails loud") {
    val bad = manifest.copy(cumulativeMetrics = List(
      CumulativeMetric("bad", "mo",
        CumulativeMeasure("x", "double", "median", "o_totalprice"),
        MetricWindow("mon", "odate", "month", "1995-01-01", "1995-02-01"))))
    val e = intercept[Exception](GraftEngine.deploy(
      spark, bad, new PathResolver(TestSpark.sfDir)))
    assert(e.getMessage.contains("unknown operator"))
  }
}
