package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScaleLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain join result") {
    val fact = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select(col("o_custkey").alias("k"), col("o_totalprice"))
    val dim = spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")
      .select(col("c_custkey").alias("k"), col("c_mktsegment"))
    val plain = fact.join(dim, Seq("k")).groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScaleLayout.saltedJoin(fact, dim, "k", saltFactor = 4)
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    val lineitem = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    ScaleLayout.writeBucketed(orders, "b_orders", 4, Seq("o_orderkey"))
    ScaleLayout.writeBucketed(lineitem, "b_lineitem", 4, Seq("l_orderkey"))
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
      col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == lineitem.count())
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("clustered layout is sorted within partitions") {
    val df = Seq((3, "c"), (1, "a"), (2, "b"), (1, "z")).toDF("k", "v")
    val out = ScaleLayout.clustered(df, 2, Seq("k"))
    out.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      val ks = it.map(_.getInt(0)).toSeq
      require(ks == ks.sorted, s"partition not sorted: $ks")
    }
  }
}
