package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)

  test("date_bin floors to the stride grid anchored at origin") {
    assert(one("cast(date_bin(900, timestamp '2024-05-01 10:37:22', timestamp '2001-01-01') as string)")
      == "2024-05-01 10:30:00")
    // origin offset shifts the grid
    assert(one("cast(date_bin(3600, timestamp '2024-05-01 10:37:22', timestamp '2001-01-01 00:30:00') as string)")
      == "2024-05-01 10:30:00")
  }

  test("strftime translates chrono tokens") {
    assert(one("strftime(timestamp '2024-05-01 09:08:07', '%Y-%m-%d %H:%M:%S')") == "2024-05-01 09:08:07")
    assert(one("strftime(timestamp '2024-05-01 09:08:07', '%d/%m/%y')") == "01/05/24")
  }

  test("json accessors: get_path, typed as_*, is_* predicates") {
    val j = """'{"a": {"b": [1, 2, 3]}, "s": "hi", "f": 1.5, "t": true, "z": null}'"""
    assert(one(s"get_path($j, 'a.b[1]')") == "2")
    assert(one(s"as_integer(get_path($j, 'a.b[0]'))") == 1L)
    assert(one(s"as_varchar(get_json_object($j, '$$.s'))") == "hi")
    assert(one(s"as_double(get_path($j, 'f'))") == 1.5)
    assert(one(s"as_boolean(get_path($j, 't'))") == true)
    assert(one(s"is_object($j)") == true)
    assert(one(s"is_array(get_json_object($j, '$$.a.b'))") == true)
    assert(one(s"as_integer(get_path($j, 'nope'))") == null)
    val arr = one(s"as_array(get_json_object($j, '$$.a.b'))")
    assert(arr.asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("1", "2", "3"))
  }

  test("digest dispatches by algorithm and matches the direct functions") {
    assert(one("digest('abc', 'md5')") == one("md5('abc')"))
    assert(one("digest('abc', 'sha256')") == one("sha2('abc', 256)"))
    assert(one("digest('abc', 'nope')") == null)
  }

  test("to_unixtime and to_local_time") {
    assert(one("to_unixtime(timestamp '1970-01-01 00:00:10.5')") == 10.5)
    assert(one("cast(to_local_time(timestamp '2024-05-01 10:00:00') as string)") == "2024-05-01 10:00:00")
  }

  test("weightedPercentile pulls the percentile toward heavy rows") {
    val df = spark.createDataFrame(Seq((1.0, 1L), (10.0, 9L))).toDF("x", "w")
    val m = df.agg(GraftFunctions.weightedPercentile(col("x"), col("w"), 0.5)).head.getDouble(0)
    assert(m == 10.0)
  }

  test("arrayResize pads and truncates") {
    val df = spark.sql("SELECT array('a','b','c') AS a")
    assert(df.select(GraftFunctions.arrayResize(col("a"), lit(5), lit("z"))).head.getSeq[String](0)
      == Seq("a", "b", "c", "z", "z"))
    assert(df.select(GraftFunctions.arrayResize(col("a"), lit(2), lit("z"))).head.getSeq[String](0)
      == Seq("a", "b"))
  }

  test("listing covers every registered function") {
    val names = GraftFunctions.listing.map(_.name)
    assert(names.contains("date_bin") && names.contains("get_path") && names.contains("digest"))
    assert(names.distinct.size == names.size, "no duplicate names in the listing")
  }
}
