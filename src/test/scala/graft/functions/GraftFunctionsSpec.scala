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

  test("date_bin takes interval strides: day-time exact, whole months calendar-anchored") {
    assert(one("cast(date_bin(INTERVAL '90' MINUTE, timestamp '2024-03-05 14:07:09', timestamp '2024-01-01') as string)")
      == "2024-03-05 13:30:00")
    assert(one("cast(date_bin(INTERVAL '2' MONTH, timestamp '2024-03-05 14:07:09', timestamp '2024-01-01') as string)")
      == "2024-03-01 00:00:00")
    // sources before the origin bin downward, not toward zero
    assert(one("cast(date_bin(INTERVAL '3' MONTH, timestamp '2023-11-15 00:00:00', timestamp '2024-01-20 06:00:00') as string)")
      == "2023-10-01 00:00:00")
    assert(one("cast(date_bin(INTERVAL '1' HOUR, timestamp '1969-12-31 23:10:00', timestamp '1970-01-01') as string)")
      == "1969-12-31 23:00:00")
  }

  test("strftime full chrono token set: names, day-of-year, 12h clock, fractions, escapes") {
    val t = "timestamp '2024-03-05 14:07:09.123456'"
    assert(one(s"strftime($t, '%a %A %b %B')") == "Tue Tuesday Mar March")
    assert(one(s"strftime($t, '%j %I %p')") == "065 02 PM")
    assert(one(s"strftime($t, '%H:%M:%S%.f')") == "14:07:09.123456")
    assert(one(s"strftime($t, '%f')") == "123456000")
    assert(one(s"strftime($t, '%3f|%6f')") == "123|123456")
    assert(one(s"strftime($t, '100%% at %-I o''clock')") == "100% at 2 o'clock")
    assert(one(s"strftime($t, '%D %T')") == "03/05/24 14:07:09")
    assert(one(s"strftime($t, '%z %:z')") == "+0000 +00:00")
    assert(one(s"to_char($t, '%F')") == "2024-03-05")
    // literal words pass through untouched even when they collide with pattern letters
    assert(one(s"strftime($t, 'year %Y')") == "year 2024")
    val err = intercept[Exception](spark.sql(s"SELECT strftime($t, '%W')").collect())
    assert(err.getMessage.contains("unsupported chrono token"))
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

  test("typed aggregates skip NULL inputs instead of crashing") {
    import spark.implicits._
    Seq(Some(3.0), None, Some(1.0), Some(2.0)).toDF("x").createOrReplaceTempView("nullagg_t")
    assert(one("(SELECT nth_value_agg(x, 2) FROM nullagg_t)") == 2.0)
    assert(one("(SELECT approx_percentile_cont_with_weight(x, 1.0, 0.5) FROM nullagg_t)") == 2.0)
    assert(one("(SELECT nth_value_agg(x, 1) FROM nullagg_t WHERE x IS NULL)") == null)
  }

  test("strftime accepts a column-valued (non-constant) format") {
    import spark.implicits._
    Seq(("2024-03-05 14:07:09", "%Y/%m"), ("2024-03-05 14:07:09", "%H:%M"))
      .toDF("t", "fmt").createOrReplaceTempView("fmt_t")
    val rows = spark.sql("SELECT strftime(cast(t as timestamp), fmt) FROM fmt_t ORDER BY fmt")
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("14:07", "2024/03"))
  }

  test("padding modifiers: %0X stays zero-padded, %-X strips padding") {
    assert(one("strftime(timestamp '2024-03-05 04:07:09', '%0d/%0m %0H')") == "05/03 04")
    assert(one("strftime(timestamp '2024-03-05 04:07:09', '%-d/%-m %-H')") == "5/3 4")
  }

  test("gcd/lcm error on BIGINT overflow instead of wrapping") {
    assert(one("lcm(0, 5)") == 0L)
    val e = intercept[Exception](spark.sql("SELECT lcm(4611686018427387904, 3)").collect())
    assert(e.getMessage.contains("overflow") ||
      Option(e.getCause).exists(_.getMessage.contains("overflow")))
  }

  test("cosine_similarity / dot_product match the HOF fold bit-for-bit") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(-0.5f, 4.0f, 2.5f))).toDF("a", "b")
    df.createOrReplaceTempView("vec_t")
    val viaExpr = spark.sql(
      "SELECT cosine_similarity(a, b), dot_product(a, b) FROM vec_t").head
    val viaFold = df.select(
      graft.operators.Similarity.cosine(col("a"), col("b")),
      graft.operators.Similarity.dot(col("a"), col("b"))).head
    assert(viaExpr.getDouble(0) == viaFold.getDouble(0))
    assert(viaExpr.getDouble(1) == viaFold.getDouble(1))
    val err = intercept[Exception](spark.sql("SELECT cosine_similarity(1, 2)").collect())
    assert(err.getMessage.contains("array"))
  }

  test("nth_value_agg returns the n-th smallest (or largest for negative n)") {
    import spark.implicits._
    val df = Seq(5.0, 1.0, 4.0, 2.0, 3.0).toDF("x").repartition(3)
    df.createOrReplaceTempView("nth_t")
    assert(one("(SELECT nth_value_agg(x, 2) FROM nth_t)") == 2.0)
    assert(one("(SELECT nth_value_agg(x, -1) FROM nth_t)") == 5.0)
    assert(one("(SELECT nth_value_agg(x, -2) FROM nth_t)") == 4.0)
    assert(one("(SELECT nth_value_agg(x, 9) FROM nth_t)") == null) // group smaller than n
  }

  test("approx weighted percentile tracks the exact one within rank tolerance") {
    import spark.implicits._
    // 40k heavily skewed weighted rows across 8 partitions (forces partial merges)
    val df = (1 to 40000)
      .map(i => (math.pow(i % 1000 + 1, 2.0), (i % 7 + 1).toDouble))
      .toDF("x", "w").repartition(8)
    df.createOrReplaceTempView("apct_t")
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val approx = one(s"(SELECT approx_percentile_cont_with_weight(x, w, $p) FROM apct_t)")
        .asInstanceOf[Double]
      val lo = one(s"(SELECT percentile(x, ${math.max(0, p - 0.01)}, cast(w as bigint)) FROM apct_t)").asInstanceOf[Double]
      val hi = one(s"(SELECT percentile(x, ${math.min(1, p + 0.01)}, cast(w as bigint)) FROM apct_t)").asInstanceOf[Double]
      assert(approx >= lo && approx <= hi, s"p=$p approx=$approx outside [$lo,$hi]")
    }
    // deterministic across runs (no RNG in the sketch)
    val a = one("(SELECT approx_percentile_cont_with_weight(x, w, 0.5) FROM apct_t)")
    val b = one("(SELECT approx_percentile_cont_with_weight(x, w, 0.5) FROM apct_t)")
    assert(a == b)
  }

  test("listing covers every registered function") {
    val names = GraftFunctions.listing.map(_.name)
    assert(names.contains("date_bin") && names.contains("get_path") && names.contains("digest"))
    assert(names.distinct.size == names.size, "no duplicate names in the listing")
  }
}
