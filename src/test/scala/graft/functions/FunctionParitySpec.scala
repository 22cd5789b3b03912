package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Function-surface parity against the reference's COMPLETE registries:
  * every scalar (`wren-core/core/src/mdl/function/scalar/mod.rs:20-194`), JSON
  * (`scalar/mod.rs:197-230`), aggregate (`aggregate/mod.rs:11-51`) and window
  * (`window/mod.rs:5-19`) function name must be (a) resolvable on the engine
  * session, (b) covered by a documented Spark-equivalent expression that this spec
  * actually runs, or (c) excluded for a reason tied to Spark's type system.
  * Adding a name to the reference list without classifying it fails the spec.
  */
class FunctionParitySpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  // ---- the reference registries, verbatim ----------------------------------

  private val refScalar = Seq(
    "nullif", "arrow_cast", "nvl", "nvl2", "overlay", "arrow_typeof", "named_struct",
    "get_field", "coalesce", "greatest", "least", "union_extract", "union_tag",
    "version", "struct",
    "digest", "md5", "sha224", "sha256", "sha384", "sha512",
    "current_date", "current_time", "date_bin", "date_part", "date_trunc",
    "from_unixtime", "make_date", "now", "to_char", "to_date", "to_local_time",
    "to_unixtime", "to_timestamp", "to_timestamp_seconds", "to_timestamp_millis",
    "to_timestamp_micros", "to_timestamp_nanos",
    "encode", "decode",
    "abs", "acos", "acosh", "asin", "asinh", "atan", "atan2", "atanh", "cbrt",
    "ceil", "cos", "cosh", "cot", "degrees", "exp", "factorial", "floor", "gcd",
    "isnan", "iszero", "lcm", "ln", "log", "log2", "log10", "nanvl", "pi", "power",
    "radians", "random", "signum", "sin", "sinh", "sqrt", "tan", "tanh", "round", "trunc",
    "regexp_count", "regexp_match", "regexp_instr", "regexp_like", "regexp_replace",
    "ascii", "bit_length", "btrim", "chr", "concat", "concat_ws", "ends_with",
    "levenshtein", "lower", "ltrim", "octet_length", "repeat", "replace", "rtrim",
    "split_part", "starts_with", "to_hex", "upper", "uuid", "contains",
    "character_length", "find_in_set", "initcap", "left", "lpad", "reverse", "right",
    "rpad", "strpos", "substr", "substr_index", "translate",
    "array_to_string", "string_to_array", "range", "gen_series", "array_dims",
    "cardinality", "array_ndims", "array_append", "array_prepend", "array_concat",
    "array_except", "array_element", "array_pop_back", "array_pop_front",
    "array_slice", "array_any_value", "make_array", "array_has", "array_has_all",
    "array_has_any", "array_empty", "array_length", "array_distance", "flatten",
    "array_max", "array_min", "array_sort", "array_repeat", "array_resize",
    "array_reverse", "array_distinct", "array_intersect", "array_union",
    "array_position", "array_positions", "array_remove", "array_remove_all",
    "array_remove_n", "array_replace_n", "array_replace_all", "array_replace",
    "map", "map_entries", "map_extract", "map_keys", "map_values")

  private val refJson = Seq(
    "get_path", "as_array", "as_binary", "as_boolean", "as_char", "as_varchar",
    "as_date", "as_decimal", "as_number", "as_double", "as_real", "as_integer",
    "as_object", "as_time", "as_timestamp", "as_timestamp_tz", "is_array",
    "is_binary", "is_boolean", "is_char", "is_varchar", "is_date", "is_double",
    "is_real", "is_integer", "is_null_value", "is_object", "is_time", "is_timestamp",
    "is_timestamp_tz")

  private val refAggregate = Seq(
    "array_agg", "first_value", "last_value", "covar_samp", "covar_pop", "corr",
    "sum", "max", "min", "median", "count", "regr_slope", "regr_intercept",
    "regr_count", "regr_r2", "regr_avgx", "regr_avgy", "regr_sxx", "regr_syy",
    "regr_sxy", "var_samp", "var_pop", "stddev", "stddev_pop", "approx_median",
    "approx_distinct", "approx_percentile_cont", "approx_percentile_cont_with_weight",
    "string_agg", "bit_and", "bit_or", "bit_xor", "bool_and", "bool_or", "avg",
    "grouping", "nth_value")

  private val refWindow = Seq(
    "cume_dist", "row_number", "lead", "lag", "rank", "dense_rank", "percent_rank",
    "ntile", "first_value", "last_value", "nth_value")

  // ---- classification -------------------------------------------------------

  /** Reference name → an equivalent Spark expression this spec executes. */
  private val aliases: Map[String, String] = Map(
    "arrow_cast" -> "cast(1 as bigint)",
    "arrow_typeof" -> "typeof(1)",
    "get_field" -> "named_struct('a', 1).a",
    "encode" -> "base64('x') || hex('x')", // DataFusion encode(x,'base64'|'hex')
    "decode" -> "cast(unbase64('eA==') as string) || cast(unhex('78') as string)",
    "random" -> "rand()",
    "ends_with" -> "endswith('ab', 'b')",
    "starts_with" -> "startswith('ab', 'a')",
    "array_to_string" -> "array_join(array('a', 'b'), ',')",
    "array_resize" -> "slice(concat(array(1,2,3), array_repeat(0, 2)), 1, 2)", // GraftFunctions.arrayResize is the Scala-API generic form
    "ln" -> "log(2.718281828459045)", // Spark ln exists too; log(x) is natural log
    "range" -> "sequence(1, 3)",
    "gen_series" -> "generate_series(1, 3)",
    "cardinality" -> "cardinality(array(1))",
    "array_concat" -> "concat(array(1), array(2))",
    "array_element" -> "element_at(array(1), 1)",
    "array_pop_back" -> "slice(array(1,2,3), 1, size(array(1,2,3)) - 1)",
    "array_pop_front" -> "slice(array(1,2,3), 2, size(array(1,2,3)) - 1)",
    "array_slice" -> "slice(array(1,2,3), 2, 2)",
    "array_any_value" -> "element_at(filter(array(null, 7), x -> x IS NOT NULL), 1)",
    "make_array" -> "array(1, 2)",
    "array_has" -> "array_contains(array(1), 1)",
    "array_has_all" -> "forall(array(1), x -> array_contains(array(1, 2), x))",
    "array_has_any" -> "arrays_overlap(array(1), array(1, 2))",
    "array_empty" -> "size(array(1)) = 0",
    "array_length" -> "size(array(1))",
    "array_reverse" -> "reverse(array(1, 2))",
    // Spark's array_remove drops ALL occurrences (= DataFusion array_remove_all);
    // first-n removal composes from filter over (value, index)
    "array_remove_all" -> "array_remove(array(1, 2, 1), 1)",
    "array_remove_n" -> "filter(array(1,2,1), (x, i) -> x != 1 OR i >= 1)",
    "array_replace" -> "transform(array(1,2), x -> IF(x = 1, 9, x))",
    "array_replace_n" -> "transform(array(1,2), (x, i) -> IF(x = 1 AND i < 1, 9, x))",
    "array_replace_all" -> "transform(array(1,2,1), x -> IF(x = 1, 9, x))",
    "array_positions" -> "filter(transform(array(1,2,1), (x, i) -> IF(x = 1, i + 1, null)), p -> p IS NOT NULL)",
    "map_extract" -> "element_at(map('a', 1), 'a')",
    // aggregates
    "approx_median" -> "(SELECT approx_percentile(x, 0.5) FROM VALUES (1.0) t(x))",
    "approx_distinct" -> "(SELECT approx_count_distinct(x) FROM VALUES (1) t(x))",
    "approx_percentile_cont" -> "(SELECT approx_percentile(x, 0.5) FROM VALUES (1.0) t(x))",
    "string_agg" -> "(SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) FROM VALUES ('a') t(x))",
    // DataFusion's nth_value AGGREGATE — registered as nth_value_agg because the
    // name must keep resolving to Spark's window function (Aggregators.scala)
    "nth_value" -> "(SELECT nth_value_agg(x, 1) FROM VALUES (1.0) t(x))")

  /** Reference name → why it cannot exist on Spark (type-system gaps). */
  private val excluded: Map[String, String] = Map(
    "union_extract" -> "Spark has no union type",
    "union_tag" -> "Spark has no union type",
    "current_time" -> "Spark has no TIME type (SURVEY §1.2)",
    "as_time" -> "Spark has no TIME type",
    "is_time" -> "Spark has no TIME type",
    "array_dims" -> "Spark arrays are strictly 1-D; size() covers the only dimension",
    "array_ndims" -> "Spark arrays are strictly 1-D")

  private def resolves(name: String): Boolean =
    spark.catalog.functionExists(name)

  test("every reference scalar + json function is classified and available") {
    val all = refScalar ++ refJson
    val unclassified = all.filterNot(n =>
      resolves(n) || aliases.contains(n) || excluded.contains(n))
    assert(unclassified.isEmpty, s"unclassified reference functions: $unclassified")
  }

  test("every reference aggregate and window function is classified and available") {
    val unclassified = (refAggregate ++ refWindow).distinct.filterNot(n =>
      resolves(n) || aliases.contains(n) || excluded.contains(n))
    assert(unclassified.isEmpty, s"unclassified reference functions: $unclassified")
  }

  test("documented alias expressions actually run") {
    aliases.foreach { case (name, sql) =>
      val wrapped = if (sql.trim.startsWith("(")) sql else s"($sql)"
      try spark.sql(s"SELECT $wrapped").collect()
      catch { case e: Throwable => fail(s"alias for $name failed: $sql\n${e.getMessage}") }
    }
  }

  test("new name-parity registrations compute the right values") {
    def one(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)
    assert(one("sha256('abc')") == one("sha2('abc', 256)"))
    assert(one("cast(to_timestamp_millis(1500) as string)").toString.endsWith("01.5"))
    assert(one("regexp_match('a1b2', '[0-9]')") == Seq("1", "2"))
    assert(one("string_to_array('a.b.c', '.')") == Seq("a", "b", "c")) // literal dot, not regex
    assert(one("to_hex(255)") == "ff")
    assert(one("strpos('hello', 'll')") == 3)
    assert(one("gcd(12, 18)") == 6L && one("lcm(4, 6)") == 12L)
    assert(one("gcd(-4, 6)") == 2L)
    assert(one("cast(array_distance(array(0.0, 0.0), array(3.0, 4.0)) as int)") == 5)
    assert(one("as_number('1.5')") == new java.math.BigDecimal("1.5000000000"))
    assert(one("is_date(as_varchar('\"2024-01-01\"'))") == true)
    assert(one("is_binary('\"68690a\"')") == true && one("is_binary('\"zz\"')") == false)
  }
}
