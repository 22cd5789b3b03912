package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions

/** Oracle-checked queries for the gap-fill function surface (SURVEY.md §2.B function
  * rows): each query registers `GraftFunctions` on the session and exercises one
  * family against a DuckDB formulation of the same semantics.
  */
object Functions {

  private def q(tables: Seq[String], sparkSql: String, oracle: String)
      : ((SparkSession, String) => DataFrame, String) =
    (((s: SparkSession, dir: String) => {
      Relational.load(s, dir, tables: _*)
      GraftFunctions.register(s)
      s.sql(sparkSql)
    }), oracle)

  val defs: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(

    // date_bin: 15-minute buckets over the events stream. Relational.load normalizes
    // the events view's ts to epoch ns whatever representation the parquet carries
    // (µs TIMESTAMP or legacy ns-long); DuckDB sees a µs timestamp either way — both
    // engines compare at µs precision.
    "f1_date_bin" -> q(
      Seq("events"),
      """SELECT bucket,
        |  cast(date_bin(INTERVAL '90' MINUTE, bucket, timestamp '1970-01-01') as timestamp_ntz) AS bucket90,
        |  cast(date_bin(INTERVAL '2' MONTH, bucket, timestamp '2000-01-01') as timestamp_ntz) AS bucket_2mo,
        |  n, sum_value
        |FROM (
        |  SELECT cast(date_bin(900, timestamp_micros(ts div 1000), timestamp '1970-01-01 00:00:00') as timestamp_ntz) AS bucket,
        |    count(*) AS n,
        |    cast(sum(cast(value as decimal(18,3))) as double) AS sum_value
        |  FROM events GROUP BY 1)
        |ORDER BY bucket""".stripMargin,
      // DuckDB time_bucket anchors sub-month widths at 2000-01-03 (epoch-aligned for
      // a 90-minute grid) and month widths at 2000-01-01 — same grids as above.
      """SELECT bucket,
        |  time_bucket(INTERVAL 90 minutes, bucket) AS bucket90,
        |  time_bucket(INTERVAL 2 months, bucket) AS bucket_2mo,
        |  n, sum_value
        |FROM (
        |  SELECT time_bucket(INTERVAL 15 minutes, cast(ts as timestamp)) AS bucket,
        |    count(*) AS n,
        |    cast(sum(cast(value as decimal(18,3))) as double) AS sum_value
        |  FROM events GROUP BY 1)
        |ORDER BY bucket""".stripMargin),

    // strftime (the reference's to_char): same %-token format string in both engines,
    // covering day/month names, day-of-year, 12-hour clock, no-pad modifiers, literal
    // words, and %% escapes (chrono token set, to_char.rs:1-83)
    "f2_strftime" -> q(
      Seq("orders"),
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od,
        |  to_char(o_orderdate, '%a %A %d %b %B') AS names,
        |  strftime(o_orderdate, 'day %j of %Y at %I %p') AS wordy,
        |  strftime(o_orderdate, '%-d/%-m 100%%') AS nopad
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od,
        |  strftime(o_orderdate, '%a %A %d %b %B') AS names,
        |  strftime(o_orderdate, 'day %j of %Y at %I %p') AS wordy,
        |  strftime(o_orderdate, '%-d/%-m 100%%') AS nopad
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin),

    // Snowflake-style JSON accessors over events.props
    "f3_json_path" -> q(
      Seq("events"),
      """SELECT event_id,
        |  get_path(props, 'k') AS k_raw,
        |  as_integer(get_path(props, 'k')) AS k_int,
        |  is_object(props) AS is_obj,
        |  is_integer(get_path(props, 'k')) AS k_is_int,
        |  as_integer(get_path(props, 'missing')) AS missing_int
        |FROM events WHERE event_id <= 300 ORDER BY event_id""".stripMargin,
      """SELECT event_id,
        |  props->>'$.k' AS k_raw,
        |  cast(props->>'$.k' as bigint) AS k_int,
        |  json_valid(props) AND trim(props) LIKE '{%' AS is_obj,
        |  try_cast(props->>'$.k' as bigint) IS NOT NULL AS k_is_int,
        |  try_cast(props->>'$.missing' as bigint) AS missing_int
        |FROM events WHERE event_id <= 300 ORDER BY event_id""".stripMargin),

    // digest dispatch (md5 + sha256 on the same row)
    "f4_digest" -> q(
      Seq("customer"),
      """SELECT c_custkey, digest(c_name, 'md5') AS h_md5, digest(c_name, 'sha256') AS h_sha
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin),

    // exact weighted percentile: Spark percentile(x, p, w) vs DuckDB quantile_cont
    // over weight-expanded rows (l_linenumber as the weight)
    "f5_weighted_pct" -> q(
      Seq("lineitem"),
      """SELECT l_returnflag,
        |  percentile(l_quantity, 0.5, cast(l_linenumber as bigint)) AS wmedian
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS wmedian
        |FROM (SELECT l_returnflag, l_quantity,
        |        unnest(generate_series(1, cast(l_linenumber as bigint))) AS rep
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // generate_series + explode = the reference's table function (table/mod.rs:9-11)
    "f6_series" -> q(
      Seq(),
      """SELECT n, n * n AS sq FROM (
        |  SELECT explode(s) AS n FROM (SELECT generate_series(1, 50) AS s)) ORDER BY n""".stripMargin,
      """SELECT n, n * n AS sq FROM generate_series(1, 50) t(n) ORDER BY n""".stripMargin),

    // to_unixtime / to_local_time / substr_index / iszero
    "f7_datetime_misc" -> q(
      Seq("orders"),
      """SELECT o_orderkey,
        |  to_unixtime(o_orderdate) AS epoch_s,
        |  cast(to_local_time(o_orderdate) as string) AS local_ts,
        |  substr_index(o_orderpriority, '-', 1) AS prio_code,
        |  iszero(o_totalprice) AS free_order
        |FROM orders WHERE o_orderkey <= 400 ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |  epoch(o_orderdate) AS epoch_s,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS local_ts,
        |  split_part(o_orderpriority, '-', 1) AS prio_code,
        |  o_totalprice = 0 AS free_order
        |FROM orders WHERE o_orderkey <= 400 ORDER BY o_orderkey""".stripMargin),

    // custom typed aggregates (Aggregators.scala): nth_value_agg is exactly
    // oracle-checkable (DuckDB sorted-list indexing); the weighted approx percentile
    // is verified in-query against an exact ±1pp rank band — if the sketch drifts,
    // approx_ok flips false and the hash check goes red.
    "f9_agg_sketch" -> q(
      Seq("lineitem"),
      """SELECT l_returnflag,
        |  nth_value_agg(cast(l_quantity as double), 5) AS nth5,
        |  nth_value_agg(cast(l_quantity as double), -3) AS nth3_last,
        |  approx_percentile_cont_with_weight(cast(l_quantity as double),
        |      cast(l_linenumber as double), 0.5)
        |    BETWEEN percentile(l_quantity, 0.49, cast(l_linenumber as bigint))
        |        AND percentile(l_quantity, 0.51, cast(l_linenumber as bigint)) AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |  cast(list_sort(list(l_quantity))[5] as double) AS nth5,
        |  cast(list_sort(list(l_quantity))[-3] as double) AS nth3_last,
        |  true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ordered string aggregation (reference string_agg; listagg WITHIN GROUP)
    "f8_string_agg" -> q(
      Seq("nation", "region"),
      """SELECT r_name, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, (fn, _)) => n -> fn }.toMap
  def oracles: Map[String, String] =
    defs.map { case (n, (_, o)) => n -> o }.toMap
}
