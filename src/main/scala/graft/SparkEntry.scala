package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Functions, GraphEr, Memory, Pipeline, Relational, Semantic, TpcH}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY.md §2:
  *   - q*:  the relational surface (§2.B) — SQL over the test tables
  *   - m*:  the semantic layer (§2.A) — MDL manifest deploy + model SQL
  * Each has a DuckDB oracle in `oracleSql` unless inherently non-SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Deploys the TPC-H-ish semantic manifest and aggregates over a model with a
    * to-one calculated field — the reference's `test_access_model` analogue.
    */
  def entry(spark: SparkSession): DataFrame =
    Semantic.queries("m10_model_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Semantic.queries ++ Pipeline.queries ++ TpcH.queries ++
      Functions.queries ++ Memory.queries ++ GraphEr.queries ++ TpcH.translitQueries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Semantic.oracles ++ Pipeline.oracles ++ TpcH.oracles ++
      Functions.oracles ++ Memory.oracles ++ GraphEr.oracles ++ TpcH.unparseOracles ++
      Semantic.pgUnparseOracles ++ TpcH.translitOracles
}
