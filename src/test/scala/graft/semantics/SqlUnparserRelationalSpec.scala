package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.{Functions, Relational}

/** Unparse breadth over the WHOLE relational + function + semantic oracle
  * families: every query whose plan is expressible as standalone SQL must
  * round-trip — emitted text executed on a bare session returns exactly the
  * engine's rows — and the four queries whose plans carry state SQL text
  * cannot express (CSV/JSON reader options, a JDBC connection, an RDD-backed
  * DataFrame) must fail with a deliberate UnsupportedOperationException, not
  * silently or confusingly.
  *
  * Together with SqlUnparserTpchSpec this exercises Expand (GROUPING SETS /
  * ROLLUP / CUBE as UNION ALL branches), Generate (LATERAL VIEW, incl. a
  * constant-folded sequence(...) array literal), higher-order functions (arrow
  * lambdas), named_struct field preservation, listagg WITHIN GROUP, lag/lead
  * frame suppression, split_part's internal literal-split, empty column-pruned
  * projections, and the full governed-model surface (RLAC filters, calc-field
  * join chains, cubes, metrics, macros, enums — every m* query).
  */
class SqlUnparserRelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val all =
    Relational.queries ++ Functions.queries ++ graft.queries.Semantic.queries

  /** Plans that are NOT expressible as standalone SQL text, by design. */
  private val expectUnsupported = Map(
    "q25_csv_scan" -> "CSV scan",
    "q26_json_scan" -> "JSON scan",
    "q27_jdbc_scan" -> "non-file relation",
    "m16_json_result" -> "LogicalRDD")

  private def unparsed(name: String): (org.apache.spark.sql.DataFrame, String) = {
    val df = all(name)(spark, TestSpark.sfDir)
    val qe = df.queryExecution
    val optimized = spark.sessionState.optimizer.execute(qe.analyzed)
    (df, SqlUnparser.unparse(optimized,
      qe.analyzed.output.map(_.name), SqlUnparser.SparkDialect))
  }

  for (name <- all.keys.toSeq.sorted if !expectUnsupported.contains(name)) {
    test(s"spark round-trip: $name") {
      val (df, text) = unparsed(name)
      val replayed = spark.sql(text)
      assert(replayed.columns.toSeq == df.columns.toSeq, s"\n$text")
      assert(replayed.collect().map(_.toString).sorted.toSeq ==
        df.collect().map(_.toString).sorted.toSeq, s"\n$text")
    }
  }

  for ((name, marker) <- expectUnsupported.toSeq.sortBy(_._1)) {
    test(s"deliberately unsupported: $name fails loudly") {
      val e = intercept[UnsupportedOperationException](unparsed(name))
      assert(e.getMessage.contains(marker), e.getMessage)
    }
  }
}
