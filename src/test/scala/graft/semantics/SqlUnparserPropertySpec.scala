package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property sweep for the Spark-dialect unparser: queries GENERATED from a
  * small grammar (projections, arithmetic/string expressions, filters, joins,
  * aggregates, sorts, limits, distinct, unions over the tpch tables) must
  * round-trip — emitted text executed on a bare session returns exactly the
  * engine's rows and column names. Seeds are fixed so failures reproduce; the
  * fixed oracle corpora (SqlUnparser*Spec) pin known shapes, this spec guards
  * the combinatorial space between them.
  */
/** The generation grammar, shared with [[SqlUnparserPostgresSpec]]'s
  * dual-dialect generation sweep.
  */
class SqlUnparserPropertyGrammar {
  /** One deterministic random query per seed. */
  def genQuery(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    val joined = rnd.nextBoolean()
    val from =
      if (joined)
        s"orders ${pick(Seq("JOIN", "LEFT JOIN"))} customer ON o_custkey = c_custkey"
      else "orders"
    val numCols = Seq("o_orderkey", "o_custkey") ++
      (if (joined) Seq("c_custkey", "c_acctbal") else Nil)
    val strCols = Seq("o_orderstatus", "o_orderpriority") ++
      (if (joined) Seq("c_mktsegment") else Nil)

    def numExpr(): String = pick(Seq(
      pick(numCols),
      s"${pick(numCols)} + ${rnd.nextInt(100)}",
      s"${pick(numCols)} * 2 - ${pick(numCols)}",
      s"abs(${pick(numCols)} - ${rnd.nextInt(50)})",
      s"coalesce(${pick(numCols)}, 0)"))
    def strExpr(): String = pick(Seq(
      pick(strCols),
      s"upper(${pick(strCols)})",
      s"substring(${pick(strCols)}, 1, ${1 + rnd.nextInt(3)})",
      s"concat(${pick(strCols)}, '_x')",
      s"CASE WHEN ${pick(numCols)} % 2 = 0 THEN ${pick(strCols)} ELSE 'other' END"))
    def pred(): String = pick(Seq(
      s"${pick(numCols)} % ${2 + rnd.nextInt(5)} = ${rnd.nextInt(2)}",
      s"${pick(numCols)} > ${rnd.nextInt(1000)}",
      s"${pick(strCols)} LIKE '${('A' + rnd.nextInt(5)).toChar}%'",
      s"${pick(strCols)} IN ('BUILDING', 'MACHINERY', 'O', 'F')",
      s"${pick(numCols)} IS NOT NULL",
      // decorrelates to a semi/anti join — SEMI/ANTI JOIN keywords on DuckDB,
      // correlated (NOT) EXISTS on Postgres/MySQL; both executed by the sweep
      s"o_custkey ${pick(Seq("IN", "NOT IN"))} " +
        s"(SELECT c_custkey FROM customer WHERE c_acctbal > ${rnd.nextInt(8000)})"))

    val where = if (rnd.nextBoolean()) s" WHERE ${pred()}" +
      (if (rnd.nextBoolean()) s" AND ${pred()}" else "") else ""

    val agg = rnd.nextInt(4) // 0: plain, 1: group-by, 2: distinct, 3: window
    val sql = agg match {
      case 1 =>
        val g = strExpr()
        // stddev_samp: shared spelling across all curated dialects (MySQL has
        // no corr/covar, so the grammar stays inside the common subset)
        s"SELECT $g AS grp, count(*) AS n, sum(${numExpr()}) AS s, " +
          s"max(${numExpr()}) AS mx, stddev_samp(${pick(numCols)}) AS sd " +
          s"FROM $from$where GROUP BY $g" +
          (if (rnd.nextBoolean()) " HAVING count(*) > 1" else "")
      case 2 =>
        s"SELECT DISTINCT ${strExpr()} AS a, ${numExpr()} % 7 AS b FROM $from$where"
      case 3 =>
        // rn cast to bigint in the SOURCE: Spark's row_number is int, the
        // target engines' bigint — the cast travels through the unparse
        val k = 1 + rnd.nextInt(4)
        s"SELECT a, b, rn FROM (SELECT ${strExpr()} AS a, o_orderkey AS b, " +
          s"cast(row_number() OVER (PARTITION BY ${pick(strCols)} " +
          s"ORDER BY o_orderkey) as bigint) AS rn FROM $from$where) w " +
          s"WHERE rn <= $k"
      case _ =>
        s"SELECT ${numExpr()} AS a, ${strExpr()} AS b, ${numExpr()} AS c FROM $from$where"
    }
    val withUnion =
      if (agg == 2 && rnd.nextBoolean()) s"$sql UNION ALL $sql" else sql
    val ordered =
      if (rnd.nextBoolean()) {
        val cols = if (agg == 1) "grp, n, s, mx, sd"
          else if (agg == 2) "a, b"
          else if (agg == 3) "a, b, rn" else "a, b, c"
        s"$withUnion ORDER BY $cols" +
          (if (rnd.nextBoolean()) s" LIMIT ${5 + rnd.nextInt(50)}" else "")
      } else withUnion
    ordered
  }
}

class SqlUnparserPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def load(): Unit =
    Seq("orders", "customer", "nation").foreach { t =>
      spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet").createOrReplaceTempView(t)
    }

  private val grammar = new SqlUnparserPropertyGrammar

  test("generated queries round-trip through the spark dialect (40 seeds)") {
    load()
    for (seed <- 0 until 40) {
      val sql = grammar.genQuery(seed)
      try {
        val df = spark.sql(sql)
        val qe = df.queryExecution
        val optimized = spark.sessionState.optimizer.execute(qe.analyzed)
        val text = SqlUnparser.unparse(optimized,
          qe.analyzed.output.map(_.name), SqlUnparser.SparkDialect)
        val replayed = spark.sql(text)
        assert(replayed.columns.toSeq == df.columns.toSeq, s"seed=$seed\n$sql\n$text")
        assert(replayed.collect().map(_.toString).sorted.toSeq ==
          df.collect().map(_.toString).sorted.toSeq, s"seed=$seed\n$sql\n$text")
      } catch {
        case e: AssertionError => throw e
        case e: Exception =>
          throw new AssertionError(s"seed=$seed failed\n$sql", e)
      }
    }
  }
}
