package graft.planner

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._

/** Property-fuzzes the MANIFEST itself — the axis the fixed-manifest sweeps
  * don't cover. Each seed generates a random MDL (random column subsets,
  * random expression columns, a random to-one chain with calculated fields —
  * including the nested calc-through-calc hard case — a random to-many
  * aggregate, and a randomly FLIPPED relationship declaration), deploys it,
  * and differential-tests the planner's expansion against an INDEPENDENT
  * oracle built directly with the DataFrame API (joins/groupBy over the raw
  * parquet — never through the planner).
  *
  * Invariants per seed (reference semantics: wren-core's model.slt:40-44
  * count-invariance law and plan.rs:1038-1146 CalculationPlanNode):
  *   1. adding calculated columns never changes the host model's row count;
  *   2. a to-one calc equals a direct left-join lookup (nested calc resolves
  *      through the TARGET model's own calc);
  *   3. a to-many calc equals a direct pre-aggregation joined back on the pk;
  *   4. expression-backed columns equal the same expression over the scan.
  */
class ManifestFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  /** Physical-table catalog: (table, pk, columns). Types mirror the parquet. */
  private case class Phys(table: String, pk: String, cols: List[(String, String)])
  private val phys = Map(
    "region" -> Phys("region", "r_regionkey",
      List("r_regionkey" -> "int", "r_name" -> "varchar")),
    "nation" -> Phys("nation", "n_nationkey",
      List("n_nationkey" -> "int", "n_name" -> "varchar", "n_regionkey" -> "int")),
    "customer" -> Phys("customer", "c_custkey",
      List("c_custkey" -> "bigint", "c_name" -> "varchar", "c_nationkey" -> "int",
        "c_acctbal" -> "double", "c_mktsegment" -> "varchar")),
    "orders" -> Phys("orders", "o_orderkey",
      List("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "varchar", "o_totalprice" -> "double",
        "o_orderpriority" -> "varchar")),
    "lineitem" -> Phys("lineitem", "l_orderkey",
      List("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int",
        "l_quantity" -> "double", "l_extendedprice" -> "double",
        "l_discount" -> "double", "l_returnflag" -> "varchar")),
    "supplier" -> Phys("supplier", "s_suppkey",
      List("s_suppkey" -> "bigint", "s_name" -> "varchar",
        "s_nationkey" -> "int", "s_acctbal" -> "double")))

  /** To-one edges: (child, parent, childFk, parentKey). Chains compose. */
  private val edges = List(
    ("nation", "region", "n_regionkey", "r_regionkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"))

  /** Two-hop chains (child, mid, top) over consecutive edges. */
  private val chains = List(
    ("customer", "nation", "region"),
    ("orders", "customer", "nation"),
    ("lineitem", "orders", "customer"),
    ("supplier", "nation", "region"))

  /** Per-table expression-column pool: (name, mdlType, sparkSqlExpr). The
    * oracle replays the identical expression via selectExpr — a different
    * path (direct scan) than the planner's deployed view.
    */
  private val exprPool = Map(
    "lineitem" -> ("x_rev", "double", "l_extendedprice * (1 - l_discount)"),
    "orders" -> ("x_tag", "varchar",
      "concat(cast(o_orderkey as string), '_', cast(o_custkey as string))"),
    "customer" -> ("x_bal", "double", "round(c_acctbal, 0)"),
    "nation" -> ("x_nm", "varchar", "upper(n_name)"),
    "region" -> ("x_nm", "varchar", "upper(r_name)"),
    "supplier" -> ("x_nm", "varchar", "upper(s_name)"))

  /** String/varchar columns usable as a to-one lookup target, per table. */
  private val lookupPool = Map(
    "region" -> List("r_name"),
    "nation" -> List("n_name"),
    "customer" -> List("c_mktsegment", "c_name"),
    "orders" -> List("o_orderstatus", "o_orderpriority"))

  /** Numeric child columns usable under a to-many aggregate, per table. */
  private val aggPool = Map(
    "nation" -> List("n_nationkey"),
    "supplier" -> List("s_acctbal"),
    "customer" -> List("c_acctbal"),
    "orders" -> List("o_totalprice"),
    "lineitem" -> List("l_quantity", "l_extendedprice"))

  private def q(s: String) = "\"" + s + "\""

  private case class Fuzzed(
      manifest: Manifest,
      viaView: Option[String],
      childModel: String, midModel: String, topModel: Option[String],
      child: String, mid: String, top: Option[String],
      toOneCalc: String, toOneTarget: String, // calc name on child, col on mid
      nestedCalc: Option[(String, String)], // calc name on child, col on top
      midCalcName: Option[String], // mid's own calc (through-calc nesting)
      aggCalc: (String, String, String), // (name on mid, op, child col)
      exprCol: Option[(String, String, String)]) // on child

  /** Build one random manifest. Names are seed-suffixed so each deploy is a
    * fresh, independent session (no view crosstalk between seeds).
    */
  private def gen(seed: Int): Fuzzed = {
    val rnd = new Random(seed)
    val (child, mid, top0) = chains(rnd.nextInt(chains.length))
    val useTop = rnd.nextBoolean()
    val top = if (useTop) Some(top0) else None
    def mname(t: String) = s"fz${seed}_$t"

    val tables = List(child, mid) ++ top.toList
    val edgeList = edges.filter { case (c, p, _, _) =>
      (c == child && p == mid) || (top.isDefined && c == mid && p == top.get) }

    // per-table kept columns: pk + any join keys + referenced cols, plus a
    // random subset of the rest (column subsetting is part of the fuzz)
    val toOneTarget = {
      val pool = lookupPool(mid)
      pool(rnd.nextInt(pool.length))
    }
    val nestedTarget = top.map { t =>
      val pool = lookupPool.getOrElse(t, List(phys(t).pk))
      pool(rnd.nextInt(pool.length))
    }
    val (aggOp, aggCol) = {
      val pool = aggPool(child)
      val col = pool(rnd.nextInt(pool.length))
      val op = Seq("sum", "count", "min", "max", "avg")(rnd.nextInt(5))
      (op, col)
    }
    val required: Map[String, Set[String]] = tables.map { t =>
      val p = phys(t)
      val joinCols = edgeList.flatMap { case (c, pr, fk, pkk) =>
        (if (c == t) List(fk) else Nil) ++ (if (pr == t) List(pkk) else Nil) }
      val refd = (if (t == mid) List(toOneTarget) else Nil) ++
        (if (top.contains(t)) nestedTarget.toList else Nil) ++
        (if (t == child) List(aggCol) else Nil)
      t -> (Set(p.pk) ++ joinCols ++ refd)
    }.toMap
    def keptCols(t: String): List[(String, String)] =
      phys(t).cols.filter { case (n, _) =>
        required(t).contains(n) || rnd.nextBoolean() }

    val exprCol = if (rnd.nextBoolean()) exprPool.get(child) else None

    // mid's own calc (to-one through the SECOND hop) — the nested
    // calc-through-calc case resolves child."rel"."midcalc"
    val midCalcName = top.flatMap { t =>
      if (rnd.nextBoolean())
        Some(s"mcalc_${nestedTarget.get}")
      else None
    }

    def relName(c: String, p: String) = s"fz${seed}_${c}_$p"

    val models = tables.map { t =>
      val base = keptCols(t).map { case (n, ty) => Column(n, ty) }
      val expr = if (t == child) exprCol.toList.map { case (n, ty, e) =>
        Column(n, ty, expression = Some(e)) } else Nil
      // relationship columns: child -> mid, mid -> top, and mid -> child
      // (the to-many direction uses the SAME edge traversed backwards)
      val rels =
        (if (t == child) List(Column("up", mname(mid), relationship = Some(relName(child, mid))))
         else Nil) ++
        (if (t == mid && top.isDefined)
          List(Column("up2", mname(top.get), relationship = Some(relName(mid, top.get))))
         else Nil) ++
        (if (t == mid) List(Column("down", mname(child), relationship = Some(relName(child, mid))))
         else Nil)
      val calcs =
        (if (t == child) {
          List(Column(s"c_one", "varchar", isCalculated = true,
            expression = Some(s"${q("up")}.${q(toOneTarget)}"))) ++
          nestedCalcExpr(seed, midCalcName, nestedTarget).toList
        } else Nil) ++
        (if (t == mid) {
          midCalcName.toList.map { mc =>
            Column(mc, "varchar", isCalculated = true,
              expression = Some(s"${q("up2")}.${q(nestedTarget.get)}")) } ++
          List(Column("c_many",
            aggOp match {
              case "count" => "bigint"
              // Spark's avg over decimal(18,2) is decimal(22,6)
              case "avg" => "decimal(22,6)"
              case _ => "decimal(18,2)"
            },
            isCalculated = true,
            expression = Some(
              if (aggOp == "count") s"count(${q("down")}.${q(phys(child).pk)})"
              else s"$aggOp(cast(${q("down")}.${q(aggCol)} as decimal(18,2)))")))
        } else Nil)
      Model(
        name = mname(t),
        tableReference = Some(TableReference(table = phys(t).table)),
        primaryKey = Some(phys(t).pk),
        columns = base ++ expr ++ rels ++ calcs)
    }

    // randomly FLIP each relationship's declaration: (child, parent) with
    // MANY_TO_ONE is semantically identical to (parent, child) with
    // ONE_TO_MANY — both orientations must deploy to the same expansion.
    // The CONDITION's side order is flipped independently (equality is
    // symmetric; the planner must bind each side by model, not position).
    val relationships = edgeList.map { case (c, p, fk, pkk) =>
      val cond =
        if (rnd.nextBoolean()) s"${q(mname(c))}.${q(fk)} = ${q(mname(p))}.${q(pkk)}"
        else s"${q(mname(p))}.${q(pkk)} = ${q(mname(c))}.${q(fk)}"
      if (rnd.nextBoolean())
        Relationship(relName(c, p), List(mname(c), mname(p)), JoinType.ManyToOne, cond)
      else
        Relationship(relName(c, p), List(mname(p), mname(c)), JoinType.OneToMany, cond)
    }

    // a view over the child model: queries through it must expand identically
    val views =
      if (rnd.nextBoolean())
        List(View(s"fz${seed}_v",
          s"SELECT * FROM graft.fuzz.${mname(child)}"))
      else Nil

    Fuzzed(
      manifest = Manifest("graft", "fuzz", models = models,
        relationships = relationships, views = views),
      viaView = views.headOption.map(_.name),
      childModel = mname(child), midModel = mname(mid), topModel = top.map(mname),
      child = child, mid = mid, top = top,
      toOneCalc = "c_one", toOneTarget = toOneTarget,
      nestedCalc = nestedTarget.map(t => ("c_two", t)),
      midCalcName = midCalcName,
      aggCalc = ("c_many", aggOp, aggCol),
      exprCol = exprCol)
  }

  /** child's two-hop calc: through the mid's own calc when one exists
    * (calc-through-calc), else the direct path expression.
    */
  private def nestedCalcExpr(
      seed: Int, midCalc: Option[String], nestedTarget: Option[String]): Option[Column] =
    nestedTarget.map { t =>
      val e = midCalc match {
        case Some(mc) => s"${q("up")}.${q(mc)}"
        case None => s"${q("up")}.${q("up2")}.${q(t)}"
      }
      Column("c_two", "varchar", isCalculated = true, expression = Some(e))
    }

  private def raw(t: String): DataFrame = spark.read.parquet(s"$dir/${phys(t).table}.parquet")

  private def rowsOf(df: DataFrame): Seq[Seq[Option[String]]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i =>
        Option(r.get(i)).map {
          case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
          case v => v.toString
        }))
      .sortBy(_.map(_.getOrElse("<null>")).mkString("|"))

  for (seed <- 0 until 32) {
    test(s"seed $seed: random manifest expands to the independent DataFrame oracle") {
      val f = gen(seed)
      val sess = GraftEngine.deployOnDir(spark, f.manifest, dir)
      val childPk = phys(f.child).pk
      val midPk = phys(f.mid).pk
      val fkOfChild = edges.collectFirst {
        case (c, p, fk, _) if c == f.child && p == f.mid => fk }.get
      val parentKey = edges.collectFirst {
        case (c, p, _, pk) if c == f.child && p == f.mid => pk }.get

      // (1) count invariance: calc columns must not change row multiplicity
      val rawChildCount = raw(f.child).count()
      assert(sess.query(s"SELECT count(*) AS n FROM ${f.childModel}")
        .collect().head.getLong(0) == rawChildCount, "child count drifted")
      val projected = sess.query(
        s"SELECT count(c_one) AS a, count(*) AS n FROM ${f.childModel}").collect().head
      assert(projected.getLong(1) == rawChildCount, "count(*) with calc drifted")

      // (2) to-one calc (+ nested two-hop, resolving through the mid's own
      //     calc when the manifest declared one) — queried through the MDL
      //     view when the fuzzed manifest carries one (identical expansion)
      val selCols = Seq(childPk, "c_one") ++ f.nestedCalc.map(_ => "c_two").toSeq
      val queryFrom = f.viaView.getOrElse(f.childModel)
      val got = rowsOf(sess.query(
        s"SELECT ${selCols.mkString(", ")} FROM $queryFrom"))
      val midLookup = raw(f.mid).select(
        (Seq(col(parentKey).as("__k"), col(f.toOneTarget).as("__one")) ++
          f.top.flatMap { t =>
            val topEdge = edges.collectFirst {
              case (c, p, fk, pk) if c == f.mid && p == t => (fk, pk) }.get
            f.nestedCalc.map(_ => col(topEdge._1).as("__tfk"))
          }.toSeq): _*)
      val oracleToOne: DataFrame = {
        val base = raw(f.child).select(col(childPk), col(fkOfChild).as("__fk"))
          .join(broadcast(midLookup), col("__fk") === col("__k"), "left_outer")
        val withNested = f.nestedCalc match {
          case Some((_, topCol)) =>
            val t = f.top.get
            val topEdge = edges.collectFirst {
              case (c, p, fk, pk) if c == f.mid && p == t => (fk, pk) }.get
            base.join(
              broadcast(raw(t).select(col(topEdge._2).as("__tk"), col(topCol).as("__two"))),
              col("__tfk") === col("__tk"), "left_outer")
              .select((Seq(col(childPk), col("__one")) :+ col("__two")): _*)
          case None => base.select(col(childPk), col("__one"))
        }
        withNested
      }
      assert(got == rowsOf(oracleToOne),
        s"to-one/nested expansion diverged from the DataFrame oracle (seed $seed)")

      // (3) to-many calc on the mid = direct pre-aggregation joined on its pk
      val (aggName, aggOp, aggCol) = f.aggCalc
      val gotAgg = rowsOf(sess.query(
        s"SELECT $midPk, $aggName FROM ${f.midModel}"))
      val pre = raw(f.child).groupBy(col(fkOfChild).as("__g")).agg(
        (aggOp match {
          case "count" => count(col(childPk))
          case "sum" => sum(col(aggCol).cast("decimal(18,2)"))
          case "min" => min(col(aggCol).cast("decimal(18,2)"))
          case "max" => max(col(aggCol).cast("decimal(18,2)"))
          case "avg" => avg(col(aggCol).cast("decimal(18,2)"))
        }).as("__agg"))
      val oracleAgg = raw(f.mid).select(col(midPk))
        .join(pre, col(midPk) === col("__g"), "left_outer")
        .select(col(midPk), col("__agg"))
      assert(gotAgg == rowsOf(oracleAgg),
        s"to-many pre-agg expansion diverged from the DataFrame oracle (seed $seed)")

      // (4) expression column replays over the raw scan
      f.exprCol.foreach { case (n, _, e) =>
        val gotE = rowsOf(sess.query(s"SELECT $childPk, $n FROM ${f.childModel}"))
        val oraE = rowsOf(raw(f.child).selectExpr(childPk, s"$e AS $n"))
        assert(gotE == oraE, s"expression column diverged (seed $seed)")
      }
    }
  }

  // The streaming law (m38 generalized over the manifest fuzz): deploying the
  // SAME random manifest with the child table resolved to readStream must
  // plan a streaming query whose AvailableNow drain equals the batch
  // expansion row for row — expression columns and the (possibly nested)
  // to-one calc ride the stream⨝static joins unchanged. A subset of seeds:
  // each drain pays a real checkpointed streaming run.
  for (seed <- 0 until 6) {
    test(s"seed $seed: streamed child model drains to the batch expansion") {
      val f = gen(seed)
      val childPk = phys(f.child).pk
      val sel = Seq(childPk, "c_one") ++
        f.nestedCalc.map(_ => "c_two").toSeq ++ f.exprCol.map(_._1).toSeq
      val sql = s"SELECT ${sel.mkString(", ")} FROM ${f.childModel}"
      val batch = rowsOf(
        GraftEngine.deployOnDir(spark, f.manifest, dir).query(sql))
      val stream = GraftEngine.deploy(spark, f.manifest,
        new StreamingPathResolver(dir, Set(phys(f.child).table))).query(sql)
      assert(stream.isStreaming, s"seed $seed must plan a streaming query")
      val tmp = java.nio.file.Files.createTempDirectory("graft_fzs_").toString
      val q = stream.writeStream.format("parquet")
        .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = rowsOf(spark.read.parquet(s"$tmp/out"))
      graft.util.Fs.deleteTree(tmp)
      assert(streamed == batch,
        s"seed $seed: streaming drain diverged from batch (${streamed.size} vs ${batch.size} rows)")
    }
  }
}
