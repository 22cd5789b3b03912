package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton (Z-order) key: interleave the low `bits` bits of N integer columns into
  * one LongType sort key. Sorting by the interleaved key clusters rows that are
  * close in EVERY dimension into the same parquet files, so a min/max file index
  * (see `operators.ScaleLayout`) prunes multi-dimensional box predicates — the
  * data-skipping layout Delta/Iceberg `OPTIMIZE ZORDER BY` uses, built here from
  * first principles (Morton 1966; no table format needed).
  *
  * Inputs must already be bucketed to non-negative ints below 2^bits (the caller
  * range-buckets raw values first — a rank/percentile or fixed-width bucket); the
  * kernel masks to the low `bits` bits so out-of-range values wrap rather than
  * corrupt neighbouring dimensions' bit planes. The generated code is one nested
  * loop whose size is independent of `bits` (the CellExpressions lesson: unrolled
  * Column trees melt janino at the widths a 100 TB layout wants).
  */
case class InterleaveBits(children: Seq[Expression], bits: Int) extends Expression {
  require(children.nonEmpty, "zorder_key needs at least one column")
  require(bits >= 1 && children.size * bits <= 63,
    s"zorder_key: ${children.size} cols x $bits bits must fit in 63 bits")

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  // `bits` is constructor state, not a child: the default Expression.sql would
  // render `zorder_key(c1, ..., cn)` — text the zorder_key SQL builder (whose
  // last argument IS the bits literal) cannot re-parse. Keep unparse→re-parse
  // round-trips total by rendering the bits argument explicitly.
  override def sql: String =
    s"$prettyName(${(children.map(_.sql) :+ bits.toString).mkString(", ")})"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c =>
      Seq(ByteType, ShortType, IntegerType, LongType).contains(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral inputs, got ${children.map(_.dataType.sql).mkString(", ")}")

  private def mask: Long = (1L << bits) - 1

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val vs = new Array[Long](n)
    var d = 0
    while (d < n) {
      val v = children(d).eval(input)
      if (v == null) return null
      vs(d) = v match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case b: Byte => b.toLong
      }
      d += 1
    }
    var z = 0L
    var i = 0
    while (i < bits) {
      d = 0
      while (d < n) {
        z |= (((vs(d) & mask) >>> i) & 1L) << (i * n + d)
        d += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    // Hoisted to a mutable field: the kernel runs per row in layout jobs, and a
    // per-row `new long[n]` would be garbage in the tight loop.
    val vs = ctx.addMutableState("long[]", "zorderVals",
      v => s"$v = new long[$n];")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    // Each load is guarded on !isNull so codegen short-circuits on the first
    // null child exactly like eval() — otherwise a later child that throws
    // (ANSI division by zero) would raise in codegen but not interpreted mode.
    val loads = evals.zipWithIndex.map { case (e, idx) =>
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code}
         |  if (${e.isNull}) { ${ev.isNull} = true; }
         |  else { $vs[$idx] = (long) ${e.value}; }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      |boolean ${ev.isNull} = false;
      |long ${ev.value} = 0L;
      |$loads
      |if (!${ev.isNull}) {
      |  for (int $i = 0; $i < $bits; $i++) {
      |    for (int $d = 0; $d < $n; $d++) {
      |      ${ev.value} |= ((($vs[$d] & ${mask}L) >>> $i) & 1L) << ($i * $n + $d);
      |    }
      |  }
      |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits = copy(children = newChildren)
}
