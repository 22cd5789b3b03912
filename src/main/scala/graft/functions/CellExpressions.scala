package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native IVF coarse-quantizer kernels. The composed Column forms —
  * `greatest(struct(dot, cid) × nlist)` for assignment and
  * `slice(sort_array(array(struct(dot, cid) × nlist)))` for probing — unroll
  * into nlist fused-loop dots of generated Java whose size grows linearly with
  * the cell count: at the √N-grown nlist a 100 TB index needs, janino falls
  * over (measured: nlist 16→48 turned a 0.8 s encode into ~26 s). Each kernel
  * here is one triple loop over the centroid matrix held as a referenced
  * object, so compile time and code size are nlist-independent.
  *
  * Tie semantics are bit-compatible with the composed forms and the DuckDB
  * oracle: assignment maximizes (dot, cid) lexicographically (ties → larger
  * cid, like `greatest` over `struct(sim, cid)`), probing returns the top-n
  * cells by (dot desc, cid desc), like descending `sort_array`.
  */
trait CellKernel { self: UnaryExpression =>
  def cents: Array[Array[Double]] // (nlist)(dim), row i scored as cid cids(i)
  def cids: Array[Int]

  protected def nlist: Int = cents.length
  protected def dim: Int = cents(0).length

  protected def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> vector, got ${other.sql}")
  }

  protected def elemAt(v: ArrayData, i: Int): Double =
    if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
}

/** `argmax_cell(vec)` → the cid of the best-scoring centroid. */
case class ArgmaxCell(
    child: Expression, cents: Array[Array[Double]], cids: Array[Int])
    extends UnaryExpression with CellKernel {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmax_cell"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var bestCid = cids(0)
    var i = 0
    while (i < nlist) {
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += elemAt(v, d) * cents(i)(d); d += 1 }
      if (acc > best || (acc == best && cids(i) > bestCid)) {
        best = acc; bestCid = cids(i)
      }
      i += 1
    }
    bestCid
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cellCents", cents, "double[][]")
    val cidsRef = ctx.addReferenceObj("cellCids", cids, "int[]")
    val get = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best"); val bestCid = ctx.freshName("bestCid")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |double $best = Double.NEGATIVE_INFINITY; int $bestCid = $cidsRef[0];
         |for (int $i = 0; $i < $nlist; $i++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $acc += (double) $v.$get($d) * $centsRef[$i][$d];
         |  }
         |  if ($acc > $best || ($acc == $best && $cidsRef[$i] > $bestCid)) {
         |    $best = $acc; $bestCid = $cidsRef[$i];
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgmaxCell =
    copy(child = newChild)
}

/** `top_cells(vec)` → array<int> of the `n` best cids by (dot desc, cid desc). */
case class TopCells(
    child: Expression, cents: Array[Array[Double]], cids: Array[Int], n: Int)
    extends UnaryExpression with CellKernel {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val keep = math.min(n, nlist)
    val topSim = new Array[Double](keep)
    val topCid = new Array[Int](keep)
    java.util.Arrays.fill(topSim, Double.NegativeInfinity)
    java.util.Arrays.fill(topCid, Int.MinValue)
    var i = 0
    while (i < nlist) {
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += elemAt(v, d) * cents(i)(d); d += 1 }
      val cid = cids(i)
      // insertion into the descending (sim, cid) top list
      var p = keep - 1
      if (acc > topSim(p) || (acc == topSim(p) && cid > topCid(p))) {
        while (p > 0 && (acc > topSim(p - 1) ||
            (acc == topSim(p - 1) && cid > topCid(p - 1)))) {
          topSim(p) = topSim(p - 1); topCid(p) = topCid(p - 1); p -= 1
        }
        topSim(p) = acc; topCid(p) = cid
      }
      i += 1
    }
    new GenericArrayData(topCid)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cellCents", cents, "double[][]")
    val cidsRef = ctx.addReferenceObj("cellCids", cids, "int[]")
    val get = if (childIsFloat) "getFloat" else "getDouble"
    val keep = math.min(n, nlist)
    nullSafeCodeGen(ctx, ev, v => {
      val topSim = ctx.freshName("topSim"); val topCid = ctx.freshName("topCid")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val cid = ctx.freshName("cid")
      val p = ctx.freshName("p")
      s"""
         |double[] $topSim = new double[$keep];
         |int[] $topCid = new int[$keep];
         |java.util.Arrays.fill($topSim, Double.NEGATIVE_INFINITY);
         |java.util.Arrays.fill($topCid, Integer.MIN_VALUE);
         |for (int $i = 0; $i < $nlist; $i++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $acc += (double) $v.$get($d) * $centsRef[$i][$d];
         |  }
         |  int $cid = $cidsRef[$i];
         |  int $p = $keep - 1;
         |  if ($acc > $topSim[$p] || ($acc == $topSim[$p] && $cid > $topCid[$p])) {
         |    while ($p > 0 && ($acc > $topSim[$p - 1] ||
         |        ($acc == $topSim[$p - 1] && $cid > $topCid[$p - 1]))) {
         |      $topSim[$p] = $topSim[$p - 1]; $topCid[$p] = $topCid[$p - 1]; $p--;
         |    }
         |    $topSim[$p] = $acc; $topCid[$p] = $cid;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($topCid);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

/** `lsh_bits(vec)` → long of packed hyperplane sign bits. The composed form
  * (one native dot + `when`/`shiftleft` per plane, OR-folded) grows the single
  * generated expression linearly with `planes` — the same janino collapse the
  * cell kernels fix, hit at the plane counts a billion-row corpus needs. One
  * loop over the precomputed plane matrix; bit-identical accumulation order
  * and `>= 0` sign test.
  */
case class LshBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  private def nplanes: Int = planes.length
  private def dim: Int = planes(0).length

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> vector, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bits"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < nplanes) {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += (if (childIsFloat) v.getFloat(d).toDouble else v.getDouble(d)) *
          planes(p)(d)
        d += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val get = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $nplanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $acc += (double) $v.$get($d) * $planesRef[$p][$d];
         |  }
         |  if ($acc >= 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBits =
    copy(child = newChild)
}
