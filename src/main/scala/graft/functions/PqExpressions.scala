package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels. The composed Column forms (one
  * `greatest(struct(dot − h, scid)…)` per subspace, one dot per lookup-table entry)
  * unroll into m·ksub ≈ 128+ fused-loop dots of generated Java, which janino
  * recompiles for seconds on every distinct plan — the same disease
  * `VectorExpressions` documents for the unrolled cosine. Each kernel here is a
  * ~25-line triple loop over a codebook held as a referenced object, compiling in
  * milliseconds.
  *
  * Arithmetic is kept bit-compatible with the composed form and the relational
  * oracle: per-subspace dots accumulate left-to-right in doubles, L2 assignment is
  * `argmax (x·c − ‖c‖²/2)` with half-norms pre-summed left-to-right, and ties go to
  * the LARGER code id (`>=` while scanning ascending), matching
  * `greatest(struct(sim, scid))` / `ORDER BY sim DESC, scid DESC`.
  *
  * The codebook array participates in case-class equality by reference only — two
  * independently built but identical expressions won't CSE, which is harmless (one
  * per plan by construction).
  */
trait PqKernel { self: UnaryExpression =>
  def books: Array[Array[Array[Double]]] // (m subspaces)(ksub codes)(dsub dims)

  protected def m: Int = books.length
  protected def ksub: Int = books(0).length
  protected def dsub: Int = books(0)(0).length

  protected def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> vector, got ${other.sql}")
  }

  /** Half squared norms ‖c‖²/2, summed left-to-right like the oracle's chain. */
  protected lazy val halfNorms: Array[Array[Double]] =
    books.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s / 2.0
    })

  protected def elemAt(v: ArrayData, i: Int): Double =
    if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
}

/** `pq_encode(vec)` → array<int> of m one-based code ids (L2 assignment per
  * subspace via the dot − halfNorm trick).
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.NegativeInfinity
      var bi = 1
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        var d = 0
        while (d < dsub) { acc += elemAt(v, s * dsub + d) * books(s)(j)(d); d += 1 }
        val sim = acc - halfNorms(s)(j)
        if (sim >= best) { best = sim; bi = j + 1 }
        j += 1
      }
      codes(s) = bi
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val halfRef = ctx.addReferenceObj("pqHalf", halfNorms, "double[][]")
    val get = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bi = ctx.freshName("bi")
      val acc = ctx.freshName("acc"); val sim = ctx.freshName("sim")
      s"""
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.NEGATIVE_INFINITY; int $bi = 1;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $acc += (double) $v.$get($s * $dsub + $d) * $booksRef[$s][$j][$d];
         |    }
         |    double $sim = $acc - $halfRef[$s][$j];
         |    if ($sim >= $best) { $best = $sim; $bi = $j + 1; }
         |  }
         |  $codes[$s] = $bi;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_table(vec)` → array<double> of m·ksub ADC lookup entries; entry
  * `s·ksub + (code−1)` is `vec_s · c_{s,code}`.
  */
case class PqTable(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_table"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val tab = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        var d = 0
        while (d < dsub) { acc += elemAt(v, s * dsub + d) * books(s)(j)(d); d += 1 }
        tab(s * ksub + j) = acc
        j += 1
      }
      s += 1
    }
    new GenericArrayData(tab)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val get = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val tab = ctx.freshName("tab")
      val s = ctx.freshName("s"); val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $tab = new double[${m * ksub}];
         |for (int $s = 0; $s < $m; $s++) {
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $acc += (double) $v.$get($s * $dsub + $d) * $booksRef[$s][$j][$d];
         |    }
         |    $tab[$s * $ksub + $j] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tab);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqTable =
    copy(child = newChild)
}
