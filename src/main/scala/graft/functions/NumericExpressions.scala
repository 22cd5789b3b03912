package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** DataFusion's integer gcd/lcm (`functions/math`), absent from Spark's function
  * surface. Interpreted eval (CodegenFallback) — these are occasional scalar calls,
  * not analytical hot paths; correctness (exact BigInt
  * arithmetic, explicit overflow errors instead of silent wraps) matters more than
  * codegen here.
  */
case class Gcd(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "gcd"
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires integral inputs")
  override def nullSafeEval(a: Any, b: Any): Any = {
    def long(x: Any): Long = x match {
      case i: Int => i.toLong; case l: Long => l; case s: Short => s.toLong; case b: Byte => b.toLong
    }
    val g = BigInt(long(a)).gcd(BigInt(long(b)))
    if (!g.isValidLong) throw new ArithmeticException("gcd overflows BIGINT") // gcd(minLong, minLong)
    g.toLong
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Gcd = copy(l, r)
}

case class Lcm(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "lcm"
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires integral inputs")
  override def nullSafeEval(a: Any, b: Any): Any = {
    def long(x: Any): Long = x match {
      case i: Int => i.toLong; case l: Long => l; case s: Short => s.toLong; case b: Byte => b.toLong
    }
    val (x, y) = (BigInt(long(a)), BigInt(long(b)))
    if (x == 0 || y == 0) 0L
    else {
      val l = (x * y).abs / x.gcd(y)
      if (!l.isValidLong) throw new ArithmeticException("lcm overflows BIGINT") // DataFusion errors here too
      l.toLong
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Lcm = copy(l, r)
}
