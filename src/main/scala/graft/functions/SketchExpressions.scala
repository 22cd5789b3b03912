package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a BROADCAST Bloom filter, as a codegen'd expression.
  *
  * The scale story: an incremental-dedup batch probing a corpus-sized fingerprint
  * index pays a shuffle join for EVERY batch row, even though (in steady state)
  * almost all rows are fresh. A Bloom filter of the index answers "definitely not
  * seen" map-side with no shuffle at all; only the `fpp`-sized sliver of maybe-seen
  * rows proceeds to the exact anti-join, so the join input shrinks from |batch| to
  * |true dups| + fpp·|batch| while the final answer stays EXACT (false positives are
  * resolved by the join, and Bloom filters have no false negatives).
  *
  * The filter rides an ordinary `Broadcast` (torrent-distributed once per executor,
  * like any broadcast join side), referenced from generated code via
  * `addReferenceObj` — the same shape Spark's own runtime-filter injection uses.
  * At 1 % fpp a billion-entry index costs ~1.2 GB: comfortably broadcast-sized on
  * cluster executors, and far below the index relation it replaces.
  *
  * Input is the 64-bit fingerprint hash (LongType) — probing longs keeps both the
  * insert and probe path allocation-free (`mightContainLong`).
  */
case class MightContainBloom(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bloom"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint fingerprint hash, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) $ref.value())
         |  .mightContainLong($v);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainBloom =
    copy(child = newChild)
}
