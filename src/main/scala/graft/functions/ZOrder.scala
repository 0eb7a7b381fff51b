package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 32-bit bucket ids into one long,
  * as a codegen'd Catalyst expression.
  *
  * `z = interleave(bits of a, bits of b)` — sorting by `z` clusters
  * rows that are close in BOTH dimensions, so a layout
  * range-partitioned and sorted by `z` gives every file/row-group a
  * bounded span in each dimension: a query box on (a, b) touches
  * O(box area) of the files instead of all of them. This is the
  * standard multi-dimension data-skipping layout (see e.g. the
  * Z-ordering literature and lakehouse OPTIMIZE implementations);
  * built-in expressions can't express bit interleaving without a
  * 32-term shift/mask chain, hence a native expression (tier (b)).
  *
  * Inputs are BUCKET IDS (non-negative, < 2^31), not raw values —
  * produce them with `width_bucket` over the column's min/max (see
  * [[graft.ext.Scale.writeZOrdered]]). Only the low 31 bits of each
  * input participate — the cap keeps the interleaved value's sign bit
  * clear, so a plain (signed) sort by `z` preserves the clustering
  * contract. Null if either side is null.
  */
case class ZOrderInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrderInterleave.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderInterleave =
    copy(left = newLeft, right = newRight)
}

object ZOrderInterleave {

  /** Spread the low 31 bits of `v` to even bit positions (0,2,4,…60).
    * 31, not 32: bit 31 of the second input would land at bit 63 — the
    * SIGN bit — making large z-values sort before small ones.
    */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** `a` on even bits, `b` on odd bits. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
