package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a pre-built [[BloomFilter]], as a codegen'd
  * Catalyst expression — the probe side of a bloom semi-join reduction.
  *
  * Spark's own `BloomFilterMightContain` exists but is internal-only
  * (not in the public function registry, verified on 4.1.2), and the
  * planner-driven runtime filter only fires on shuffle-join shapes it
  * recognizes. This expression makes the pattern available explicitly:
  * build a filter on the small side (`df.stat.bloomFilter` — a
  * distributed treeAggregate), embed its serialized bytes as a binary
  * literal, and filter the big side BEFORE its shuffle. No false
  * negatives, so a following exact semi-join returns the exact result;
  * the bloom only cuts the rows that shuffle.
  *
  * The filter bytes must be a foldable (literal) second argument; the
  * deserialized filter is cached per expression instance and referenced
  * directly from generated code (`addReferenceObj`), so the hot loop is
  * one `mightContainLong` call — no per-row deserialization.
  *
  * Key type is LongType only: `stat.bloomFilter` inserts integral
  * columns via `putLong`, so probing any other physical representation
  * would silently miss. Widen narrower ints with `.cast("long")`.
  */
case class BloomMightContain(child: Expression, filterBytes: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = filterBytes

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, filterBytes.dataType) match {
      case (LongType, BinaryType) if filterBytes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) filter argument")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, binary), " +
          s"got ${child.dataType.simpleString} and ${filterBytes.dataType.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter = {
    val bytes = filterBytes.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(v: Any, _bytes: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.mightContainLong($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(child = newLeft, filterBytes = newRight)
}
