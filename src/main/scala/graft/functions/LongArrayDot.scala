package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns as a native
  * codegen'd Catalyst expression.
  *
  * Why not built-ins: `aggregate(zip_with(a, b, (x, y) -> x*y), 0L, +)`
  * is semantically identical but materializes an intermediate array per
  * row and evaluates two lambda closures per element. On an O(n²)
  * similarity join (12.5M pairs × 64 dims at bench sf0.1) that
  * allocation is the bottleneck. This expression compiles to a tight
  * primitive loop inside whole-stage codegen — no allocation, no
  * boxing — the (b) tier of the custom-operator preference order
  * (compose built-ins < custom Expression < custom physical operator).
  *
  * Null semantics: null input array → null (nullSafe); arrays are
  * produced by `transform` over non-null embeddings, so element nulls
  * do not occur (elements of a null-free transform are non-null).
  * Unequal lengths: the shorter length wins (zip semantics).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native functions into a session's function
  * registry — callable from SQL (`SELECT graft_qdot(a, b)`) and from
  * the Column API via `call_function`.
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_qdot" -> (args => LongArrayDot(args(0), args(1))),
    "graft_qdist2" -> (args => LongArraySqDist(args(0), args(1))),
    "graft_qsub" -> (args => LongArraySub(args(0), args(1))),
    "graft_qrotate" ->
      (args => QRotate(args(0), args(1), args(2), args(3), args(4))),
    "graft_nearest" -> (args => NearestCandidate(args(0), args(1), args(2))),
    "graft_pq_encode" -> (args => PqEncode(args(0), args(1), args(2))),
    "graft_bpe_apply" -> (args => BpeApply(args(0), args(1), args(2))),
    "graft_hamming" -> (args => StringHamming(args(0), args(1))),
    "graft_bloom_might_contain" -> (args => BloomMightContain(args(0), args(1))),
    "graft_zorder" -> (args => ZOrderInterleave(args(0), args(1))),
    "graft_jaccard" -> (args => ArrayJaccard(args(0), args(1))),
    "graft_containment" -> (args => ArrayContainment(args(0), args(1))),
    "graft_rolling_minhash" -> (args => RollingMinHash(args(0), args(1))),
    "graft_portable_hash" -> (args => PortableHash(args.head)),
    "graft_unigram_viterbi" ->
      (args => UnigramViterbi(args(0), args(1), args(2), args(3))),
    // aggregate: the analyzer wraps a bare AggregateFunction from the
    // registry into an AggregateExpression, same as the built-ins
    "graft_gram" -> (args => GramMatrix(args.head)),
    "graft_hll_distinct" -> (args => HllDistinct(args.head)),
    "graft_hll_sketch" -> (args => HllSketch(args.head)),
    "graft_hll_merge_estimate" -> (args => HllMergeEstimate(args.head)))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      if (!spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier(name))) {
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(name, builder, "built-in")
      }
    }

  /** Column-API handle (requires [[register]] on the session first). */
  def qdotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_qdot", a, b)

  /** Column-API handle (requires [[register]] on the session first). */
  def hammingNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_hamming", a, b)

  /** Column-API handle (requires [[register]] on the session first). */
  def jaccardNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_jaccard", a, b)

  /** Column-API handle (requires [[register]] on the session first). */
  def containmentNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_containment", a, b)
}
