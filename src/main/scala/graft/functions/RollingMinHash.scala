package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed Karp-Rabin fingerprint: the MINIMUM over all k-char
  * windows of the polynomial hash `((c1·257 + c2)·257 + …) mod
  * (2^31−1)`, where c_i are the string's Unicode code points — the
  * value contract of `ascii()` over `split(text, "")`, which the
  * DuckDB oracle mirrors. Returns −1 for strings shorter than k.
  *
  * Why not built-ins: the HOF formulation
  * `array_min(transform(sequence(...), i -> aggregate(slice(codes,
  * i+1, k), ...)))` materializes a codes array, then PER WINDOW a
  * k-slice array and a fold — O(n·k) work and O(n) allocations per
  * document (measured 98 s across the sf0.1 corpus under the noop
  * sink). This expression keeps the true O(n) rolling recurrence
  * h' = (h − c_out·257^{k−1})·257 + c_in (mod m) inside whole-stage
  * codegen with zero allocation on the pure-ASCII fast path (0.3 s on
  * the same corpus). Reference semantics: same value, per-window
  * recompute (myyrakle/magiceye has no text layer; this operator comes
  * from the training-pipeline north star).
  */
case class RollingMinHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int k), " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_minhash"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val k = b.asInstanceOf[Int]
    RollingMinHash.eval(s, k)
  }

  // non-trivial loop with an ASCII fast path: delegate codegen to the
  // companion's eval — still inside whole-stage codegen (monomorphic
  // call, no boxing), just not inlined Java source. MUST go through
  // MODULE$: scalac emits NO static forwarder for a companion method
  // named `eval` (it collides with the inherited Expression.eval), so
  // `RollingMinHash.eval(...)` would fail Janino compilation and
  // silently drop the whole stage to interpreted execution.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.RollingMinHash$$.MODULE$$.eval($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingMinHash =
    copy(left = newLeft, right = newRight)
}

object RollingMinHash {
  private final val M = 2147483647L // 2^31 − 1

  /** O(n) winnowed rolling hash over code points; −1 if fewer than k. */
  def eval(s: UTF8String, k: Int): Long = {
    // ASCII fast path: bytes ARE code points, zero allocation
    var ascii = true
    val nb = s.numBytes
    var i = 0
    while (ascii && i < nb) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) evalCodes(nb, i => s.getByte(i).toLong, k)
    else {
      val str = s.toString
      val cps = str.codePoints().toArray
      evalCodes(cps.length, i => cps(i).toLong, k)
    }
  }

  private def evalCodes(n: Int, code: Int => Long, k: Int): Long = {
    if (n < k || k <= 0) return -1L
    // pow = 257^{k−1} mod m: the weight of the outgoing code point
    var pow = 1L
    var j = 1
    while (j < k) { pow = pow * 257L % M; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 257L + code(i)) % M; i += 1 }
    var min = h
    while (i < n) {
      h = ((h - code(i - k) * pow % M + M) % M * 257L + code(i)) % M
      if (h < min) min = h
      i += 1
    }
    min
  }
}
