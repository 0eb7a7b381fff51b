package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable string hash
  * ([[graft.ext.TrainPrep.portableHash]]: base-31 fold of the md5 hex
  * characters into [0, 1e9+7)) as ONE fused native expression.
  *
  * Value-identical to the compositional form
  * `aggregate(transform(split(md5(c), ""), ascii), 0, fold)` — which
  * allocates 32 single-character UTF8Strings plus an array per input
  * just to re-read the hex digits the digest already had as bytes —
  * and to the DuckDB twin (`list_reduce` over
  * `regexp_extract_all(md5(x), '.')`), so every oracle stays
  * bit-exact. Measured ≈30% off the span-hashing stage of
  * [[graft.ext.Dedup.crossDocSpans]] at sf0.1 (the md5 itself is the
  * irreducible remainder — it IS the cross-engine contract).
  *
  * Null → null (md5 of null is null in the compositional form).
  */
case class PortableHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_portable_hash"

  override protected def nullSafeEval(v: Any): Any =
    PortableHash.hash(v.asInstanceOf[UTF8String])

  // MODULE$: scalac emits NO static forwarder for a companion method
  // of a case class (the class name is taken), so call the module
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableHash$$.MODULE$$.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): PortableHash =
    copy(child = newChild)
}

object PortableHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Fold the 32 lowercase hex characters of md5(s) — as their ASCII
    * codes, straight off the digest bytes — into (acc·31 + ch) mod 1e9+7.
    */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 16) {
      acc = (acc * 31L + hexAscii((d(i) >> 4) & 0xf)) % 1000000007L
      acc = (acc * 31L + hexAscii(d(i) & 0xf)) % 1000000007L
      i += 1
    }
    acc
  }

  private def hexAscii(nibble: Int): Long =
    if (nibble < 10) ('0' + nibble).toLong else ('a' + nibble - 10).toLong
}
