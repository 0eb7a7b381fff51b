package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Set Jaccard similarity of two string arrays as a codegen'd Catalyst
  * expression — the LSH verify scorer.
  *
  * Why not built-ins: the verify step scores every candidate pair with
  * `(size(array_distinct(a)) + size(array_distinct(b)) -
  * size(array_distinct(concat(a,b)))) / size(array_distinct(concat))`,
  * which materializes a concatenated array plus three distinct-arrays
  * (each with its own internal hash table) PER PAIR. One pass with two
  * hash sets computes the identical value: with dA=|distinct a|,
  * dB=|distinct b|, I=|dA ∩ dB|, the union is dA+dB-I, and
  * I/(dA+dB-I) is bit-identical to the built-in formula's
  * (dA+dB-U)/U — same integer operands, same single double division,
  * so DuckDB oracle parity is preserved exactly.
  *
  * Two empty sets define 0.0 (not 0/0) — same convention as
  * [[graft.ext.TextPrimitives.jaccard]]: sub-shingle-width docs must
  * not near-dup-pair via shingles. Null if either array is null.
  */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayJaccard.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ArrayJaccard.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.jaccard($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}

object ArrayJaccard {

  /** One pass, two hash sets; see class doc for the parity argument. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String]()
    var inter = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      val v = b.getUTF8String(i)
      if (setB.add(v) && setA.contains(v)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }
}
