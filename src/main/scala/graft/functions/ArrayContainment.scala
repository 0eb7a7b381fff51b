package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Containment statistics of two string arrays as one codegen'd pass:
  * `struct(inter = |set(a) ∩ set(b)|, na = |set(a)|)` — the containment
  * verify scorer (`inter/na`, directional).
  *
  * Why not built-ins: `size(array_intersect(a, b))` plus `size(a)`
  * materializes the intersection ARRAY per candidate pair (internal
  * hash table + copied elements) only to take its length. One pass
  * with two hash sets produces the identical integers — same
  * convention as [[ArrayJaccard]], which this mirrors; the (b) tier of
  * the custom-operator preference order. Null if either array is null.
  */
case class ArrayContainment(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("inter", IntegerType, nullable = false),
    StructField("na", IntegerType, nullable = false)))
  override def prettyName: String = "graft_containment"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayContainment.interNa(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ArrayContainment.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interNa($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayContainment =
    copy(left = newLeft, right = newRight)
}

object ArrayContainment {

  /** One pass, two hash sets (set semantics on both sides). */
  def interNa(a: ArrayData, b: ArrayData): InternalRow = {
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
    new GenericInternalRow(Array[Any](inter, setA.size))
  }
}
