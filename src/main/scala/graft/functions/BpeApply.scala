package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bpe_apply(syms, passesA, passesB)` — the BPE greedy
  * merge-application fold ([[graft.ext.TextAnalysis]] `bpeApply`) as
  * one native expression, applied for a whole SCHEDULE of
  * symbol-disjoint passes in a single call.
  *
  * The HOF form it replaces ran, per symbol of every chunk, an
  * interpreted `aggregate` lambda holding a ≤kBatch-deep
  * when/endsWith/concat chain — and the encode replay stacked one such
  * projection PER PASS (12–64 layers between checkpoints). This is the
  * identical pinned procedure as tight loops (spec-pinned
  * differentially against the HOF form):
  *
  * per pass, left-to-right over `split(syms, ' ', -1)` (Spark split
  * semantics: trailing empties kept): an empty accumulator takes the
  * symbol; otherwise the FIRST batch rule (a, b) with
  * `x == b && (acc == a || acc.endsWith(' ' + a))` — i.e. the
  * accumulator's last space-bounded symbol is exactly `a` — appends
  * `x` separator-less (fusing a+b); no rule appends ` x`. Symbols
  * never contain spaces (they are space-split tokens and their
  * concatenations), so "last symbol equals a" implements the
  * endsWith test exactly.
  */
case class BpeApply(syms: Expression, passesA: Expression, passesB: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(syms, passesA, passesB)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
    syms.dataType match {
      case StringType => ()
      case other => return fail(s"syms must be string, got ${other.catalogString}")
    }
    Seq(("passesA", passesA), ("passesB", passesB)).foreach { case (n, e) =>
      e.dataType match {
        case ArrayType(ArrayType(StringType, _), _) => ()
        case other =>
          return fail(s"$n must be array<array<string>>, got ${other.catalogString}")
      }
      if (!e.foldable) return fail(s"$n must be a literal")
    }
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = syms.nullable
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val schedule: Array[(Array[String], Array[String])] = {
    def strMat(e: Expression): Array[Array[String]] = e.eval(null) match {
      case ad: ArrayData =>
        val out = new Array[Array[String]](ad.numElements())
        var i = 0
        while (i < out.length) {
          val inner = ad.getArray(i)
          val row = new Array[String](inner.numElements())
          var j = 0
          while (j < row.length) { row(j) = inner.getUTF8String(j).toString; j += 1 }
          out(i) = row
          i += 1
        }
        out
      case other =>
        throw new IllegalStateException(s"$prettyName: unexpected literal $other")
    }
    val as = strMat(passesA)
    val bs = strMat(passesB)
    require(as.length == bs.length && as.zip(bs).forall(p => p._1.length == p._2.length),
      s"$prettyName: passesA and passesB must be parallel")
    as.zip(bs)
  }

  def doEval(s: UTF8String): UTF8String = {
    var cur = s.toString
    var p = 0
    while (p < schedule.length) {
      val (as, bs) = schedule(p)
      val toks = cur.split(" ", -1)
      val sb = new java.lang.StringBuilder(cur.length)
      var lastStart = 0
      var t = 0
      while (t < toks.length) {
        val x = toks(t)
        if (sb.length == 0) {
          // the HOF form's when(acc === '', x): an EMPTY accumulator
          // (initial, or still empty after leading empty symbols)
          // takes the symbol bare
          sb.append(x)
          lastStart = 0
        } else {
          var matched = false
          var r = 0
          while (!matched && r < bs.length) {
            if (x == bs(r) &&
                sb.length - lastStart == as(r).length &&
                sb.indexOf(as(r), lastStart) == lastStart) {
              sb.append(x) // fuse: last symbol becomes a+b
              matched = true
            }
            r += 1
          }
          if (!matched) {
            sb.append(' ')
            lastStart = sb.length
            sb.append(x)
          }
        }
        t += 1
      }
      cur = sb.toString
      p += 1
    }
    UTF8String.fromString(cur)
  }

  override def eval(input: InternalRow): Any = {
    val s = syms.eval(input)
    if (s == null) null else doEval(s.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApply].getName)
    val c = syms.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.doEval(${c.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeApply =
    copy(syms = newChildren(0), passesA = newChildren(1), passesB = newChildren(2))
}
