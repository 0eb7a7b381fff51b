package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM Viterbi DP ([[graft.ext.Unigram]]) as ONE native
  * expression — replaces the `aggregate`/`transform` HOF fold that
  * computed the same table.
  *
  * Why not the HOF form: higher-order functions are CodegenFallback in
  * Spark — the fold ran as an interpreted expression TREE (per chunk:
  * 12 accumulator array copies, ≤48 candidate struct allocations, each
  * scoring via a linear `element_at` scan of the ~100-entry literal
  * map), whose cost is dominated by per-node interpretation overhead
  * and allocation, and whose throughput is hostage to late-run JIT /
  * code-cache state (the round-15 driver bench measured the SAME plan
  * at 7.29× its isolated-run cost — BASELINE §R16). This expression is
  * the identical pinned procedure as two tight JVM loops over a hashed
  * model, inside whole-stage codegen via a reference-object call (the
  * [[RollingMinHash]] precedent, with instance state for the model).
  *
  * Pinned semantics (bit-identical to the HOF form, spec-pinned):
  * positions are CODE POINTS 1..n of the chunk; best state at i is the
  * lexicographic max over candidates j ∈ [max(0, i−maxPieceLen), i−1]
  * with piece w[j+1..i] in the model, of the struct
  * (prev.s + score(piece), prev.nn − 1, −j) — i.e. max total score,
  * then FEWEST pieces, then SMALLEST start (longest final piece).
  * Backtrack walks the stored starts from n; `pieces` is the best
  * path's pieces start-to-end (consumers only count/explode them, so
  * order is free but deterministic).
  *
  * Open-world behavior is EXPLICIT (round-15 advisor: the HOF form
  * null-dropped chunks with unseen characters through an inner join):
  *
  *  - `fallback` null: an unseen character (no model piece can end at
  *    its position — single characters are never pruned from a model,
  *    so any in-model piece covering it would imply the character was
  *    seen) throws with the chunk and position, instead of silently
  *    corrupting counts.
  *  - `fallback` = s_fb: the unseen character is taken as its own
  *    piece with score s_fb and counted in `n_oov` — SentencePiece's
  *    byte/char-fallback shape on the pinned score grid.
  *
  * Output: struct(s: total path score, pieces: array<string>,
  * n_oov: count of fallback pieces on the path). n_tok = size(pieces)
  * = the HOF form's −nn by construction.
  */
case class UnigramViterbi(
    chunk: Expression,
    model: Expression,
    maxPieceLen: Expression,
    fallback: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(chunk, model, maxPieceLen, fallback)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
    chunk.dataType match {
      case StringType => ()
      case other => return fail(s"chunk must be string, got ${other.catalogString}")
    }
    model.dataType match {
      case MapType(StringType, LongType, _) => ()
      case other =>
        return fail(s"model must be map<string,bigint>, got ${other.catalogString}")
    }
    if (!model.foldable) return fail("model must be a literal map")
    maxPieceLen.dataType match {
      case IntegerType => ()
      case other => return fail(s"maxPieceLen must be int, got ${other.catalogString}")
    }
    if (!maxPieceLen.foldable) return fail("maxPieceLen must be a literal")
    fallback.dataType match {
      case LongType | NullType => ()
      case other =>
        return fail(s"fallback must be bigint or null, got ${other.catalogString}")
    }
    if (!fallback.foldable) return fail("fallback must be a literal")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = UnigramViterbi.outType
  override def nullable: Boolean = chunk.nullable
  override def prettyName: String = "graft_unigram_viterbi"

  // foldable children evaluated once per (deserialized) instance —
  // model-sized executor state, exactly the literal the HOF form
  // carried, hashed instead of linearly scanned. Values boxed
  // (java.lang.Long): absent-key get must yield null, not Scala's
  // silent unbox-to-0.
  @transient private lazy val modelMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    model.eval(null) match {
      case null => ()
      case md: MapData =>
        val ks = md.keyArray()
        val vs = md.valueArray()
        var i = 0
        while (i < md.numElements()) {
          m.put(ks.getUTF8String(i).toString, java.lang.Long.valueOf(vs.getLong(i)))
          i += 1
        }
      case other => throw new IllegalStateException(
        s"$prettyName: unexpected model literal ${other.getClass}")
    }
    m
  }
  @transient private lazy val lMax: Int =
    maxPieceLen.eval(null).asInstanceOf[Int]
  @transient private lazy val fb: java.lang.Long =
    fallback.eval(null).asInstanceOf[java.lang.Long]

  /** Instance entry point shared by eval and codegen. */
  def doEval(w: UTF8String): InternalRow =
    UnigramViterbi.run(w.toString, modelMap, lMax, fb)

  override def eval(input: InternalRow): Any = {
    val w = chunk.eval(input)
    if (w == null) null else doEval(w.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugViterbi", this, classOf[UnigramViterbi].getName)
    val c = chunk.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.doEval(${c.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UnigramViterbi =
    copy(chunk = newChildren(0), model = newChildren(1),
      maxPieceLen = newChildren(2), fallback = newChildren(3))
}

object UnigramViterbi {

  val outType: StructType = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_oov", LongType, nullable = false)))

  /** The DP + backtrack over CODE-POINT positions (mapped to char
    * offsets once up front — correct beyond the BMP, free within it).
    */
  def run(
      str: String,
      model: java.util.HashMap[String, java.lang.Long],
      lMax: Int,
      fb: java.lang.Long): InternalRow = {
    val nChars = str.length
    val offFull = new Array[Int](nChars + 1)
    var n = 0
    var ci = 0
    while (ci < nChars) {
      offFull(n) = ci
      ci += Character.charCount(str.codePointAt(ci))
      n += 1
    }
    offFull(n) = nChars
    val off = offFull
    val s = new Array[Long](n + 1)
    val nn = new Array[Long](n + 1)
    val pj = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var found = false
      var bs = 0L
      var bnn = 0L
      var bnj = 0L
      var bj = 0
      var j = math.max(0, i - lMax)
      while (j < i) {
        val sc = model.get(str.substring(off(j), off(i)))
        if (sc != null) {
          val cs = s(j) + sc.longValue()
          val cnn = nn(j) - 1L
          val cnj = -j.toLong
          if (!found || cs > bs ||
              (cs == bs && (cnn > bnn || (cnn == bnn && cnj > bnj)))) {
            found = true; bs = cs; bnn = cnn; bnj = cnj; bj = j
          }
        }
        j += 1
      }
      if (!found) {
        if (fb == null)
          throw new IllegalStateException(
            s"graft_unigram_viterbi: character '${str.substring(off(i - 1), off(i))}' " +
              s"at position $i of chunk '$str' is absent from the model — " +
              "train/encode corpora diverge; use the fallback variant")
        bs = s(i - 1) + fb.longValue()
        bnn = nn(i - 1) - 1L
        bj = i - 1
      }
      s(i) = bs
      nn(i) = bnn
      pj(i) = bj
      i += 1
    }
    val count = (-nn(n)).toInt
    val pieces = new Array[AnyRef](count)
    var nOov = 0L
    var pos = n
    var k = count - 1
    while (pos > 0) {
      val j = pj(pos)
      val piece = str.substring(off(j), off(pos))
      if (!model.containsKey(piece)) nOov += 1L
      pieces(k) = UTF8String.fromString(piece)
      k -= 1
      pos = j
    }
    InternalRow(s(n), new GenericArrayData(pieces), nOov)
  }
}
