package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd vector-quantization kernels for the ANN tier
  * ([[graft.ext.Similarity]] / [[graft.ext.AnnIndex]]) — the round-16
  * optimization pass's [[UnigramViterbi]] move replayed on the
  * rotation / coarse-assign / PQ-encode hot paths.
  *
  * Why: the previous forms were higher-order-function expression trees
  * (`aggregate(zip_with(...))` folds, one per component/candidate), and
  * HOFs are CodegenFallback — interpreted per row, allocation-heavy,
  * and (for the d×d rotation) built as d nested `withColumn` Projects
  * whose analysis alone is quadratic in d. Worse, the argmin patterns
  * they fed were JOIN + groupBy(vector) aggregations: a corpus-sized
  * exchange per build pass that a map-side argmin never pays. Each
  * expression here is the identical pinned integer procedure as a
  * tight JVM loop (same Long wrap-around semantics as Spark's native
  * long arithmetic, same truncate-toward-zero division as `div`, same
  * tie orders), so every consumer's DuckDB oracle is unchanged.
  *
  * All model-side inputs (bases, centroid/codebook tables) are
  * FOLDABLE children: vocab/model-sized literals evaluated once per
  * (deserialized) instance — the broadcast-inside-the-expression-tree
  * convention the rotation chain has always used, now without the
  * per-row interpretation tax.
  */
object VecQuant {

  /** Evaluate a foldable array<array<long>> child to Array[Array[Long]]. */
  private[functions] def matOf(e: Expression): Array[Array[Long]] =
    e.eval(null) match {
      case null => Array.empty
      case ad: ArrayData =>
        val out = new Array[Array[Long]](ad.numElements())
        var i = 0
        while (i < out.length) {
          out(i) = ad.getArray(i).toLongArray()
          i += 1
        }
        out
      case other =>
        throw new IllegalStateException(s"unexpected matrix literal ${other.getClass}")
    }

  private[functions] def vecOf(e: Expression): Array[Long] =
    e.eval(null) match {
      case null => Array.empty
      case ad: ArrayData => ad.toLongArray()
      case other =>
        throw new IllegalStateException(s"unexpected vector literal ${other.getClass}")
    }

  private[functions] def intVecOf(e: Expression): Array[Int] =
    e.eval(null) match {
      case null => Array.empty
      case ad: ArrayData => ad.toIntArray()
      case other =>
        throw new IllegalStateException(s"unexpected id-vector literal ${other.getClass}")
    }

  /** Exact integer squared L2 distance — the [[LongArrayDot]] loop for
    * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, +)`.
    */
  def sqDist(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** `graft_qdist2(a, b)` — exact integer squared L2 distance of two
  * array<bigint> columns; the native twin of
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), cast(0 as bigint), +)`.
  * Zip semantics on unequal lengths (shorter wins), null-safe.
  */
case class LongArraySqDist(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_qdist2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecQuant.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArraySqDist =
    copy(left = newLeft, right = newRight)
}

/** `graft_qsub(a, b)` — element-wise difference of two array<bigint>
  * columns (`zip_with(a, b, (x,y) -> x - y)` without the HOF): the
  * residual step of every coarse-assign path. Shorter length wins,
  * null-safe, elements never null (inputs are transform outputs over
  * non-null embeddings).
  */
case class LongArraySub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_qsub"

  def doEval(a: ArrayData, b: ArrayData): GenericArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = a.getLong(i) - b.getLong(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    doEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qsub", this, classOf[LongArraySub].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.doEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArraySub =
    copy(left = newLeft, right = newRight)
}

/** `graft_qrotate(q, comps, centers, n, divisors)` — the integer-exact
  * full rotation/projection of one quantized vector through a literal
  * eigenbasis, as ONE expression instead of d nested Projects each
  * holding an interpreted fold:
  *
  *   num_c  = n · (q · comps_c) − centers_c          (Long arithmetic —
  *            identical wrap semantics to the lit(n) * aggregate(...)
  *            − lit(center) column it replaces)
  *   out_c  = divisors_c == 0 ? num_c
  *            : num_c / divisors_c                   (Java / == Spark
  *            `div` == the pinned CASE WHEN >= 0 ... ELSE -((-x) div y)
  *            truncate-toward-zero route — equal BY DEFINITION for all
  *            signs, spec-pinned)
  *
  * `comps` (array<array<bigint>>), `centers` (array<bigint>), `n`
  * (bigint) and `divisors` (array<bigint>, one per component; 0 =
  * emit the raw numerator) must be literals — they are the persisted/
  * driver-side rotation MODEL ([[graft.ext.Similarity.rotationModel]]),
  * KB-scale at any corpus size.
  */
case class QRotate(
    q: Expression,
    comps: Expression,
    centers: Expression,
    n: Expression,
    divisors: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(q, comps, centers, n, divisors)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
    q.dataType match {
      case ArrayType(LongType, _) => ()
      case other => return fail(s"q must be array<bigint>, got ${other.catalogString}")
    }
    comps.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => ()
      case other =>
        return fail(s"comps must be array<array<bigint>>, got ${other.catalogString}")
    }
    if (!comps.foldable) return fail("comps must be a literal")
    centers.dataType match {
      case ArrayType(LongType, _) => ()
      case other =>
        return fail(s"centers must be array<bigint>, got ${other.catalogString}")
    }
    if (!centers.foldable) return fail("centers must be a literal")
    n.dataType match {
      case LongType => ()
      case other => return fail(s"n must be bigint, got ${other.catalogString}")
    }
    if (!n.foldable) return fail("n must be a literal")
    divisors.dataType match {
      case ArrayType(LongType, _) => ()
      case other =>
        return fail(s"divisors must be array<bigint>, got ${other.catalogString}")
    }
    if (!divisors.foldable) return fail("divisors must be a literal")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = q.nullable
  override def prettyName: String = "graft_qrotate"

  @transient private lazy val compsM: Array[Array[Long]] = VecQuant.matOf(comps)
  @transient private lazy val centersV: Array[Long] = VecQuant.vecOf(centers)
  @transient private lazy val nRows: Long = n.eval(null).asInstanceOf[Long]
  @transient private lazy val divV: Array[Long] = VecQuant.vecOf(divisors)

  def doEval(qv: ArrayData): GenericArrayData = {
    val dOut = compsM.length
    val out = new Array[Long](dOut)
    val dIn = qv.numElements()
    var c = 0
    while (c < dOut) {
      val v = compsM(c)
      val lim = math.min(dIn, v.length)
      var dot = 0L
      var i = 0
      while (i < lim) { dot += qv.getLong(i) * v(i); i += 1 }
      val num = nRows * dot - centersV(c)
      val dv = divV(c)
      out(c) = if (dv == 0L) num else num / dv
      c += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val qv = q.eval(input)
    if (qv == null) null else doEval(qv.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qrotate", this, classOf[QRotate].getName)
    val c = q.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.doEval(${c.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QRotate =
    copy(q = newChildren(0), comps = newChildren(1), centers = newChildren(2),
      n = newChildren(3), divisors = newChildren(4))
}

/** `graft_nearest(v, cands, ids)` — argmin over a literal candidate
  * table by (exact integer L2², id): returns
  * struct(id int, d2 bigint), the map-side form of
  *
  *   join(broadcast(cands)) → groupBy(vector) → min(struct(d2, id))
  *
  * which shuffled the whole corpus per coarse-assign/Lloyd pass. Tie
  * order pinned identically: strictly-smaller d2 wins, equal d2 keeps
  * the smaller id.
  */
case class NearestCandidate(v: Expression, cands: Expression, ids: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(v, cands, ids)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
    v.dataType match {
      case ArrayType(LongType, _) => ()
      case other => return fail(s"v must be array<bigint>, got ${other.catalogString}")
    }
    cands.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => ()
      case other =>
        return fail(s"cands must be array<array<bigint>>, got ${other.catalogString}")
    }
    if (!cands.foldable) return fail("cands must be a literal")
    ids.dataType match {
      case ArrayType(IntegerType, _) => ()
      case other =>
        return fail(s"ids must be array<int>, got ${other.catalogString}")
    }
    if (!ids.foldable) return fail("ids must be a literal")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("d2", LongType, nullable = false),
    StructField("r", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = v.nullable
  override def prettyName: String = "graft_nearest"

  @transient private lazy val candsM: Array[Array[Long]] = VecQuant.matOf(cands)
  @transient private lazy val idsV: Array[Int] = {
    val iv = VecQuant.intVecOf(ids)
    require(iv.length == candsM.length && iv.nonEmpty,
      s"$prettyName: ids (${iv.length}) must parallel a non-empty cands (${candsM.length})")
    iv
  }

  def doEval(qv: ArrayData): InternalRow = {
    var bestId = 0
    var bestD2 = 0L
    var bestC = 0
    var found = false
    var c = 0
    while (c < candsM.length) {
      val cand = candsM(c)
      val lim = math.min(qv.numElements(), cand.length)
      var acc = 0L
      var i = 0
      while (i < lim) {
        val d = qv.getLong(i) - cand(i)
        acc += d * d
        i += 1
      }
      val id = idsV(c)
      if (!found || acc < bestD2 || (acc == bestD2 && id < bestId)) {
        found = true; bestD2 = acc; bestId = id; bestC = c
      }
      c += 1
    }
    // residual vs the winner — zip semantics (min length), matching
    // graft_qsub / zip_with(q, cq, (x, y) -> x - y)
    val win = candsM(bestC)
    val n = math.min(qv.numElements(), win.length)
    val r = new Array[Long](n)
    var i = 0
    while (i < n) { r(i) = qv.getLong(i) - win(i); i += 1 }
    InternalRow(bestId, bestD2, new GenericArrayData(r))
  }

  override def eval(input: InternalRow): Any = {
    val qv = v.eval(input)
    if (qv == null) null else doEval(qv.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearest", this, classOf[NearestCandidate].getName)
    val c = v.genCode(ctx)
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
      newChildren: IndexedSeq[Expression]): NearestCandidate =
    copy(v = newChildren(0), cands = newChildren(1), ids = newChildren(2))
}

/** `graft_pq_encode(r, cb, cbIds)` — product-quantization encode of a
  * residual against a literal per-subspace codebook: r splits into
  * `m = size(cb)` equal contiguous subvectors (the
  * [[graft.ext.Similarity]] `subvectors` decomposition — subvector s
  * is r[s·(d/m) .. (s+1)·(d/m))), each assigned its argmin
  * (exact L2², cid) codeword. Output:
  * array<struct(sub int, cid int, d2 bigint)> ordered by sub — the
  * map-side form of the posexplode → join(broadcast(cb)) →
  * groupBy(vector, sub) → min(struct(d2, cid)) corpus shuffle.
  */
case class PqEncode(r: Expression, cb: Expression, cbIds: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(r, cb, cbIds)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
    r.dataType match {
      case ArrayType(LongType, _) => ()
      case other => return fail(s"r must be array<bigint>, got ${other.catalogString}")
    }
    cb.dataType match {
      case ArrayType(ArrayType(ArrayType(LongType, _), _), _) => ()
      case other => return fail(
        s"cb must be array<array<array<bigint>>>, got ${other.catalogString}")
    }
    if (!cb.foldable) return fail("cb must be a literal")
    cbIds.dataType match {
      case ArrayType(ArrayType(IntegerType, _), _) => ()
      case other => return fail(
        s"cbIds must be array<array<int>>, got ${other.catalogString}")
    }
    if (!cbIds.foldable) return fail("cbIds must be a literal")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("cid", IntegerType, nullable = false),
    StructField("d2", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = r.nullable
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val cbM: Array[Array[Array[Long]]] = {
    cb.eval(null) match {
      case ad: ArrayData =>
        val out = new Array[Array[Array[Long]]](ad.numElements())
        var s = 0
        while (s < out.length) {
          val sub = ad.getArray(s)
          val cands = new Array[Array[Long]](sub.numElements())
          var c = 0
          while (c < cands.length) { cands(c) = sub.getArray(c).toLongArray(); c += 1 }
          out(s) = cands
          s += 1
        }
        out
      case other =>
        throw new IllegalStateException(s"unexpected codebook literal $other")
    }
  }
  @transient private lazy val cbIdsM: Array[Array[Int]] = {
    cbIds.eval(null) match {
      case ad: ArrayData =>
        val out = new Array[Array[Int]](ad.numElements())
        var s = 0
        while (s < out.length) { out(s) = ad.getArray(s).toIntArray(); s += 1 }
        require(out.length == cbM.length && out.zip(cbM).forall {
          case (ids, cands) => ids.length == cands.length && ids.nonEmpty },
          s"$prettyName: cbIds must parallel a non-empty cb per subspace")
        out
      case other =>
        throw new IllegalStateException(s"unexpected codebook-id literal $other")
    }
  }

  def doEval(rv: ArrayData): GenericArrayData = {
    val m = cbM.length
    val d = rv.numElements()
    val w = d / m
    val out = new Array[AnyRef](m)
    var s = 0
    while (s < m) {
      val base = s * w
      val cands = cbM(s)
      val ids = cbIdsM(s)
      var bestCid = 0
      var bestD2 = 0L
      var found = false
      var c = 0
      while (c < cands.length) {
        val cand = cands(c)
        val lim = math.min(w, cand.length)
        var acc = 0L
        var i = 0
        while (i < lim) {
          val dd = rv.getLong(base + i) - cand(i)
          acc += dd * dd
          i += 1
        }
        val id = ids(c)
        if (!found || acc < bestD2 || (acc == bestD2 && id < bestCid)) {
          found = true; bestD2 = acc; bestCid = id
        }
        c += 1
      }
      out(s) = InternalRow(s, bestCid, bestD2)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val rv = r.eval(input)
    if (rv == null) null else doEval(rv.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    val c = r.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.doEval(${c.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqEncode =
    copy(r = newChildren(0), cb = newChildren(1), cbIds = newChildren(2))
}
