package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass Gram/moment accumulator over `array<bigint>` vectors
  * — the MERGEABLE-model-state tier ([[HllDistinct]]'s pattern) applied
  * to second-moment statistics: one scan of the corpus folds every
  * vector into a fixed `1 + d + d(d+1)/2`-long buffer
  *
  *   `[ n, Σx₀ … Σx_{d-1}, Σx₀x₀, Σx₀x₁ … Σx_{d-1}x_{d-1} ]`
  *
  * (upper triangle, row-major), partials merge by element-wise
  * addition in any order and grouping, and the shuffle carries ONE
  * buffer per partition — so the full d×d covariance structure of a
  * 100 TB embedding corpus costs a single map pass plus a tiny
  * all-to-one merge, where the compositional alternative (explode to
  * (vec, i, j, xᵢ·xⱼ) rows and hash-aggregate) materializes n·d²
  * intermediate rows just to throw them into the same d² cells.
  *
  * All arithmetic is exact integer on the callers' quantization grid
  * (the oracle-exactness convention): the buffer is a pure function of
  * the input MULTISET, so results are deterministic under any
  * partitioning or partial-aggregation plan (spec-pinned). Input
  * vectors must share one length; the first row fixes `d` and a
  * mismatch fails loudly rather than mis-accumulating. Null vectors
  * are skipped (SQL aggregate convention).
  *
  * Overflow contract: entries accumulate |x|²·n, a long holds exact
  * sums while n·max|x|² < 2⁶³ — callers pick the grid accordingly
  * (the covariance operator quantizes at 1e3, not the similarity
  * tier's 1e6, buying ~10⁶× row headroom) and do their finishing
  * arithmetic in BigInt. The contract is ENFORCED, not assumed: every
  * accumulation is addExact/multiplyExact, so a violation throws
  * ArithmeticException instead of silently wrapping — which matters
  * for the unbounded-lifetime streaming merge
  * ([[graft.streaming.CovarianceMonitor]]).
  */
case class GramMatrix(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }

  // d is unknown until the first vector: the empty buffer is the
  // zero-rows state (createAggregationBuffer can't see data)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def sized(d: Int): Array[Long] = new Array[Long](1 + d + d * (d + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) sized(d) else buf
    require(b.length == 1 + d + d * (d + 1) / 2,
      s"$prettyName: vector length $d differs from the corpus's")
    // loud, not silent: a NULL component would fold as 0 under the
    // unsafe row format (and the oracle's SUM would skip it) — exactly
    // the mis-accumulation this aggregate promises never to do.
    // Checked for the whole vector BEFORE any element is folded, so a
    // rejected row never half-updates the buffer. Callers quantize
    // non-null embeddings, so this never fires on the registry paths.
    var c = 0
    while (c < d) {
      require(!arr.isNullAt(c),
        s"$prettyName: NULL vector component at index $c")
      c += 1
    }
    // addExact/multiplyExact (JIT intrinsics — branch-free overflow
    // checks, no measurable cost next to the array traffic): a
    // violation of the n·max|x|² < 2⁶³ grid contract THROWS instead of
    // wrapping into silently wrong covariances — the fail-loudly
    // convention the NULL check above already follows, and the one
    // that matters for the long-lived streaming monitor, whose merged
    // buffer grows without bound across batches.
    b(0) = Math.addExact(b(0), 1L)
    var i = 0
    var p = 1 + d // start of the product triangle
    while (i < d) {
      val xi = arr.getLong(i)
      b(1 + i) = Math.addExact(b(1 + i), xi)
      var j = i
      while (j < d) {
        b(p) = Math.addExact(b(p), Math.multiplyExact(xi, arr.getLong(j)))
        p += 1; j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"$prettyName: merging buffers of different vector lengths")
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  // clone: the buffer is mutable aggregation state (the HllSketch.eval
  // convention) — handing the live array out would alias it
  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}
