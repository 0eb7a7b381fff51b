package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native HyperLogLog distinct-count aggregate — the MERGEABLE-sketch
  * tier of the extension ladder (a custom `TypedImperativeAggregate`,
  * complementing the scalar expressions in this package).
  *
  * Mergeability is the whole point at 100 TB: each partition folds its
  * rows into a fixed 2^p-byte register array, partial buffers combine
  * by element-wise max in any order and any grouping — so the
  * aggregation is one map-side pass plus a tiny shuffle of sketches,
  * and the SAME sketch can be persisted per day/partition and merged
  * across arbitrary time windows later without touching raw data
  * (the property count(DISTINCT) fundamentally lacks).
  *
  * Standard HLL (Flajolet et al. 2007): register index = top `p` bits
  * of a 64-bit hash, register value = leading-zero rank of the
  * remaining bits; harmonic-mean estimate with the small-range
  * linear-counting correction. The estimate is a pure function of the
  * register array, which is a pure function of the input SET — so
  * results are deterministic under any partitioning, ordering, or
  * partial-aggregation plan (spec-pinned). p=12 → 4096 one-byte
  * registers, rsd ≈ 1.04/√4096 ≈ 1.6%.
  */
/** Shared HLL register math (p=12, 4096 one-byte registers). */
private[graft] object Hll {
  val p = 12
  val m: Int = 1 << p

  /** Canonical 64-bit hash per data type. Every atomic type hashes a
    * canonical byte representation with the full 64-bit domain — a
    * `hashCode`-based fallback would collapse the domain to 32 bits of
    * entropy and systematically underestimate cardinalities near
    * 10^8-10^9 (birthday collisions among 2^32 hash values). Doubles and
    * floats canonicalize -0.0 to 0.0 (value-equal inputs must hash
    * equal; `doubleToLongBits` already canonicalizes NaN); decimals hash
    * the unscaled value bytes mixed with the scale. Non-atomic types are
    * rejected by `checkInputDataTypes` before execution.
    */
  def hash(v: Any): Long = v match {
    case l: java.lang.Long    => XXH64.hashLong(l, 42L)
    case i: java.lang.Integer => XXH64.hashLong(i.toLong, 42L)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    case sh: java.lang.Short  => XXH64.hashLong(sh.toLong, 42L)
    case by: java.lang.Byte   => XXH64.hashLong(by.toLong, 42L)
    case b: java.lang.Boolean => XXH64.hashLong(if (b) 1L else 0L, 42L)
    case d: java.lang.Double =>
      val dv = if (d.doubleValue == 0.0d) 0.0d else d.doubleValue
      XXH64.hashLong(java.lang.Double.doubleToLongBits(dv), 42L)
    case f: java.lang.Float =>
      val fv = if (f.floatValue == 0.0f) 0.0f else f.floatValue
      XXH64.hashLong(java.lang.Float.floatToIntBits(fv).toLong, 42L)
    case dec: Decimal =>
      val bd = dec.toJavaBigDecimal
      val bytes = bd.unscaledValue.toByteArray
      XXH64.hashLong(bd.scale.toLong,
        XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L))
    case bytes: Array[Byte] =>
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    case other => XXH64.hashLong(other.hashCode.toLong, 42L)
  }

  /** Input gate shared by the sketch-building aggregates. */
  def checkAtomicInput(fn: String, dt: DataType): TypeCheckResult = dt match {
    case NullType | BooleanType | ByteType | ShortType | IntegerType |
        LongType | FloatType | DoubleType | StringType | BinaryType |
        DateType | TimestampType | TimestampNTZType =>
      TypeCheckResult.TypeCheckSuccess
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires an atomic input type (numeric, string, binary, " +
        s"datetime, decimal or boolean), got ${other.catalogString}")
  }

  def add(buf: Array[Byte], v: Any): Unit = if (v != null) {
    val h = hash(v)
    val idx = (h >>> (64 - p)).toInt
    val rank = math.min(64 - p + 1,
      java.lang.Long.numberOfLeadingZeros(h << p) + 1).toByte
    if (rank > buf(idx)) buf(idx) = rank
  }

  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def estimate(buf: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }
}

case class HllDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_distinct"
  override def checkInputDataTypes(): TypeCheckResult =
    Hll.checkAtomicInput(prettyName, child.dataType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    Hll.add(buf, child.eval(input)); buf
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Hll.mergeInto(a, b)
  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllDistinct =
    copy(child = newChildren.head)
}

/** Sketch-RETURNING variant: emits the raw register array (binary) so
  * sketches can be stored per fine-grained group (a day, a partition)
  * and later rolled up by [[HllMergeEstimate]] — the two-level
  * workflow that never re-reads raw data. Register bytes are a pure
  * function of the input set, so the emitted sketch is deterministic
  * and [[HllMergeEstimate]] over finer sketches is bit-identical to
  * direct estimation (spec-pinned).
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_sketch"
  override def checkInputDataTypes(): TypeCheckResult =
    Hll.checkAtomicInput(prettyName, child.dataType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.m)
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    Hll.add(buf, child.eval(input)); buf
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Hll.mergeInto(a, b)
  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

/** Merge pre-built [[HllSketch]] binaries and estimate — the rollup
  * side of the two-level workflow.
  */
case class HllMergeEstimate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_merge_estimate"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.m)
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    child.eval(input) match {
      case b: Array[Byte] =>
        require(b.length == Hll.m,
          s"graft_hll_merge_estimate: expected a ${Hll.m}-byte sketch, got ${b.length}")
        Hll.mergeInto(buf, b)
      case null => buf
      case other => throw new IllegalArgumentException(
        s"graft_hll_merge_estimate takes binary sketches, got $other")
    }
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Hll.mergeInto(a, b)
  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()
  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeEstimate =
    copy(child = newChildren.head)
}
