package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator as-of join, the (c) tier of the extension ladder:
  * a custom logical node, planned by [[AsOfJoinStrategy]] into
  * [[AsOfJoinExec]] — a sort-merge physical operator that matches each
  * left row with the LATEST right row of the same key at or before its
  * timestamp in ONE streaming pass per partition.
  *
  * Same semantics as the [[graft.ext.AsOf.asofJoin]] composition
  * (union + running `last(ignoreNulls)` window, spec-pinned equal),
  * but physically leaner: the composition materializes a unioned frame
  * with null-padded struct columns and runs window state over it; the
  * native operator sorts each side once (the same exchanges the window
  * needs anyway) and merges with O(1) state — no union blow-up, no
  * window buffers.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[AsOfJoinPlan]]; registered per-session via
  * `experimental.extraStrategies` (see [[graft.ext.AsOf.asofJoinNative]])
  * or globally by [[graft.GraftSparkExtensions]].
  */
object AsOfJoinStrategy extends org.apache.spark.sql.classic.Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, payload) =>
      AsOfJoinExec(lk, rk, lts, rts, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on the keys and
  * sorted by (keys, ts) — the SAME exchange+sort a window formulation
  * needs — then each co-partition pair merges in one pass: the right
  * cursor trails the left row, remembering only the last right row at
  * or before it (rows at exactly ts DO match — "known at t"). State per
  * partition is one buffered row, however large the key groups are.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  /** Exact clustering on the FULL key set, both sides. Plain
    * `ClusteredDistribution(keys)` can be satisfied by a child already
    * hash-partitioned on a strict subset of the keys; if the two sides
    * then settle on different partitionings, `zipPartitions` would pair
    * rows of the same key from DIFFERENT partition indexes and silently
    * mis-join. `requireAllClusterKeys = true` makes EnsureRequirements
    * accept only a partitioning over exactly these keys (same set, same
    * order), inserting an exchange otherwise — co-partitioning holds by
    * construction, independent of what the children arrive with.
    */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true),
    ClusteredDistribution(rightKeys, requireAllClusterKeys = true))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lFullExprs = leftKeys :+ leftTs
    val rFullExprs = rightKeys :+ rightTs
    val payloadExprs = rightPayload
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lFullProj = UnsafeProjection.create(lFullExprs, lOut)
      val rFullProj = UnsafeProjection.create(rFullExprs, rOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val resultProj = UnsafeProjection.create(
        outAttrs, lOut ++ payloadExprs.map(_.withNullability(true)))
      val fullOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes :+ tsType)
      val nullPayload = new GenericInternalRow(payloadExprs.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // one-row trailing state: the latest right row consumed so far
      // (its payload and key, copied — sort iterators reuse row objects)
      var matchPayload: InternalRow = null
      var matchKey: UnsafeRow = null

      lIter.map { l =>
        val lFull = lFullProj(l)
        while (rBuf.hasNext && fullOrd.compare(rFullProj(rBuf.head), lFull) <= 0) {
          val r = rBuf.next()
          matchPayload = payloadProj(r).copy()
          matchKey = rKeyProj(r).copy()
        }
        val payload =
          if (matchKey != null && matchKey == lKeyProj(l)) matchPayload
          else nullPayload
        resultProj(joined(l, payload))
      }
    }
  }
}
