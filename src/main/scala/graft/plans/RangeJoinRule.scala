package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a point-in-interval theta join into a binned
  * equi-join.
  *
  * A join whose only usable predicate is `p BETWEEN s AND e` has no
  * equi keys, so Spark plans a BroadcastNestedLoopJoin (or a cartesian
  * product) — O(n·m) comparisons, the classic interval-join scale
  * cliff. The standard fix (implemented manually by
  * [[graft.ext.RangeJoin.binnedIntervalJoin]], here applied
  * automatically) overlays a grid of width `w`: the point side gets ONE
  * bin `p div w`, the interval side explodes into its covered bins
  * `[s div w .. e div w]`, the join becomes a hash join on the bin
  * (plus any pre-existing equi keys), and the original range predicate
  * remains as the residual filter. Each qualifying pair meets in
  * exactly one bin — the point's — so no dedup is needed, and truncating
  * division is monotone so the bin range always covers the point's bin
  * (negative values included).
  *
  * Opt-in: set `spark.graft.rangeJoin.binWidth` (a positive long in the
  * unit of the range columns) on the session; unset/0 disables the
  * rewrite. Width tuning is the usual selectivity tradeoff: too small
  * explodes many bins per interval, too large puts many candidates in a
  * bin. Fires on INNER joins and on LEFT/RIGHT OUTER joins whose
  * preserved side is the point side (the interval side explodes into
  * bins, so an unmatched preserved interval row would be duplicated
  * once per bin — those shapes are left alone). Point/bound expressions
  * may be any integral, date or timestamp type: each is mapped through
  * a monotone to-long conversion (int/short/byte widen; date → epoch
  * days, so `binWidth` is in DAYS; timestamp/ntz → epoch micros, so
  * `binWidth` is in MICROSECONDS) and the original predicate stays as
  * the exact residual filter. Requires deterministic, single-side
  * expressions; idempotent via the `graft_bin` marker attributes it
  * introduces.
  */
case class RangeJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def binWidth: Long = {
    val raw = session.conf.get("spark.graft.rangeJoin.binWidth", "0")
    try raw.toLong
    catch {
      case _: NumberFormatException =>
        // The user explicitly opted in with a value we can't parse —
        // silently running the O(n·m) nested loop instead would be the
        // worst failure mode, so say so loudly.
        logWarning(s"spark.graft.rangeJoin.binWidth='$raw' is not a " +
          "long; range-join bin rewrite DISABLED — interval joins fall " +
          "back to the nested-loop plan")
        0L
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner | LeftOuter | RightOuter, Some(cond), hint)
          if !cond.references.exists(_.name.startsWith("graft_bin")) =>
        rewrite(j, left, right, cond, hint, w).getOrElse(j)
    }
  }

  /** Normalized range conjunct: `point >= bound` (lower) or
    * `point <= bound` (upper); strictness is irrelevant for coverage.
    */
  private case class RangeConj(point: Expression, bound: Expression, lower: Boolean)

  /** Monotone (non-decreasing) conversion to Long, or None for an
    * unsupported type. Monotonicity is all bin coverage needs:
    * s ≤ p ≤ e under the column type implies
    * toLong(s) ≤ toLong(p) ≤ toLong(e), so the point's bin always falls
    * inside the interval's bin range; exactness is restored by the
    * residual filter on the ORIGINAL typed predicate.
    */
  private def toLong(e: Expression): Option[Expression] = e.dataType match {
    case LongType => Some(e)
    case IntegerType | ShortType | ByteType => Some(Cast(e, LongType))
    case DateType => Some(Cast(UnixDate(e), LongType))
    case TimestampType => Some(UnixMicros(e))
    case TimestampNTZType =>
      // NTZ micros relative to the session zone; the same zone is applied
      // to both sides of every conjunct, preserving monotonicity.
      Some(UnixMicros(Cast(e, TimestampType,
        Some(session.sessionState.conf.sessionLocalTimeZone))))
    case _ => None
  }

  private def rewrite(
      j: Join,
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      hint: JoinHint,
      w: Long): Option[LogicalPlan] = {

    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    def usable(e: Expression) = e.deterministic && toLong(e).isDefined

    // orient every comparison conjunct as (point, bound, isLower) where
    // point and bound sit on opposite sides of the join
    def orient(a: Expression, b: Expression, aGeB: Boolean): Seq[RangeConj] =
      if (usable(a) && usable(b) &&
        ((fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))))
        Seq(RangeConj(a, b, lower = aGeB), RangeConj(b, a, lower = !aGeB))
      else Nil

    def splitConjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
      case other     => Seq(other)
    }
    val conjuncts = splitConjuncts(cond)
    val oriented = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => orient(a, b, aGeB = true)
      case GreaterThan(a, b)        => orient(a, b, aGeB = true)
      case LessThanOrEqual(a, b)    => orient(a, b, aGeB = false)
      case LessThan(a, b)           => orient(a, b, aGeB = false)
      case _                        => Nil
    }

    // find one point expression with BOTH a lower and an upper bound on
    // the opposite side
    val candidates = oriented.filter(_.lower).flatMap { lo =>
      oriented.find(up => !up.lower && up.point.semanticEquals(lo.point) &&
        // both bounds must come from the same (opposite) side
        (fromLeft(lo.bound) == fromLeft(up.bound)))
        .map(up => (lo.point, lo.bound, up.bound))
    }
    // outer joins: only the point side may be the preserved side — the
    // interval side explodes into bins, so a preserved-but-unmatched
    // interval row would be emitted once per bin
    val candidate = candidates.find { case (p, _, _) =>
      j.joinType match {
        case Inner      => true
        case LeftOuter  => fromLeft(p)
        case RightOuter => fromRight(p)
        case _          => false
      }
    }

    candidate.map { case (p, s, e) =>
      val pointOnLeft = fromLeft(p)
      def div(x: Expression) = new IntegralDivide(toLong(x).get, Literal(w))

      val binP = Alias(div(p), "graft_bin_p")()
      val binRange = AttributeReference("graft_bin_r", LongType)()
      val sDiv = div(s)
      val eDiv = div(e)
      // empty intervals (s > e) yield no bins rather than tripping
      // Sequence's direction check; the inner join drops them anyway.
      // Sequence is TimeZoneAware — without an explicit zone it stays
      // unresolved and fails the optimizer's plan validation.
      val seq = new Sequence(sDiv, eDiv, Some(Literal(1L)))
        .withTimeZone(session.sessionState.conf.sessionLocalTimeZone)
      val bins = If(LessThanOrEqual(sDiv, eDiv), seq,
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))

      val (pointPlan, rangePlan) =
        if (pointOnLeft) (left, right) else (right, left)
      val newPoint = Project(pointPlan.output :+ binP, pointPlan)
      val newRange = Generate(Explode(bins), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(binRange),
        child = rangePlan)

      val binEq = EqualTo(binP.toAttribute, binRange)
      val (newLeft, newRight) =
        if (pointOnLeft) (newPoint, newRange) else (newRange, newPoint)
      // keep every original conjunct: the range predicate is the
      // residual filter, pre-existing equi keys stay equi keys
      val newJoin = Join(newLeft, newRight, j.joinType, Some(And(cond, binEq)), hint)
      Project(j.output, newJoin)
    }
  }
}
