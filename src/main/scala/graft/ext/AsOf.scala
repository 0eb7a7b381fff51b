package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the LATEST right row
  * of the same key with `ts_right <= ts_left`. Spark has no native
  * as-of operator; the naive formulations are a range theta-join
  * (O(n·m) nested loop) or a per-left-row aggregation. This is the
  * scalable composition: UNION both sides tagged, ONE shuffle on the
  * key, and a running `last(right, ignoreNulls)` window over the
  * merged time order — O((n+m) log(n+m)) per key group, no
  * nested-loop, AQE-compatible.
  *
  * Right rows at exactly `ts_left` DO match (tag orders right before
  * left at equal timestamps) — the usual "known at time t" semantic.
  * Requires (key, ts) unique per side for full determinism (else the
  * merge order among equal timestamps is tag-then-arbitrary).
  */
object AsOf {

  /** @param left      probe side (each row gets its as-of match or nulls)
    * @param right     reference side
    * @param keys      equi-join key columns (same names both sides)
    * @param tsCol     ordering column name (same name both sides)
    * @param rightPrefix prefix for right-side payload columns in the output
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightPrefix: String = "asof_"): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq

    val rightStructType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(f => keys.contains(f.name)))

    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(left.schema).as("__l"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rightStructType).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          rightPayload.map(c => col(s"__match.$c").as(s"$rightPrefix$c")): _*)
  }

  /** [[asofJoin]] as a NATIVE operator: same contract, same output
    * schema, but planned through [[graft.plans.AsOfJoinPlan]] into the
    * custom sort-merge [[graft.plans.AsOfJoinExec]] (one streaming
    * merge pass per partition, one buffered row of state — no unioned
    * null-padded frame, no window buffers). The strategy registers
    * itself on the session idempotently, so this works on any session,
    * extensions-injected or not. Spec-pinned equal to [[asofJoin]].
    */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightPrefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    org.apache.spark.sql.graft.Bridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // self-join hygiene the analyzer does for built-in joins: when both
    // sides descend from the same scan they share exprIds, which breaks
    // attribute binding inside the custom node — re-alias the right side
    // with fresh ids
    val rp =
      if (rp0.outputSet.intersect(lp.outputSet).isEmpty) rp0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val lk = keys.map(attr(lp, _))
    val rk = keys.map(attr(rp, _))
    require(lk.map(_.dataType) == rk.map(_.dataType), "key types must match")
    val (lts, rts) = (attr(lp, tsCol), attr(rp, tsCol))
    require(lts.dataType == rts.dataType, "ts types must match")
    val payloadNames = right.columns.filterNot(keys.contains).toSeq
    val payload = payloadNames.map(attr(rp, _))
    val node = graft.plans.AsOfJoinPlan(lp, rp, lk, rk, lts, rts, payload)
    org.apache.spark.sql.graft.Bridge.ofRows(spark, node)
      .toDF(left.columns.toSeq ++ payloadNames.map(n => s"$rightPrefix$n"): _*)
  }

  /** Nearest-in-time variant: for each left row, the right row of the
    * same key minimizing |ts_right − ts_left|; exact ties (equal
    * distance both directions) resolve BACKWARD ("known at t" wins).
    * Same one-shuffle union frame as [[asofJoin]]; the backward and
    * forward candidates come from two window passes over the merged
    * order (one exchange, two sorts — still no theta join, no
    * nested-loop). Same determinism contract: (keys, ts) unique per
    * side.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightPrefix: String = "nearest_"): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq
    val rightStructType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(f => keys.contains(f.name)))

    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(left.schema).as("__l"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rightStructType).as("__r")): _*)

    // backward: right sorts BEFORE left at equal ts (side asc) so an
    // exactly-at-t right row is visible; forward mirrors it (side desc)
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val back = col("__back")
    val fwd = col("__fwd")
    val dBack = col("__ts") - col(s"__back.$tsCol")
    val dFwd = col(s"__fwd.$tsCol") - col("__ts")
    r.unionByName(l)
      .withColumn("__back", last(col("__r"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", first(col("__r"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
      .withColumn("__match",
        when(back.isNull, fwd)
          .when(fwd.isNull, back)
          .when(dFwd < dBack, fwd)
          .otherwise(back))
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          rightPayload.map(c => col(s"__match.$c").as(s"$rightPrefix$c")): _*)
  }
}

/** Interval-containment (range) join — for each point row, the interval
  * rows of the same key with `start <= point <= end`. Spark plans the
  * naive theta-join as a nested loop (O(n·m) per key group); the scale
  * formulation BINS the domain: points hash to their bin, intervals
  * explode to every bin they overlap, and the join becomes an EQUI-join
  * on (keys, bin) + an exact containment filter. Shuffle volume is
  * points + intervals×(avg bins per interval); bin width trades
  * interval fan-out against bucket selectivity — pick it near the
  * median interval length.
  */
object RangeJoin {

  /** @param points    each row has `pointCol` (long, non-negative)
    * @param intervals each row has `startCol`/`endCol` (long, inclusive)
    * @param keys      equi-key columns present on both sides
    * @param binWidth  bin size in the point column's units
    */
  def binnedIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"$pointCol div ${binWidth}L"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div ${binWidth}L"), expr(s"$endCol div ${binWidth}L"))))
    // a point lives in exactly ONE bin, so containment matches are
    // already unique — no post-join distinct needed
    p.join(iv, keys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
