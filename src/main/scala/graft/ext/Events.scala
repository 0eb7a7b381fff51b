package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch; the
  * Structured Streaming twin lives in [[graft.streaming.Sessionize]]).
  *
  * Timestamps: events.parquet carries TIMESTAMP(NANOS), which the
  * engine reads as nanos-since-epoch longs (see
  * [[graft.sources.Tables]]). All time math here uses integer
  * microseconds via `div` — long nanos MUST NOT round-trip through
  * double (`col/1000` promotes to double and loses precision above
  * 2^53 ns ≈ 104 days).
  *
  * Scale: sessionization is one shuffle on user_id (the window
  * partition key) followed by one aggregation on (user_id, session_id) —
  * partial-aggregated map-side. Value sums use exact integer cents.
  */
object Events {

  private def tsUs = expr("ts div 1000")

  /** Gap-based sessionization: a session breaks after `gapMinutes` of
    * user inactivity. Classic lag + cumulative-sum-of-breaks; the
    * in-partition order (ts, event_id) is total, so session ids are
    * deterministic.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .withColumn("is_new_session",
        when(col("ts_us") - lag("ts_us", 1).over(byUser) > gapUs, 1)
          .when(lag("ts_us", 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum("is_new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"),
        sum("value_cents").as("value_cents"))
  }

  /** Ordered funnel: per user, the earliest time of each step that
    * happens strictly AFTER the previous step's time (first view, then
    * first click after that view, then first purchase after that
    * click). One min-aggregate + one broadcast-size join per step —
    * never a per-user sort of the whole event log; at 100 TB each step
    * is a shuffle keyed by user_id and the per-user state is one long.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val e = events.select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
    var acc = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts_us").as(s"t_${steps.head}"))
    steps.sliding(2).foreach {
      case Seq(prev, st) =>
        val next = e.filter(col("event_type") === st)
          .join(acc.select(col("user_id"), col(s"t_$prev")), Seq("user_id"))
          .where(col("ts_us") > col(s"t_$prev"))
          .groupBy("user_id").agg(min("ts_us").as(s"t_$st"))
        acc = acc.join(next, Seq("user_id"), "left")
      case _ => // single step: nothing to chain
    }
    acc
  }

  /** [[funnel]] with a CONVERSION WINDOW: step k counts only if it
    * happens within `maxGapUs` of step k-1 — "purchased within an hour
    * of clicking", the form production funnels actually use (an
    * unbounded funnel credits conversions days later). Same
    * greedy-earliest semantics per step, same one-join-per-step shape;
    * each join is still an equi-join on user_id with the gap bound as
    * the residual filter.
    */
  def funnelWindowed(events: DataFrame, steps: Seq[String], maxGapUs: Long): DataFrame = {
    require(steps.nonEmpty && maxGapUs > 0)
    val e = events.select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
    var acc = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts_us").as(s"t_${steps.head}"))
    steps.sliding(2).foreach {
      case Seq(prev, st) =>
        val next = e.filter(col("event_type") === st)
          .join(acc.select(col("user_id"), col(s"t_$prev")), Seq("user_id"))
          .where(col("ts_us") > col(s"t_$prev") &&
            col("ts_us") <= col(s"t_$prev") + maxGapUs)
          .groupBy("user_id").agg(min("ts_us").as(s"t_$st"))
        acc = acc.join(next, Seq("user_id"), "left")
      case _ => ()
    }
    acc
  }

  /** Top user journeys: each user's first `maxSteps` events (by time,
    * event_id tie-break) joined into a `a>b>c` path string, then the
    * `k` most common paths. One window pass (shuffle on user_id), one
    * aggregate per user, one aggregate keyed by path — the path-count
    * shuffle carries one short string per user, and top-k is
    * TakeOrderedAndProject. Ordered collect is
    * `sort_array(collect_list(struct(rn, ...)))` — never input order.
    */
  def topPaths(events: DataFrame, maxSteps: Int = 5, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val paths = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxSteps)
      .groupBy("user_id")
      .agg(concat_ws(">",
        transform(sort_array(collect_list(struct(col("rn"), col("event_type")))),
          x => x("event_type"))).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** Cohort retention: users grouped by first-seen day; for each
    * (cohort, day-offset) the distinct users active that day. Two
    * shuffles total (first-seen aggregate, retention aggregate).
    */
  def retention(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"),
      to_date(timestamp_micros(tsUs)).as("day"))
    val cohorts = e.groupBy("user_id").agg(min("day").as("cohort"))
    e.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_n"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Tumbling-window aggregation: fixed windows of `windowMinutes` by
    * event type. Integer bucket arithmetic (`div`) so any engine agrees
    * on window assignment exactly.
    */
  def windowAgg(events: DataFrame, windowMinutes: Int = 5): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    events
      .select(col("event_type"), tsUs.as("ts_us"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .withColumn("window_start_us", (col("ts_us") - (col("ts_us") % winUs)))
      .groupBy("window_start_us", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("value_cents").as("value_cents"))
  }

  /** Live hours vs the seasonal baseline: each calendar (type, day,
    * hour) cell compared against its type's hour-of-day mean volume,
    * deviation flagged when the cell exceeds `thresholdPct`% of the
    * baseline — the alerting join [[hourlyBaseline]] feeds. All
    * arithmetic cross-multiplied integers: cell_n · n_days · 100 is
    * compared against threshold · baseline_total, so no division at
    * all on the flag path and the deviation ratio ships in exact ppm.
    *
    * Scale: one (type, day, hour) aggregate over the stream, one
    * (type, hod) baseline aggregate (24·|types| rows, broadcast), one
    * broadcast join. n_days is per (type, hod) — days where that hour
    * had any traffic — so the mean is over OBSERVED cells, robust to
    * partial first/last days.
    */
  def hourlyAnomalies(events: DataFrame, thresholdPct: Int = 150): DataFrame = {
    val cells = events
      .select(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"),
        pmod(expr("(ts div 1000) div 3600000000"), lit(24L)).as("hod"))
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(count(lit(1)).as("n"))
    val baseline = cells.groupBy(col("event_type"), col("hod"))
      .agg(sum(col("n")).as("base_total"), count(lit(1)).as("n_days"))
    cells.join(broadcast(baseline), Seq("event_type", "hod"))
      .select(col("event_type"), col("day"), col("hod"), col("n"),
        expr("base_total div n_days").as("baseline_n"),
        expr("n * n_days * 1000000 div base_total").as("ratio_ppm"),
        expr(s"n * n_days * 100 > $thresholdPct * base_total").as("is_anomaly"))
  }

  /** Seasonal hour-of-day baseline per event type: volume, exact cent
    * sums, the integer-DIV mean, and each hour's share of its type's
    * traffic in ppm — the reference table an alerting pipeline compares
    * live hours against. Hour-of-day from integer microseconds
    * (timezone-free, no timestamp rounding); one partial-aggregated
    * shuffle on (type, hod) + a 24-row-per-type window.
    */
  def hourlyBaseline(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        pmod(expr("(ts div 1000) div 3600000000"), lit(24L)).as("hod"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .withColumn("avg_cents", expr("sum_cents div n_events"))
      .withColumn("share_ppm", expr(
        "n_events * 1000000 div (sum(n_events) over (partition by event_type))"))

  /** Daily active users split into NEW (first-ever-seen that day) vs
    * RETURNING — the growth-accounting view every engagement dashboard
    * leads with. Two partial-aggregated shuffles: per-user first-seen
    * day, then per-(day) counts via one distinct-user frame joined to
    * the broadcast-sized first-seen table. Exact integers.
    */
  def newVsReturning(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val du = events
      .select(col("user_id"), expr(s"(ts div 1000) div $dayUs").as("day"))
      .distinct()
    val firstSeen = du.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    du.join(firstSeen, Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"))
      .withColumn("returning_users", col("dau") - col("new_users"))
      .withColumn("new_ppm", expr("new_users * 1000000 div dau"))
  }

  /** Experiment readout — the A/B metrics table: bucket every event by
    * its variant (here derived from the props payload: k mod 2 — in
    * production the assignment column), then per event type emit both
    * arms' volumes, user counts, exact cent sums, integer-DIV means,
    * and the mean difference in exact cents. Everything integer: the
    * readout is engine-reproducible, and ratio metrics (lift %) are
    * left to the consumer because a negative numerator under integer
    * division is the one place engines disagree.
    *
    * Scale shape: one partial-aggregated shuffle keyed (type, variant),
    * conditional-summed to one row per type — no self-join for the
    * A-vs-B comparison.
    */
  def experimentReadout(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), col("user_id"),
        pmod(get_json_object(col("props"), "$.k").cast("long"), lit(2L)).as("variant"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n_b"),
        count_distinct(when(col("variant") === 0L, col("user_id"))).as("users_a"),
        count_distinct(when(col("variant") === 1L, col("user_id"))).as("users_b"),
        sum(when(col("variant") === 0L, col("cents")).otherwise(0L)).as("cents_a"),
        sum(when(col("variant") === 1L, col("cents")).otherwise(0L)).as("cents_b"))
      .withColumn("mean_cents_a", expr("cents_a div n_a"))
      .withColumn("mean_cents_b", expr("cents_b div n_b"))
      .withColumn("mean_diff_cents", col("mean_cents_b") - col("mean_cents_a"))

  /** Rule-based bot scoring from inter-arrival times — the traffic-
    * hygiene filter an events pipeline runs before any engagement
    * metric: per user, the fraction of consecutive gaps under
    * `fastGapMs` (machine-speed actions) in exact ppm, flagged when
    * fast-heavy AND high-volume. Deterministic integers only.
    *
    * Scale shape: one per-user window (ordered by the total (ts,
    * event_id) key) + one aggregate — the sessionize shape; a hot user
    * bounds the window partition exactly like a hot session key, same
    * mitigation (AQE/salting) applies.
    */
  def botScore(
      events: DataFrame,
      fastGapMs: Long = 1000,
      minEvents: Long = 10,
      flagPpm: Long = 500000): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(byUser))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("gap_us") < fastGapMs * 1000L, 1L).otherwise(0L)).as("n_fast"),
        sum(when(col("gap_us").isNotNull, 1L).otherwise(0L)).as("n_gaps"))
      .withColumn("fast_ppm",
        when(col("n_gaps") === 0L, 0L)
          .otherwise(expr("n_fast * 1000000 div n_gaps")))
      .withColumn("is_bot",
        col("n_events") >= minEvents && col("fast_ppm") >= flagPpm)
  }

  /** Per-user feature assembly — the feature-store join shape: the
    * flat per-user aggregate (volume, exact spend, activity span)
    * LEFT-joined with the session-grain rollup from [[sessionize]]
    * (session count, total session time). Every feature exact
    * integers; users with one event still appear (left join, zero-
    * duration sessions). Two shuffles keyed by user_id — the point is
    * that downstream training reads ONE wide frame.
    */
  def userFeatures(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val base = events
      .select(col("user_id"), tsUs.as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("total_cents"),
        expr(s"min(ts_us) div $dayUs").as("first_day"),
        expr(s"max(ts_us) div $dayUs").as("last_day"),
        countDistinct(expr(s"ts_us div $dayUs")).as("n_active_days"))
    val sessions = sessionize(events)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("duration_us")).as("session_time_us"))
    base.join(sessions, Seq("user_id"), "left")
      .withColumn("events_per_session_ppm",
        expr("n_events * 1000000 div greatest(n_sessions, 1L)"))
  }

  /** Sequence-conformance QC — the DATA-quality sibling of
    * [[graft.ext.Profile.expectations]] for event ORDER: per rule, how
    * many users violate the expected lifecycle ("purchased without
    * ever viewing", "clicked before the first view", "signup seen
    * after other activity"). Emits one exact count row per rule; a
    * conformant pipeline reads all zeros.
    *
    * Shape: one per-(user, type) min/max aggregate (a single shuffle
    * keyed by user), then per-rule conditional counts over that
    * |users|-row frame.
    */
  def sequenceConformance(events: DataFrame): DataFrame = {
    val times = events
      .select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("first_view"),
        min(when(col("event_type") === "click", col("ts_us"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("first_purchase"),
        min(when(col("event_type") === "signup", col("ts_us"))).as("first_signup"),
        min(col("ts_us")).as("first_any"))
    def rule(name: String, cond: org.apache.spark.sql.Column) =
      times.agg(sum(when(cond, 1L).otherwise(0L)).as("n_violations"),
          count(lit(1)).as("n_users"))
        .select(lit(name).as("rule"), col("n_violations"), col("n_users"),
          expr("n_violations * 1000000 div n_users").as("violation_ppm"))
    rule("purchase_without_view",
        col("first_purchase").isNotNull && col("first_view").isNull)
      .unionByName(rule("click_before_first_view",
        col("first_click").isNotNull && col("first_view").isNotNull &&
          col("first_click") < col("first_view")))
      .unionByName(rule("signup_not_first_event",
        col("first_signup").isNotNull && col("first_signup") > col("first_any")))
  }

  /** Benford leading-digit profile of the value column — the classic
    * fabricated-numbers screen: organic transaction amounts follow
    * log-uniform leading digits (30.1% ones …), synthetic or capped
    * data doesn't. Emits per digit the count, observed share in exact
    * ppm, the Benford expectation (log10(1+1/d) pre-computed as ppm
    * literals — no float math in the plan), and the signed deviation.
    * One projection + one 9-row aggregate over the scan.
    */
  def benfordDigits(events: DataFrame): DataFrame = {
    // floor(log10(1+1/d) * 1e6) for d = 1..9
    val benford = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L, 45757L)
    val expect = benford.zipWithIndex
      .map { case (ppm, i) => s"WHEN ${i + 1} THEN ${ppm}L" }
      .mkString("CASE digit ", " ", " END")
    events
      .select(round(col("value") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("digit", expr("cast(substring(cast(cents as string), 1, 1) as int)"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("observed_ppm", expr("n * 1000000 div (sum(n) over ())"))
      .withColumn("benford_ppm", expr(expect))
      .withColumn("delta_ppm", col("observed_ppm") - col("benford_ppm"))
  }

  /** Debounced alerting over [[hourlyAnomalies]]: a cell pages only
    * when it AND the immediately preceding hour are both anomalous —
    * the standard "two consecutive breaches" rule that keeps one-hour
    * blips out of the pager. One lag window over the (type, hour)
    * cell frame (already aggregate-sized); gaps in the hour sequence
    * break runs by construction (the previous ROW must be the
    * previous HOUR).
    */
  def anomalyDebounce(events: DataFrame, thresholdPct: Int = 150): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("abs_hour")
    hourlyAnomalies(events, thresholdPct)
      .withColumn("abs_hour", expr("day * 24 + hod"))
      .withColumn("prev_anom", lag(col("is_anomaly"), 1).over(w))
      .withColumn("prev_hour", lag(col("abs_hour"), 1).over(w))
      .withColumn("is_alert",
        col("is_anomaly") &&
          coalesce(col("prev_anom") && col("prev_hour") === col("abs_hour") - 1, lit(false)))
      .drop("abs_hour", "prev_anom", "prev_hour")
  }

  /** Cohort lifetime-value curve: users grouped by first-seen day
    * (the acquisition cohort); for each (cohort, age-in-days) cell the
    * active users, that day's exact revenue cents, the RUNNING
    * cumulative revenue, and cumulative LTV per acquired user
    * (integer-DIV cents) — the curve a growth team reads "day-30 LTV"
    * off. Extends [[retention]] (user counts only) with the revenue
    * dimension.
    *
    * Scale shape: one per-user first-seen aggregate, one
    * (cohort, age) aggregate, then a window over the per-cohort daily
    * cells — the windowed frame is cohorts × horizon days, orders of
    * magnitude smaller than the event log; cohort sizes broadcast.
    */
  def cohortLtv(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val e = events.select(col("user_id"),
      expr(s"(ts div 1000) div $dayUs").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val first = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_users"))
    val cells = e.join(first, Seq("user_id"))
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
      .agg(countDistinct(col("user_id")).as("n_active"), sum(col("cents")).as("day_cents"))
    val w = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum(col("day_cents")).over(w))
      .join(broadcast(sizes), Seq("cohort"))
      .withColumn("ltv_cents_per_user", expr("cum_cents div cohort_users"))
  }

  /** Funnel READOUT: collapse [[funnel]]'s per-user step times into the
    * table a dashboard shows — per step, how many users reached it,
    * step-over-step conversion, and conversion from the top, exact ppm.
    * One aggregate over the funnel frame (single row), exploded to one
    * row per step on the driver-free plan side.
    */
  def funnelRates(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val f = funnel(events, steps)
    val counts = f.agg(
      sum(when(col(s"t_${steps.head}").isNotNull, 1L).otherwise(0L)).as(s"n_${steps.head}"),
      steps.tail.map(st =>
        sum(when(col(s"t_$st").isNotNull, 1L).otherwise(0L)).as(s"n_$st")): _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val prev = if (i == 0) st else steps(i - 1)
      counts.select(
        lit(i + 1).as("step_index"), lit(st).as("step"),
        col(s"n_$st").as("n_users"),
        expr(s"n_$st * 1000000 div greatest(n_$prev, 1L)").as("conv_from_prev_ppm"),
        expr(s"n_$st * 1000000 div greatest(n_${steps.head}, 1L)").as("conv_from_first_ppm"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Simple exponential smoothing (α = 1/2) over the daily revenue
    * series, in EXACT integers: level_t = (y_t + level_{t−1}) div 2
    * (all operands non-negative, so floor division is engine-portable),
    * one-step-ahead forecast_t = level_{t−1}, residual = y − forecast.
    * The anomaly-baseline / capacity-forecast primitive with a
    * reproducible answer — float EWMA would drift across engines.
    *
    * Scale shape: the event log collapses to one row per day (partial-
    * aggregated shuffle); the sequential fold runs as an `aggregate`
    * HOF over the sorted day array INSIDE the plan — a single row
    * carrying ~thousands of days, the same tiny-series discipline as
    * [[graft.ext.Assoc.seasonalityDecompose]]. No driver loop.
    */
  def sesForecast(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val daily = events
      .select(expr(s"(ts div 1000) div $dayUs").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
    daily
      .agg(sort_array(collect_list(struct(col("day"), col("cents")))).as("s"))
      .select(expr(
        """aggregate(s,
             named_struct('init', false, 'lvl', cast(0 as bigint),
                          'out', cast(array() as array<struct<day:bigint,cents:bigint,level:bigint,forecast:bigint>>)),
             (acc, x) -> named_struct(
               'init', true,
               'lvl', case when not acc.init then x.cents else (x.cents + acc.lvl) div 2 end,
               'out', concat(acc.out, array(named_struct(
                 'day', x.day, 'cents', x.cents,
                 'level', case when not acc.init then x.cents else (x.cents + acc.lvl) div 2 end,
                 'forecast', case when not acc.init then x.cents else acc.lvl end)))),
             acc -> acc.out)""").as("out"))
      .select(explode(col("out")).as("r"))
      .select(col("r.day").as("day"), col("r.cents").as("cents"),
        col("r.level").as("level"), col("r.forecast").as("forecast"),
        (col("r.cents") - col("r.forecast")).as("residual_cents"))
  }

  /** Exponentially-decayed engagement score per user: each event
    * contributes `value_cents / 2^age_days` (half-life = one day,
    * measured back from the corpus's latest event), summed per user.
    * The per-event decay is an integer FLOOR division by a power of
    * two, so the score is exact and engine-reproducible — no float
    * powers, no log/exp — while keeping the semantics recency models
    * want (yesterday counts half, a month ago counts nothing).
    *
    * Scale shape: one broadcast scalar (max ts), one per-row decay
    * projection, one partial-aggregated shuffle on user_id. The decayed
    * contribution saturates to 0 past 62 days, which also bounds the
    * shift for int64.
    */
  def decayedEngagement(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val maxUs = events.select(max(tsUs).as("m"))
    events
      .select(col("user_id"), tsUs.as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .crossJoin(broadcast(maxUs))
      .withColumn("age_days", expr(s"least((m - ts_us) div $dayUs, 62L)"))
      .withColumn("decayed", expr("cents div cast(pow(2, age_days) as bigint)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("decayed")).as("decayed_cents"),
        max(expr("-age_days")).as("_neg"))
      .withColumn("latest_age_days", -col("_neg"))
      .drop("_neg")
  }
}
