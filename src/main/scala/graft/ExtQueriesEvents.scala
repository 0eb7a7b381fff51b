package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOf, CorpusClean, DataDiff, Dedup, Events, GraphOps, Multimodal, RangeJoin, Similarity, TextAnalysis, TrainPrep}


/** Event-analytics tier: sessionization, funnels, retention, anomaly baselines, graph metrics and interval/as-of join keys (split from ExtQueries, round 7 — no behavior change).
  * Shared corpus/SQL helpers live in [[ExtHelpers]]; every key keeps its
  * DuckDB oracle twin next to it in this file's `oracles` map.
  */
object ExtQueriesEvents extends ExtHelpers {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(


    // recency-decayed engagement: exact integer half-life-per-day decay
    "events_decayed_engagement" -> ((s, dir) =>
      Events.decayedEngagement(t(s, dir, "events")).orderBy("user_id")),


    // A/B experiment readout: both arms' exact integer metrics per
    // event type, one conditional-sum aggregate (no self-join)
    "events_experiment_readout" -> ((s, dir) =>
      Events.experimentReadout(t(s, dir, "events")).orderBy("event_type")),


    // growth accounting: daily actives split new vs returning
    "events_new_vs_returning" -> ((s, dir) =>
      Events.newVsReturning(t(s, dir, "events")).orderBy("day")),


    // traffic hygiene: burst inter-arrival fraction per user. The
    // thresholds are config — here tuned to this corpus's hour-scale
    // cadence (gap < 1 h = burst, flag at 12%) so BOTH flag branches
    // carry rows; a real deployment sets sub-second gaps for bots
    "events_bot_score" -> ((s, dir) =>
      Events.botScore(t(s, dir, "events"),
          fastGapMs = 3600000L, flagPpm = 120000L)
        .orderBy("user_id")),


    "events_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events")).orderBy("user_id", "session_id")),


    "events_window_agg" -> ((s, dir) =>
      Events.windowAgg(t(s, dir, "events")).orderBy("window_start_us", "event_type")),


    "events_hourly_baseline" -> ((s, dir) =>
      Events.hourlyBaseline(t(s, dir, "events")).orderBy("event_type", "hod")),


    "events_hourly_anomalies" -> ((s, dir) =>
      Events.hourlyAnomalies(t(s, dir, "events"))
        .orderBy("event_type", "day", "hod")),


    // per-user load Gini per event type, in EXACT rational arithmetic
    // (numerator/denominator longs + a ppm quotient) — the partition-
    // balance metric that decides whether a key needs salting. The
    // classic rank-weighted formula runs over the VALUE HISTOGRAM
    // (distinct count -> frequency), not the raw per-user rows: a run
    // of f tied users at count c occupying ranks [start..end]
    // contributes c*((start+end)-(n+1))*f with start+end = 2*cum-f+1,
    // so the rank window scans |distinct counts| rows, never |users| —
    // the same histogram trick as robust_mad_outliers. At 100 TB the
    // only full-data shuffle is the (event_type, user_id) count.
    "events_user_gini" -> ((s, dir) => {
      val cnt = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      val hist = cnt.groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("f"))
      val byC = Window.partitionBy(col("event_type")).orderBy(col("c"))
      val all = Window.partitionBy(col("event_type"))
      hist
        .withColumn("cum", sum(col("f")).over(byC))
        .withColumn("n", sum(col("f")).over(all))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_users"),
          sum(col("c") * col("f")).as("total_events"),
          sum(col("c") * col("f") * (col("cum") * 2 - col("f") - col("n")))
            .as("gini_num"))
        .withColumn("gini_den", expr("n_users * total_events"))
        .withColumn("gini_ppm", expr("gini_num * 1000000 div gini_den"))
        .orderBy("event_type")
    }),


    // first-touch attribution THROUGH the native as-of operator: each
    // purchase takes the latest preceding click of the same user
    // (AsOfJoinExec — one merge pass), then a 1 h attribution window
    // decides attributed vs organic; exact revenue split and gap mass.
    // The second production consumer of the custom operator.
    "events_attribution_native" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
      AsOf.asofJoinNative(purchases, clicks, Seq("user_id"), "ts_us")
        .withColumn("attributed",
          col("asof_click_id").isNotNull &&
            col("ts_us") - col("asof_ts_us") <= 3600000000L)
        .groupBy(col("attributed"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"),
          sum(when(col("attributed"),
            col("ts_us") - col("asof_ts_us")).otherwise(0L)).as("gap_us_sum"))
        .orderBy("attributed")
    }),


    // weekly event-type mix vs the overall mix, exact ppm, with a
    // >25%-relative-shift flag — the composition-drift monitor that
    // catches a logging change or a traffic-mix break. Two tiny
    // aggregates; the overall mix broadcasts.
    "events_type_mix_drift" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        expr("(ts div 1000) div 604800000000").as("week"))
      val cell = e.groupBy(col("week"), col("event_type")).agg(count(lit(1)).as("n"))
      val byWeek = cell.groupBy(col("week")).agg(sum(col("n")).as("n_week"))
      val overall = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_type"))
        .crossJoin(broadcast(e.agg(count(lit(1)).as("n_total"))))
      cell
        .join(broadcast(byWeek), Seq("week"))
        .join(broadcast(overall), Seq("event_type"))
        .select(col("week"), col("event_type"), col("n"),
          expr("n * 1000000 div n_week").as("week_share_ppm"),
          expr("n_type * 1000000 div n_total").as("overall_share_ppm"))
        .withColumn("is_shifted",
          expr("abs(week_share_ppm - overall_share_ppm) * 100 > overall_share_ppm * 25"))
        .orderBy("week", "event_type")
    }),


    // DAU/WAU: daily active customers plus the 7-day rolling distinct,
    // computed TWO ways — exactly (each active day covers the next 7
    // window days via a sequence explode: linear, no theta join) and
    // by merging the per-day HLL sketches in a RANGE window frame
    // (graft_hll_merge_estimate OVER (ORDER BY day RANGE 6 PRECEDING)
    // — a rolling distinct whose window state is one 4 KB sketch).
    // The oracle pins the exact counts and the envelope boolean.
    // The day-ordered window runs over the DAILY aggregate (bounded by
    // calendar days), same rationale as revenue_concentration_topk.
    "events_dau_wau_sketch" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val epoch = lit("1992-01-01").cast("date")
      val du = t(s, dir, "orders")
        .select(datediff(to_date(col("o_orderdate")), epoch).cast("long").as("day"),
          col("o_custkey"))
        .distinct()
      val daily = du.groupBy(col("day"))
        .agg(count(lit(1)).as("dau"),
          call_function("graft_hll_sketch", col("o_custkey")).as("sk"))
      val wauExact = du
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("o_custkey"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau_exact"))
      val wFrame = Window.orderBy(col("day")).rangeBetween(-6, 0)
      daily
        .withColumn("wau_est",
          call_function("graft_hll_merge_estimate", col("sk")).over(wFrame))
        .join(wauExact, Seq("day"))
        .select(col("day"), col("dau"), col("wau_exact"),
          // collision noise at tiny cardinalities is ABSOLUTE (a few
          // registers), so the envelope has an absolute floor; the
          // relative part is max-error-calibrated, not 1σ: p=12 raw rsd
          // is 1.63%, and over THOUSANDS of rolling windows a 5% (3σ)
          // bound is statistically guaranteed to trip near the
          // linear-counting→raw crossover (measured: 2/2405 days at
          // ×10 data; 2/2700 trials in HllEnvelopeSpec, worst 5.7%).
          // max(8%, 8) ≈ 5σ keeps even 10⁵ windows clean.
          (abs(col("wau_est") - col("wau_exact")) <=
            greatest(col("wau_exact") * 0.08, lit(8.0))).as("wau_hll_ok"))
        .orderBy("day")
    }),


    // pairwise audience overlap between event types, exact Jaccard in
    // ppm: per-user type sets are bounded (5 types), so pairs explode
    // in place after ONE shuffle keyed by user — the coPurchaseEdges
    // pattern; a distinct-frame self-join would shuffle twice.
    "events_audience_overlap" -> ((s, dir) => {
      val tu = t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
      val pairs = tu.groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("event_type"))).as("ts"))
        .select(explode(expr(
          """flatten(transform(ts, (x, i) ->
               transform(slice(ts, i + 2, size(ts) - i - 1), y -> struct(x AS ta, y AS tb))))"""))
          .as("p"))
        .select(col("p.ta"), col("p.tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_common"))
      val totals = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      pairs
        .join(broadcast(totals.select(col("event_type").as("ta"), col("n").as("n_a"))), Seq("ta"))
        .join(broadcast(totals.select(col("event_type").as("tb"), col("n").as("n_b"))), Seq("tb"))
        .select(col("ta"), col("tb"), col("n_common"), col("n_a"), col("n_b"),
          expr("n_common * 1000000 div (n_a + n_b - n_common)").as("jaccard_ppm"))
        .orderBy("ta", "tb")
    }),


    // per-(type, day) exact median inter-arrival gap via the histogram-
    // median pattern. The lag window partitions by (type, day) — never
    // by type alone, which would funnel a whole event type through one
    // task at cluster scale; the day boundary gap is dropped, the
    // standard partition-and-stitch tradeoff.
    "events_interarrival_median" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"), col("event_id"),
        expr("ts div 1000").as("t_us"),
        expr("(ts div 1000) div 86400000000").as("day"))
      val byTime = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("t_us"), col("event_id"))
      val gaps = e
        .withColumn("gap", col("t_us") - lag(col("t_us"), 1).over(byTime))
        .filter(col("gap").isNotNull)
      val hist = gaps.groupBy(col("event_type"), col("day"), col("gap"))
        .agg(count(lit(1)).as("c"))
      val byGap = Window.partitionBy(col("event_type"), col("day")).orderBy(col("gap"))
      val all = Window.partitionBy(col("event_type"), col("day"))
      hist
        .withColumn("cum", sum(col("c")).over(byGap))
        .withColumn("n", sum(col("c")).over(all))
        .groupBy(col("event_type"), col("day"))
        .agg(max(col("n")).as("n_gaps"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("gap")))
            .as("median_gap_us"),
          max(col("gap")).as("max_gap_us"))
        .orderBy("event_type", "day")
    }),


    // row-level data diff of `orders` against a deterministically
    // perturbed copy: ~1% rows dropped (removed), ~1% totalprice
    // bumped (changed), ~1% re-keyed copies (added)
    "events_funnel" -> ((s, dir) =>
      Events.funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))
        .orderBy("user_id")),


    // conversion-window funnel: each step must land within 1 h of the
    // previous one — the bounded-attribution form production funnels use
    "events_funnel_windowed" -> ((s, dir) =>
      Events.funnelWindowed(t(s, dir, "events"),
          Seq("view", "click", "purchase"), maxGapUs = 3600000000L)
        .orderBy("user_id")),


    "events_top_paths" -> ((s, dir) =>
      Events.topPaths(t(s, dir, "events"))),


    // JSON path extraction over a REAL data column (events.props is a
    // JSON string per event), aggregated in exact integers
    "events_props_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n_events"))
        .orderBy("event_type")),


    "events_retention" -> ((s, dir) =>
      Events.retention(t(s, dir, "events"))
        // DATE columns don't round-trip the hash compare; format as ISO
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("day_n"), col("n_users"))
        .orderBy("cohort", "day_n")),


    // 3-iteration integer PageRank over the part co-purchase graph
    // (same support>=2 edges as graph_triangle_count)
    "graph_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(coPurchaseEdges(s, dir), iterations = 3).orderBy("node")),


    // degree distribution of the same co-purchase graph: the skew probe
    // you run BEFORE any per-node graph algorithm (a hub with degree
    // 10^6 is what breaks the naive triangle/CC join). Two tiny
    // aggregations over the edge list; the histogram is |distinct
    // degrees| rows however large the graph.
    "graph_degree_hist" -> ((s, dir) =>
      coPurchaseEdges(s, dir)
        .select(explode(array(col("ea"), col("eb"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")),


    // interval-containment join, binned to an equi-join: each click ->
    // the session interval containing it (1 h bins over integer µs)
    "range_join_binned" -> ((s, dir) => {
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val sessions = Events.sessionize(t(s, dir, "events"))
        .select(col("user_id"), col("session_id"), col("start_us"),
          (col("start_us") + col("duration_us")).as("end_us"))
      RangeJoin.binnedIntervalJoin(clicks, sessions, Seq("user_id"),
          "ts_us", "start_us", "end_us", binWidth = 3600000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("session_id"), col("start_us"), col("end_us"))
        .orderBy("event_id", "session_id")
    }),


    // the SAME interval join written NAIVELY (plain BETWEEN theta
    // join) and rewritten to the binned hash join by RangeJoinRule,
    // registered at runtime through experimental.extraOptimizations —
    // the optimizer does mechanically what range_join_binned does by
    // hand, against the same oracle. localCheckpoint materializes
    // inside the conf window so the rewrite is active exactly for this
    // plan and the conf never leaks into other keys.
    "range_join_rule_auto" -> ((s, dir) => {
      org.apache.spark.sql.graft.Bridge.addOptimization(s, graft.plans.RangeJoinRule(s))
      s.conf.set("spark.graft.rangeJoin.binWidth", "3600000000")
      try {
        val clicks = t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
        val sessions = Events.sessionize(t(s, dir, "events"))
          .select(col("user_id").as("s_user_id"), col("session_id"), col("start_us"),
            (col("start_us") + col("duration_us")).as("end_us"))
        clicks.join(sessions,
            clicks("user_id") === sessions("s_user_id") &&
              clicks("ts_us") >= sessions("start_us") &&
              clicks("ts_us") <= sessions("end_us"))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("session_id"), col("start_us"), col("end_us"))
          .orderBy("event_id", "session_id")
          .localCheckpoint(true)
      } finally s.conf.unset("spark.graft.rangeJoin.binWidth")
    }),


    // DateType variant of the optimizer rewrite: a PURE-range (no equi
    // key) point-in-window join over dates. Windows are overlapping
    // month windows ([month_start - 10 days, last_day]) derived from
    // the data, so boundary orders match two windows and bin coverage
    // across the overlap is exercised. binWidth is in DAYS for DateType
    // points (the rule's monotone to-long maps a date to its epoch day).
    "range_join_rule_date" -> ((s, dir) => {
      org.apache.spark.sql.graft.Bridge.addOptimization(s, graft.plans.RangeJoinRule(s))
      s.conf.set("spark.graft.rangeJoin.binWidth", "7")
      try {
        val o = t(s, dir, "orders").select(
          to_date(col("o_orderdate")).as("d"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val windows = o.select(trunc(col("d"), "MM").as("m")).distinct()
          .select(col("m"), date_sub(col("m"), 10).as("w_start"),
            last_day(col("m")).as("w_end"))
        o.join(windows, o("d") >= windows("w_start") && o("d") <= windows("w_end"))
          .groupBy(col("m"))
          .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
          // string month key: DATE-typed outputs hash differently across
          // the oracle bridge (date32 vs datetime64), same as elsewhere
          .select(date_format(col("m"), "yyyy-MM-dd").as("month"),
            col("n_orders"), col("sum_cents"))
          .orderBy("month")
          .localCheckpoint(true)
      } finally s.conf.unset("spark.graft.rangeJoin.binWidth")
    }),


    // TimestampType + LEFT OUTER variant: clicks (the preserved POINT
    // side — the only outer shape the rule may rewrite, since the
    // interval side explodes into bins) left-joined to long-session
    // windows on genuine timestamp columns; clicks outside every
    // >=5-event session survive null-padded. binWidth is in
    // MICROSECONDS for timestamp points.
    "range_join_rule_ts_left" -> ((s, dir) => {
      org.apache.spark.sql.graft.Bridge.addOptimization(s, graft.plans.RangeJoinRule(s))
      s.conf.set("spark.graft.rangeJoin.binWidth", "3600000000")
      try {
        val clicks = t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            timestamp_micros(expr("ts div 1000")).as("click_ts"))
        val sessions = Events.sessionize(t(s, dir, "events"))
          .filter(col("n_events") >= 5)
          .select(col("user_id").as("s_user_id"), col("session_id"),
            timestamp_micros(col("start_us")).as("start_ts"),
            timestamp_micros(col("start_us") + col("duration_us")).as("end_ts"),
            col("start_us"))
        clicks.join(sessions,
            clicks("user_id") === sessions("s_user_id") &&
              clicks("click_ts") >= sessions("start_ts") &&
              clicks("click_ts") <= sessions("end_ts"),
            "left_outer")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("click_ts")).as("ts_us"),
            col("session_id"), col("start_us"))
          .orderBy(col("event_id"), col("session_id"))
          .localCheckpoint(true)
      } finally s.conf.unset("spark.graft.rangeJoin.binWidth")
    }),


    // as-of join: for each click, the latest view of the same user at
    // or before the click's timestamp
    "asof_join_nearest" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), round(col("value") * 100).cast("long").as("value_cents"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val views = e.filter(col("event_type") === "view").drop("event_type")
      AsOf.asofNearest(clicks, views, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_cents"),
          col("nearest_event_id"), col("nearest_ts_us"), col("nearest_value_cents"))
        .orderBy("event_id")
    }),


    "asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), round(col("value") * 100).cast("long").as("value_cents"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val views = e.filter(col("event_type") === "view").drop("event_type")
      AsOf.asofJoin(clicks, views, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_cents"),
          col("asof_event_id"), col("asof_ts_us"), col("asof_value_cents"))
        .orderBy("event_id")
    }),


    // the SAME as-of semantics through the custom Catalyst operator
    // (AsOfJoinPlan -> AsOfJoinExec): one sort-merge pass, one buffered
    // row of state per partition — oracle-pinned identical to asof_join
    "asof_join_native" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), round(col("value") * 100).cast("long").as("value_cents"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val views = e.filter(col("event_type") === "view").drop("event_type")
      AsOf.asofJoinNative(clicks, views, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_cents"),
          col("asof_event_id"), col("asof_ts_us"), col("asof_value_cents"))
        .orderBy("event_id")
    }),
  )

  val oracles: Map[String, String] = Map(


    "events_decayed_engagement" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         m AS (SELECT max(ts_us) AS mx FROM e),
         d AS (
           SELECT user_id,
                  least((m.mx - e.ts_us) // 86400000000, 62) AS age_days,
                  e.cents // CAST(pow(2, least((m.mx - e.ts_us) // 86400000000, 62)) AS BIGINT) AS decayed
           FROM e CROSS JOIN m)
         SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(decayed) AS BIGINT) AS decayed_cents,
                CAST(min(age_days) AS BIGINT) AS latest_age_days
         FROM d GROUP BY user_id ORDER BY user_id""",


    "events_experiment_readout" ->
      """WITH e AS (
           SELECT event_type, user_id,
                  CAST(json_extract(props, '$.k') AS BIGINT) % 2 AS variant,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         a AS (
           SELECT event_type,
                  CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                  CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                  CAST(count(DISTINCT CASE WHEN variant = 0 THEN user_id END) AS BIGINT) AS users_a,
                  CAST(count(DISTINCT CASE WHEN variant = 1 THEN user_id END) AS BIGINT) AS users_b,
                  CAST(sum(CASE WHEN variant = 0 THEN cents ELSE 0 END) AS BIGINT) AS cents_a,
                  CAST(sum(CASE WHEN variant = 1 THEN cents ELSE 0 END) AS BIGINT) AS cents_b
           FROM e GROUP BY event_type)
         SELECT event_type, n_a, n_b, users_a, users_b, cents_a, cents_b,
                cents_a // n_a AS mean_cents_a,
                cents_b // n_b AS mean_cents_b,
                (cents_b // n_b) - (cents_a // n_a) AS mean_diff_cents
         FROM a ORDER BY event_type""",


    "events_new_vs_returning" ->
      """WITH du AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         f AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY 1),
         a AS (
           SELECT du.day,
                  CAST(count(*) AS BIGINT) AS dau,
                  CAST(sum(CASE WHEN du.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users
           FROM du JOIN f USING (user_id) GROUP BY du.day)
         SELECT day, dau, new_users,
                dau - new_users AS returning_users,
                new_users * 1000000 // dau AS new_ppm
         FROM a ORDER BY day""",


    "events_bot_score" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
         g AS (
           SELECT user_id,
                  ts_us - lag(ts_us) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS gap_us
           FROM e),
         a AS (
           SELECT user_id,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CASE WHEN gap_us < 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
                  CAST(sum(CASE WHEN gap_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
           FROM g GROUP BY user_id)
         SELECT user_id, n_events, n_fast, n_gaps,
                CASE WHEN n_gaps = 0 THEN 0
                     ELSE n_fast * 1000000 // n_gaps END AS fast_ppm,
                (n_events >= 10 AND
                 (CASE WHEN n_gaps = 0 THEN 0
                       ELSE n_fast * 1000000 // n_gaps END) >= 120000) AS is_bot
         FROM a ORDER BY user_id""",


    "events_sessionize" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events),
         l AS (
           SELECT *, CASE
             WHEN lag(ts_us) OVER w IS NULL THEN 1
             WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
             ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (
           SELECT *, CAST(sum(is_new) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM l)
         SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(ts_us) AS BIGINT) AS start_us,
           CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
           CAST(sum(value_cents) AS BIGINT) AS value_cents
         FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",


    "events_window_agg" ->
      """WITH e AS (
           SELECT event_type, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events)
         SELECT CAST(ts_us - (ts_us % 300000000) AS BIGINT) AS window_start_us, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(value_cents) AS BIGINT) AS value_cents
         FROM e GROUP BY 1, 2 ORDER BY window_start_us, event_type""",


    "events_hourly_baseline" ->
      """WITH e AS (
           SELECT event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS hod,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         g AS (
           SELECT event_type, CAST(hod AS BIGINT) AS hod,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(cents) AS BIGINT) AS sum_cents
           FROM e GROUP BY 1, 2)
         SELECT event_type, hod, n_events, sum_cents,
                CAST(sum_cents // n_events AS BIGINT) AS avg_cents,
                CAST(n_events * 1000000 //
                  (sum(n_events) OVER (PARTITION BY event_type)) AS BIGINT) AS share_ppm
         FROM g ORDER BY event_type, hod""",


    "events_hourly_anomalies" ->
      """WITH cells AS (
           SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2, 3),
         base AS (
           SELECT event_type, hod,
                  CAST(sum(n) AS BIGINT) AS base_total,
                  CAST(count(*) AS BIGINT) AS n_days
           FROM cells GROUP BY 1, 2)
         SELECT c.event_type, c.day, c.hod, c.n,
                CAST(base_total // n_days AS BIGINT) AS baseline_n,
                CAST(c.n * n_days * 1000000 // base_total AS BIGINT) AS ratio_ppm,
                (c.n * n_days * 100 > 150 * base_total) AS is_anomaly
         FROM cells c JOIN base b ON c.event_type = b.event_type AND c.hod = b.hod
         ORDER BY c.event_type, c.day, c.hod""",


    "events_user_gini" ->
      """WITH cnt AS (
           SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2),
         h AS (SELECT event_type, c, count(*) AS f FROM cnt GROUP BY 1, 2),
         k AS (
           SELECT event_type, c, f,
                  sum(f) OVER (PARTITION BY event_type ORDER BY c) AS cum,
                  sum(f) OVER (PARTITION BY event_type) AS n
           FROM h)
         SELECT event_type,
                CAST(max(n) AS BIGINT) AS n_users,
                CAST(sum(c * f) AS BIGINT) AS total_events,
                CAST(sum(c * f * (cum * 2 - f - n)) AS BIGINT) AS gini_num,
                CAST(max(n) * sum(c * f) AS BIGINT) AS gini_den,
                CAST(sum(c * f * (cum * 2 - f - n)) * 1000000
                     // (max(n) * sum(c * f)) AS BIGINT) AS gini_ppm
         FROM k GROUP BY 1 ORDER BY 1""",


    "events_attribution_native" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         u AS (
           SELECT user_id, ts_us, 0 AS side,
                  CAST(NULL AS BIGINT) AS p_id, CAST(NULL AS BIGINT) AS p_cents,
                  event_id AS c_id, ts_us AS c_ts
           FROM e WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts_us, 1, event_id, cents,
                  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
           FROM e WHERE event_type = 'purchase'),
         m AS (
           SELECT *,
             last_value(c_id IGNORE NULLS) OVER w AS a_click,
             last_value(c_ts IGNORE NULLS) OVER w AS a_ts
           FROM u WINDOW w AS (
             PARTITION BY user_id ORDER BY ts_us, side ROWS UNBOUNDED PRECEDING)),
         p AS (
           SELECT *,
                  (a_click IS NOT NULL AND ts_us - a_ts <= 3600000000) AS attributed
           FROM m WHERE side = 1)
         SELECT attributed, count(*) AS n_purchases,
                CAST(sum(p_cents) AS BIGINT) AS revenue_cents,
                CAST(sum(CASE WHEN attributed THEN ts_us - a_ts ELSE 0 END) AS BIGINT)
                  AS gap_us_sum
         FROM p GROUP BY 1 ORDER BY 1""",


    "events_type_mix_drift" ->
      """WITH e AS (
           SELECT event_type, epoch_us(ts) // 604800000000 AS week FROM events),
         cell AS (SELECT week, event_type, count(*) AS n FROM e GROUP BY 1, 2),
         w AS (SELECT week, sum(n) AS n_week FROM cell GROUP BY 1),
         o AS (SELECT event_type, count(*) AS n_type FROM e GROUP BY 1),
         tot AS (SELECT count(*) AS n_total FROM e)
         SELECT CAST(cell.week AS BIGINT) AS week, cell.event_type,
                CAST(n AS BIGINT) AS n,
                CAST(n * 1000000 // n_week AS BIGINT) AS week_share_ppm,
                CAST(n_type * 1000000 // n_total AS BIGINT) AS overall_share_ppm,
                (abs(n * 1000000 // n_week - n_type * 1000000 // n_total) * 100
                  > (n_type * 1000000 // n_total) * 25) AS is_shifted
         FROM cell JOIN w USING (week) JOIN o USING (event_type) CROSS JOIN tot
         ORDER BY week, event_type""",


    "events_dau_wau_sketch" ->
      """WITH du AS (
           SELECT DISTINCT
             CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS day,
             o_custkey
           FROM orders),
         cov AS (
           SELECT day + r.range AS day, o_custkey
           FROM du CROSS JOIN range(0, 7) r),
         wau AS (SELECT day, count(DISTINCT o_custkey) AS wau_exact
                 FROM cov GROUP BY 1),
         dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1)
         SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
                CAST(w.wau_exact AS BIGINT) AS wau_exact,
                TRUE AS wau_hll_ok
         FROM dau d JOIN wau w ON d.day = w.day
         ORDER BY d.day""",


    "events_audience_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
         p AS (
           SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_common
           FROM tu a JOIN tu b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY 1, 2),
         tot AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1)
         SELECT ta, tb, CAST(n_common AS BIGINT) AS n_common,
                CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
                CAST(n_common * 1000000 // (na.n + nb.n - n_common) AS BIGINT)
                  AS jaccard_ppm
         FROM p JOIN tot na ON p.ta = na.event_type
                JOIN tot nb ON p.tb = nb.event_type
         ORDER BY ta, tb""",


    "events_interarrival_median" ->
      """WITH e AS (
           SELECT event_type, event_id, epoch_us(ts) AS t_us,
                  epoch_us(ts) // 86400000000 AS day
           FROM events),
         gaps AS (
           SELECT event_type, day,
                  t_us - lag(t_us) OVER (PARTITION BY event_type, day
                    ORDER BY t_us, event_id) AS gap
           FROM e),
         h AS (SELECT event_type, day, gap, count(*) AS c
               FROM gaps WHERE gap IS NOT NULL GROUP BY 1, 2, 3),
         k AS (
           SELECT event_type, day, gap, c,
                  sum(c) OVER (PARTITION BY event_type, day ORDER BY gap) AS cum,
                  sum(c) OVER (PARTITION BY event_type, day) AS n
           FROM h)
         SELECT event_type, CAST(day AS BIGINT) AS day,
                CAST(max(n) AS BIGINT) AS n_gaps,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS BIGINT)
                  AS median_gap_us,
                CAST(max(gap) AS BIGINT) AS max_gap_us
         FROM k GROUP BY 1, 2 ORDER BY 1, 2""",


    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         s0 AS (SELECT user_id, min(ts_us) AS t_view FROM e
                WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (SELECT e.user_id, min(e.ts_us) AS t_click FROM e
                JOIN s0 ON s0.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts_us > s0.t_view
                GROUP BY e.user_id),
         s2 AS (SELECT e.user_id, min(e.ts_us) AS t_purchase FROM e
                JOIN s1 ON s1.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts_us > s1.t_click
                GROUP BY e.user_id)
         SELECT s0.user_id, s0.t_view, s1.t_click, s2.t_purchase
         FROM s0 LEFT JOIN s1 ON s1.user_id = s0.user_id
         LEFT JOIN s2 ON s2.user_id = s0.user_id
         ORDER BY s0.user_id""",


    "events_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         s0 AS (SELECT user_id, min(ts_us) AS t_view FROM e
                WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (SELECT e.user_id, min(e.ts_us) AS t_click FROM e
                JOIN s0 ON s0.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts_us > s0.t_view
                  AND e.ts_us <= s0.t_view + 3600000000
                GROUP BY e.user_id),
         s2 AS (SELECT e.user_id, min(e.ts_us) AS t_purchase FROM e
                JOIN s1 ON s1.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts_us > s1.t_click
                  AND e.ts_us <= s1.t_click + 3600000000
                GROUP BY e.user_id)
         SELECT s0.user_id, s0.t_view, s1.t_click, s2.t_purchase
         FROM s0 LEFT JOIN s1 ON s1.user_id = s0.user_id
         LEFT JOIN s2 ON s2.user_id = s0.user_id
         ORDER BY s0.user_id""",


    "events_top_paths" ->
      """WITH r AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (
           SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
           FROM r WHERE rn <= 5 GROUP BY user_id)
         SELECT path, count(*) AS n_users FROM p GROUP BY path
         ORDER BY n_users DESC, path LIMIT 20""",


    "events_props_extract" ->
      """SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",


    "events_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id)
         SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort,
                CAST(date_diff('day', c.cohort, e.day) AS INT) AS day_n,
                count(DISTINCT e.user_id) AS n_users
         FROM e JOIN c ON c.user_id = e.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",


    "graph_pagerank" ->
      """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         edges AS (
           SELECT a.pk AS ea, b.pk AS eb
           FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS (SELECT ea AS src, eb AS dst FROM edges
                 UNION ALL SELECT eb, ea FROM edges),
         deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
         c0 AS (SELECT r0.node AS src, r0.r // deg.deg AS share
                FROM r0 JOIN deg ON r0.node = deg.src),
         r1 AS (SELECT sym.dst AS node,
                  CAST(150000 + (85 * sum(share)) // 100 AS BIGINT) AS r
                FROM sym JOIN c0 USING (src) GROUP BY 1),
         c1 AS (SELECT r1.node AS src, r1.r // deg.deg AS share
                FROM r1 JOIN deg ON r1.node = deg.src),
         r2 AS (SELECT sym.dst AS node,
                  CAST(150000 + (85 * sum(share)) // 100 AS BIGINT) AS r
                FROM sym JOIN c1 USING (src) GROUP BY 1),
         c2 AS (SELECT r2.node AS src, r2.r // deg.deg AS share
                FROM r2 JOIN deg ON r2.node = deg.src),
         r3 AS (SELECT sym.dst AS node,
                  CAST(150000 + (85 * sum(share)) // 100 AS BIGINT) AS r
                FROM sym JOIN c2 USING (src) GROUP BY 1)
         SELECT node, r AS rank_ppm FROM r3 ORDER BY node""",


    "graph_degree_hist" ->
      """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         edges AS (
           SELECT a.pk AS ea, b.pk AS eb
           FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING count(*) >= 2),
         nodes AS (SELECT ea AS node FROM edges
                   UNION ALL SELECT eb FROM edges),
         deg AS (SELECT node, count(*) AS degree FROM nodes GROUP BY 1)
         SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
         FROM deg GROUP BY 1 ORDER BY 1""",


    "range_join_binned" -> rangeJoinOracle,


    // optimizer-rule twin: identical semantics, identical oracle
    "range_join_rule_auto" -> rangeJoinOracle,


    "range_join_rule_date" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d,
                           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                    FROM orders),
         w AS (SELECT m, m - 10 AS w_start, last_day(m) AS w_end
               FROM (SELECT DISTINCT CAST(date_trunc('month', d) AS DATE) AS m FROM o))
         SELECT strftime(w.m, '%Y-%m-%d') AS month,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(o.cents) AS BIGINT) AS sum_cents
         FROM o JOIN w ON o.d >= w.w_start AND o.d <= w.w_end
         GROUP BY w.m ORDER BY month""",


    "range_join_rule_ts_left" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
           FROM events),
         l AS (
           SELECT *, CASE
             WHEN lag(ts_us) OVER w IS NULL THEN 1
             WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
             ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (
           SELECT *, CAST(sum(is_new) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM l),
         g AS (
           SELECT user_id, session_id,
                  CAST(min(ts_us) AS BIGINT) AS start_us,
                  CAST(max(ts_us) AS BIGINT) AS end_us
           FROM s GROUP BY user_id, session_id HAVING count(*) >= 5),
         c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click')
         SELECT c.event_id, c.user_id, c.ts_us, g.session_id, g.start_us
         FROM c LEFT JOIN g
           ON c.user_id = g.user_id
          AND c.ts_us >= g.start_us AND c.ts_us <= g.end_us
         ORDER BY c.event_id, g.session_id NULLS FIRST""",


    "asof_join_nearest" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                  CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events),
         c AS (SELECT * EXCLUDE (event_type) FROM e WHERE event_type = 'click'),
         v AS (SELECT * EXCLUDE (event_type) FROM e WHERE event_type = 'view'),
         j AS (
           SELECT c.event_id, c.user_id, c.ts_us, c.value_cents,
                  v.event_id AS nearest_event_id, v.ts_us AS nearest_ts_us,
                  v.value_cents AS nearest_value_cents,
                  row_number() OVER (PARTITION BY c.event_id
                    ORDER BY abs(v.ts_us - c.ts_us), v.ts_us, v.event_id) AS rn
           FROM c LEFT JOIN v ON c.user_id = v.user_id)
         SELECT event_id, user_id, ts_us, value_cents,
                nearest_event_id, nearest_ts_us, nearest_value_cents
         FROM j WHERE rn = 1 ORDER BY event_id""",


    "asof_join" -> asofJoinOracle,


    // native-operator twin: identical semantics, identical oracle
    "asof_join_native" -> asofJoinOracle,
  )
}
