package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 continuation batch: analytics shapes a production
  * training-data / warehouse pipeline needs that the registry did not
  * yet cover — customer segmentation, interval sweep-line concurrency,
  * vocabulary-coverage sizing, winsorized aggregation, PMI
  * collocations, exact repeated-n-gram span dedup (the Lee et al.
  * "deduplicating training data" primitive, bounded to word 8-grams),
  * and a bucketed co-located join.
  *
  * Everything stays in exact integer arithmetic (cents / e6
  * fixed-point / integer DIV) so the DuckDB oracle hash-compare is
  * bit-exact. Quantile boundaries use the histogram form throughout:
  * the value at rank r is the MIN value whose cumulative count >= r,
  * so raw rows cross ONE partial-aggregated shuffle into a
  * (group, value) histogram and windows run over |distinct values|
  * rows — never a row_number over the fact (which would serialize each
  * group onto one core; the same rewrite that took exact_median_window
  * 1.49s -> 0.51s).
  */
object Queries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  private def priceC = round(col("o_totalprice") * 100).cast("long")

  // -------------------------------------------------------------------
  // RFM segmentation: per-customer Recency / Frequency / Monetary
  // scores 1-4, bucketed by EXACT quartile boundary values (score =
  // 1 + #boundaries strictly exceeded), then segment-level rollup.
  // Boundary-compare scoring (not ntile) on purpose: a global ntile
  // would rank the whole customer frame in one task; here each metric
  // reduces to a count-histogram whose quartile pass broadcasts three
  // scalars back. The rec/freq histograms are bounded by the calendar
  // and by order counts; mon_c's histogram is customer-cardinality, so
  // at 1.5B customers its quartile pass swaps to Scale.chunkedCumSum
  // exactly as feature_binning_deciles does (locally the plain window
  // wins — the chunked form reads its input three times, and this
  // function calls quartiles() thrice). Ties at a boundary fall into
  // the lower bucket on both sides by construction.
  private def eventsRfm(s: SparkSession, dir: String): DataFrame = {
    // per-customer frame persisted: it feeds the global-max probe,
    // three quartile histograms AND the final scoring pass — without
    // it the orders scan + aggregate re-runs five times
    val per = graft.ext.Checkpoints.truncateLazy(t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"), priceC.as("price_c"))
      .groupBy(col("o_custkey"))
      .agg(max(col("d")).as("last_d"),
        count(lit(1)).as("freq"),
        sum(col("price_c")).as("mon_c")))
    val withRec = per
      .crossJoin(broadcast(per.agg(max(col("last_d")).as("gmax"))))
      .withColumn("rec", datediff(col("gmax"), col("last_d")).cast("long"))

    // exact quartile boundaries of one integer metric via the
    // histogram form; yields one row: (q1, q2, q3)
    def quartiles(metric: String): DataFrame = {
      val h = withRec.groupBy(col(metric).as("v")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy("v")
      h.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(Window.partitionBy()))
        .agg(
          min(when(col("cum") >= expr("(n + 3) div 4"), col("v"))).as(s"${metric}_q1"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("v"))).as(s"${metric}_q2"),
          min(when(col("cum") >= expr("(3 * n + 3) div 4"), col("v"))).as(s"${metric}_q3"))
    }

    def score(metric: String): org.apache.spark.sql.Column =
      lit(1) + when(col(metric) > col(s"${metric}_q1"), 1).otherwise(0) +
        when(col(metric) > col(s"${metric}_q2"), 1).otherwise(0) +
        when(col(metric) > col(s"${metric}_q3"), 1).otherwise(0)

    withRec
      .crossJoin(broadcast(quartiles("rec")))
      .crossJoin(broadcast(quartiles("freq")))
      .crossJoin(broadcast(quartiles("mon_c")))
      .withColumn("segment",
        concat(score("rec"), lit("-"), score("freq"), lit("-"), score("mon_c")))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("mon_c")).as("sum_mon_c"))
      .orderBy("segment")
  }

  // -------------------------------------------------------------------
  // Sweep-line interval concurrency: each event opens a half-open
  // 30-minute activity interval [ts, ts+30m); the max number of
  // simultaneously-open intervals per event_type is the max prefix sum
  // over (+1 at start, -1 at end) points ordered by (time, delta) —
  // delta ASC puts closes before opens at the same instant, which is
  // exactly half-open semantics. The per-type running sum is a
  // sequential scan by construction (sweep lines don't parallelize
  // within a key); at 100 TB you shard the time axis into ranges and
  // correct each shard by the net open-count of everything before it —
  // the per-type global MAX here is permutation-invariant within tied
  // (t, delta) runs, so the oracle compare is stable.
  private def sweepConcurrency(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"), expr("ts div 1000").as("t_us"))
    val pts = e.select(col("event_type"), col("t_us").as("t"), lit(1).as("delta"))
      .unionByName(e.select(col("event_type"),
        (col("t_us") + 1800000000L).as("t"), lit(-1).as("delta")))
    val w = Window.partitionBy("event_type").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("open", sum(col("delta")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("open")).as("max_concurrent"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_intervals"))
      .orderBy("event_type")
  }

  // -------------------------------------------------------------------
  // Vocabulary coverage: per language, the smallest vocabulary (tokens
  // taken in descending-count order) covering >= 95% of token mass.
  // Computed over the histogram OF COUNTS: tokens sharing a count are
  // interchangeable, so after (lang, count) -> (n_tokens, mass) the
  // window runs over |distinct count values| rows (~hundreds) instead
  // of |vocab| rows (~millions at corpus scale), and the boundary
  // count's partial take is the exact integer
  // ceil((95%·total − mass_above) / c*). No token-level window, no
  // single-partition sort of the vocabulary.
  private def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val perTok = t(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val hist = perTok.groupBy(col("lang"), col("c"))
      .agg(count(lit(1)).as("n_toks"))
      .withColumn("mass", col("c") * col("n_toks"))
    val w = Window.partitionBy("lang").orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum_incl", sum(col("mass")).over(w))
      .withColumn("toks_incl", sum(col("n_toks")).over(w))
      .withColumn("total", sum(col("mass")).over(Window.partitionBy("lang")))
      .filter(col("cum_incl") * 100 >= col("total") * 95 &&
        (col("cum_incl") - col("mass")) * 100 < col("total") * 95)
      .select(col("lang"), col("total").as("total_tokens"),
        (col("toks_incl") - col("n_toks") +
          expr("(total * 95 - (cum_incl - mass) * 100 + c * 100 - 1) div (c * 100)"))
          .as("vocab_95"))
      .orderBy("lang")
  }

  // -------------------------------------------------------------------
  // Winsorized aggregation: clamp lineitem prices (cents) to the exact
  // discrete [p05, p95] per return flag, then sum. ONE fact scan and
  // ONE final aggregate: on the (flag, value) histogram, "v < lo"
  // ⟺ cum(v) < r05 and "v > hi" ⟺ cum(v) − c(v) ≥ r95, so the clamped
  // sum decomposes into Σ v·c over the mid-range plus lo·|below| +
  // hi·|above| — the boundary VALUES come out of the same aggregate as
  // conditional mins, so no join back onto the fact exists at all.
  private def winsorizeClampAgg(s: SparkSession, dir: String): DataFrame = {
    val h = t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .groupBy(col("l_returnflag"), col("price_c")).agg(count(lit(1)).as("c"))
    graft.ext.Scale.chunkedCumSum(h, Seq("l_returnflag"), "price_c", "c", "cum")
      .withColumnRenamed("cum_total", "n")
      .withColumn("below", expr("cum < (n * 5 + 99) div 100"))
      .withColumn("above", expr("cum - c >= (n * 95 + 99) div 100"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("c")).as("n"),
        min(when(expr("cum >= (n * 5 + 99) div 100"), col("price_c"))).as("lo_c"),
        min(when(expr("cum >= (n * 95 + 99) div 100"), col("price_c"))).as("hi_c"),
        sum(when(!col("below") && !col("above"), col("price_c") * col("c"))
          .otherwise(0L)).as("s_mid"),
        sum(when(col("below"), col("c")).otherwise(0L)).as("n_below"),
        sum(when(col("above"), col("c")).otherwise(0L)).as("n_above"))
      .select(col("l_returnflag"), col("n"), col("lo_c"), col("hi_c"),
        (col("s_mid") + col("lo_c") * col("n_below") + col("hi_c") * col("n_above"))
          .as("sum_winsor_c"))
      .orderBy("l_returnflag")
  }

  // -------------------------------------------------------------------
  // PMI collocations: adjacent-token bigrams scored by pointwise
  // mutual information, kept in EXACT fixed point — the ratio
  // p(x,y)/(p(x)p(y)) = c_xy·U²/(N·c_x·c_y) is evaluated as one
  // decimal(38)-domain integer DIV (max magnitude ~1e25, well inside
  // 38 digits; DuckDB mirrors it in HUGEINT), so ranking never touches
  // a float/log. Two shuffles (unigram + bigram counts) + two
  // broadcast joins of the unigram side onto bigrams; top-k is a
  // TakeOrdered, not a global sort.
  private def textPmiBigrams(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").withColumn("w", split(col("text"), " "))
    val uni = docs.select(explode(col("w")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totalU = uni.agg(sum(col("c")).as("u"))
    val bi = docs
      .select(explode(expr(
        """transform(sequence(1, greatest(size(w) - 1, 1)),
             i -> struct(element_at(w, i) AS x, element_at(w, i + 1) AS y))"""))
        .as("b"))
      .select(col("b.x"), col("b.y"))
      .filter(length(col("x")) > 0 && length(col("y")) > 0)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 5)
    val totalN = bi.agg(sum(col("cxy")).as("n"))
    bi.join(broadcast(uni.withColumnRenamed("tok", "x").withColumnRenamed("c", "cx")), Seq("x"))
      .join(broadcast(uni.withColumnRenamed("tok", "y").withColumnRenamed("c", "cy")), Seq("y"))
      .crossJoin(broadcast(totalU))
      .crossJoin(broadcast(totalN))
      .withColumn("pmi_e6", expr(
        """(cast(cxy as decimal(20,0)) * cast(u as decimal(20,0)) * cast(u as decimal(20,0))
             * cast(1000000 as decimal(20,0)))
           div (cast(n as decimal(20,0)) * cast(cx as decimal(20,0)) * cast(cy as decimal(20,0)))"""))
      .select(col("x"), col("y"), col("cxy"), col("pmi_e6"))
      .orderBy(col("pmi_e6").desc, col("x"), col("y"))
      .limit(20)
  }

  // -------------------------------------------------------------------
  // Exact repeated-n-gram spans (the substring-dedup primitive from
  // "Deduplicating Training Data Makes Language Models Better",
  // bounded to word 8-grams): every 8-gram appearing in >= 2 DISTINCT
  // documents, with its document frequency. Corpus = the %5 document
  // sample plus planted first-half truncations (doc_id + 1e6), the
  // same convention as the other dedup keys — a truncation shares all
  // its 8-grams with its original, so matches are guaranteed. One
  // shuffle keyed by the gram string after a per-document DISTINCT;
  // at 100 TB the gram key is a 64-bit hash instead of the string and
  // the >= 2 filter happens map-side via a count-min prefilter.
  private def dedupRepeatedNgrams(s: SparkSession, dir: String): DataFrame = {
    val d5 = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    val wc = split(col("text"), " ")
    val corpus = d5.unionByName(d5.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(wc, lit(1), greatest((size(wc) / 2).cast("int"), lit(1))))
        .as("text")))
    corpus
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 7), i -> array_join(slice(w, i, 8), ' '))"))
        .as("gram"))
      .distinct()
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(50)
  }

  // -------------------------------------------------------------------
  // Bucketed co-located join: both sides written as 8-bucket tables on
  // the join key, then joined and aggregated. With matching bucketing
  // the join needs NO exchange on either side and the pre-aggregation
  // by the bucket column is exchange-free too (plan-asserted in
  // Queries4Spec with broadcast disabled) — this is the layout you'd
  // give any repeatedly-joined 100 TB fact/dim pair instead of paying
  // the fact shuffle per query. The oracle is the plain join on the
  // raw parquet: bucketing must not change a single row.
  private def bucketedJoinColocated(s: SparkSession, dir: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    graft.ext.Scale.writeBucketed(
      t(s, dir, "orders").select(col("o_custkey"), priceC.as("price_c")),
      "g4_orders_bkt", "o_custkey", 8, Some(s"$wh/g4_orders_bkt"))
    graft.ext.Scale.writeBucketed(
      t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
      "g4_customer_bkt", "c_custkey", 8, Some(s"$wh/g4_customer_bkt"))
    val perCust = s.table("g4_orders_bkt")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("sum_c"))
    s.table("g4_customer_bkt")
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("n_orders"),
        sum(col("sum_c")).as("revenue_c"))
      .orderBy("c_mktsegment")
  }

  // -------------------------------------------------------------------
  // Time-weighted average: per event type, TWA of `value` held between
  // consecutive events — Σ(v·Δt)/ΣΔt with v in e6 fixed point and Δt in
  // exact micros. The product Σ(v_e6·Δt_us) can reach ~1e22, so the
  // accumulation runs in decimal(38) (HUGEINT on the DuckDB side) and
  // only the final integer-DIV quotient returns to BIGINT — no float
  // ever. The lag window partitions by event_type; its per-type state
  // is one row.
  private def eventsTimeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("t_us"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"), expr("ts div 1000").as("t_us"),
        round(col("value") * 1000000).cast("long").as("v_e6"))
      .withColumn("next_t", lead(col("t_us"), 1).over(w))
      .filter(col("next_t").isNotNull)
      .withColumn("dt", col("next_t") - col("t_us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_segments"),
        expr("""sum(cast(v_e6 as decimal(28,0)) * cast(dt as decimal(28,0)))
                div sum(cast(dt as decimal(28,0)))""").as("twa_e6"))
      .orderBy("event_type")
  }

  // -------------------------------------------------------------------
  // Gaps-and-islands: per-user runs of consecutive active DAYS (the
  // classic date − row_number() trick: day minus its per-user rank is
  // constant exactly within an island of consecutive days). The window
  // runs over each user's DISTINCT days — bounded by the calendar, not
  // the event count. Output: islands + longest/total streak per user.
  private def userActivityStreaks(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"),
        to_date(graft.sources.Tables.eventTs(col("ts"))).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), max(col("len")).as("max_streak"),
        sum(col("len")).as("active_days"))
      .orderBy("user_id")
  }

  // -------------------------------------------------------------------
  // Decile feature binning: assign each lineitem price (cents) its
  // exact per-flag decile bin, then the per-(flag, bin) distribution.
  // ONE fact scan: the bin is a pure function of the histogram's own
  // cumulative count — v exceeds boundary d_k = min{v: cum ≥ r_k}
  // exactly when cum(v) − c(v) ≥ r_k — so after the (flag, value)
  // histogram no join, no boundary broadcast and no second scan of the
  // fact exist; every row of the fact is read once and all decile math
  // runs on |distinct values| rows. (The first formulation broadcast
  // d1..d9 back onto a second fact scan: 1.7 s vs 0.9 s at sf0.1, and
  // at 100 TB the second scan is the whole fact again.)
  private def featureBinningDeciles(s: SparkSession, dir: String): DataFrame = {
    val h = t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .groupBy(col("l_returnflag"), col("price_c")).agg(count(lit(1)).as("c"))
    // distributed prefix sum, not Window.partitionBy(flag): with 3
    // flags the plain window cumsums the whole histogram on 3 cores —
    // and at 100 TB one task would buffer a whole flag's histogram
    val cum = graft.ext.Scale.chunkedCumSum(
      h, Seq("l_returnflag"), "price_c", "c", "cum")
      .withColumnRenamed("cum_total", "n")
    val bin = (1 to 9).foldLeft(lit(1)) { (acc, k) =>
      acc + when(expr(s"cum - c >= (n * $k + 9) div 10"), 1).otherwise(0)
    }
    cum.withColumn("bin", bin)
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(sum(col("c")).as("n"), sum(col("price_c") * col("c")).as("sum_c"))
      .orderBy("l_returnflag", "bin")
  }

  // -------------------------------------------------------------------
  // Robust outliers via MAD: per flag, exact median m, exact median of
  // |x − m| (MAD), and the count of |x − m| > 3·MAD — all in integer
  // cents via two histogram-form median passes (the second histogram is
  // over |x − m| after broadcasting m back; no row windows anywhere).
  // MAD is the robust scale estimator — unlike ±3σ it doesn't let the
  // outliers themselves inflate the fence.
  private def robustMadOutliers(s: SparkSession, dir: String): DataFrame = {
    // ONE fact scan into the (flag, value, count) histogram; persisted
    // because the median subtree and the deviation re-aggregation both
    // consume it. Every later step — median, |v − med| histogram, MAD,
    // outlier count — is weighted arithmetic over |distinct values|
    // rows, so the fact is never rescanned and never re-shuffled. (The
    // first formulation joined the medians back onto the raw fact and
    // re-aggregated 6M dev rows; this one re-aggregates the ~600k-row
    // histogram.)
    val h = graft.ext.Checkpoints.truncateLazy(t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      .groupBy(col("l_returnflag"), col("v")).agg(count(lit(1)).as("c")))

    // plain window: each median is consumed once and the histogram is
    // persisted, so the fan-out cost of the chunked prefix sum (three
    // input reads per call) outweighs its parallelism here — measured
    // same-run at sf0.1: plain 3.6 s vs chunked-both-medians 7.3 s. A
    // deployment with millions of distinct values per group swaps this
    // for Scale.chunkedCumSum exactly as feature_binning_deciles does
    def medianOfHist(hist: DataFrame, out: String): DataFrame = {
      val w = Window.partitionBy("l_returnflag").orderBy("v")
      hist.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("l_returnflag")))
        .groupBy(col("l_returnflag"))
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("v"))).as(out))
    }

    val med = medianOfHist(h, "med_c")
    // persisted like h: the deviation histogram feeds the MAD median
    // (which reads it three times through the chunked prefix sum) and
    // the final outlier rollup
    val devH = graft.ext.Checkpoints.truncateLazy(
      h.join(broadcast(med), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("med_c"),
          abs(col("v") - col("med_c")).as("v"))
        .agg(sum(col("c")).as("c")))
    val mad = medianOfHist(devH, "mad_c")
    devH.join(broadcast(mad), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("c")).as("n"), max(col("med_c")).as("med_c"),
        max(col("mad_c")).as("mad_c"),
        sum(when(col("v") > col("mad_c") * 3, col("c")).otherwise(0L)).as("n_outliers"))
      .orderBy("l_returnflag")
  }

  // -------------------------------------------------------------------
  // Table profiling: per-column completeness / cardinality / extrema
  // over a string-safe projection of orders (money in cents, dates as
  // ISO strings — so min/max stringify identically on both engines).
  // Shape: ONE scan, stack() to (col_name, value) long form, then the
  // two-level histogram aggregate — partial map-side (col, value)
  // counts shrink the shuffle to |distinct values| rows, and the final
  // per-column rollup reads the histogram (n = Σc, distinct = row
  // count, extrema = min/max). A multi-countDistinct aggregate would
  // Expand the scan 6× instead (measured 3.8 s vs this form's sub-s at
  // sf0.1); at 100 TB you'd swap exact distincts for HLL sketches
  // (approx_distinct_hll key) — the one-scan shape stays.
  private def profileTableStats(s: SparkSession, dir: String): DataFrame = {
    val proj = t(s, dir, "orders").select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      col("o_custkey").cast("string").as("o_custkey"),
      col("o_orderstatus").as("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").cast("string").as("price_c"),
      date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd").as("o_orderdate"),
      col("o_orderpriority").as("o_orderpriority"))
    graft.ext.Profile.table(proj)
  }

  // -------------------------------------------------------------------
  // Join/aggregation skew diagnostics: for each candidate key column,
  // the distribution facts that decide between a plain shuffle,
  // AQE skew splitting and explicit salting (Scale.saltedJoin) — key
  // cardinality, max per-key fanout, top-1/top-10 row share (exact
  // ppm), p99 per-key count, and max/avg skew ratio. Everything reads
  // from the per-key count histogram and then the histogram OF COUNTS
  // (the vocab_coverage trick: the top-10 share takes whole count
  // levels from the top plus an exact partial take at the boundary
  // level), so per column it is one fact scan + two tiny aggregates —
  // the diagnostic is cheap enough to run BEFORE every big join.
  private def dataSkewReport(s: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.skew(t(s, dir, "events"), "user_id", "events.user_id")
      .unionByName(graft.ext.Profile.skew(
        t(s, dir, "lineitem"), "l_suppkey", "lineitem.l_suppkey"))
      .orderBy("key_col")

  // -------------------------------------------------------------------
  // Quantile normalization: map each distinct value to its exact
  // percentile rank (ppm, cum·1e6 div n) within its group — the
  // feature-engineering transform that makes skewed columns comparable
  // across groups. Runs entirely on the (group, value) histogram via
  // the distributed prefix sum, so the fact is scanned once and the
  // transform table (|distinct values| rows) broadcast-joins back onto
  // any frame that needs normalized features.
  private def quantileNormalizeRank(s: SparkSession, dir: String): DataFrame = {
    val h = t(s, dir, "lineitem")
      .select(col("l_returnflag"), round(col("l_quantity")).cast("long").as("qty"))
      .groupBy(col("l_returnflag"), col("qty")).agg(count(lit(1)).as("c"))
    graft.ext.Scale.chunkedCumSum(h, Seq("l_returnflag"), "qty", "c", "cum")
      .select(col("l_returnflag"), col("qty"), col("c"),
        expr("cum * 1000000 div cum_total").as("pct_ppm"))
      .orderBy("l_returnflag", "qty")
  }

  // Acquisition-cohort repeat rate: customers grouped by their FIRST
  // order's month; a customer "repeats" when any later order lands in a
  // later month. Two partial-aggregated shuffles (per-customer min +
  // per-customer repeat flag), cohort table is |months| rows; rates in
  // exact ppm. Months emitted as strings (date-typed outputs drift
  // dtype-kind through the driver's pandas compare).
  private def cohortRepeatRate(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_custkey"),
      date_format(to_date(col("o_orderdate")), "yyyy-MM").as("month"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("month")).as("cohort"))
    val repeat = o.join(first, Seq("o_custkey"))
      .groupBy(col("o_custkey"), col("cohort"))
      .agg(max(when(col("month") > col("cohort"), 1L).otherwise(0L)).as("is_repeat"))
    repeat.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("is_repeat")).as("n_repeat"))
      .withColumn("repeat_ppm", expr("n_repeat * 1000000 div n_customers"))
      .orderBy("cohort")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cohort_repeat_rate" -> cohortRepeatRate _,
    "quantile_normalize_rank" -> quantileNormalizeRank _,
    "data_skew_report" -> dataSkewReport _,
    "events_rfm_segments" -> eventsRfm _,
    "interval_sweep_concurrency" -> sweepConcurrency _,
    "vocab_coverage" -> vocabCoverage _,
    "winsorize_clamp_agg" -> winsorizeClampAgg _,
    "text_pmi_bigrams" -> textPmiBigrams _,
    "dedup_repeated_ngrams" -> dedupRepeatedNgrams _,
    "bucketed_join_colocated" -> bucketedJoinColocated _,
    "events_time_weighted_avg" -> eventsTimeWeightedAvg _,
    "user_activity_streaks" -> userActivityStreaks _,
    "feature_binning_deciles" -> featureBinningDeciles _,
    "robust_mad_outliers" -> robustMadOutliers _,
    "profile_table_stats" -> profileTableStats _,
  )

  val oracles: Map[String, String] = Map(
    "cohort_repeat_rate" ->
      """WITH o AS (
           SELECT o_custkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month
           FROM orders),
         f AS (SELECT o_custkey, min(month) AS cohort FROM o GROUP BY 1),
         r AS (
           SELECT o.o_custkey, f.cohort,
                  max(CASE WHEN o.month > f.cohort THEN 1 ELSE 0 END) AS is_repeat
           FROM o JOIN f USING (o_custkey)
           GROUP BY 1, 2)
         SELECT cohort,
                CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(is_repeat) AS BIGINT) AS n_repeat,
                CAST(sum(is_repeat) * 1000000 // count(*) AS BIGINT) AS repeat_ppm
         FROM r GROUP BY cohort ORDER BY cohort""",

    "events_rfm_segments" ->
      """WITH per AS (
           SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
                  count(*) AS freq,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon_c
           FROM orders GROUP BY 1),
         wr AS (
           SELECT *, CAST(date_diff('day', last_d, (SELECT max(last_d) FROM per)) AS BIGINT) AS rec
           FROM per),
         qr AS (
           SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
                  min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS q2,
                  min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
           FROM (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
                 FROM (SELECT rec AS v, count(*) AS c FROM wr GROUP BY 1))),
         qf AS (
           SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
                  min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS q2,
                  min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
           FROM (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
                 FROM (SELECT freq AS v, count(*) AS c FROM wr GROUP BY 1))),
         qm AS (
           SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
                  min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS q2,
                  min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
           FROM (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
                 FROM (SELECT mon_c AS v, count(*) AS c FROM wr GROUP BY 1)))
         SELECT concat(
                  1 + CAST(rec > qr.q1 AS INT) + CAST(rec > qr.q2 AS INT) + CAST(rec > qr.q3 AS INT),
                  '-',
                  1 + CAST(freq > qf.q1 AS INT) + CAST(freq > qf.q2 AS INT) + CAST(freq > qf.q3 AS INT),
                  '-',
                  1 + CAST(mon_c > qm.q1 AS INT) + CAST(mon_c > qm.q2 AS INT) + CAST(mon_c > qm.q3 AS INT)
                ) AS segment,
                count(*) AS n_customers, CAST(sum(mon_c) AS BIGINT) AS sum_mon_c
         FROM wr, qr, qf, qm
         GROUP BY 1 ORDER BY 1""",

    "interval_sweep_concurrency" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t_us FROM events),
         pts AS (
           SELECT event_type, t_us AS t, 1 AS delta FROM e
           UNION ALL
           SELECT event_type, t_us + 1800000000, -1 FROM e),
         run AS (
           SELECT event_type, delta,
                  sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                    ROWS UNBOUNDED PRECEDING) AS open
           FROM pts)
         SELECT event_type, CAST(max(open) AS BIGINT) AS max_concurrent,
                CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_intervals
         FROM run GROUP BY 1 ORDER BY 1""",

    "vocab_coverage" ->
      """WITH per_tok AS (
           SELECT lang, tok, count(*) AS c
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
           WHERE len(tok) > 0 GROUP BY 1, 2),
         hist AS (
           SELECT lang, c, count(*) AS n_toks, c * count(*) AS mass
           FROM per_tok GROUP BY 1, 2),
         cum AS (
           SELECT *, sum(mass) OVER (PARTITION BY lang ORDER BY c DESC
                       ROWS UNBOUNDED PRECEDING) AS cum_incl,
                  sum(n_toks) OVER (PARTITION BY lang ORDER BY c DESC
                       ROWS UNBOUNDED PRECEDING) AS toks_incl,
                  sum(mass) OVER (PARTITION BY lang) AS total
           FROM hist)
         SELECT lang, CAST(total AS BIGINT) AS total_tokens,
                CAST(toks_incl - n_toks +
                  (total * 95 - (cum_incl - mass) * 100 + c * 100 - 1) // (c * 100)
                AS BIGINT) AS vocab_95
         FROM cum
         WHERE cum_incl * 100 >= total * 95 AND (cum_incl - mass) * 100 < total * 95
         ORDER BY lang""",

    "winsorize_clamp_agg" ->
      """WITH fact AS (
           SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
           FROM lineitem),
         h AS (SELECT l_returnflag, price_c, count(*) AS c FROM fact GROUP BY 1, 2),
         cum AS (
           SELECT *, sum(c) OVER (PARTITION BY l_returnflag ORDER BY price_c) AS cum,
                  sum(c) OVER (PARTITION BY l_returnflag) AS n
           FROM h),
         bounds AS (
           SELECT l_returnflag,
                  min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN price_c END) AS lo_c,
                  min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN price_c END) AS hi_c
           FROM cum GROUP BY 1)
         SELECT f.l_returnflag, count(*) AS n, max(lo_c) AS lo_c, max(hi_c) AS hi_c,
                CAST(sum(greatest(least(price_c, hi_c), lo_c)) AS BIGINT) AS sum_winsor_c
         FROM fact f JOIN bounds b ON f.l_returnflag = b.l_returnflag
         GROUP BY 1 ORDER BY 1""",

    "text_pmi_bigrams" ->
      """WITH docs AS (SELECT string_split(text, ' ') AS w FROM documents),
         uni AS (
           SELECT tok, count(*) AS c
           FROM (SELECT unnest(w) AS tok FROM docs)
           WHERE len(tok) > 0 GROUP BY 1),
         u AS (SELECT sum(c) AS u FROM uni),
         bi AS (
           SELECT b['x'] AS x, b['y'] AS y, count(*) AS cxy
           FROM (SELECT unnest([struct_pack(x := w[i + 1], y := w[i + 2])
                   FOR i IN range(0, greatest(len(w) - 1, 1))]) AS b
                 FROM docs)
           WHERE len(b['x']) > 0 AND len(b['y']) > 0
           GROUP BY 1, 2 HAVING count(*) >= 5),
         n AS (SELECT sum(cxy) AS n FROM bi)
         SELECT x, y, cxy,
                CAST((CAST(cxy AS HUGEINT) * CAST(u.u AS HUGEINT) * CAST(u.u AS HUGEINT)
                        * CAST(1000000 AS HUGEINT))
                     // (CAST(n.n AS HUGEINT) * CAST(cx.c AS HUGEINT) * CAST(cy.c AS HUGEINT))
                AS BIGINT) AS pmi_e6
         FROM bi
         JOIN uni cx ON bi.x = cx.tok
         JOIN uni cy ON bi.y = cy.tok, u, n
         ORDER BY pmi_e6 DESC, x, y LIMIT 20""",

    "dedup_repeated_ngrams" ->
      """WITH d5 AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
         corpus AS (
           SELECT doc_id, text FROM d5
           UNION ALL
           SELECT doc_id + 1000000,
                  array_to_string(w[1:greatest(CAST(len(w) // 2 AS INT), 1)], ' ')
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d5)),
         grams AS (
           SELECT DISTINCT doc_id, gram
           FROM (SELECT doc_id,
                        unnest([array_to_string(w[i + 1:i + 8], ' ')
                          FOR i IN range(0, greatest(len(w) - 7, 0))]) AS gram
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
                 WHERE len(w) >= 8))
         SELECT gram, count(*) AS n_docs
         FROM grams GROUP BY 1 HAVING count(*) >= 2
         ORDER BY n_docs DESC, gram LIMIT 50""",

    "bucketed_join_colocated" ->
      """WITH per AS (
           SELECT o_custkey, count(*) AS n_orders,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_c
           FROM orders GROUP BY 1)
         SELECT c_mktsegment, count(*) AS n_customers,
                CAST(sum(n_orders) AS BIGINT) AS n_orders,
                CAST(sum(sum_c) AS BIGINT) AS revenue_c
         FROM customer JOIN per ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",

    "quantile_normalize_rank" ->
      """WITH h AS (
           SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS qty, count(*) AS c
           FROM lineitem GROUP BY 1, 2)
         SELECT l_returnflag, qty, c,
                CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY qty
                  ROWS UNBOUNDED PRECEDING) * 1000000
                  // sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS pct_ppm
         FROM h ORDER BY l_returnflag, qty""",

    "data_skew_report" ->
      """WITH rep AS (
           SELECT * FROM (
             WITH per AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
             hist AS (SELECT c, count(*) AS n_keys, c * count(*) AS mass FROM per GROUP BY 1),
             cum AS (
               SELECT *, sum(n_keys) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING) AS ckd,
                      sum(mass) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING) AS cmd,
                      sum(n_keys) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cka,
                      sum(n_keys) OVER () AS tot_keys
               FROM hist),
             a AS (
               SELECT sum(mass) AS n_rows, sum(n_keys) AS n_keys, max(c) AS max_n,
                      max(CASE WHEN ckd >= 10 AND ckd - n_keys < 10
                        THEN cmd - mass + (10 - (ckd - n_keys)) * c END) AS top10_n,
                      min(CASE WHEN cka * 100 >= tot_keys * 99 THEN c END) AS p99_n
               FROM cum)
             SELECT 'events.user_id' AS key_col,
                    CAST(n_rows AS BIGINT) AS n_rows,
                    CAST(n_keys AS BIGINT) AS n_keys, max_n,
                    CAST(max_n * 1000000 // n_rows AS BIGINT) AS top1_ppm,
                    CAST(coalesce(top10_n, n_rows) * 1000000 // n_rows AS BIGINT) AS top10_ppm,
                    p99_n,
                    CAST(CAST(max_n AS HUGEINT) * n_keys * 1000000 // n_rows AS BIGINT) AS skew_x_ppm
             FROM a)
           UNION ALL
           SELECT * FROM (
             WITH per AS (SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
             hist AS (SELECT c, count(*) AS n_keys, c * count(*) AS mass FROM per GROUP BY 1),
             cum AS (
               SELECT *, sum(n_keys) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING) AS ckd,
                      sum(mass) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING) AS cmd,
                      sum(n_keys) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cka,
                      sum(n_keys) OVER () AS tot_keys
               FROM hist),
             a AS (
               SELECT sum(mass) AS n_rows, sum(n_keys) AS n_keys, max(c) AS max_n,
                      max(CASE WHEN ckd >= 10 AND ckd - n_keys < 10
                        THEN cmd - mass + (10 - (ckd - n_keys)) * c END) AS top10_n,
                      min(CASE WHEN cka * 100 >= tot_keys * 99 THEN c END) AS p99_n
               FROM cum)
             SELECT 'lineitem.l_suppkey',
                    CAST(n_rows AS BIGINT), CAST(n_keys AS BIGINT), max_n,
                    CAST(max_n * 1000000 // n_rows AS BIGINT),
                    CAST(coalesce(top10_n, n_rows) * 1000000 // n_rows AS BIGINT),
                    p99_n,
                    CAST(CAST(max_n AS HUGEINT) * n_keys * 1000000 // n_rows AS BIGINT)
             FROM a))
         SELECT * FROM rep ORDER BY key_col""",

    "events_time_weighted_avg" ->
      """WITH e AS (
           SELECT event_type, event_id, epoch_us(ts) AS t_us,
                  CAST(round(value * 1000000) AS BIGINT) AS v_e6
           FROM events),
         seg AS (
           SELECT event_type, v_e6,
                  lead(t_us) OVER (PARTITION BY event_type
                    ORDER BY t_us, event_id) - t_us AS dt
           FROM e)
         SELECT event_type, count(*) AS n_segments,
                CAST(sum(CAST(v_e6 AS HUGEINT) * CAST(dt AS HUGEINT))
                     // sum(CAST(dt AS HUGEINT)) AS BIGINT) AS twa_e6
         FROM seg WHERE dt IS NOT NULL
         GROUP BY 1 ORDER BY 1""",

    "user_activity_streaks" ->
      """WITH days AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         isl AS (
           SELECT user_id,
                  day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp
           FROM days),
         runs AS (
           SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_islands,
                CAST(max(len) AS BIGINT) AS max_streak,
                CAST(sum(len) AS BIGINT) AS active_days
         FROM runs GROUP BY 1 ORDER BY 1""",

    "feature_binning_deciles" ->
      """WITH fact AS (
           SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
           FROM lineitem),
         h AS (SELECT l_returnflag, price_c, count(*) AS c FROM fact GROUP BY 1, 2),
         cum AS (
           SELECT *, sum(c) OVER (PARTITION BY l_returnflag ORDER BY price_c) AS cum,
                  sum(c) OVER (PARTITION BY l_returnflag) AS n
           FROM h),
         bounds AS (
           SELECT l_returnflag,
                  min(CASE WHEN cum >= (n * 1 + 9) // 10 THEN price_c END) AS d1,
                  min(CASE WHEN cum >= (n * 2 + 9) // 10 THEN price_c END) AS d2,
                  min(CASE WHEN cum >= (n * 3 + 9) // 10 THEN price_c END) AS d3,
                  min(CASE WHEN cum >= (n * 4 + 9) // 10 THEN price_c END) AS d4,
                  min(CASE WHEN cum >= (n * 5 + 9) // 10 THEN price_c END) AS d5,
                  min(CASE WHEN cum >= (n * 6 + 9) // 10 THEN price_c END) AS d6,
                  min(CASE WHEN cum >= (n * 7 + 9) // 10 THEN price_c END) AS d7,
                  min(CASE WHEN cum >= (n * 8 + 9) // 10 THEN price_c END) AS d8,
                  min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN price_c END) AS d9
           FROM cum GROUP BY 1)
         SELECT f.l_returnflag,
                1 + CAST(price_c > d1 AS INT) + CAST(price_c > d2 AS INT)
                  + CAST(price_c > d3 AS INT) + CAST(price_c > d4 AS INT)
                  + CAST(price_c > d5 AS INT) + CAST(price_c > d6 AS INT)
                  + CAST(price_c > d7 AS INT) + CAST(price_c > d8 AS INT)
                  + CAST(price_c > d9 AS INT) AS bin,
                count(*) AS n, CAST(sum(price_c) AS BIGINT) AS sum_c
         FROM fact f JOIN bounds b ON f.l_returnflag = b.l_returnflag
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "robust_mad_outliers" ->
      """WITH fact AS (
           SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
           FROM lineitem),
         med AS (
           SELECT l_returnflag,
                  min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med_c
           FROM (SELECT l_returnflag, v, sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
                        sum(c) OVER (PARTITION BY l_returnflag) AS n
                 FROM (SELECT l_returnflag, price_c AS v, count(*) AS c FROM fact GROUP BY 1, 2))
           GROUP BY 1),
         dev AS (
           SELECT f.l_returnflag, price_c, med_c, abs(price_c - med_c) AS adev
           FROM fact f JOIN med m ON f.l_returnflag = m.l_returnflag),
         mad AS (
           SELECT l_returnflag,
                  min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS mad_c
           FROM (SELECT l_returnflag, v, sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
                        sum(c) OVER (PARTITION BY l_returnflag) AS n
                 FROM (SELECT l_returnflag, adev AS v, count(*) AS c FROM dev GROUP BY 1, 2))
           GROUP BY 1)
         SELECT d.l_returnflag, count(*) AS n, max(d.med_c) AS med_c,
                max(mad.mad_c) AS mad_c,
                CAST(sum(CASE WHEN adev > mad.mad_c * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM dev d JOIN mad ON d.l_returnflag = mad.l_returnflag
         GROUP BY 1 ORDER BY 1""",

    "profile_table_stats" ->
      """WITH proj AS (
           SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
                  CAST(o_custkey AS VARCHAR) AS o_custkey,
                  o_orderstatus,
                  CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) AS price_c,
                  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
                  o_orderpriority
           FROM orders)
         SELECT 'o_custkey' AS col_name, count(*) AS n, count(o_custkey) AS n_nonnull,
                count(DISTINCT o_custkey) AS n_distinct,
                min(o_custkey) AS min_s, max(o_custkey) AS max_s FROM proj
         UNION ALL
         SELECT 'o_orderdate', count(*), count(o_orderdate), count(DISTINCT o_orderdate),
                min(o_orderdate), max(o_orderdate) FROM proj
         UNION ALL
         SELECT 'o_orderkey', count(*), count(o_orderkey), count(DISTINCT o_orderkey),
                min(o_orderkey), max(o_orderkey) FROM proj
         UNION ALL
         SELECT 'o_orderpriority', count(*), count(o_orderpriority), count(DISTINCT o_orderpriority),
                min(o_orderpriority), max(o_orderpriority) FROM proj
         UNION ALL
         SELECT 'o_orderstatus', count(*), count(o_orderstatus), count(DISTINCT o_orderstatus),
                min(o_orderstatus), max(o_orderstatus) FROM proj
         UNION ALL
         SELECT 'price_c', count(*), count(price_c), count(DISTINCT price_c),
                min(price_c), max(price_c) FROM proj
         ORDER BY col_name""",
  )
}
