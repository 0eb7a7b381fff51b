package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 relational/source coverage batch (same driver contract and
  * hash-compare conventions as [[Queries]]): null-aware anti join,
  * correlated EXISTS, RANGE window frames, rank-family windows,
  * date/string/regex scalar surfaces, histogramming, latest-record
  * dedup, upsert-merge, cross join, and source-format round-trips
  * (JSON / CSV / ORC).
  *
  * Scale notes are on each query; the recurring ones:
  *  - NOT IN over a nullable key plans a null-aware anti join — at
  *    scale Spark broadcasts the (small, deduped) inner side rather
  *    than shuffling the fact table;
  *  - latest-record-per-key is one hash shuffle + in-partition sort
  *    (no global sort before the filter);
  *  - the merge shape is the standard incremental-upsert join: at
  *    100 TB the base side is bucketed/partitioned so only changed
  *    partitions rewrite.
  */
object Queries2 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(s"v2_$n"))

  /** NOT IN (subquery) with a NULLABLE inner expression — the
    * null-aware anti join (three-valued logic: any inner NULL would
    * empty the result; Spark plans BroadcastNestedLoop/NullAwareAnti
    * instead of a plain left_anti). The inner side here is nullable by
    * type but never null in practice, so the semantics stay testable.
    */
  private def nullAwareAntiJoin(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "orders", "customer")
    s.sql("""
      SELECT o_orderkey, o_custkey FROM v2_orders
      WHERE o_custkey NOT IN
        (SELECT nullif(c_custkey, -1) FROM v2_customer WHERE c_acctbal < 0)
      ORDER BY o_orderkey""")
  }

  /** Correlated EXISTS + NOT EXISTS in one predicate — Catalyst
    * rewrites to a semi join and an anti join on the same fact.
    */
  private def existsCorrelated(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "orders", "customer")
    s.sql("""
      SELECT c_custkey, c_name FROM v2_customer c
      WHERE EXISTS (SELECT 1 FROM v2_orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        AND NOT EXISTS (SELECT 1 FROM v2_orders o2
                        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
      ORDER BY c_custkey""")
  }

  /** RANGE window frame (value-based, not row-based): per customer,
    * how many of their orders fall within $10k below this order's
    * price, and their exact cent total. Peers (price ties) enter the
    * frame together, so the result is deterministic without a unique
    * sort key.
    */
  private def windowRangeFrame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
      .withColumn("n_in_band",
        expr("""count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)"""))
      .withColumn("band_cents",
        expr("""sum(price_c) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)"""))
      .select(col("o_orderkey"), col("o_custkey"), col("n_in_band"), col("band_cents"))
      .orderBy("o_orderkey")

  /** Rank-family windows: percent_rank and cume_dist (each a single
    * exact integer division, so bit-identical across engines) over a
    * unique in-partition order.
    */
  private def percentRankCumeDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_orderkey")
  }

  /** Date/time scalar surface: component extraction, truncation,
    * month arithmetic, day diffs — rendered to strings/ints so both
    * engines hash identically (TESTDATA timestamps are UTC).
    */
  private def datetimeFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("y"),
        quarter(col("o_orderdate")).cast("int").as("q"),
        month(col("o_orderdate")).cast("int").as("m"),
        dayofmonth(col("o_orderdate")).cast("int").as("d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(add_months(to_date(col("o_orderdate")), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("int").as("days_since"))
      .orderBy("o_orderkey")

  /** String scalar surface: pad/trim/slice/replace/search/repeat —
    * the projection-only shape stays inside one WholeStageCodegen.
    */
  private def stringFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"),
        element_at(split(col("c_name"), "_"), -1).as("name_num"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        instr(col("c_name"), "_").cast("int").as("us_pos"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        repeat(col("c_mktsegment").substr(1, 2), 2).as("seg2x"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
      .orderBy("c_custkey")

  /** Regex surface over the events props JSON-ish strings: extract,
    * count, boolean match — all engine-portable digit/word classes.
    */
  private def regexpFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        regexp_extract(col("props"), "([0-9]+)", 1).as("first_num"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("int").as("n_nums"),
        col("props").rlike("[a-z]+_[a-z]+").as("has_snake"))
      .orderBy("event_id")

  /** Fixed-width histogram: integer bucketing (floor of an exact
    * division) then count/min/max per bucket — the group-by is over
    * ~25 buckets, so partial aggregation collapses almost everything
    * map-side.
    */
  private def histogramFixedBins(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(floor(col("o_totalprice") / 25000.0).cast("int").as("bucket"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("price_c")).as("min_c"),
        max(col("price_c")).as("max_c"))
      .orderBy("bucket")

  /** Latest-record-per-key (the QUALIFY idiom): one shuffle on the
    * key, in-partition sort, keep row_number()=1 — the standard CDC
    * "current snapshot" compaction. No global sort.
    */
  private def latestRecordPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"))
      .orderBy("o_custkey")
  }

  /** Cross join of the two dimension tables — the one shape where a
    * cartesian product is the RIGHT plan (both sides tiny; Spark picks
    * BroadcastNestedLoopJoin).
    */
  private def crossJoinDims(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").select(col("r_name"))
      .crossJoin(broadcast(t(s, dir, "nation").select(col("n_name"))))
      .orderBy("r_name", "n_name")

  /** Incremental upsert (MERGE INTO semantics) as a full-outer join:
    * base = committed snapshot, updates = the change batch; output is
    * the merged snapshot plus the action taken per key. At scale the
    * base is bucketed on the key so only matched buckets rewrite.
    */
  private def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("price_c"))
    val base = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey").as("b_key"), col("price_c").as("b_price"))
    val updates = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("u_key"), (col("price_c") + 100000L).as("u_price"))
    base.join(updates, col("b_key") === col("u_key"), "full_outer")
      .select(
        coalesce(col("b_key"), col("u_key")).as("o_orderkey"),
        coalesce(col("u_price"), col("b_price")).as("price_c"),
        when(col("b_key").isNull, "insert")
          .when(col("u_key").isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy("o_orderkey")
  }

  /** Exact 3σ outlier flagging without floating point: |x−μ| > 3σ is
    * cross-multiplied into (n·x − S)² > 9·(n·Q − S²) over integer
    * cents (S=Σx, Q=Σx²), evaluated in DECIMAL(38,0) — bit-exact on
    * any engine and any partitioning, where a float mean/stddev pair
    * would be neither. One partial-agg'd shuffle for the per-group
    * moments, broadcast back over the fact. (Decimal38 holds the
    * cross-terms up to ~1e12 rows per group at cents scale; beyond
    * that, widen to the two-pass float form with a tolerance.)
    */
  private def eventsOutlier3Sigma(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("v_c"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("s"),
        sum(col("v_c") * col("v_c")).as("q"))
    val d = "decimal(38,0)"
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("lhs",
        (col("n").cast(d) * col("v_c").cast(d) - col("s").cast(d)) *
        (col("n").cast(d) * col("v_c").cast(d) - col("s").cast(d)))
      .withColumn("rhs",
        lit(9).cast(d) * (col("n").cast(d) * col("q").cast(d) -
          col("s").cast(d) * col("s").cast(d)))
      .select(col("event_id"), col("event_type"), col("v_c"),
        (col("lhs") > col("rhs")).as("is_outlier"))
      .orderBy("event_id")
  }

  /** rank / dense_rank side by side (ties on o_totalprice cents make
    * them diverge — rank skips, dense_rank doesn't).
    */
  private def rankDenseRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_c").desc)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .orderBy("o_orderkey")
  }

  /** Exact integer moments: n, Σx, Σx² per group over the small-domain
    * quantity column — the building blocks of mean/variance/stddev,
    * kept in bigint so the distributed partial aggregation is
    * bit-exact regardless of partition order (float moment aggregates
    * are famously non-associative).
    */
  private def statsMoments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), round(col("l_quantity")).cast("long").as("qty"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).as("sum_x"),
        sum(col("qty") * col("qty")).as("sum_x2"),
        min(col("qty")).as("min_x"),
        max(col("qty")).as("max_x"))
      .orderBy("l_returnflag")

  /** explode_outer: rows with EMPTY arrays survive as a null element —
    * the 1-row-minimum contract a flattening ingest needs (plain
    * explode silently drops empty-array parents).
    */
  private def explodeOuterEmpty(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      // every 7th doc gets an empty token array to exercise the outer branch
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, array().cast("array<string>"))
          .otherwise(slice(split(col("text"), " "), 1, 3)).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("tok")).as("n_toks"))
      .orderBy("doc_id")

  /** Change log → SCD-2 dimension: per key ordered by change time,
    * each record's validity interval is [its own date, the next
    * record's date), open-ended (and flagged current) for the latest.
    * One hash shuffle + in-partition sort (lead window) — the
    * standard warehouse history-table build, sibling of
    * latest_record_per_key which keeps only the final state.
    */
  private def scd2FromChanges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate"))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("next_date"), "yyyy-MM-dd"), lit("9999-12-31"))
          .as("valid_to"),
        col("next_date").isNull.as("is_current"))
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  /** Sliding ROWS frame: 5-row moving sum/count per customer — the
    * bounded-frame sibling of the running (unbounded) sum key. Exact
    * cents; the average is a single int/int division (bit-identical
    * across engines).
    */
  private def windowMovingAvg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
      .withColumn("mov_sum_c",
        expr("""sum(price_c) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"""))
      .withColumn("mov_n",
        expr("""count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"""))
      .select(col("o_orderkey"), col("o_custkey"), col("mov_sum_c"), col("mov_n"),
        (col("mov_sum_c").cast("double") / col("mov_n")).as("mov_avg_c"))
      .orderBy("o_orderkey")

  /** first_value / last_value / nth_value over the full partition
    * frame (explicit UNBOUNDED FOLLOWING — the default frame would
    * make last_value degenerate to the current row).
    */
  private def windowFirstLastNth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .withColumn("first_key",
        expr("""first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))
      .withColumn("last_key",
        expr("""last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))
      .withColumn("second_key",
        expr("""nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))
      .orderBy("o_orderkey")

  /** Time-series gap fill: hourly event counts per type, with missing
    * (type, hour) cells materialized as zero via a generated dense
    * hour grid (sequence + explode) left-joined to the sparse counts.
    * The grid is hours × types (tiny — broadcast side); the counts
    * aggregate is the only real shuffle.
    */
  private def timeseriesGapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"),
        date_trunc("hour", graft.sources.Tables.eventTs(col("ts"))).as("h"))
    val counts = ev.groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("n"))
    val span = ev.agg(min(col("h")).as("h_min"), max(col("h")).as("h_max"))
    val grid = span
      .select(explode(expr("sequence(h_min, h_max, interval 1 hour)")).as("h"))
      .crossJoin(broadcast(ev.select(col("event_type")).distinct()))
    grid.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "hour")
  }

  // --- source-format round-trips: write the engine's sink format, read
  // it back through the matching source, aggregate — proves the
  // schema/value fidelity of each connector (oracle aggregates the
  // original parquet). Round-trip dirs are per-JVM temp paths.

  private def roundtripDir(fmt: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_rt_$fmt"

  /** JSON lines round-trip over documents (strings + bigints; JSON
    * escaping covers the newline-free corpus text).
    */
  private def jsonSourceRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = roundtripDir("json")
    t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").json(path)
    s.read.json(path)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  /** CSV round-trip over orders (quoting/escaping exercised by the
    * string columns; schema re-imposed on read — header-only inference
    * would widen everything to string).
    */
  private def csvSourceRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = roundtripDir("csv")
    val src = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
    src.write.mode("overwrite").option("header", "true").csv(path)
    s.read.schema(src.schema).option("header", "true").csv(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_c"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy("o_orderstatus")
  }

  /** Hive-style partitioned parquet + partition pruning: write orders
    * partitioned by status, read back with a status filter, and verify
    * the aggregate. The point is the PLAN (pinned in SourcesSpec): the
    * filter must become a PartitionFilter on the scan — directory-level
    * pruning that never opens the other partitions' files — which at
    * 100 TB is the difference between scanning 1/k of the table and all
    * of it. Values are oracle-checked against the unpartitioned table.
    */
  private def partitionedParquetPruning(s: SparkSession, dir: String): DataFrame = {
    val path = roundtripDir("part_parquet")
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"),
        col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    s.read.parquet(path)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_c"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy("o_custkey")
  }

  /** Parquet schema evolution: two writers with DIFFERENT schemas (v2
    * adds a column) land in one dataset; `mergeSchema` reconciles the
    * footer schemas at read time and back-fills the missing column with
    * nulls — how a long-lived 100 TB table absorbs schema change
    * without rewriting history. Values oracle-checked against the
    * equivalent union-with-null.
    */
  private def parquetSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val path = roundtripDir("evolve_parquet")
    val o = t(s, dir, "orders")
    val v1 = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val v2 = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
    v1.write.mode("overwrite").parquet(s"$path/v=1")
    v2.write.mode("overwrite").parquet(s"$path/v=2")
    s.read.option("mergeSchema", "true").parquet(s"$path/v=1", s"$path/v=2")
      .groupBy((col("o_orderkey") % 100).as("key_mod"))
      .agg(count(lit(1)).as("n"),
        count(col("price_c")).as("n_with_price"),
        sum(coalesce(col("price_c"), lit(0L))).as("sum_c"))
      .orderBy("key_mod")
  }

  /** ORC round-trip over lineitem (the other columnar format Spark
    * ships a vectorized reader for).
    */
  private def orcSourceRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = roundtripDir("orc")
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_c"))
      .orderBy("l_returnflag")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "null_aware_anti_join" -> nullAwareAntiJoin _,
    "exists_correlated" -> existsCorrelated _,
    "window_range_frame" -> windowRangeFrame _,
    "percent_rank_cume_dist" -> percentRankCumeDist _,
    "datetime_functions" -> datetimeFunctions _,
    "string_functions" -> stringFunctions _,
    "regexp_functions" -> regexpFunctions _,
    "histogram_fixed_bins" -> histogramFixedBins _,
    "latest_record_per_key" -> latestRecordPerKey _,
    "cross_join_dims" -> crossJoinDims _,
    "merge_upsert" -> mergeUpsert _,
    "events_outlier_3sigma" -> eventsOutlier3Sigma _,
    "rank_dense_rank" -> rankDenseRank _,
    "stats_moments" -> statsMoments _,
    "explode_outer_empty" -> explodeOuterEmpty _,
    "scd2_from_changes" -> scd2FromChanges _,
    "window_moving_avg" -> windowMovingAvg _,
    "window_first_last_nth" -> windowFirstLastNth _,
    "timeseries_gap_fill" -> timeseriesGapFill _,
    "json_source_roundtrip" -> jsonSourceRoundtrip _,
    "csv_source_roundtrip" -> csvSourceRoundtrip _,
    "orc_source_roundtrip" -> orcSourceRoundtrip _,
    "partitioned_parquet_pruning" -> partitionedParquetPruning _,
    "parquet_schema_evolution" -> parquetSchemaEvolution _,
  )

  val oracles: Map[String, String] = Map(
    "null_aware_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey NOT IN
           (SELECT nullif(c_custkey, -1) FROM customer WHERE c_acctbal < 0)
         ORDER BY o_orderkey""",

    "exists_correlated" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
         ORDER BY c_custkey""",

    "window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_in_band,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS band_cents
         FROM orders ORDER BY o_orderkey""",

    "percent_rank_cume_dist" ->
      """SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS pr,
           cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS cd
         FROM orders ORDER BY o_orderkey""",

    "datetime_functions" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT) AS days_since
         FROM orders ORDER BY o_orderkey""",

    "string_functions" ->
      """SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
           string_split(c_name, '_')[-1] AS name_num,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
           CAST(strpos(c_name, '_') AS INT) AS us_pos,
           reverse(c_mktsegment) AS seg_rev,
           repeat(substr(c_mktsegment, 1, 2), 2) AS seg2x,
           concat_ws('|', c_mktsegment, c_name) AS joined
         FROM customer ORDER BY c_custkey""",

    "regexp_functions" ->
      """SELECT event_id,
           coalesce(regexp_extract(props, '([0-9]+)', 1), '') AS first_num,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_nums,
           regexp_matches(props, '[a-z]+_[a-z]+') AS has_snake
         FROM events ORDER BY event_id""",

    "histogram_fixed_bins" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS INT) AS bucket,
           count(*) AS n,
           min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_c,
           max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_c
         FROM orders GROUP BY 1 ORDER BY bucket""",

    "latest_record_per_key" ->
      """SELECT o_custkey, o_orderkey, latest_date FROM (
           SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1 ORDER BY o_custkey""",

    "cross_join_dims" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",

    "merge_upsert" ->
      """WITH o AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
                    FROM orders),
         base AS (SELECT o_orderkey AS b_key, price_c AS b_price FROM o
                  WHERE o_orderkey % 3 != 0),
         updates AS (SELECT o_orderkey AS u_key, price_c + 100000 AS u_price FROM o
                     WHERE o_orderkey % 2 = 0)
         SELECT coalesce(b_key, u_key) AS o_orderkey,
           coalesce(u_price, b_price) AS price_c,
           CASE WHEN b_key IS NULL THEN 'insert'
                WHEN u_key IS NULL THEN 'keep'
                ELSE 'update' END AS action
         FROM base FULL OUTER JOIN updates ON b_key = u_key
         ORDER BY o_orderkey""",

    "events_outlier_3sigma" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS v_c
           FROM events),
         st AS (
           SELECT event_type, count(*) AS n, sum(v_c) AS s, sum(v_c * v_c) AS q
           FROM ev GROUP BY event_type)
         SELECT ev.event_id, ev.event_type, ev.v_c,
           (CAST(st.n AS HUGEINT) * ev.v_c - CAST(st.s AS HUGEINT))
             * (CAST(st.n AS HUGEINT) * ev.v_c - CAST(st.s AS HUGEINT))
             > 9 * (CAST(st.n AS HUGEINT) * CAST(st.q AS HUGEINT)
                    - CAST(st.s AS HUGEINT) * CAST(st.s AS HUGEINT)) AS is_outlier
         FROM ev JOIN st USING (event_type)
         ORDER BY event_id""",

    "rank_dense_rank" ->
      """SELECT o_orderkey, o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC)
         ORDER BY o_orderkey""",

    "stats_moments" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_x,
           CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_x2,
           min(CAST(round(l_quantity) AS BIGINT)) AS min_x,
           max(CAST(round(l_quantity) AS BIGINT)) AS max_x
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "explode_outer_empty" ->
      """WITH t AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN []
                  ELSE string_split(text, ' ')[1:3] END AS toks
           FROM documents),
         x AS (SELECT doc_id, unnest(
                 CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS tok
               FROM t)
         SELECT doc_id, count(*) AS n_rows, count(tok) AS n_toks
         FROM x GROUP BY doc_id ORDER BY doc_id""",

    "scd2_from_changes" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           coalesce(strftime(next_date, '%Y-%m-%d'), '9999-12-31') AS valid_to,
           next_date IS NULL AS is_current
         FROM (
           SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
             lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS next_date
           FROM orders)
         ORDER BY o_custkey, valid_from, o_orderkey""",

    "window_moving_avg" ->
      """SELECT o_orderkey, o_custkey, mov_sum_c, mov_n,
           CAST(mov_sum_c AS DOUBLE) / mov_n AS mov_avg_c
         FROM (
           SELECT o_orderkey, o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum_c,
             count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mov_n
           FROM orders) ORDER BY o_orderkey""",

    "window_first_last_nth" ->
      """SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderkey""",

    "timeseries_gap_fill" ->
      """WITH ev AS (
           SELECT event_type, date_trunc('hour', ts) AS h FROM events),
         counts AS (
           SELECT event_type, h, count(*) AS n FROM ev GROUP BY event_type, h),
         span AS (SELECT min(h) AS h_min, max(h) AS h_max FROM ev),
         grid AS (
           SELECT t.event_type, g.h
           FROM span, unnest(generate_series(span.h_min, span.h_max, INTERVAL 1 HOUR)) AS g(h)
           CROSS JOIN (SELECT DISTINCT event_type FROM ev) t)
         SELECT grid.event_type,
           strftime(grid.h, '%Y-%m-%d %H:00') AS hour,
           coalesce(counts.n, 0) AS n
         FROM grid LEFT JOIN counts
           ON grid.event_type = counts.event_type AND grid.h = counts.h
         ORDER BY grid.event_type, hour""",

    "json_source_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM documents GROUP BY lang ORDER BY lang""",

    "csv_source_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           min(o_orderkey) AS min_key
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "orc_source_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "partitioned_parquet_pruning" ->
      """SELECT o_custkey, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           min(o_orderkey) AS min_key
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY o_custkey ORDER BY o_custkey""",

    "parquet_schema_evolution" ->
      """WITH merged AS (
           SELECT o_orderkey, CAST(NULL AS BIGINT) AS price_c
           FROM orders WHERE o_orderkey % 2 = 0
           UNION ALL
           SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
           FROM orders WHERE o_orderkey % 2 = 1)
         SELECT o_orderkey % 100 AS key_mod, count(*) AS n,
                count(price_c) AS n_with_price,
                CAST(sum(coalesce(price_c, 0)) AS BIGINT) AS sum_c
         FROM merged GROUP BY 1 ORDER BY 1""",
  )
}
