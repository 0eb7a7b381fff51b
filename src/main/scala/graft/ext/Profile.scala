package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data diagnostics: per-column profiling and join-key skew reports.
  * Both run on count histograms — one fact scan plus tiny aggregates —
  * so they are cheap enough to run routinely before big pipelines (the
  * skew report is the decision input for plain shuffle vs AQE skew
  * splitting vs [[Scale.saltedJoin]]). Backing engines for the
  * `profile_table_stats` / `data_skew_report` registry keys and the
  * CLI `profile` / `skew` subcommands.
  */
object Profile {

  /** Per-column completeness / cardinality / extrema over an arbitrary
    * frame (columns stringified by the caller or here via cast). ONE
    * scan: stack() to (col, value) long form, then the two-level
    * histogram aggregate — partial map-side (col, value) counts shrink
    * the shuffle to |distinct values| rows; a multi-countDistinct
    * aggregate would Expand the scan |columns|× instead. At 100 TB
    * swap the exact distincts for HLL sketches; the shape stays.
    */
  def table(df: DataFrame): DataFrame = {
    val proj = df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)
    val cols = proj.columns.toSeq
    val stackExpr = cols.map(c => s"'$c', `$c`").mkString(", ")
    proj
      .select(expr(s"stack(${cols.size}, $stackExpr) as (col_name, value)"))
      .groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("col_name"))
      .agg(sum(col("c")).as("n"),
        sum(when(col("value").isNotNull, col("c")).otherwise(0L)).as("n_nonnull"),
        count(col("value")).as("n_distinct"),
        min(col("value")).as("min_s"),
        max(col("value")).as("max_s"))
      .orderBy("col_name")
  }

  /** Join/aggregation skew facts for one key column: cardinality, max
    * per-key fanout, top-1/top-10 row share (exact ppm; the top-10
    * share takes whole count levels from the top plus an exact partial
    * take at the boundary level), p99 per-key count, and the max/avg
    * ratio in decimal(38) (1e6-row hot key × 1e9 keys × 1e6 wraps a
    * long). Null keys count as a real key — they hash to one partition
    * like any other value, which is exactly the classic skew case.
    */
  def skew(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val perKey = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    val hist = perKey.groupBy(col("c")).agg(count(lit(1)).as("n_keys"))
      .withColumn("mass", col("c") * col("n_keys"))
    val wDesc = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum_keys_desc", sum(col("n_keys")).over(wDesc))
      .withColumn("cum_mass_desc", sum(col("mass")).over(wDesc))
      .withColumn("cum_keys_asc", sum(col("n_keys")).over(wAsc))
      .withColumn("tot_keys", sum(col("n_keys")).over(Window.partitionBy()))
      .agg(
        sum(col("mass")).as("n_rows"),
        sum(col("n_keys")).as("n_keys"),
        max(col("c")).as("max_n"),
        max(when(col("cum_keys_desc") >= 10 &&
            col("cum_keys_desc") - col("n_keys") < 10,
          col("cum_mass_desc") - col("mass")
            + (lit(10) - (col("cum_keys_desc") - col("n_keys"))) * col("c")))
          .as("top10_n"),
        min(when(col("cum_keys_asc") * 100 >= col("tot_keys") * 99, col("c")))
          .as("p99_n"))
      .select(
        lit(label).as("key_col"), col("n_rows"), col("n_keys"), col("max_n"),
        expr("max_n * 1000000 div n_rows").as("top1_ppm"),
        expr("coalesce(top10_n, n_rows) * 1000000 div n_rows").as("top10_ppm"),
        col("p99_n"),
        expr("cast(max_n as decimal(38,0)) * n_keys * 1000000 div n_rows")
          .as("skew_x_ppm"))
  }

  /** Deequ-style data-quality expectations — the constraint suite a
    * pipeline runs before publishing a dataset version: primary-key
    * uniqueness, referential integrity, domain ranges, null budgets,
    * freshness. Uniform contract per check row: `observed <= threshold`
    * ⇔ `passed`, everything exact integers, so the report is
    * engine-reproducible and diffable across runs (the reference's
    * schema-diff idea applied to DATA invariants).
    *
    * Scale shape: each check is one aggregate over its table (the two
    * referential checks are anti-join counts — hash join on the key,
    * null-safe); checks union into a constant-width report frame.
    * No driver-side evaluation: the verdict column is computed in the
    * plan.
    */
  def expectations(
      orders: DataFrame,
      lineitem: DataFrame,
      customer: DataFrame,
      events: DataFrame,
      documents: DataFrame): DataFrame = {
    def check(name: String, table: String, observed: DataFrame, threshold: Long): DataFrame =
      observed.select(
        lit(name).as("check"), lit(table).as("table_name"),
        col("observed").cast("long").as("observed"),
        lit(threshold).as("threshold"),
        (col("observed") <= threshold).as("passed"))

    val pkDup = orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).agg(count(lit(1)).as("observed"))
    val fkLineOrders = lineitem.join(orders.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("observed"))
    val fkOrdersCust = orders.join(customer.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("observed"))
    val qtyRange = lineitem
      .filter(col("l_quantity") < 1 || col("l_quantity") > 50)
      .agg(count(lit(1)).as("observed"))
    val nullCust = orders.filter(col("o_custkey").isNull)
      .agg(count(lit(1)).as("observed"))
    val negValue = events.filter(col("value") < 0)
      .agg(count(lit(1)).as("observed"))
    val emptyDocPpm = documents.agg(
      expr("sum(case when length(text) = 0 then 1 else 0 end) * 1000000 div count(1)")
        .as("observed"))
    // freshness: days from the newest shipment to a fixed reference day
    // (2002-01-01 = epoch day 11688); stale pipelines exceed the budget
    val staleDays = lineitem.agg(
      (lit(11688L) - max(datediff(col("l_shipdate"), lit("1970-01-01")))).as("observed"))

    check("pk_unique_violations", "orders", pkDup, 0)
      .unionByName(check("fk_orphans", "lineitem->orders", fkLineOrders, 0))
      .unionByName(check("fk_orphans", "orders->customer", fkOrdersCust, 0))
      .unionByName(check("quantity_out_of_range", "lineitem", qtyRange, 0))
      .unionByName(check("null_custkey", "orders", nullCust, 0))
      .unionByName(check("negative_value", "events", negValue, 0))
      .unionByName(check("empty_doc_ppm", "documents", emptyDocPpm, 50000))
      .unionByName(check("staleness_days", "lineitem", staleDays, 365))
  }
}
