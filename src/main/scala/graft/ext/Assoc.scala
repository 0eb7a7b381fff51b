package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association / co-occurrence mining: the market-basket primitives
  * (support, confidence, lift) over both the event stream (which event
  * types co-occur within a user) and the order lines (which parts are
  * co-purchased) — reference `check.rs` diffs entity SETS per table;
  * these generalize set co-membership to scored association rules.
  *
  * Scale design: pair generation is NEVER a self-join of the fact
  * table. Each basket's item set is collected in one shuffle keyed by
  * the basket id, and id-ordered pairs explode in place — quadratic
  * only in BASKET size (bounded: an order has ≤ ~40 parts, a user has
  * ≤ |event types|), linear in basket count. The per-item totals the
  * scores need are a second small aggregate, broadcast back onto the
  * pair frame. All scores ship as exact ppm integers (floor division),
  * so any engine reproduces them bit-for-bit.
  */
object Assoc {

  /** Pairs (a < b) of co-occurring items per basket with support
    * counts: one shuffle keyed by basket, in-place ordered-pair
    * expansion (see the scale note above).
    */
  private def pairSupport(baskets: DataFrame): DataFrame =
    baskets // (basket, item) distinct
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
             transform(slice(items, i + 2, size(items) - i - 1), y -> struct(x AS a, y AS b))))"""))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))

  /** Event-type co-occurrence lift at user grain: for each unordered
    * type pair, the observed co-occurrence (users with both) against
    * the independence expectation n_a·n_b/n, as exact ppm
    * (lift > 1e6 = types attract, < 1e6 = repel). The segmentation
    * signal behind "users who X also Y" dashboards.
    *
    * Shape: distinct (user, type) → per-user pair expansion → pair
    * counts; per-type user counts and the user total are tiny
    * aggregates broadcast onto the pair frame. Two fact shuffles total
    * (distinct, pair count).
    */
  def eventTypeLift(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id").as("basket"), col("event_type").as("item"))
      .distinct()
    val pairs = pairSupport(ut)
    val perType = ut.groupBy(col("item")).agg(count(lit(1)).as("n_users"))
    val total = ut.select(countDistinct(col("basket")).as("n_total"))
    pairs
      .join(broadcast(perType.select(col("item").as("a"), col("n_users").as("n_a"))), Seq("a"))
      .join(broadcast(perType.select(col("item").as("b"), col("n_users").as("n_b"))), Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a").as("type_a"), col("b").as("type_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * n_total * 1000000 div (n_a * n_b)").as("lift_ppm"))
  }

  /** Association rules over co-purchased parts: for every part pair
    * with support ≥ `minSupport` co-orders, both directional
    * confidences (P(b|a), P(a|b)) and the symmetric lift, in exact ppm.
    * The "frequently bought together" table, mined without any
    * fact-table self-join.
    *
    * Shape: distinct (order, part) → per-order pair expansion → pair
    * counts (support-filtered EARLY, before the score joins, so the
    * scored frame is only the frequent pairs); per-part order counts
    * join in (broadcast — the part dimension is small relative to
    * facts), the order total is a broadcast scalar.
    */
  def basketRules(lineitem: DataFrame, minSupport: Long = 2): DataFrame = {
    val op = lineitem.select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    val pairs = pairSupport(op).filter(col("n_ab") >= minSupport)
    val perPart = op.groupBy(col("item")).agg(count(lit(1)).as("n_orders"))
    val total = op.select(countDistinct(col("basket")).as("n_total"))
    pairs
      .join(broadcast(perPart.select(col("item").as("a"), col("n_orders").as("n_a"))), Seq("a"))
      .join(broadcast(perPart.select(col("item").as("b"), col("n_orders").as("n_b"))), Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a").as("part_a"), col("b").as("part_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * 1000000 div n_a").as("conf_ab_ppm"),
        expr("n_ab * 1000000 div n_b").as("conf_ba_ppm"),
        expr("n_ab * n_total * 1000000 div (n_a * n_b)").as("lift_ppm"))
  }

  /** Co-purchase edge list: part pairs co-ordered in at least
    * `minSupport` orders (ea < eb). The graph the link-prediction /
    * graph-analytics keys run on; same in-place pair expansion as
    * [[basketRules]].
    */
  def coOrderEdges(lineitem: DataFrame, minSupport: Long = 2): DataFrame =
    pairSupport(lineitem
        .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
        .distinct())
      .filter(col("n_ab") >= minSupport)
      .select(col("a").as("ea"), col("b").as("eb"))

  /** Year-over-year brand share shift: each brand's share of annual
    * line revenue in exact ppm, with the signed change vs the prior
    * year (share arithmetic is all positive-operand division; the
    * delta is a subtraction, so engines agree on negatives). The
    * assortment-drift monitor a merchandising dashboard leads with.
    *
    * Shape: one fact-scan aggregate to (brand, year) cells, share via
    * a per-year window over that small frame, lag over (brand, year).
    */
  def brandShareYoy(lineitem: DataFrame, part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = lineitem
      .select(col("l_partkey"), year(col("l_shipdate")).as("yr"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(part.select(col("p_partkey").as("l_partkey"), col("p_brand")), Seq("l_partkey"))
      .groupBy(col("p_brand"), col("yr"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("brand_cents"))
    cells
      .withColumn("share_ppm", expr(
        "brand_cents * 1000000 div (sum(brand_cents) over (partition by yr))"))
      .withColumn("prev_share_ppm",
        lag(col("share_ppm"), 1).over(Window.partitionBy("p_brand").orderBy("yr")))
      .withColumn("share_shift_ppm", col("share_ppm") - col("prev_share_ppm"))
  }

  /** Monthly return rate: the share of line items flagged returned
    * ('R') per calendar month in exact ppm — the quality/regret signal
    * tracked next to revenue. One partial-aggregated scan.
    */
  def returnRateByMonth(lineitem: DataFrame): DataFrame =
    lineitem
      .select((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1).as("ym"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n_lines"), sum(col("ret")).as("n_returned"))
      .withColumn("return_ppm", expr("n_returned * 1000000 div n_lines"))

  /** Month-over-month revenue growth in engine-portable signed ppm:
    * growth = sign(Δ) · (|Δ| · 1e6 div prev) — the division always
    * sees non-negative operands (floor vs truncate never diverges),
    * the sign is applied after. First month reports null growth.
    * Same tiny-monthly-frame discipline as [[seasonalityDecompose]].
    */
  def momGrowth(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = orders
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("ym"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("month_cents"))
    val w = Window.orderBy("ym")
    monthly
      .withColumn("prev_cents", lag(col("month_cents"), 1).over(w))
      .withColumn("delta_cents", col("month_cents") - col("prev_cents"))
      .withColumn("growth_ppm",
        when(col("prev_cents").isNotNull,
          signum(col("delta_cents")).cast("long") *
            expr("abs(delta_cents) * 1000000 div prev_cents")))
  }

  /** Classical time-series decomposition of monthly order revenue —
    * trend (centered 3-month moving average), month-of-year seasonal
    * index, residual — all in exact integer cents/ppm (the STL shape
    * with integer kernels, so engines agree bit-for-bit).
    *
    * trend is null on the first/last month (no full window);
    * seasonal_ppm compares the month-of-year's mean against the global
    * monthly mean via cross-multiplied integer division.
    *
    * Shape: one aggregate to ~n-months rows, then window/broadcast
    * arithmetic on that tiny frame — the fact table is touched once.
    */
  def seasonalityDecompose(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = orders
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("ym"),
        month(col("o_orderdate")).as("moy"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("ym"), col("moy"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("month_cents"))
    // the window runs over the MONTHLY aggregate (~tens of rows), so the
    // unpartitioned frame is a deliberate single-task step on a tiny side
    val w = Window.orderBy(col("ym")).rowsBetween(-1, 1)
    val withTrend = monthly
      .withColumn("w_sum", sum(col("month_cents")).over(w))
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("trend_cents", when(col("w_n") === 3, expr("w_sum div 3")))
      .drop("w_sum", "w_n")
    // seasonal index from per-month MEANS (integer div first, then the
    // ppm ratio) — cross-multiplying the raw cent sums by 1e6 would
    // overflow int64 around sf1.0, and both engines apply the identical
    // floor-division order so the result stays bit-exact
    val moyStats = monthly.groupBy(col("moy"))
      .agg(expr("sum(month_cents) div count(1)").as("moy_mean"))
    val global = monthly.select(expr("sum(month_cents) div count(1)").as("g_mean"))
    withTrend
      .join(broadcast(moyStats), Seq("moy"))
      .crossJoin(broadcast(global))
      .select(col("ym"), col("moy"), col("n_orders"), col("month_cents"),
        col("trend_cents"),
        expr("moy_mean * 1000000 div g_mean").as("seasonal_ppm"),
        (col("month_cents") - col("trend_cents")).as("residual_cents"))
  }
}
