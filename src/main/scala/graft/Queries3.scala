package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 TPC-H completion batch: the remaining headline query shapes
  * (Q2/Q4/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q17/Q19/Q21/Q22), adapted to the
  * driver testdata's reduced TPC-H schema (TESTDATA.md). Adaptations,
  * applied identically on the Spark and DuckDB sides so the oracle
  * stays exact:
  *
  *  - there is no `partsupp` table → the supply catalog is derived as
  *    `SELECT l_partkey, l_suppkey, min(price_c) FROM lineitem GROUP BY
  *    1,2` (Q2/Q9/Q11/Q17 cost/stock stand-ins use it or
  *    `p_retailprice`);
  *  - there are no `l_commitdate`/`l_receiptdate` columns → "late" is
  *    `l_shipdate > o_orderdate + 90 days` (Q4/Q12/Q21);
  *  - there is no `l_shipmode` → Q12 groups by `l_returnflag`;
  *  - there is no `c_phone` country code → Q22 derives the code as
  *    `c_custkey % 7` (same expression both sides).
  *
  * All money stays in exact integer cents (`price_c`) / cent-basis
  * points (`rev_e4 = price_c * (100 - disc_pct)`), as in [[Queries]] —
  * the oracle hash-compare is bit-exact, never float-tolerant.
  *
  * Scale notes (100 TB): every dimensional join below broadcasts
  * (region/nation/supplier/part filters reduce to KB-MB); the only
  * fact-side shuffles are the groupBy aggregations on already-reduced
  * rows. Q21's double correlation is expressed as one per-order
  * aggregate (counts of suppliers/late-suppliers) instead of two
  * correlated EXISTS scans — one shuffle of the filtered fact instead
  * of three.
  */
object Queries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  private def priceC = round(col("l_extendedprice") * 100).cast("long")
  private def discPct = round(col("l_discount") * 100).cast("long")
  private def qtyL = round(col("l_quantity")).cast("long")

  // -------------------------------------------------------------------
  // Q2 — min-cost supplier per part (correlated-min shape).
  // Supply catalog derived from lineitem; "cost" of (part, supplier) =
  // the minimum observed line price in cents. Region-restricted
  // suppliers; the min is computed per part and re-joined (Catalyst
  // plans the re-join as a broadcast of the tiny min table).
  private def tpchQ2(s: SparkSession, dir: String): DataFrame = {
    // ONE filtered part frame serves both the semi-join prefilter and
    // the final name join — the predicate lives in one place
    val parts = t(s, dir, "part")
      .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_name"))
    // dim filter pushed BELOW the supply aggregation: only ~4% of
    // lineitem reaches the (l_partkey, l_suppkey) shuffle — at scale
    // this is the difference between shuffling the fact and a sliver
    val supply = t(s, dir, "lineitem")
      .join(broadcast(parts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(priceC).as("offer_c"))
    val eurSup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("s_acctbal") * 100).cast("long").as("acctbal_c"), col("n_name"))
    val offers = supply
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eurSup), col("l_suppkey") === col("s_suppkey"))
    val minOffer = offers.groupBy(col("p_partkey").as("mo_partkey"))
      .agg(min(col("offer_c")).as("min_offer_c"))
    offers
      .join(broadcast(minOffer),
        col("p_partkey") === col("mo_partkey") && col("offer_c") === col("min_offer_c"))
      .select(col("acctbal_c"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("offer_c"))
      .orderBy(col("acctbal_c").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  // Q4 — order-priority count with a correlated EXISTS (semi join).
  // "Late" adaptation: some lineitem shipped >90 days after the order
  // date. The semi join keeps the orders side lean (no fan-out), then
  // one small groupBy.
  private def tpchQ4(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("o_orderdate")) < lit("1996-04-01").cast("date"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 90),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  // Q7 — volume shipping between two REGIONS (nation-level pairs are
  // empty at sf0.001: only 10 suppliers exist), both directions, by
  // ship year. Supplier region via lineitem, customer region via
  // orders; both dim lookups broadcast.
  private def tpchQ7(s: SparkSession, dir: String): DataFrame = {
    def natRegion(nk: String, out: String) =
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as(nk), col("r_name").as(out))
    val l = t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1998-01-01").cast("date"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (priceC * (lit(100L) - discPct)).as("rev_e4"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(natRegion("s_nkey", "supp_region")), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(natRegion("c_nkey", "cust_region")), col("c_nationkey") === col("c_nkey"))
      .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
        (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
      .groupBy(col("supp_region"), col("cust_region"), col("l_year"))
      .agg(sum(col("rev_e4")).as("revenue_e4"))
      .orderBy("supp_region", "cust_region", "l_year")
  }

  // Q8 — national market share: of the PROMO-part revenue bought by
  // ASIA-region customers, which integer share came from NATION_3
  // suppliers, per order year. Exact numerator/denominator BIGINTs
  // (no float division in the gate).
  private def tpchQ8(s: SparkSession, dir: String): DataFrame = {
    val asiaCust = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val o = t(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val promoParts = t(s, dir, "part").filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val supNation = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (priceC * (lit(100L) - discPct)).as("rev_e4"))
    l.join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", col("rev_e4")).otherwise(0L))
          .as("target_rev_e4"),
        sum(col("rev_e4")).as("total_rev_e4"))
      .orderBy("o_year")
  }

  // Q9 — product-type profit by supplier nation and order year.
  // Cost stand-in: p_retailprice per unit (no partsupp.ps_supplycost
  // in the testdata). amount_e4 = rev_e4 - retail_c*100*qty, exact.
  private def tpchQ9(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), round(col("p_retailprice") * 100).cast("long").as("retail_c"))
    val supNation = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (priceC * (lit(100L) - discPct)).as("rev_e4"), qtyL.as("qty"))
    l.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("rev_e4") - col("retail_c") * 100L * col("qty")).as("profit_e4"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  // Q11 — important stock: per-part supply value restricted to one
  // nation's suppliers, kept if above a fraction of the total (scalar
  // subquery → broadcast of a 1-row aggregate; the HAVING filter runs
  // post-shuffle on the already-aggregated tiny table).
  private def tpchQ11(s: SparkSession, dir: String): DataFrame = {
    val supp5 = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val value = t(s, dir, "lineitem")
      .join(broadcast(supp5), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(priceC).as("value_c"))
    val total = value.agg(sum(col("value_c")).as("total_c"))
    value.join(broadcast(total))
      // integer DIV matches the oracle's `//`; Column `/` would go
      // through double and drift once total_c exceeds 2^53
      .filter(col("value_c") > expr("total_c DIV 1000"))
      .select(col("l_partkey"), col("value_c"))
      .orderBy(col("value_c").desc, col("l_partkey"))
  }

  // Q12 — late-shipment priority counts grouped by l_returnflag (the
  // schema has no l_shipmode): one fact-side join orders⋈lineitem with
  // the late predicate, then a 3-group aggregate of two CASE sums.
  private def tpchQ12(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1997-01-01").cast("date"))
      .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 90))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_returnflag")
  }

  // Q13 — customer order-count distribution: left outer join with a
  // join-level filter (priority), two stacked aggregations. The
  // distribution agg input is one row per customer — tiny.
  private def tpchQ13(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // Q15 — top supplier: quarterly revenue per supplier, keep the
  // max-revenue supplier(s) via a 1-row scalar max broadcast back.
  private def tpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1996-04-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(sum(priceC * (lit(100L) - discPct)).as("total_rev_e4"))
    val maxRev = rev.agg(max(col("total_rev_e4")).as("max_rev_e4"))
    t(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev))
      .filter(col("total_rev_e4") === col("max_rev_e4"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
      .orderBy("s_suppkey")
  }

  // Q17 — small-quantity revenue: per-part average quantity as a
  // grouped subquery re-joined to the fact; the avg compare stays in
  // integers (5*qty*cnt < sum ⇔ qty < avg/5 — no float division).
  private def tpchQ17(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#5")
      .select(col("p_partkey"))
    // semi-filter the fact FIRST: per-part stats only exist for parts
    // the final join consumes, so computing them over the pruned fact
    // is result-identical and keeps the stats frame dim-sized (the
    // broadcast below ships ~|Brand#5 parts| rows, never the full
    // part keyspace)
    val l = t(s, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), qtyL.as("qty"), priceC.as("price_c"))
    val stats = l.groupBy(col("l_partkey").as("st_partkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
    l.join(broadcast(stats), col("l_partkey") === col("st_partkey"))
      .filter(col("qty") * 5L * col("cnt") < col("sum_qty"))
      .agg(sum(col("price_c")).as("total_c"), count(lit(1)).as("n_rows"))
  }

  // Q19 — disjunctive predicate pushdown: OR-of-ANDs over part
  // attributes and line quantities, single equi-join on partkey with
  // the residual disjunction evaluated post-join (Catalyst pushes the
  // per-side conjuncts common to all branches into the scans).
  private def tpchQ19(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_size"))
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"), qtyL.as("qty"),
        (priceC * (lit(100L) - discPct)).as("rev_e4"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) && col("qty").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) && col("qty").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && col("qty").between(20, 30)))
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_rows"))
  }

  // Q21 — suppliers who kept orders waiting: the classic double
  // correlation (EXISTS other supplier / NOT EXISTS other late
  // supplier) expressed as ONE per-order aggregate — n_supp and
  // n_late_supp distinct counts — then a semi filter. One shuffle of
  // the filtered fact instead of three correlated scans; at 100 TB the
  // per-order aggregate is the same shuffle key as the join.
  private def tpchQ21(s: SparkSession, dir: String): DataFrame = {
    val fOrders = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = t(s, dir, "lineitem")
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 90)).as("is_late"))
    // ONE pass over the fact: per-order supplier stats AND the late
    // supplier set in the same aggregate, so lineitem is scanned once
    // (sets are bounded by suppliers-per-order, a small constant).
    // size(collect_set) instead of countDistinct: two distinct aggs
    // would plan an Expand (3× the fact rows through the shuffle) +
    // SortAggregate; the set version is one ObjectHashAggregate.
    val perOrder = l.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_suppkey")).as("supps"),
        collect_set(when(col("is_late"), col("l_suppkey"))).as("late_supps"))
      .select(col("l_orderkey"), size(col("supps")).as("n_supp"),
        size(col("late_supps")).as("n_late_supp"), col("late_supps"))
    val natSup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AFRICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    perOrder
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("l_orderkey"), explode(col("late_supps")).as("late_supp"))
      .join(broadcast(natSup), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(countDistinct(col("l_orderkey")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  // Q22 — global sales opportunity: rich-but-inactive customers.
  // Country code adapted to c_custkey % 7 (no c_phone column); the
  // positive-balance average is a broadcast scalar; "inactive" means
  // no orders since 2000 (every customer has SOME order in this
  // testdata) — a left-anti join against the filtered orders.
  private def tpchQ22(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), (col("c_custkey") % 7L).cast("int").as("cntrycode"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_c"))
    val avgPos = c.filter(col("acctbal_c") > 0L)
      .agg(sum(col("acctbal_c")).as("sum_c"), count(lit(1)).as("n_c"))
    val o = t(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("2000-01-01").cast("date"))
      .select(col("o_custkey"))
    c.join(broadcast(avgPos))
      .filter(col("acctbal_c") * col("n_c") > col("sum_c"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum(col("acctbal_c")).as("totacctbal_c"))
      .orderBy("cntrycode")
  }

  // -------------------------------------------------------------------
  // Q16 — parts/supplier relationship: distinct supplier counts per
  // (brand, type, size) over the supply catalog, excluding a
  // deterministic "complaints" supplier set (no s_comment column → the
  // proxy is s_suppkey % 10 = 7, same expression both sides). Supply
  // pairs come from ONE distinct over lineitem's (part, supp); parts
  // and the exclusion list broadcast; the single countDistinct plans
  // as a two-phase aggregate with no Expand.
  private def tpchQ16(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#2" && !col("p_type").startsWith("MEDIUM") &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val excluded = t(s, dir, "supplier")
      .filter(col("s_suppkey") % 10 === 7).select(col("s_suppkey"))
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  // -------------------------------------------------------------------
  // Q20 — potential part promotion: suppliers holding "excess stock"
  // of small parts. No ps_availqty column → the proxy is the supplier's
  // all-time shipped quantity per part vs 2× its 1996 shipments
  // (availqty > 0.5·sold becomes total > 2·sold_1996, exact integers,
  // same expression both sides). One (part, supp) aggregate off the
  // fact computes both sums in a single pass; parts and the nation
  // filter broadcast.
  private def tpchQ20(s: SparkSession, dir: String): DataFrame = {
    val smallParts = t(s, dir, "part")
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val ps = t(s, dir, "lineitem")
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(qtyL).as("total_qty"),
        sum(when(year(to_date(col("l_shipdate"))) === 1996, qtyL).otherwise(0L))
          .as("qty_1996"))
      .filter(col("qty_1996") > 0L && col("total_qty") > col("qty_1996") * 2)
      .select(col("l_suppkey")).distinct()
    val nations = t(s, dir, "nation")
      .filter(col("n_name").startsWith("NATION_1")).select(col("n_nationkey"))
    t(s, dir, "supplier")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(ps, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  // -------------------------------------------------------------------
  // Coverage batch beyond TPC-H: unpivot/melt, lateral top-n join,
  // BM25 ranking, Markov transition matrix.

  // Wide→long unpivot (melt) of part's numeric attributes via the
  // Dataset.unpivot API (plans as Expand — one pass, no shuffle, no
  // join; at 100 TB this is the only sane melt: k× row fan-out with
  // zero exchange).
  private def unpivotMelt(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("long").as("size_l"),
        round(col("p_retailprice") * 100).cast("long").as("retail_c"))
      .unpivot(Array(col("p_partkey")), Array(col("size_l"), col("retail_c")),
        "attr", "value")
      .orderBy("p_partkey", "attr")

  // Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 richest
  // customers per nation. Catalyst decorrelates the limit into a
  // per-key row_number — i.e. the distributed window top-k — instead
  // of N correlated scans.
  private def lateralTopN(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("q3_nation")
    t(s, dir, "customer").createOrReplaceTempView("q3_customer")
    s.sql("""
      SELECT n.n_name, t.c_custkey, t.acctbal_c
      FROM q3_nation n,
      LATERAL (
        SELECT c.c_custkey,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c
        FROM q3_customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY acctbal_c DESC, c.c_custkey LIMIT 2) t
      ORDER BY n.n_name, t.acctbal_c DESC, t.c_custkey""")
  }

  // BM25 document ranking for a fixed query term set (k1=1.2, b=0.75).
  // Every input to the float formula is an exact integer (tf, df, N,
  // dl, Σdl); the per-term score is floored to 1e-6 fixed point BEFORE
  // the cross-term sum, so the final ordering compare is pure integer
  // (same convention as text_tfidf_topk). One term-keyed shuffle for
  // tf/df; df and corpus stats broadcast back.
  private def textBm25(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents").createOrReplaceTempView("q3_documents")
    s.sql("""
      WITH tok AS (
        SELECT doc_id, explode(split(text, ' ')) AS term FROM q3_documents),
      dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      n AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN ('dup', 'vector', 'join') GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      scored AS (
        SELECT tf.doc_id,
          CAST(floor(1e6 *
            ln((CAST(n.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                / (CAST(n.sum_dl AS DOUBLE) / n.n_docs)))) AS BIGINT)
            AS term_score_e6
        FROM tf JOIN df ON tf.term = df.term
        JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN n)
      SELECT doc_id, CAST(sum(term_score_e6) AS BIGINT) AS score_e6,
             count(*) AS n_terms
      FROM scored GROUP BY doc_id
      ORDER BY score_e6 DESC, doc_id LIMIT 10""")
  }

  // First-order Markov transition matrix over per-user event
  // sequences: lag window → pair counts → per-source probability in
  // exact parts-per-million (integer floor division both sides).
  private def eventsMarkov(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = e.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("curr"))
      .withColumn("prev", lag(col("curr"), 1).over(w))
      .filter(col("prev").isNotNull)
    val counts = pairs.groupBy(col("prev"), col("curr")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev").as("t_prev")).agg(sum(col("n")).as("total"))
    counts.join(broadcast(totals), col("prev") === col("t_prev"))
      .select(col("prev"), col("curr"), col("n"),
        expr("n * 1000000 DIV total").as("p_ppm")) // integer DIV: `/` is
      .orderBy("prev", "curr")                     // double division in Spark
  }

  // Triangle counting over the part co-purchase graph: parts that
  // appear in >=2 common orders form an edge; triangles are the
  // standard two-hop join with the a<b<c orientation (each triangle
  // counted once, and the orientation bounds the join fan-out by
  // out-degree — the classic distributed-triangle trick; at scale the
  // orientation would be by degree, not id, to crush hub skew).
  // Per-order pair expansion is quadratic in ORDER SIZE (bounded ~40),
  // not in table size.
  private def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    // pair generation via in-order set expansion, NOT a self-join: one
    // shuffle keyed by order collects each order's part set; id-ordered
    // pairs explode in place (the self-join shuffles the same frame
    // twice for the same pairs — the pairsWithinBuckets pattern)
    // the edge list feeds FOUR consumers (three legs of the triangle
    // join + the edge count): lazy checkpoint so each consumer reads
    // the materialized edges instead of re-running the collect_set +
    // pair-expansion subtree (reference-tracked, no session leak)
    val edges = graft.ext.Checkpoints.truncateLazy(t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
             transform(slice(pks, i + 2, size(pks) - i - 1), y -> struct(x AS ea, y AS eb))))"""))
        .as("e"))
      .select(col("e.ea"), col("e.eb"))
      .groupBy(col("ea"), col("eb"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select(col("ea"), col("eb")))
    val tri = edges.alias("e1")
      .join(edges.alias("e2"), col("e1.eb") === col("e2.ea"))
      .join(edges.alias("e3"),
        col("e3.ea") === col("e1.ea") && col("e3.eb") === col("e2.eb"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val nTri = tri.agg(count(lit(1)).as("n_triangles"))
    nEdges.join(nTri)
  }

  // Rolling DISTINCT count over an ordered window: distinct event
  // types among each user's last 5 events. Spark has no native
  // windowed count-distinct — size(collect_set() OVER rows-frame) is
  // the idiomatic formulation (state bounded by the frame width).
  private def windowRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("n_distinct5", size(collect_set(col("event_type")).over(w)))
      .select(col("event_id"), col("user_id"), col("n_distinct5"))
      .orderBy("event_id")
  }

  // Exact grouped percentiles (discrete: the value AT rank ceil(p*n),
  // no interpolation) in the HISTOGRAM form: the value at rank r in
  // sorted order is the minimum value whose cumulative count >= r, so
  // raw rows pass through ONE partial-aggregated shuffle into a
  // (group, value) histogram and the window runs over |distinct
  // values| rows per group — never a per-row window over the fact
  // (the same rewrite that took exact_median_window 1.49s -> 0.51s;
  // a row-rank window makes each group a single-threaded partition).
  private def exactPercentilesGrouped(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "lineitem")
      .select(col("l_returnflag"), qtyL.as("qty"))
      .groupBy(col("l_returnflag"), col("qty"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("qty")
    hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cum") >= ceil(col("n") * 0.25), col("qty"))).as("p25"),
        min(when(col("cum") >= ceil(col("n") * 0.5), col("qty"))).as("p50"),
        min(when(col("cum") >= ceil(col("n") * 0.9), col("qty"))).as("p90"))
      .orderBy("l_returnflag")
  }

  // Directional containment dedup: |A∩B| / |A| over 3-gram shingle
  // sets within (lang, source) blocks — catches sub-documents that
  // Jaccard misses (a contained doc has low Jaccard vs a much larger
  // superset doc). Integer outputs: intersection size, |A|, and the
  // score in exact ppm (floor division both sides). The threshold is
  // PUSHED DOWN into the join as a size prefilter: containment >= 0.5
  // needs |A∩B| >= |A|/2 and |A∩B| <= |B|, so 2|B| >= |A| — pairs
  // failing it never reach the set intersection (result-identical).
  // At production scale the candidate set comes from an LSH prefilter
  // (corpus_clean composition), not all block pairs.
  private def dedupContainment(s: SparkSession, dir: String): DataFrame = {
    // corpus = docs ∪ first-half truncations at doc_id+1e6 (the same
    // planted-duplicate convention as the other dedup keys): each
    // truncation is CONTAINED in its original, which Jaccard alone
    // would score ~0.5 and miss at higher thresholds
    val d5 = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val w = split(col("text"), " ")
    val d = d5.unionByName(d5.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("source"),
      concat_ws(" ", slice(w, lit(1), greatest((size(w) / 2).cast("int"), lit(1))))
        .as("text")))
    graft.functions.GraftFunctions.register(s)
    // widened before the per-row shingling (narrow scan must not
    // serialize it) and lazily checkpointed: BOTH sides of the
    // self-join read this frame — without materialization the
    // tokenize+shingle+distinct subtree runs twice (Dedup.scala:66)
    val sh = graft.ext.Checkpoints.truncateLazy(
      graft.ext.Scale.widen(d).select(col("doc_id"), col("lang"), col("source"),
        array_distinct(graft.ext.TextPrimitives.shingles(
          graft.ext.TextPrimitives.tokens(col("text")), 3)).as("sh")))
    sh.alias("a").join(sh.alias("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
        col("a.doc_id") =!= col("b.doc_id") &&
        size(col("b.sh")) * 2 >= size(col("a.sh")))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        // one-pass native scorer: size(array_intersect(..)) would
        // materialize the intersection array per candidate pair
        graft.functions.GraftFunctions.containmentNative(col("a.sh"), col("b.sh"))
          .as("st"))
      .select(col("a_id"), col("b_id"),
        col("st.inter").as("inter"), col("st.na").as("na"))
      .filter(col("na") > 0)
      .withColumn("containment_ppm",
        expr("CAST(inter AS BIGINT) * 1000000 DIV na"))
      .filter(col("containment_ppm") >= 500000L)
      .orderBy("a_id", "b_id")
  }

  // Count-min heavy hitters over event users: exact top-10 counts
  // (oracle-comparable) + the CMS estimate's guarantee bounds as
  // booleans (est >= exact, over-estimate <= 3·N/width) — the same
  // exact-plus-tolerance contract as the HLL/KLL sketch keys.
  private def approxTopkCms(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"))
    val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(10)
    val sketch = graft.ext.FreqSketch.cmsBuild(e, "user_id")
    val est = graft.ext.FreqSketch.cmsEstimate(sketch, exact, "user_id")
    val total = e.agg(count(lit(1)).as("n_total"))
    exact.join(broadcast(est), Seq("user_id"))
      .join(broadcast(total))
      .select(col("user_id"), col("exact_n"),
        (col("est_n") >= col("exact_n")).as("cms_lower_ok"),
        (col("est_n") - col("exact_n") <= col("n_total") * 3L / 1024L + 1L)
          .as("cms_upper_ok"))
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  // NULL-ordering semantics pinned through row_number VALUES (the
  // gate's compare sorts rows, so only rank values can witness sort
  // order). Spark defaults to NULLS FIRST for ASC, DuckDB to NULLS
  // LAST — the engine must spell the placement explicitly to be
  // portable, which is exactly what this key checks.
  private def sortNullsOrdering(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("q3_orders")
    s.sql("""
      SELECT o_orderkey, o_orderstatus, rn FROM (
        SELECT o_orderkey, o_orderstatus,
               row_number() OVER (PARTITION BY o_orderstatus
                 ORDER BY nullif(o_orderpriority, '3-MEDIUM') NULLS LAST,
                          o_orderkey) AS rn
        FROM q3_orders)
      WHERE rn <= 100 ORDER BY o_orderstatus, rn""")
  }

  // Boolean/conditional aggregate surface: bool_and / bool_or /
  // count_if — single partial-aggregated pass.
  private def aggBooleanSurface(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("bool_and(o_totalprice > 0)").as("all_positive"),
        expr("bool_or(o_totalprice > 400000)").as("any_large"),
        expr("count_if(o_orderpriority = '1-URGENT')").as("n_urgent"),
        expr("count_if(o_totalprice > 200000)").as("n_big"))
      .orderBy("o_orderstatus")

  // Batch use of the BUILT-IN session_window aggregate, cross-checked
  // against an independent gaps-and-islands derivation in the oracle —
  // validates Spark's native session semantics (merge while the gap to
  // the previous event is < 30 min; window end = last event + gap)
  // rather than reimplementing them. Events carry bigint nanos; the
  // window runs on exact-integer-derived micros timestamps.
  private def sessionWindowBatch(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), graft.sources.Tables.eventTs(col("ts")).as("tts"))
    e.groupBy(col("user_id"), session_window(col("tts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q2_min_cost_supplier" -> tpchQ2 _,
    "tpch_q4_order_priority" -> tpchQ4 _,
    "tpch_q7_volume_shipping" -> tpchQ7 _,
    "tpch_q8_market_share" -> tpchQ8 _,
    "tpch_q9_product_profit" -> tpchQ9 _,
    "tpch_q11_important_stock" -> tpchQ11 _,
    "tpch_q12_priority_shipments" -> tpchQ12 _,
    "tpch_q13_order_distribution" -> tpchQ13 _,
    "tpch_q15_top_supplier" -> tpchQ15 _,
    "tpch_q17_small_quantity" -> tpchQ17 _,
    "tpch_q16_parts_suppliers" -> tpchQ16 _,
    "tpch_q19_disjunctive_join" -> tpchQ19 _,
    "tpch_q20_potential_promotion" -> tpchQ20 _,
    "tpch_q21_waiting_supplier" -> tpchQ21 _,
    "tpch_q22_sales_opportunity" -> tpchQ22 _,
    "unpivot_melt" -> unpivotMelt _,
    "lateral_topn_join" -> lateralTopN _,
    "text_bm25_topk" -> textBm25 _,
    "events_markov_transitions" -> eventsMarkov _,
    "graph_triangle_count" -> graphTriangles _,
    "window_rolling_distinct" -> windowRollingDistinct _,
    "exact_percentiles_grouped" -> exactPercentilesGrouped _,
    "dedup_containment" -> dedupContainment _,
    "approx_topk_cms" -> approxTopkCms _,
    "sort_nulls_ordering" -> sortNullsOrdering _,
    "agg_boolean_surface" -> aggBooleanSurface _,
    "events_session_window_batch" -> sessionWindowBatch _,
  )

  val oracles: Map[String, String] = Map(
    "tpch_q16_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#2' AND p_type NOT LIKE 'MEDIUM%'
           AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
           AND l_suppkey NOT IN (
             SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 7)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "tpch_q20_potential_promotion" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
                  sum(CAST(round(l_quantity) AS BIGINT)) AS total_qty,
                  sum(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1996
                      THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS qty_1996
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
           GROUP BY 1, 2),
         q AS (
           SELECT DISTINCT l_suppkey FROM ps
           WHERE qty_1996 > 0 AND total_qty > qty_1996 * 2)
         SELECT s_suppkey, s_name
         FROM supplier
         WHERE s_nationkey IN (
             SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION\_1%' ESCAPE '\')
           AND s_suppkey IN (SELECT l_suppkey FROM q)
         ORDER BY s_suppkey""",

    "tpch_q2_min_cost_supplier" ->
      """WITH supply AS (
           SELECT l_partkey, l_suppkey,
                  min(CAST(round(l_extendedprice*100) AS BIGINT)) AS offer_c
           FROM lineitem GROUP BY 1, 2),
         eur_sup AS (
           SELECT s.s_suppkey, s.s_name,
                  CAST(round(s.s_acctbal*100) AS BIGINT) AS acctbal_c, n.n_name
           FROM supplier s
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name = 'EUROPE'),
         offers AS (
           SELECT e.acctbal_c, e.s_name, e.n_name, p.p_partkey, p.p_name,
                  sp.offer_c,
                  min(sp.offer_c) OVER (PARTITION BY p.p_partkey) AS min_offer_c
           FROM supply sp
           JOIN part p ON sp.l_partkey = p.p_partkey
           JOIN eur_sup e ON sp.l_suppkey = e.s_suppkey
           WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE')
         SELECT acctbal_c, s_name, n_name, p_partkey, p_name, offer_c
         FROM offers WHERE offer_c = min_offer_c
         ORDER BY acctbal_c DESC, n_name, s_name, p_partkey""",

    "tpch_q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
           AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
           AND EXISTS (
             SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey
               AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 90)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "tpch_q7_volume_shipping" ->
      """SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
                CAST(year(l.l_shipdate) AS INT) AS l_year,
                CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
                  AS revenue_e4
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
         JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
           AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
             OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "tpch_q8_market_share" ->
      """SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                  THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                  ELSE 0 END) AS BIGINT) AS target_rev_e4,
                CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
                  AS total_rev_e4
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         WHERE p.p_type = 'PROMO'
           AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
           AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
           AND o.o_custkey IN (
             SELECT c.c_custkey FROM customer c
             JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
             JOIN region r ON n2.n_regionkey = r.r_regionkey
             WHERE r.r_name = 'ASIA')
         GROUP BY 1 ORDER BY 1""",

    "tpch_q9_product_profit" ->
      """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
                CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                  - CAST(round(p.p_retailprice*100) AS BIGINT) * 100
                    * CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS profit_e4
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE p.p_name LIKE '%red%'
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",

    "tpch_q11_important_stock" ->
      """WITH value AS (
           SELECT l.l_partkey,
                  CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT)
                    AS value_c
           FROM lineitem l
           WHERE l.l_suppkey IN (
             SELECT s.s_suppkey FROM supplier s
             JOIN nation n ON s.s_nationkey = n.n_nationkey
             JOIN region r ON n.n_regionkey = r.r_regionkey
             WHERE r.r_name = 'EUROPE')
           GROUP BY 1)
         SELECT l_partkey, value_c FROM value
         WHERE value_c > (SELECT sum(value_c) FROM value) // 1000
         ORDER BY value_c DESC, l_partkey""",

    "tpch_q12_priority_shipments" ->
      """SELECT l.l_returnflag,
                CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
           AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 90
         GROUP BY 1 ORDER BY 1""",

    "tpch_q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c.c_custkey, count(o.o_orderkey) AS c_count
           FROM customer c
           LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
           GROUP BY c.c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "tpch_q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
                    AS total_rev_e4
           FROM lineitem
           WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
             AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
           GROUP BY 1)
         SELECT s.s_suppkey, s.s_name, r.total_rev_e4
         FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
         WHERE r.total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
         ORDER BY s.s_suppkey""",

    "tpch_q17_small_quantity" ->
      """WITH l AS (
           SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS price_c
           FROM lineitem),
         stats AS (
           SELECT l_partkey AS st_partkey, sum(qty) AS sum_qty, count(*) AS cnt
           FROM l GROUP BY 1)
         SELECT CAST(sum(l.price_c) AS BIGINT) AS total_c, count(*) AS n_rows
         FROM l
         JOIN stats st ON l.l_partkey = st.st_partkey
         WHERE l.l_partkey IN
             (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5')
           AND l.qty * 5 * st.cnt < st.sum_qty""",

    "tpch_q19_disjunctive_join" ->
      """SELECT CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
                  AS revenue_e4,
                count(*) AS n_rows
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
                AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 11)
            OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
                AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10 AND 20)
            OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 20 AND 30)""",

    "tpch_q21_waiting_supplier" ->
      """WITH l AS (
           SELECT li.l_orderkey, li.l_suppkey,
                  CAST(li.l_shipdate AS DATE)
                    > CAST(o.o_orderdate AS DATE) + 90 AS is_late
           FROM lineitem li
           JOIN orders o ON li.l_orderkey = o.o_orderkey
           WHERE o.o_orderstatus = 'F'),
         per_order AS (
           SELECT l_orderkey AS po_orderkey,
                  count(DISTINCT l_suppkey) AS n_supp,
                  count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
           FROM l GROUP BY 1)
         SELECT s.s_name, count(DISTINCT l.l_orderkey) AS numwait
         FROM l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         JOIN per_order po ON l.l_orderkey = po.po_orderkey
         WHERE l.is_late AND r.r_name = 'AFRICA'
           AND po.n_supp >= 2 AND po.n_late_supp = 1
         GROUP BY 1 ORDER BY numwait DESC, s_name""",

    "tpch_q22_sales_opportunity" ->
      """WITH c AS (
           SELECT c_custkey, CAST(c_custkey % 7 AS INT) AS cntrycode,
                  CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_c
           FROM customer),
         avg_pos AS (
           SELECT sum(acctbal_c) AS sum_c, count(*) AS n_c
           FROM c WHERE acctbal_c > 0)
         SELECT c.cntrycode, count(*) AS numcust,
                CAST(sum(c.acctbal_c) AS BIGINT) AS totacctbal_c
         FROM c CROSS JOIN avg_pos a
         WHERE c.acctbal_c * a.n_c > a.sum_c
           AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                           AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
         GROUP BY 1 ORDER BY 1""",

    "unpivot_melt" ->
      """WITH p AS (
           SELECT p_partkey, CAST(p_size AS BIGINT) AS size_l,
                  CAST(round(p_retailprice*100) AS BIGINT) AS retail_c
           FROM part)
         SELECT p_partkey, attr, value FROM (
           SELECT p_partkey, 'size_l' AS attr, size_l AS value FROM p
           UNION ALL
           SELECT p_partkey, 'retail_c', retail_c FROM p)
         ORDER BY p_partkey, attr""",

    "lateral_topn_join" ->
      """SELECT n.n_name, t.c_custkey, t.acctbal_c
         FROM nation n,
         LATERAL (
           SELECT c.c_custkey,
                  CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c
           FROM customer c
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY acctbal_c DESC, c.c_custkey LIMIT 2) t
         ORDER BY n.n_name, t.acctbal_c DESC, t.c_custkey""",

    "text_bm25_topk" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         n AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term IN ('dup', 'vector', 'join') GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         scored AS (
           SELECT tf.doc_id,
             CAST(floor(1e6 *
               ln((CAST(n.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                   / (CAST(n.sum_dl AS DOUBLE) / n.n_docs)))) AS BIGINT)
               AS term_score_e6
           FROM tf JOIN df ON tf.term = df.term
           JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN n)
         SELECT doc_id, CAST(sum(term_score_e6) AS BIGINT) AS score_e6,
                count(*) AS n_terms
         FROM scored GROUP BY doc_id
         ORDER BY score_e6 DESC, doc_id LIMIT 10""",

    "events_markov_transitions" ->
      """WITH pairs AS (
           SELECT user_id, event_type AS curr,
                  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS prev
           FROM events),
         counts AS (
           SELECT prev, curr, count(*) AS n FROM pairs
           WHERE prev IS NOT NULL GROUP BY prev, curr),
         totals AS (SELECT prev AS t_prev, sum(n) AS total FROM counts GROUP BY 1)
         SELECT c.prev, c.curr, c.n,
                CAST(c.n * 1000000 // t.total AS BIGINT) AS p_ppm
         FROM counts c JOIN totals t ON c.prev = t.t_prev
         ORDER BY prev, curr""",

    "graph_triangle_count" ->
      """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         edges AS (
           SELECT a.pk AS ea, b.pk AS eb
           FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT (SELECT count(*) FROM edges) AS n_edges,
                (SELECT count(*) FROM edges e1
                 JOIN edges e2 ON e1.eb = e2.ea
                 JOIN edges e3 ON e3.ea = e1.ea AND e3.eb = e2.eb) AS n_triangles""",

    "window_rolling_distinct" ->
      """SELECT event_id, user_id,
                CAST(count(DISTINCT event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_distinct5
         FROM events ORDER BY event_id""",

    "exact_percentiles_grouped" ->
      """WITH ranked AS (
           SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS qty,
                  row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY CAST(round(l_quantity) AS BIGINT), l_orderkey, l_linenumber) AS rn,
                  count(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
         SELECT l_returnflag,
                max(CASE WHEN rn = ceil(n*0.25) THEN qty END) AS p25,
                max(CASE WHEN rn = ceil(n*0.5)  THEN qty END) AS p50,
                max(CASE WHEN rn = ceil(n*0.9)  THEN qty END) AS p90
         FROM ranked
         WHERE rn = ceil(n*0.25) OR rn = ceil(n*0.5) OR rn = ceil(n*0.9)
         GROUP BY 1 ORDER BY 1""",

    "dedup_containment" ->
      """WITH d5 AS (
           SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 5 = 0),
         corpus AS (
           SELECT doc_id, lang, source, text FROM d5
           UNION ALL
           SELECT doc_id + 1000000, lang, source,
                  array_to_string(w[1:greatest(CAST(len(w)//2 AS INT), 1)], ' ')
           FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM d5)),
         sh0 AS (
           SELECT doc_id, lang, source,
                  list_distinct([array_to_string(w[i+1:i+3], ' ')
                    FOR i IN range(0, greatest(len(w)-2, 0))]) AS sh
           FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w
                 FROM corpus))
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                CAST(len(list_intersect(a.sh, b.sh)) AS INT) AS inter,
                CAST(len(a.sh) AS INT) AS na,
                CAST(len(list_intersect(a.sh, b.sh)) * 1000000 // len(a.sh) AS BIGINT)
                  AS containment_ppm
         FROM sh0 a JOIN sh0 b
           ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
         WHERE len(a.sh) > 0
           AND len(list_intersect(a.sh, b.sh)) * 1000000 // len(a.sh) >= 500000
         ORDER BY a_id, b_id""",

    "approx_topk_cms" ->
      """SELECT user_id, count(*) AS exact_n,
                TRUE AS cms_lower_ok, TRUE AS cms_upper_ok
         FROM events GROUP BY user_id
         ORDER BY exact_n DESC, user_id LIMIT 10""",

    "sort_nulls_ordering" ->
      """SELECT o_orderkey, o_orderstatus, rn FROM (
           SELECT o_orderkey, o_orderstatus,
                  row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY nullif(o_orderpriority, '3-MEDIUM') NULLS LAST,
                             o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 100 ORDER BY o_orderstatus, rn""",

    "agg_boolean_surface" ->
      """SELECT o_orderstatus,
                bool_and(o_totalprice > 0) AS all_positive,
                bool_or(o_totalprice > 400000) AS any_large,
                CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
                CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big
         FROM orders GROUP BY 1 ORDER BY 1""",

    "events_session_window_batch" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         l AS (
           SELECT *, CASE
             WHEN lag(ts_us) OVER w IS NULL THEN 1
             WHEN ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1
             ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
         s AS (
           SELECT *, sum(is_new) OVER (
             PARTITION BY user_id ORDER BY ts_us
             ROWS UNBOUNDED PRECEDING) AS sid
           FROM l)
         SELECT user_id,
                CAST(min(ts_us) AS BIGINT) AS start_us,
                CAST(max(ts_us) + 1800000000 AS BIGINT) AS end_us,
                CAST(count(*) AS BIGINT) AS n_events
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, start_us""",
  )
}
