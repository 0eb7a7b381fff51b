package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.diff.{Diff, DiffOptions}
import graft.schema.Snapshot

/** Physical-plan assertions: the properties that make these operators
  * scale are checked here, not just eyeballed — filter/projection
  * pushdown to the parquet scan, broadcast joins for small sides,
  * map-side partial aggregation, whole-stage codegen coverage.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): String =
    plan(SparkEntry.queries(name)(spark, sf("sf0.001")))

  test("scan_project_filter pushes filter and prunes columns at the parquet scan") {
    val p = q("scan_project_filter")
    assert(p.contains("PushedFilters") &&
      (p.contains("IsNotNull(o_orderstatus)") || p.contains("EqualTo(o_orderstatus,F)")),
      s"filter not pushed:\n$p")
    // projection pruned to the two selected columns + filter column
    assert(p.contains("ReadSchema") && !p.contains("o_comment"),
      s"columns not pruned:\n$p")
  }

  test("small-dimension joins broadcast (no shuffle of the big side)") {
    val p = q("three_way_join_filter")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    val ps = q("semi_join_in_subquery")
    assert(ps.contains("LeftSemi"), s"expected semi join:\n$ps")
  }

  test("aggregation runs partial (map-side) before the shuffle") {
    val p = q("hash_agg_partial_final")
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      s"no partial aggregation:\n$p")
  }

  test("top-k is TakeOrderedAndProject, not a full sort") {
    val p = q("limit_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("diff engine: all four entity joins broadcast the target side") {
    val base = Snapshot.fromParquetDir(spark, sf("sf0.001"))
    val p = plan(Diff.diff(base, base, DiffOptions()))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"metadata diff should never sort-merge:\n$p")
  }

  test("diff engine with broadcastTarget=false degrades to shuffled joins, not a crash") {
    val base = Snapshot.fromParquetDir(spark, sf("sf0.001"))
    val p = plan(Diff.diff(base, base, DiffOptions(broadcastTarget = false)))
    // AQE may still pick broadcast for tiny inputs; the point is the
    // plan builds and keeps equi-join operators (never nested-loop).
    assert(!p.contains("BroadcastNestedLoopJoin"), s"diff must stay equi-join:\n$p")
  }

  test("text analysis is shuffle-free (pure projection over the scan)") {
    Seq("text_token_count", "text_quality_score", "text_language_id", "text_fingerprint")
      .foreach { name =>
        // the final orderBy for the oracle adds one exchange; strip it by
        // checking the un-ordered operator itself
        val p = plan(graft.ext.TextAnalysis.tokenCounts(
          graft.sources.Tables.load(spark, sf("sf0.001"), "documents")))
        assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
      }
  }

  test("LSH ANN join is an equi-join on the bucket key (not nested-loop)") {
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
    val p = plan(graft.ext.Similarity.lshTopK(e, e.limit(4), k = 3))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"bucketed ANN must equi-join:\n$p")
    assert(p.contains("graft_qdot"), s"native dot product not in plan:\n$p")
  }

  test("dedup_embedding_cosine equi-joins on block-pair keys (no nested loop / cartesian)") {
    val p = q("dedup_embedding_cosine")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"exact pair join must stay block-partitioned:\n$p")
    assert(p.contains("graft_qdot"), s"native dot product not in plan:\n$p")
  }

  test("knn_graph_blocked scores pairs through the tile equi-join, ranks with one window") {
    val p = q("knn_graph_blocked")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"kNN graph must stay block-partitioned:\n$p")
    assert(p.contains("graft_qdot"), s"native dot product not in plan:\n$p")
    assert(p.contains("Window"), s"expected the per-query ranking window:\n$p")
  }

  test("incremental LSH joins the two signature frames on the bucket key") {
    val p = q("dedup_incremental_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate generation must stay an equi-join:\n$p")
    assert(p.contains("graft_jaccard"), s"native jaccard verify not in plan:\n$p")
  }

  test("broadcast_join keeps the fact side shuffle-free before aggregation") {
    val p = q("broadcast_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join must not sort-merge:\n$p")
  }

  test("skew_salted_agg is two aggregation levels with partial phases") {
    val p = q("skew_salted_agg")
    // (key, salt) pre-agg + key merge, each with its own partial phase
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 4, s"expected two-level (>=4 HashAggregate nodes) plan, got $aggs:\n$p")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("skew_salted_join joins on (key, salt) so a hot key spreads") {
    val p = q("skew_salted_join")
    assert(p.contains("__salt"), s"expected the salt in the join keys:\n$p")
  }

  test("bloom_semi_join probes the bloom filter below the join") {
    val p = q("bloom_semi_join")
    assert(p.contains("graft_bloom_might_contain"), s"no bloom probe:\n$p")
    val probeAt = p.indexOf("graft_bloom_might_contain")
    val joinAt = p.indexOf("Join")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"bloom probe must sit under the join (prune before shuffle):\n$p")
  }

  test("tpch_q1 partial-aggregates map-side; tpch_q3 top-10 avoids a full sort") {
    val q1 = q("tpch_q1_pricing_summary")
    assert(q1.contains("HashAggregate") && q1.contains("partial_"),
      s"Q1 must partial-aggregate before the shuffle:\n$q1")
    val q3 = q("tpch_q3_shipping_priority")
    assert(q3.contains("TakeOrderedAndProject"),
      s"Q3 LIMIT 10 must be top-k, not a global sort:\n$q3")
  }

  test("tpch_q18 having-aggregate partials map-side; top-100 is top-k") {
    val p = q("tpch_q18_large_orders")
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      s"Q18 quantity aggregate must partial map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"Q18 LIMIT 100 must be top-k, not a global sort:\n$p")
  }

  test("pivot_agg is a single-pass aggregate (no distinct-values job)") {
    val p = q("pivot_agg")
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      s"pivot must partial-aggregate:\n$p")
  }

  test("explode_unnest keeps Generate outside any shuffle") {
    val p = q("explode_unnest")
    assert(p.contains("Generate"), s"expected Generate node:\n$p")
    // the only exchange is the final presentation sort's range partitioning
    assert(!p.contains("Exchange hashpartitioning"),
      s"explode should not hash-shuffle:\n$p")
  }

  test("NOT IN over a nullable inner plans the null-aware anti join") {
    val p = q("null_aware_anti_join")
    // Spark's single-column null-aware path: broadcast + isNullAwareAntiJoin
    // (never a plain shuffled left_anti, which would drop the 3VL semantics)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast-side null-aware anti join:\n$p")
    assert(p.toLowerCase.contains("anti"), s"expected anti join:\n$p")
  }

  test("exists/not-exists rewrite to semi and anti joins (no subquery at runtime)") {
    val p = q("exists_correlated")
    assert(p.toLowerCase.contains("semi") && p.toLowerCase.contains("anti"),
      s"expected semi+anti join pair:\n$p")
  }

  test("latest_record_per_key: one hash shuffle, in-partition sort, no global sort before filter") {
    val p = q("latest_record_per_key")
    // the row_number partition sort must be a local Sort under one
    // hashpartitioning exchange of the key — the final orderBy is the
    // only range exchange
    assert(p.contains("hashpartitioning(o_custkey"), s"expected key shuffle:\n$p")
    assert("rangepartitioning".r.findAllIn(p).size <= 1,
      s"more than the final ORDER BY's range exchange:\n$p")
  }

  test("timeseries_gap_fill broadcasts the dense grid side") {
    val p = q("timeseries_gap_fill")
    assert(p.contains("BroadcastHashJoin"), s"expected grid broadcast:\n$p")
  }

  test("exact median histogram: raw rows pass through ONE partial-aggregated shuffle") {
    val p = q("exact_median_window")
    // two HashAggregate levels (partial before the exchange) for the
    // (group, value) count; the cumulative window runs on the tiny
    // histogram, never on raw rows
    assert(p.contains("HashAggregate"), p)
    assert(p.indexOf("HashAggregate") != p.lastIndexOf("HashAggregate"),
      s"expected partial+final aggregate levels:\n$p")
  }

  test("grouped percentiles run in histogram form: window only over the histogram") {
    val p = q("exact_percentiles_grouped")
    // raw rows cross ONE partial-aggregated shuffle into the (group,
    // value) histogram; the cumulative window and the final pivot run
    // over |distinct values| rows per group, never over the fact
    assert(p.contains("HashAggregate") &&
      p.indexOf("HashAggregate") != p.lastIndexOf("HashAggregate"),
      s"expected partial+final histogram aggregate:\n$p")
    // tree section only (details repeat node names); parents print
    // first, so "window consumes the histogram aggregate" reads as
    // finalAgg < Window < histogramAgg < Scan in the listing
    val tree = p.substring(0, math.max(p.indexOf("\n\n"), 0) match {
      case 0 => p.length; case n => n
    })
    val windowPos = tree.indexOf("Window")
    val scanPos = tree.indexOf("Scan parquet")
    assert(windowPos >= 0 && scanPos >= 0, p)
    assert(tree.indexOf("HashAggregate") < windowPos &&
      windowPos < tree.lastIndexOf("HashAggregate") &&
      tree.lastIndexOf("HashAggregate") < scanPos,
      s"window must consume the histogram, not raw rows:\n$p")
  }

  test("merge_upsert full-outer join sorts both sides on the merge key (SMJ)") {
    val p = q("merge_upsert")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      s"expected full-outer sort-merge join:\n$p")
  }

  test("unpivot_melt plans as Expand with no exchange (shuffle-free melt)") {
    val p = q("unpivot_melt")
    assert(p.contains("Expand"), s"expected Expand:\n$p")
    // the only exchange allowed is the final orderBy's range partition
    val body = p.split("Sort").head
    assert(!body.contains("Exchange hashpartitioning"),
      s"melt should not hash-shuffle:\n$p")
  }

  test("lateral LIMIT decorrelates to a per-key window top-k, not N scans") {
    val p = q("lateral_topn_join")
    assert(p.contains("Window"), s"expected decorrelated window:\n$p")
    assert(!p.contains("CartesianProduct"), s"lateral must not go nested-loop:\n$p")
  }

  test("tpch_q19 disjunctive join stays a single broadcast hash join") {
    val p = q("tpch_q19_disjunctive_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"OR-of-ANDs must not degrade to nested loop:\n$p")
  }

  test("tpch_q7 fact side joins dims via broadcast; one aggregate shuffle") {
    val p = q("tpch_q7_volume_shipping")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"expected >=3 broadcast joins, got $bhj:\n$p")
  }

  test("tpch_q21 computes double correlation as ONE per-order aggregate") {
    val p = q("tpch_q21_waiting_supplier")
    // the per-order distinct-count + late-set aggregate runs in ONE pass
    // over lineitem⋈orders: exactly 5 scans total (lineitem, orders,
    // supplier, nation, region), no fact self-join. The formatted plan
    // prints every scan twice (tree + detail) — count the detail lines.
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(scans <= 5, s"too many scans ($scans) — correlation not aggregated:\n$p")
  }

  test("multimodal: metadata-only queries prune the payload column out of the parquet scan") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    graft.ext.Multimodal.fromDocuments(
        graft.sources.Tables.load(spark, sf("sf0.001"), "documents"))
      .write.mode("overwrite").parquet(dir)
    val p = plan(spark.read.parquet(dir)
      .groupBy("media_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("declared_w").as("w_sum")))
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("payload"),
      s"metadata-only query must never read the payload bytes:\n$p")
  }

  test("round-5 operators keep their scale shapes: equi-joins, broadcasts, no shuffles where promised") {
    // semDedup: the within-cell pair stage is an equi-join on cell_id;
    // the only row-expanding join allowed is the BROADCAST centroid
    // fan-out (k rows, the ivfTopK convention) — never a shuffled
    // cartesian of data-sized frames
    val psem = q("semdedup_prune")
    assert(!psem.contains("CartesianProduct"),
      s"semdedup must never cartesian two data-sized frames:\n$psem")
    assert(psem.contains("SortMergeJoin") || psem.contains("ShuffledHashJoin") ||
      psem.contains("BroadcastHashJoin"),
      s"semdedup pair stage must equi-join on the cell:\n$psem")
    assert(psem.contains("BroadcastExchange"),
      s"centroid fan-out must broadcast, not shuffle:\n$psem")
    // hashed linear classifier + int8 QC: per-row projections — the
    // only exchange allowed is widen's round-robin fan-out of the
    // narrow test scan; never a hash (aggregation/join) shuffle
    val d = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val pcls = plan(graft.ext.TextAnalysis.qualityClassifier(d))
    assert(!pcls.contains("Exchange hashpartitioning"),
      s"classifier must not hash-shuffle:\n$pcls")
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
    val pq = plan(graft.ext.Similarity.int8QuantQc(e))
    assert(!pq.contains("Exchange hashpartitioning"),
      s"int8 QC must not hash-shuffle:\n$pq")
    // shard shuffle: exactly ONE exchange node (the shard repartition
    // feeding the per-shard rank window); formatted explain prints each
    // node twice (tree + detail), so count tree nodes only
    val pss = plan(graft.ext.TrainPrep.shardShuffle(d))
    assert(raw"Exchange \(\d+\)".r.findAllIn(pss).size == 1,
      s"shard shuffle should shuffle once, by shard:\n$pss")
    // k-means final assignment: centroids broadcast (k-row fan-out),
    // never a shuffled cartesian
    val pkm = plan(graft.ext.Similarity.sphericalKMeans(e, k = 4, iterations = 1))
    assert(pkm.contains("BroadcastExchange") && !pkm.contains("CartesianProduct"),
      s"k-means assignment should broadcast centroids:\n$pkm")
  }

  test("whole-stage codegen covers the hot paths") {
    // AQE shows codegen spans only in the FINAL plan — execute first,
    // then read the adaptive plan's executed tree (codegen stages carry
    // the `*(n)` prefix).
    Seq("hash_agg_partial_final", "column_type_mismatch", "dedup_exact").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      df.collect() // executes THIS plan (count() would plan a new one)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WholeStageCodegen") || p.contains("*("),
        s"$name has no codegen span:\n$p")
    }
  }
}
